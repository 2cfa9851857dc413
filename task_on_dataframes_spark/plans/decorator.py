"""User-facing task declaration decorators.

API-compatible with the reference's stacked style (reference:
frame_tasks/decorator.py:14-111)::

    @tada.new_task()
    @tada.requires(["sample_ind", re.compile(r"(.+)\\.tokens")], arg="x")
    @tada.makes(["sample_ind", r"{x}.clean_tokens"], appends=False)
    @tada.close_task()
    def tokenize_clean(x, requires, expects): ...

Unlike the reference — which threads a module-global "task under
construction" through an RLock (frame_tasks/decorator.py:11-102) — each
decorator attaches metadata to the function object and ``new_task``
(outermost, applied last) assembles and registers the :class:`Task`.
Declaration order is preserved: decorator application is bottom-up, so
each ``requires``/``makes`` *prepends* its entries. ``close_task`` is a
no-op kept for drop-in compatibility.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

from .task import Task, TaskRegistry, default_registry
from .variable import Variable, VarIn

_REQ_ATTR = "_tada_requires"
_GEN_ATTR = "_tada_generates"
_APPENDS_ATTR = "_tada_appends"
_EXTRA_ATTR = "_tada_pass_extra"


def requires(columns: List[VarIn], arg: str):
    """Declare that DataFrame parameter ``arg`` must provide ``columns``
    (exact names, regex patterns, or ``{...}`` templates)."""

    def _decorate(f: Callable) -> Callable:
        entries = [(arg, Variable(c)) for c in columns]
        setattr(f, _REQ_ATTR, entries + list(getattr(f, _REQ_ATTR, [])))
        if any(v.is_pattern for _, v in entries) and getattr(f, _EXTRA_ATTR, None) is None:
            setattr(f, _EXTRA_ATTR, True)
        doc = [f.__doc__ or "", f"Requires columns {columns} for dataframe arg {arg}"]
        f.__doc__ = "\n".join(doc)
        return f

    return _decorate


def makes(columns: List[str], return_pos: Optional[int] = None, appends: bool = True):
    """Declare the output columns (templates allowed). ``appends=True``
    passes the bound input frame's other columns through to the output
    (dedup + left join-back at execution)."""
    assert columns

    def _decorate(f: Callable) -> Callable:
        entries = [(return_pos, c) for c in columns]
        setattr(f, _GEN_ATTR, entries + list(getattr(f, _GEN_ATTR, [])))
        setattr(f, _APPENDS_ATTR, appends)
        ret_at = f" at position {return_pos}" if return_pos else ""
        ret_app = ", along with the required input dataframe columns" if appends else ""
        doc = [f.__doc__ or "", f"Returns: dataframe{ret_at} with columns {columns}{ret_app}."]
        f.__doc__ = "\n".join(doc)
        return f

    return _decorate


def new_task(name: Optional[str] = None, registry: Optional[TaskRegistry] = None):
    """Outermost decorator: assemble the metadata attached by
    ``requires``/``makes`` into a :class:`Task` and register it under the
    function's name (or ``name``)."""

    def _decorate(f: Callable) -> Callable:
        task = Task(
            name=name or f.__name__,
            requires=list(getattr(f, _REQ_ATTR, [])),
            generates=list(getattr(f, _GEN_ATTR, [])),
            fcode=f,
            appends=bool(getattr(f, _APPENDS_ATTR, False)),
            pass_extra=getattr(f, _EXTRA_ATTR, None),
            ref=f.__name__,
        )
        (default_registry if registry is None else registry).register(task)
        f.__doc__ = "\n".join([f"Task: {name or f.__name__}", f.__doc__ or ""])

        @functools.wraps(f)
        def _wrapped(*args, **kwargs):
            return f(*args, **kwargs)

        return _wrapped

    return _decorate


def close_task():
    """No-op, kept for reference API compatibility (the reference uses it
    to release its construction lock, frame_tasks/decorator.py:99-111)."""

    def _decorate(f: Callable) -> Callable:
        return f

    return _decorate


class temporary_tasks:
    """Context manager: any task registered inside is removed on exit.

    Handy for tests and for notebook experimentation against the default
    registry.
    """

    def __init__(self, registry: Optional[TaskRegistry] = None):
        self.registry = default_registry if registry is None else registry

    def __enter__(self) -> TaskRegistry:
        self._snap = self.registry.snapshot()
        return self.registry

    def __exit__(self, *exc) -> None:
        self.registry.restore(self._snap)
