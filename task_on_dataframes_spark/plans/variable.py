"""Column matchers: exact strings or regex patterns with capture groups.

Parity notes (semantics established by the reference, re-implemented
fresh):

* A pattern matches a column name via *anchored-prefix* semantics
  (``re.match``), so authors anchor with ``\\Z`` when they need an exact
  match (reference: frame_tasks/tasks.py:65-76, basic_tasks.py:93).
* Capture groups of the matched pattern feed output-name templating
  (see :mod:`.unify`).
* A global, opt-in case-insensitivity flag exists (reference:
  frame_tasks/tasks.py:20).
* Variables round-trip through a URL-safe encoding ``S<string>`` /
  ``M<pattern>`` (reference: frame_tasks/tasks.py:33-44) used by the
  interactive state codec.
"""

from __future__ import annotations

import re
from typing import Optional, Union

VarIn = Union[str, "re.Pattern[str]"]

_IGNORE_CASE = False

# Templated requirement strings look like "{x}.counts" / "{x.0.1}.top90".
TEMPLATE_RE = re.compile(r"\{(\w+)(?:\.(\d+)(?:\.(\d+))?)?\}")


def set_ignore_case(flag: bool) -> None:
    """Globally toggle case-insensitive matching for *exact-string*
    variables created afterwards."""
    global _IGNORE_CASE
    _IGNORE_CASE = flag


class Variable:
    """Wraps either an exact column-name string or a compiled regex.

    ``matches(name)`` returns the :class:`re.Match` (or a truthy sentinel
    for exact hits) so callers can consume capture groups.
    """

    __slots__ = ("string", "pattern")

    def __init__(self, x: VarIn):
        if isinstance(x, str):
            self.string: Optional[str] = x
            flags = re.I if _IGNORE_CASE else 0
            # Exact strings still get a compiled matcher so equality can
            # honour the ignore-case flag uniformly.
            self.pattern: "re.Pattern[str]" = re.compile(re.escape(x) + r"\Z", flags)
        else:
            self.string = None
            self.pattern = x

    # -- classification ------------------------------------------------
    @property
    def is_pattern(self) -> bool:
        return self.string is None

    @property
    def is_templated(self) -> bool:
        """True for exact strings containing ``{...}`` placeholders that
        must be resolved against earlier bindings before matching."""
        return self.string is not None and TEMPLATE_RE.search(self.string) is not None

    # -- matching ------------------------------------------------------
    def matches(self, name: str) -> Optional["re.Match[str]"]:
        """Anchored-prefix match against a concrete column name."""
        if self.string is not None and not _IGNORE_CASE:
            # fast path; build a match object only when needed
            return self.pattern.match(name) if self.string == name else None
        return self.pattern.match(name)

    def __eq__(self, other: object) -> bool:
        if isinstance(other, str):
            if self.string is not None:
                return self.string == other or bool(self.pattern.match(other))
            return self.pattern.match(other) is not None
        if isinstance(other, Variable):
            if self.string is not None and other.string is not None:
                return self.string == other.string
            return self.pattern == other.pattern
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.string) if self.string is not None else hash(self.pattern)

    # -- serialization (interactive state codec) -----------------------
    @staticmethod
    def from_q(q: str) -> "Variable":
        if q.startswith("S"):
            return Variable(q[1:])
        if q.startswith("M"):
            return Variable(re.compile(q[1:]))
        raise ValueError(f"bad variable encoding: {q!r}")

    def q_enc(self) -> str:
        if self.string is not None:
            return f"S{self.string}"
        return f"M{self.pattern.pattern}"

    def __repr__(self) -> str:
        if self.string is not None:
            return self.string
        return f"P'{self.pattern.pattern}'"

    # -- presentation helper (reference: tasks.py:57-63) ---------------
    def highlight_match(self, name: str, start_tag: str, end_tag: str) -> str:
        if self.string is not None:
            return start_tag + name + end_tag if name == self.string else name
        if self.pattern.match(name):
            return start_tag + name + end_tag
        return name
