"""Execution layer: bind a planned task invocation to live frames.

Frames are **lazy PySpark DataFrames** — every step here composes
Catalyst logical plans; nothing materializes until the caller collects
or writes the goal frame, so column pruning / predicate pushdown /
join selection apply across the whole composed pipeline. A pandas
fallback is provided so the planner can be exercised without a JVM.

Reference semantics preserved (frame_tasks/tasks.py:164-275):

* each bound input frame is *reindexed* down to exactly the required
  columns in declaration order; missing columns warn and materialize as
  NULL (reference: tasks.py:200-205 warns and fills NaN);
* ``requires`` / ``expects`` kwargs are injected when the task function
  can accept them (the reference retries on TypeError, tasks.py:207-232;
  we inspect the signature instead);
* for an ``appends`` task with a single data arg and a single
  unpositioned return, the bound frame's remaining columns are
  re-attached via dedup + left equi-join on the required key columns
  (reference: tasks.py:262-269) — on Spark the dedup'd side is
  broadcast-eligible and Catalyst picks the physical join;
* declared output columns are validated with a warning, never an error
  (reference: tasks.py:236-274).
"""

from __future__ import annotations

import inspect
import warnings
from typing import Any, Dict, List, Sequence, Tuple, Union

from .plans.task import Arg, RetArg, Task
from .plans.unify import Binding


def _is_spark(frame: Any) -> bool:
    return type(frame).__module__.startswith("pyspark")


def quoted(name: str) -> str:
    """Backtick-quote a column name so dotted lineage names like
    ``doc.text.tokens`` resolve as plain columns, not struct fields."""
    return "`" + name.replace("`", "``") + "`"


def spark_col(frame: Any, name: str):
    """Column reference by exact name on a Spark DataFrame (dotted-name
    safe)."""
    from pyspark.sql import functions as F

    return F.col(quoted(name))


def reindex_frame(frame: Any, columns: Sequence[str]) -> Any:
    """Project ``frame`` to exactly ``columns`` in order; absent columns
    warn and appear as NULL (reference: frame_tasks/tasks.py:200-205)."""
    missing = [c for c in columns if c not in frame.columns]
    if missing:
        warnings.warn(f"reindex: {missing} not found; filled with NULL")
    if _is_spark(frame):
        from pyspark.sql import functions as F

        return frame.select(
            *[
                F.col(quoted(c)) if c in frame.columns else F.lit(None).alias(c)
                for c in columns
            ]
        )
    return frame.reindex(columns=list(columns))


def append_join_back(output: Any, source: Any, keys: Sequence[str]) -> Any:
    """Left-join the source frame's non-key columns onto ``output`` on
    ``keys``, deduplicating the source by the keys first (reference:
    frame_tasks/tasks.py:262-269)."""
    keys = [k for k in keys if k in source.columns and k in output.columns]
    carried = [c for c in source.columns if c not in keys and c not in output.columns]
    if not keys or not carried:
        return output
    if _is_spark(output):
        from pyspark.sql import functions as F

        extras = source.select(
            *[F.col(quoted(c)) for c in [*keys, *carried]]
        ).dropDuplicates(list(keys))
        return output.join(extras, on=list(keys), how="left")
    extras = source[list(keys) + carried].drop_duplicates(subset=list(keys))
    return output.merge(extras, on=list(keys), how="left")


def _accepts_kwarg(fn, name: str) -> bool:
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return True
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return True
    return name in params


def call_task(
    task: Task,
    bindings: Sequence[Binding],
    expects: List[RetArg],
    data: List[Any],
) -> List[Any]:
    """Invoke ``task`` with inputs bound per ``bindings`` over the live
    frame list ``data``; return the task's output frames (lazy)."""
    if task.fcode is None:
        raise RuntimeError(f"task {task.name} has no function")

    # per-arg concrete column lists, in *declaration* order of requires
    per_arg_cols: Dict[Arg, Dict[int, str]] = {}
    per_arg_frame: Dict[Arg, Any] = {}
    reference: Dict[Tuple[Arg, Union[str, Any]], str] = {}
    for b in bindings:
        per_arg_cols.setdefault(b.arg, {})[b.req_index] = b.column
        per_arg_frame[b.arg] = data[b.frame]
        ident: Union[str, Any] = b.var.pattern if b.var.is_pattern else b.var.string
        reference[(b.arg, ident)] = b.column

    kwargs: Dict[str, Any] = {}
    reindex_cols: Dict[Arg, List[str]] = {}
    for arg, by_index in per_arg_cols.items():
        cols = [by_index[i] for i in sorted(by_index)]
        reindex_cols[arg] = cols
        kwargs[arg] = reindex_frame(per_arg_frame[arg], cols)

    if task.pass_extra is not False:
        if _accepts_kwarg(task.fcode, "requires"):
            kwargs["requires"] = reference
        if _accepts_kwarg(task.fcode, "expects"):
            kwargs["expects"] = list(expects)

    output_ = task.fcode(**kwargs)

    positional = any(pos is not None for pos, _ in expects)
    if positional:
        if not isinstance(output_, (list, tuple)):
            warnings.warn(f"return from {task.name}: expected a sequence of frames")
            outputs = [output_]
        else:
            outputs = list(output_)
        for pos, name in expects:
            idx = pos if pos is not None else 0
            if idx >= len(outputs):
                warnings.warn(f"return from {task.name}: fewer frames than expected")
                break
            if name not in outputs[idx].columns:
                warnings.warn(
                    f"return from {task.name}: {name!r} not found in position {idx}"
                )
        return outputs

    output = output_[0] if isinstance(output_, (list, tuple)) else output_
    if task.appends and len(reindex_cols) == 1:
        (arg, keys), = reindex_cols.items()
        output = append_join_back(output, per_arg_frame[arg], keys)
    absent = {name for _, name in expects} - set(output.columns)
    if absent:
        warnings.warn(f"return from {task.name}: {absent} not found")
    return [output]
