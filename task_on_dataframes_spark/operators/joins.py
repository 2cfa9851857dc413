"""Join operators beyond Spark's built-ins: as-of join and range join.

The reference has only pandas index/keyed left equi-joins (reference:
frame_tasks/basic_tasks.py:27-29, frame_tasks/tasks.py:262-269); these
are the time-series/interval join primitives a large-scale pipeline
needs, built as compositions of DataFrame ops so Catalyst optimizes
them:

* :func:`asof_join` — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented with the union-tag +
  running ``last(ignorenulls)`` window: ONE shuffle on the join key,
  no per-row subqueries, no cross product — the formulation that holds
  when both sides are billions of rows (cost is a sort within each key
  partition, exactly what a merge as-of join costs).
* :func:`range_join` — match rows to interval buckets. The bucket side
  is broadcast, so the big side never shuffles and Catalyst evaluates
  the range predicate inside codegen. When the bucket table itself
  grows beyond broadcast size, the standard rewrite is to quantize both
  sides onto a fixed-width grid column and equi-join on the grid id
  (each row joins its own and adjacent grid cells, then the exact range
  predicate filters) — turning the theta-join into a hash join.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    prefix: str = "asof_",
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Left as-of (backward) join: attach to each left row the right row
    with the greatest ``right_ts <= left_ts`` for the same key.

    ``right_cols`` are the right-side payload columns to attach (renamed
    ``{prefix}{col}``); ``tiebreak`` orders right rows sharing a
    timestamp (larger wins), making the result deterministic. The whole
    matched row travels as one struct so NULLs inside a payload column
    never mix values from different right rows.
    """
    right_ts = right_ts or left_ts
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )
    on = list(on)
    left_rest = [c for c in left.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in right_cols])

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols
            ) + ">"
        ).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left_rest],
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_rest],
    )

    # right rows sort before left rows at the same timestamp (<=
    # semantics); among right rows at one ts the largest tiebreak comes
    # last, so the running last() picks it
    order: List[Column] = [F.col("__ts"), F.col("__is_left")]
    if tiebreak is not None:
        order.append(F.when(F.col("__is_left") == 0, F.col(f"__r.{tiebreak}")))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rhs.unionByName(lhs).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in left_rest if c != left_ts],
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    big: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each ``big`` row to the bucket rows with
    ``lo <= value < hi``. The bucket side is broadcast — the big side
    never moves."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return big.join(F.broadcast(buckets), cond, how)


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SCD-1 merge (the CDC/incremental-load primitive): rows from
    ``updates`` replace same-key rows of ``base``; new keys append;
    untouched base rows pass through. Schemas must match by name.

    Built as ``base LEFT ANTI updates  UNION ALL  updates`` — the
    anti-join is one keyed operation, and when the update batch is
    small relative to the base (the normal CDC case) it broadcasts, so
    the base never shuffles: at 100 TB the whole merge is a map-side
    filter plus an append. (A full-outer-join formulation would shuffle
    both sides on the key for no benefit.) Last-writer-wins within
    ``updates`` is the caller's contract — dedup updates first if the
    batch can contain multiple versions of one key.
    """
    keys = list(keys)
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"upsert: schema mismatch {cols} vs {updates.columns}"
        )
    survivors = base.join(F.broadcast(updates.select(*keys)), on=keys,
                          how="left_anti")
    return survivors.select(*cols).unionByName(updates.select(*cols))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    payload_col: str,
) -> DataFrame:
    """Classify every key across two corpus snapshots as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit
    step an incremental ingestion pipeline runs between crawl dumps
    before deciding what to re-process. Compares md5 digests of the
    payload, not the payload itself, so the shuffle carries 32-byte
    digests instead of document bodies; the full-outer hash join is
    ONE shuffle keyed on the snapshot key (or zero with pre-bucketed
    snapshots). Returns ``(key, status)``.
    """
    o = old.select(
        F.col(key_col).alias("key"), F.md5(F.col(payload_col)).alias("od")
    )
    n = new.select(
        F.col(key_col).alias("key"), F.md5(F.col(payload_col)).alias("nd")
    )
    return o.join(n, on="key", how="full_outer").select(
        "key",
        F.when(F.col("od").isNull(), "added")
        .when(F.col("nd").isNull(), "removed")
        .when(F.col("od") != F.col("nd"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
