"""Text pipeline operators: tokenize, clean, count, top-K%-of-mass.

Re-expresses the reference's usenet text pipeline (reference:
frame_tasks/basic_tasks.py:32-105) as native Spark column expressions:

* explode-with-carry replaces the reference's pandas index join-back
  (basic_tasks.py:38-40): source columns ride through one ``select``
  with the exploded column, so no join is ever needed;
* ``value_counts`` is a shuffle-once ``groupBy().count()`` with map-side
  partial aggregation (vs. the reference's in-memory
  ``Series.value_counts``, basic_tasks.py:87);
* the top-90%-of-mass cut (basic_tasks.py:92-105) is a window cumsum
  over the *vocabulary* (distinct tokens), not the corpus — the single
  global window is bounded by vocabulary size, and the resulting token
  set joins back broadcast-left-semi so the 100TB-side table never
  shuffles.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..runtime import quoted


def _c(name: str) -> Column:
    return F.col(quoted(name))


def tokenize(
    df: DataFrame,
    col: str,
    out: str,
    pattern: str = r"\s+",
    lowercase: bool = True,
    carry: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Split ``col`` on ``pattern`` and explode to one row per token,
    carrying ``carry`` columns (default: all other columns) through the
    same select — the Spark-native form of explode-with-index-carry."""
    carry_cols = list(carry) if carry is not None else [c for c in df.columns if c != out]
    src = F.lower(_c(col)) if lowercase else _c(col)
    return df.select(
        *[_c(c) for c in carry_cols],
        F.explode(F.split(src, pattern)).alias(out),
    )


def clean_tokens(
    df: DataFrame,
    col: str,
    out: str,
    min_len: int = 2,
    carry: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Trim leading/trailing non-word characters and drop short tokens
    (reference: basic_tasks.py:74-79 — ``\\A\\W+|\\W+\\Z`` strip then
    ``len > 1``)."""
    carry_cols = list(carry) if carry is not None else [c for c in df.columns if c not in (col, out)]
    cleaned = F.regexp_replace(_c(col), r"^\W+|\W+$", "")
    return (
        df.select(*[_c(c) for c in carry_cols], cleaned.alias(out))
        .filter(F.length(_c(out)) >= min_len)
    )


def value_counts(df: DataFrame, col: str, out: Optional[str] = None, desc: bool = True) -> DataFrame:
    """Group-by count, descending — the reference's generic ``counts``
    task (basic_tasks.py:82-89). One shuffle on the grouped column with
    automatic partial aggregation."""
    out = out or f"{col}.counts"
    grouped = df.groupBy(_c(col)).agg(F.count(F.lit(1)).alias(out))
    if desc:
        grouped = grouped.orderBy(F.desc(quoted(out)), _c(col))
    return grouped


def running_sum(
    df: DataFrame,
    value_col: str,
    out: str,
    order_by: Sequence[Column],
) -> DataFrame:
    """Cumulative sum over an explicit total order (reference:
    basic_tasks.py:100 relies on pandas insertion order; Spark must name
    the order in the window spec — SURVEY §7.3)."""
    w = Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(_c(value_col)).over(w))


def top_mass_fraction(
    counts_df: DataFrame,
    key_col: str,
    count_col: str,
    fraction: float = 0.9,
) -> DataFrame:
    """Keep the smallest prefix of most-frequent keys whose cumulative
    count stays under ``fraction`` of the total (reference:
    basic_tasks.py:92-105). Ties broken by key so the cut is
    deterministic on any engine.

    The window has no partition key, so it runs single-partition — but
    over the *distinct-key* table only (vocabulary-sized, not
    corpus-sized), which is the scalable formulation.
    """
    order = [F.desc(quoted(count_col)), F.asc(quoted(key_col))]
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    return (
        counts_df.select(
            _c(key_col),
            _c(count_col),
            F.sum(_c(count_col)).over(w_cum).alias("__cum"),
            F.sum(_c(count_col)).over(w_all).alias("__total"),
        )
        .filter(F.col("__cum") < fraction * F.col("__total"))
        .select(_c(key_col), _c(count_col))
    )


def top_mass_filter(
    df: DataFrame,
    col: str,
    fraction: float = 0.9,
    counts_df: Optional[DataFrame] = None,
    count_col: Optional[str] = None,
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` value is in the
    top-``fraction``-of-mass set — the reference's ``top90`` output
    shape (all occurrences, basic_tasks.py:99-105). The tiny top set is
    broadcast for a shuffle-free left-semi join against the big side."""
    if counts_df is None:
        counts_df = value_counts(df, col, out="__cnt", desc=False)
        count_col = "__cnt"
    assert count_col is not None
    top = top_mass_fraction(counts_df, col, count_col, fraction).select(_c(col))
    return df.join(F.broadcast(top), on=[col], how="left_semi")
