"""Deterministic sampling / dataset splitting.

Training pipelines need *reproducible* splits — the same row must land
in the same split on every run, on any cluster, at any parallelism.
Random `df.sample()` can't promise that across engines/partitionings;
hashing a stable key can: bucket = portable_hash(key, salt) % 1000,
compare against per-mille thresholds. One narrow scan, no shuffle, no
state; adding data later never moves existing rows between splits.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash32


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable per-mille bucket (0..999) for a row key."""
    return F.pmod(hash32(F.concat(F.lit(salt + ":"), key.cast("string"))), F.lit(1000))


def assign_split(
    df: DataFrame,
    key_col: str,
    fractions: Sequence[Tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Label every row with its split, by cumulative per-mille ranges
    over the stable hash bucket. Fractions must sum to <= 1; any
    remainder is labeled ``holdout``."""
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    for name, frac in fractions:
        hi = lo + int(round(frac * 1000))
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    assert lo <= 1000, "fractions exceed 1.0"
    return df.withColumn(out, expr.otherwise("holdout"))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a stable ``fraction`` of rows by key hash — same rows every
    run, no shuffle, filter evaluated at the scan."""
    return df.filter(
        split_bucket(F.col(key_col), salt) < int(round(fraction * 1000))
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_pm: Column, salt: str = "wsamp"
) -> DataFrame:
    """Importance resampling: keep each row with probability
    ``weight_pm``/1000 (a per-row per-mille integer weight), decided by
    the stable key hash — the primitive behind quality-weighted corpus
    mixing, where high-quality documents survive with higher
    probability than low-quality ones. Unlike ``rand() < w`` the
    decision is a pure function of (key, salt): task retries, reruns,
    and incremental loads keep exactly the same rows, and the expected
    kept mass is sum(weight_pm)/1000 regardless of partitioning.
    Integer-exact, zero shuffle, evaluated in the scan stage."""
    return df.filter(split_bucket(F.col(key_col), salt) < weight_pm)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a different stable
    fraction of rows for each value of ``strata_col`` (the
    corpus-mixing primitive — e.g. keep 100% of rare languages, 10% of
    the dominant one). Unlike ``df.sampleBy`` the decision is a pure
    function of the row key, so reruns, retries, and later incremental
    loads keep exactly the same rows. Zero shuffle: one hash + one
    CASE, evaluated in the scan stage."""
    bucket = split_bucket(F.col(key_col), salt)
    thresh: Column = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        per_mille = int(round(frac * 1000))
        thresh = (
            F.when(cond, per_mille)
            if thresh is None
            else thresh.when(cond, per_mille)
        )
    thresh = (
        thresh.otherwise(int(round(default_fraction * 1000)))
        if thresh is not None
        else F.lit(int(round(default_fraction * 1000)))
    )
    return df.filter(bucket < thresh)
