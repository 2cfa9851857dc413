"""Skew-handling operators for the cases AQE does not cover.

AQE's skew-join splitting (on by default, session.py) handles skewed
*shuffle joins*, and partial aggregation flattens skew for algebraic
aggregates. Two gaps remain at 100 TB:

* **non-algebraic / distinct aggregation on a skewed key** — all rows
  of the hot key still land on one reducer. :func:`distinct_count_2phase`
  and :func:`salted_agg` break the hot key across reducers first.
* **broadcast-ineligible joins against a skewed key set where AQE is
  unavailable** (e.g. stream-static joins): :func:`salted_join`
  replicates the small side per salt so the big side's hot key spreads
  over ``n_salt`` partitions.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_count_2phase(
    df: DataFrame, keys: Sequence[str], value: str, out: str = "n_distinct"
) -> DataFrame:
    """``count(DISTINCT value)`` per key without funneling a hot key's
    rows into one reducer: phase 1 groups by (key, value) — the value
    spreads the hot key across partitions and partial aggregation
    collapses duplicates map-side; phase 2 counts the surviving
    (key, value) pairs per key."""
    keys = list(keys)
    pairs = df.select(*keys, value).groupBy(*keys, value).agg(F.lit(1))
    return pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    exprs_partial: List[Column],
    exprs_final: List[Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation through an explicit salt column: phase 1
    groups by (keys, salt) so a hot key occupies ``n_salt`` reducers,
    phase 2 merges the partials per key. ``exprs_partial`` aggregate the
    raw rows; ``exprs_final`` (referencing the partial aliases) merge
    them (e.g. partial ``sum(x) AS s`` → final ``sum(s) AS s``)."""
    keys = list(keys)
    # salt must be DETERMINISTIC per row: partition-id/monotonic-id salts
    # change when a map task is recomputed after a partial shuffle fetch,
    # double-counting or dropping rows in phase 2. Hashing the full row
    # content reproduces identical salts on any retry.
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*exprs_partial)
    return partial.groupBy(*keys).agg(*exprs_final)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a content-derived salt
    in [0, n_salt); the small side is replicated once per salt value; the
    join key becomes (keys..., salt), so one hot key spreads over
    ``n_salt`` shuffle partitions instead of one.

    ``how`` is restricted to inner/left/left_semi/left_anti: replicating
    the small side means every UNMATCHED small-side row would surface
    ``n_salt`` times in a right/full outer result, which is silently
    wrong. (left_semi/left_anti on the big side are safe: semi/anti
    dedupe matches by definition.)
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the salt-replicated "
            "small side emits unmatched rows n_salt times under "
            "right/full outer joins; use inner/left/left_semi/left_anti"
        )
    on = list(on)
    # deterministic per-row salt (see salted_agg): survives task retries
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(n_salt))
    )
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    small_s = small.withColumn("__salt", F.explode(salts))
    out = big_s.join(small_s, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
