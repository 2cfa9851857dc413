"""Approximate aggregation sketches — the single-pass, bounded-memory
summaries a 100 TB profiling pass runs where exact answers would
shuffle the world:

* :func:`approx_distinct` — HyperLogLog++ distinct counts
  (``approx_count_distinct``): fixed-size sketch per group, map-side
  mergeable, relative standard deviation ``rsd``.
* :func:`approx_quantiles` — Greenwald-Khanna quantile sketch
  (``percentile_approx``): rank error bounded by ``1/accuracy``,
  mergeable, one pass. (``DataFrame.approxQuantile`` collects to the
  driver; this stays an aggregate expression so it composes with
  groupBy and runs fully distributed.)

Sketch outputs are engine-specific by nature (different engines ship
different sketch implementations and seeds), so these operators are
validated by ERROR-BOUND tests against the exact in-repo aggregates
rather than a DuckDB value oracle — the correct check for an
approximate answer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """One row of HLL++ distinct-count estimates, one column per input
    column (named ``<col>_approx``)."""
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx")
            for c in cols
        ]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Approximate quantiles of ``col`` (optionally per group) as one
    aggregate expression — rank error <= 1/accuracy of the row count."""
    aggs = [
        F.percentile_approx(col, p, accuracy).alias(
            f"q{int(p * 100):02d}"
        )
        for p in probs
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 16,
    capacity_per_partition: int = 256,
) -> DataFrame:
    """Misra-Gries heavy hitters: items occurring more than n/k times,
    with frequency estimates whose undercount is bounded by
    n/capacity summed over partitions.

    Per-partition Misra-Gries summaries (bounded ``capacity`` counters
    regardless of partition cardinality) merge by summing counter
    values — the standard mergeable-summary property — then the global
    top-k of the merged counters is taken with TakeOrdered. The
    shuffle moves n_partitions x capacity rows, never the corpus;
    this is the profiling shape for "what dominates this 100 TB
    column" when an exact groupBy would be cardinality-bound.

    Returns (item, est_count) for the top ``k`` merged counters.
    Approximate by nature -> validated by error-bound tests (the
    estimate is within [true - n/capacity, true]), not a value oracle.
    """
    from typing import Iterator

    import pandas as pd

    cap = int(capacity_per_partition)

    def mg_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf["__item"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "c": list(counters.values()),
                }
            )

    partials = df.select(F.col(col).cast("string").alias("__item")).mapInPandas(
        mg_partial, schema="item string, c long"
    )
    merged = partials.groupBy("item").agg(F.sum("c").alias("est_count"))
    return merged.orderBy(F.desc("est_count"), "item").limit(k)


def cms_counters(
    df: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch counter table: ``depth`` independent hash rows
    of ``width`` buckets. UNLIKE the HLL/GK sketches above, every
    counter is an EXACT sum over deterministic portable hashes
    (md5-derived universal family, :mod:`.hashing`), so the full
    counter table — and any estimate read from it — is bit-replayable
    by the DuckDB oracle. The sketch property is structural: the table
    is fixed-size (``depth * width`` rows) no matter the corpus, built
    by one map-side-combined aggregation of ``depth`` scan-stage
    bucket ids per item — the mergeable shape that profiles a 100 TB
    stream in one pass with kilobytes of state.

    Returns (r, bk, c): hash-row index, bucket, exact count.
    """
    from .hashing import hash32, perm_hash

    h = hash32(F.col(col))
    buckets = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (perm_hash(h, r) % width).alias("bk"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.r", "rb.bk")
    return buckets.groupBy("r", "bk").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    items: DataFrame,
    counters: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: the estimate
    is the MIN over the item's ``depth`` counters — always >= the true
    count, over by at most the collisions in its emptiest row. The
    counter table is broadcast (fixed-size), so lookups never shuffle
    the probe side."""
    from .hashing import hash32, perm_hash

    h = hash32(F.col(col))
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (perm_hash(h, r) % width).alias("bk"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", "rb.r", "rb.bk")
    keep = [c for c in items.columns]
    return (
        probes.join(F.broadcast(counters), ["r", "bk"])
        .groupBy(*keep)
        .agg(F.min("c").alias("est"))
    )
