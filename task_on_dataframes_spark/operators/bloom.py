"""Broadcast Bloom-filter membership: the bounded-state scale path for
decontamination and blocklist probes.

The exact-join decontamination (``operators/dedup`` + the
``decontaminate`` query) shuffles train grams against the benchmark
gram set — correct, but the benchmark side grows with the number of
held-out suites. A Bloom filter caps the shipped state at ``m`` bits
regardless of how many grams feed it: ``k`` hash functions set bits in
an ``m``-wide array; a probe is "possibly present" only when ALL ``k``
bits are set. False positives are an explicit, deterministic function
of (hash family, m, k) — both the Spark plan and the DuckDB oracle
evaluate the *same* portable md5-derived hashes, so the flagged set
(including any false positives) is bit-identical across engines.

Scale shape: building the filter reduces benchmark grams to at most
``m`` distinct bit positions (one ``distinct`` on an int key, bounded
output); probing is k scan-stage hash expressions + k BROADCAST hash
semi-joins against the <= m-row bit table — the corpus never shuffles,
and the broadcast payload is bounded by m (65536 ints here, ~0.5 MB)
no matter how large the benchmark set grows. On a 1000-executor
cluster the probe side stays embarrassingly parallel.

(An equivalent formulation packs the bits into a numpy bitmap probed
inside a Pandas UDF — O(1) per probe with zero joins; the join form is
preferred here because it stays entirely JVM-side and Catalyst folds
the k semi-joins into one scan stage.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import hash32, hash32_sql

#: filter width in bits (bounded broadcast state)
M_BITS = 1 << 16
#: number of hash functions
K_HASH = 3


def bloom_bit(col, i: int, m: int = M_BITS):
    """Bit position of hash function ``i`` for a value column."""
    return F.pmod(hash32(F.concat(F.lit(f"bloom{i}:"), col)), F.lit(m))


def bloom_bit_sql(expr: str, i: int, m: int = M_BITS) -> str:
    """DuckDB rendering of :func:`bloom_bit` (identical bits)."""
    inner = hash32_sql(f"'bloom{i}:' || {expr}")
    return f"({inner} % {m})"


def build_bloom_bits(
    values: DataFrame, col: str, k: int = K_HASH, m: int = M_BITS
) -> DataFrame:
    """Distinct set bit positions for a value set: <= m rows of
    ``(bit)``. One union + distinct on an int key; output bounded by m
    regardless of input cardinality."""
    parts = [
        values.select(bloom_bit(F.col(col), i, m).alias("bit"))
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    # the bit table is probed k times downstream (one semi-join per
    # hash function); Catalyst will not dedupe the aliased subplan, so
    # persist the <= m-row result to compute the benchmark-gram pass
    # once instead of k times
    return out.distinct().persist()


def bloom_probe_hits(
    probes: DataFrame,
    bits: DataFrame,
    col: str,
    k: int = K_HASH,
    m: int = M_BITS,
) -> DataFrame:
    """Rows of ``probes`` whose value has ALL ``k`` bits present in
    ``bits`` — the Bloom "possibly present" set, false positives
    included by design. k broadcast semi-joins on int keys; the probe
    side never shuffles."""
    out = probes
    for i in range(k):
        bname = f"__b{i}"
        out = (
            out.withColumn(bname, bloom_bit(F.col(col), i, m))
            .join(
                F.broadcast(bits.select(F.col("bit").alias(bname))),
                on=bname,
                how="left_semi",
            )
            .drop(bname)
        )
    return out
