"""Distributed dense linear algebra over embedding columns.

Training-data pipelines need a few dense primitives after embedding —
corpus/label centroids, the Gram (scatter) matrix behind covariance
and PCA, top principal components for whitening or dedup projection.
Naively these are driver-side; the shapes here keep them distributed:

* :func:`label_centroids` — posexplode to (label, pos, x) and ONE
  keyed shuffle with map-side partial aggregation; DECIMAL-exact sums
  make the means independent of partitioning and summation order
  (same pattern as :mod:`.clustering`).
* :func:`gram_matrix` — per-partition NumPy ``X^T X`` partials via
  ``mapInPandas`` (Arrow batches), then ONE shuffle of
  n_partitions x d(d+1)/2 rows summed by (i, j). 100 TB of vectors
  reduce to d^2 numbers without ever shuffling the corpus — the
  canonical map-side Gram reduction.
* :func:`pca_power_top` — power iteration on the d x d Gram on the
  driver (d^2 doubles — tiny), AFTER the distributed reduction.
  Deterministic: fixed all-ones init, fixed iteration count, the sign
  normalized so the largest-|loading| component is positive.

No reference counterpart (the reference has no embedding linalg); the
oracle twin replays the identical rounded-Gram iteration in SQL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .localdata import local_frame


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean vector as (label, pos, mean) rows — pos is
    1-based to match SQL ``unnest WITH ORDINALITY``. One shuffle of
    n x d rows with map-side partial DECIMAL sums; exact and
    partition-order-proof."""
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos0", "x"
        ),
    ).select("label", (F.col("pos0") + 1).alias("pos"), "x")
    return exploded.groupBy("label", "pos").agg(
        F.expr(
            "round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)"
            " / count(1), 6)"
        ).alias("mean")
    )


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """Upper-triangle Gram matrix sum_rows(x_i * x_j) as (i, j, v)
    rows, i <= j, 1-based, v rounded to 6 decimals.

    Per-partition ``X^T X`` partials in NumPy (one BLAS call per Arrow
    batch), then one d(d+1)/2-key shuffle of the partials. The corpus
    itself is never shuffled — at 1000 executors this moves
    n_partitions x d^2 doubles, not n x d."""
    import numpy as np

    iu = np.triu_indices(dims)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dims, dims))
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            acc += x.T @ x
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": iu[0] + 1,
                    "j": iu[1] + 1,
                    "pv": acc[iu],
                }
            )

    partials = emb.select(
        F.col(vec_col).cast("array<double>").alias("v")
    ).mapInPandas(_partial, schema="i int, j int, pv double")
    return partials.groupBy("i", "j").agg(
        F.round(F.sum("pv"), 6).alias("v")
    )


def pca_power_top(
    spark: SparkSession,
    gram: DataFrame,
    dims: int = 64,
    iters: int = 8,
) -> DataFrame:
    """Top principal direction of the (already distributed-reduced)
    Gram matrix: power iteration on the driver from an all-ones start,
    ``iters`` fixed steps, loadings rounded to 5 with the sign chosen
    so the largest-|loading| dimension is positive. Returns (pos,
    loading) rows, pos 1-based."""
    import numpy as np

    g = np.zeros((dims, dims))
    for r in gram.collect():
        g[r["i"] - 1, r["j"] - 1] = r["v"]
        g[r["j"] - 1, r["i"] - 1] = r["v"]
    v = np.ones(dims)
    for _ in range(iters):
        v = g @ v
        v = v / np.sqrt((v * v).sum())
    lead = int(np.argmax(np.abs(np.round(v, 12))))
    if v[lead] < 0:
        v = -v
    rows = [(i + 1, float(x)) for i, x in enumerate(np.round(v, 5))]
    return local_frame(spark, rows, "pos int, loading double")


def pca_power_top2(
    spark: SparkSession,
    gram: DataFrame,
    dims: int = 64,
    iters: int = 8,
) -> DataFrame:
    """Top TWO principal directions via power iteration + Hotelling
    deflation on the distributed-reduced Gram matrix: v1 as in
    :func:`pca_power_top` (rounded to 5), then the Rayleigh quotient
    lam1 = v1'Gv1 / v1'v1 (rounded 6), the deflated matrix
    G2 = G - lam1*v1*v1' (entries rounded 6), and the same fixed
    power iteration on G2 for v2. Every rounding is an engine
    synchronization point: both Spark and the DuckDB oracle iterate
    on IDENTICAL deflated entries, so IEEE noise cannot diverge the
    chains. Driver cost is d x d (dimension-bounded — the corpus
    never leaves the distributed Gram reduction). Returns
    (component, pos, loading), pos 1-based."""
    import numpy as np

    g = np.zeros((dims, dims))
    for r in gram.collect():
        g[r["i"] - 1, r["j"] - 1] = r["v"]
        g[r["j"] - 1, r["i"] - 1] = r["v"]

    def _power(mat):
        v = np.ones(dims)
        for _ in range(iters):
            v = mat @ v
            v = v / np.sqrt((v * v).sum())
        lead = int(np.argmax(np.abs(np.round(v, 12))))
        if v[lead] < 0:
            v = -v
        return np.round(v, 5)

    v1 = _power(g)
    lam1 = round(float(v1 @ g @ v1) / float(v1 @ v1), 6)
    g2 = np.round(g - lam1 * np.outer(v1, v1), 6)
    v2 = _power(g2)
    rows = [
        (c, i + 1, float(x))
        for c, v in ((1, v1), (2, v2))
        for i, x in enumerate(v)
    ]
    return local_frame(
        spark, rows, "component int, pos int, loading double"
    )
