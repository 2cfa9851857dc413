"""Product quantization (PQ) for approximate nearest neighbor search.

The fourth rung of the ANN ladder (brute force -> LSH -> IVF -> PQ):
compress each embedding into ``m`` one-byte-ish codes by vector-
quantizing each of ``m`` subspaces independently, then answer queries
with an asymmetric-distance (ADC) scan over the code table — at 100 TB
the corpus the query touches shrinks from ``n x dims`` doubles to
``n x m`` small ints plus a broadcast ``m x k`` lookup table per query.

Everything is engine-deterministic so the DuckDB oracle can replay it
bit for bit (same discipline as :mod:`.clustering`):

* **init** — hash-stratified pick per subspace (portable md5
  :func:`.hashing.hash32` of ``"pq{sub}:" + vec_id``), min-hash row
  per stratum seeds the codeword.
* **distance** — squared L2 composed from sequential-fold dot products
  (``dot(a,a) - 2 dot(a,b) + dot(b,b)``) exactly like
  :func:`.dedup.cosine` composes its quotient, rounded to 6; ties to
  the smallest code id.
* **update** — per-dimension DECIMAL(28,12)-exact means rounded to 6:
  partition-count- and summation-order-independent.
* fixed iteration count, no convergence test.

Scale shape: codewords (``m x k`` rows) broadcast; encode collapses
the per-subspace fan-out with a map-side ``min(struct(d2, code))``
before one vec-keyed shuffle; ADC joins the broadcast query LUT to the
long-form code table and aggregates on (query, vec) — the corpus
embedding table itself is read once for training/encoding and never
again at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dot
from .hashing import hash32


def _d2(a: str, b: str):
    """Squared L2 distance via the oracle-proven dot composition."""
    return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)


def pq_train_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train ``m`` independent sub-quantizers and encode the corpus.

    Returns ``(codes, centroids)``: codes = (vec_id, sub, code);
    centroids = (sub, code, cv array<double> of dims/m).
    """
    d_sub = dims // m
    # ALL m sub-quantizers train in ONE fused plan keyed by (sub, code):
    # the per-subspace-loop formulation launches m x iters separate
    # broadcast-build job chains (measured 4.6 s at sf0.1, almost all
    # scheduling); fusing them is pure re-keying — the per-(sub, vec)
    # hashes, distances, and DECIMAL means are bit-identical, so the
    # per-subspace oracle replay still matches.
    c_sub = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("fv"),
        )
        .select(
            "vec_id",
            F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("sub"),
            "fv",
        )
        .select(
            "vec_id",
            "sub",
            F.expr(f"slice(fv, sub * {d_sub} + 1, {d_sub})").alias("v"),
        )
        # per-(vec, sub) squared norm computed ONCE instead of once per
        # candidate codeword in the x k scoring fan-out; reusing the
        # identical fold result keeps the oracle bit-exact
        .withColumn("v2", dot("v", "v"))
    )
    h = hash32(
        F.concat(
            F.lit("pq"),
            F.col("sub").cast("string"),
            F.lit(":"),
            F.col("vec_id").cast("string"),
        )
    )
    cents = (
        c_sub.withColumn("h", h)
        .withColumn("code", F.col("h") % k)
        .groupBy("sub", "code")
        .agg(F.min(F.struct("h", "vec_id", "v")).alias("mn"))
        .select("sub", "code", F.col("mn.v").alias("cv"))
        .withColumn("cv2", dot("cv", "cv"))
        .persist()
    )
    mean_aggs = [
        F.expr(
            f"round(CAST(sum(CAST(element_at(v, {i + 1}) AS "
            f"DECIMAL(28,12))) AS DOUBLE) / count(1), 6)"
        ).alias(f"s{i}")
        for i in range(d_sub)
    ]
    assign = None
    for it in range(iters):
        scored = c_sub.join(F.broadcast(cents), on="sub").select(
            "vec_id",
            "sub",
            "v",
            "v2",
            "code",
            # same expression tree as _d2 with the two self-dots reused
            F.round(
                F.col("v2") - 2.0 * dot("v", "cv") + F.col("cv2"), 6
            ).alias("d2"),
        )
        assign = (
            scored.groupBy("vec_id", "sub")
            .agg(
                F.min(F.struct("d2", "code")).alias("mn"),
                F.first("v").alias("v"),
                F.first("v2").alias("v2"),
            )
            .select(
                "vec_id", "sub", "v", "v2", F.col("mn.code").alias("code")
            )
        )
        if it < iters - 1:
            cents = (
                assign.groupBy("sub", "code")
                .agg(*mean_aggs)
                .select(
                    "sub",
                    "code",
                    F.array(
                        *[F.col(f"s{i}") for i in range(d_sub)]
                    ).alias("cv"),
                )
                .withColumn("cv2", dot("cv", "cv"))
                .persist()
            )
    codes = assign.select("vec_id", "sub", "code")
    return codes, cents.select("sub", "code", "cv")


def pq_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k_top: int = 10,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, vec_id, adc_dist, rk).

    The query-side LUT (one squared L2 per (query, sub, codeword) —
    ``q x m x k`` rows) broadcasts into the long-form code table; the
    ADC distance is the sum of the m looked-up entries. Ranking is a
    per-query window (bounded partitions = query count).
    """
    from pyspark.sql import Window

    d_sub = dims // m
    codes, cents = pq_train_encode(
        emb, m=m, k=k, iters=iters, dims=dims, id_col=id_col, vec_col=vec_col
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_sub = q.select(
        "query_id",
        F.explode(
            F.array(*[F.lit(j) for j in range(m)])
        ).alias("sub"),
        "qv",
    ).select(
        "query_id",
        "sub",
        F.expr(f"slice(qv, sub * {d_sub} + 1, {d_sub})").alias("v"),
    )
    lut = q_sub.join(F.broadcast(cents), on="sub").select(
        "query_id",
        "sub",
        "code",
        F.round(_d2("v", "cv"), 6).alias("d2"),
    )
    adc = (
        codes.join(F.broadcast(lut), on=["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            # DECIMAL-exact sum of the m rounded-to-6 entries: double
            # addition order differs between engines and flips the
            # round-5 boundary on ~2% of rows
            F.round(F.sum(F.col("d2").cast("decimal(18,6)")), 5)
            .cast("double")
            .alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_top)
        .select("query_id", "vec_id", "adc_dist", "rk")
    )


def ivfpq_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k_top: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k: int = 32,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF + PQ hybrid (the production ANN shape): a coarse inverted
    index restricts each query to ``n_probe`` cells, then ADC over PQ
    codes ranks only those candidates — query cost is
    ``(n / n_centroids) x n_probe`` code lookups, never a corpus scan.

    Coarse assignment mirrors :func:`..similarity.ivf_ann_topk`
    (hash-stratified centroid pick, broadcast + map-side argmax by
    cosine); codes are non-residual PQ (documented divergence from
    residual IVFPQ — keeps the two quantizers independently
    oracle-replayable). Self-hits are excluded like the IVF operator.
    """
    from pyspark.sql import Window

    from .similarity import _ivf_centroids, _ivf_member, _ivf_probes

    c = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vc"),
    )
    cents = _ivf_centroids(c, n_centroids)
    member = _ivf_member(c, cents).select("vec_id", "cid")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
    )
    probes = _ivf_probes(q, cents, n_probe).select("query_id", "cid")
    codes, pq_cents = pq_train_encode(
        emb, m=m, k=k, iters=iters, dims=dims, id_col=id_col, vec_col=vec_col
    )
    d_sub = dims // m
    q_sub = q.select(
        "query_id",
        F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("sub"),
        "qv" if "qv" in q.columns else "vq",
    ).select(
        "query_id",
        "sub",
        F.expr(f"slice(vq, sub * {d_sub} + 1, {d_sub})").alias("v"),
    )
    lut = q_sub.join(F.broadcast(pq_cents), on="sub").select(
        "query_id",
        "sub",
        "code",
        F.round(_d2("v", "cv"), 6).alias("d2"),
    )
    cand = member.join(F.broadcast(probes), on="cid").filter(
        F.col("query_id") != F.col("vec_id")
    ).select("query_id", "vec_id")
    adc = (
        cand.join(codes, on="vec_id")
        .join(F.broadcast(lut), on=["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            F.round(F.sum(F.col("d2").cast("decimal(18,6)")), 5)
            .cast("double")
            .alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_top)
        .select("query_id", "vec_id", "adc_dist", "rk")
    )
