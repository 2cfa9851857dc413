"""Product-quantization ANN behavior tests (exact values are the
DuckDB oracle's job — these assert the operator's structural and
quality contracts)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from task_on_dataframes_spark.operators.pq import pq_ann_topk, pq_train_encode


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_cover_corpus_once_per_subspace(spark, emb):
    codes, cents = pq_train_encode(emb, m=4, k=16, iters=2)
    n = emb.count()
    per_sub = codes.groupBy("sub").count().collect()
    assert {r["sub"] for r in per_sub} == {0, 1, 2, 3}
    assert all(r["count"] == n for r in per_sub)
    # codes stay in range and centroids exist for every used code
    used = codes.select("sub", "code").distinct()
    missing = used.join(cents, ["sub", "code"], "left_anti").count()
    assert missing == 0


def test_adc_recall_beats_chance_by_an_order_of_magnitude(spark, emb, sf_dir):
    import pandas as pd

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_ann_topk(emb, q, k_top=10, m=8, k=32, iters=2).toPandas()
    ref = emb.toPandas()
    V = np.vstack(ref.embedding.values).astype(np.float64)
    ids = ref.vec_id.values
    recalls = []
    for qid in range(10):
        qv = V[ids == qid][0]
        d = ((V - qv) ** 2).sum(1)
        top = set(ids[np.argsort(d, kind="stable")[:10]])
        recalls.append(len(set(got[got.query_id == qid].vec_id) & top) / 10)
    mean_recall = sum(recalls) / len(recalls)
    # chance recall is 10/n (~2% at sf0.001); measured ~0.34 on the
    # synthetic random unit vectors (the PQ-pessimal distribution)
    n = len(ids)
    assert mean_recall >= max(0.2, 5 * 10 / n), (recalls, n)


def test_adc_join_is_broadcast_no_cartesian(spark, emb):
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = pq_ann_topk(emb, q, k_top=5, m=4, k=16, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_no_self_hits_and_bounded(spark, emb):
    from task_on_dataframes_spark.operators.pq import ivfpq_ann_topk

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_ann_topk(
        emb, q, k_top=10, n_centroids=16, n_probe=4, m=4, k=16, iters=1
    ).toPandas()
    assert (got.query_id != got.vec_id).all()
    assert got.groupby("query_id").size().max() <= 10
    # ranks are dense 1..n per query
    for _, g in got.groupby("query_id"):
        assert sorted(g.rk) == list(range(1, len(g) + 1))


def test_ivfpq_candidates_come_from_probed_cells_only(spark, emb):
    # with n_probe == n_centroids the hybrid degrades to plain PQ over
    # the whole corpus (minus self) — a containment sanity check
    from task_on_dataframes_spark.operators.pq import (
        ivfpq_ann_topk,
        pq_ann_topk,
    )

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = ivfpq_ann_topk(
        emb, q, k_top=5, n_centroids=4, n_probe=4, m=4, k=16, iters=1
    ).toPandas()
    plain = pq_ann_topk(emb, q, k_top=6, m=4, k=16, iters=1).toPandas()
    for qid in range(5):
        a = list(full[full.query_id == qid].vec_id)
        # plain PQ includes the self-hit (dist 0) at rank 1; drop it
        b = [v for v in plain[plain.query_id == qid].vec_id if v != qid][:5]
        assert a == b, (qid, a, b)


def test_sq_rerank_recall_near_exact(spark, emb):
    from task_on_dataframes_spark.operators.similarity import (
        cosine_topk,
        sq_ann_rerank,
    )

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=10).toPandas()
    got = sq_ann_rerank(emb, queries, k=10, shortlist=50).toPandas()
    recalls = []
    for qid in range(10):
        top = set(exact[exact.query_id == qid].vec_id)
        recalls.append(len(set(got[got.query_id == qid].vec_id) & top) / 10)
    # int8 symmetric quantization barely perturbs a 64-dim cosine:
    # a 50-candidate shortlist recovers essentially the exact top-10
    assert sum(recalls) / len(recalls) >= 0.9
    # reranked scores ARE the exact cosines for the hits they share
    merged = got.merge(exact, on=["query_id", "vec_id"], suffixes=("", "_x"))
    assert (merged.cos == merged.cos_x).all()


def test_sq_rerank_stage1_is_group_limit_prune(spark, emb):
    from task_on_dataframes_spark.operators.similarity import sq_ann_rerank

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = sq_ann_rerank(emb, queries)._jdf.queryExecution().executedPlan().toString()
    # both stages prune via window group limit / top-k, never a global sort
    assert "WindowGroupLimit" in plan or "TakeOrdered" in plan
    assert "CartesianProduct" not in plan


def test_ivfsq_recall_and_exact_rerank_scores(spark, emb):
    from task_on_dataframes_spark.operators.similarity import (
        cosine_topk,
        ivfsq_ann_topk,
    )

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=10).toPandas()
    got = ivfsq_ann_topk(
        emb, queries, k=10, n_centroids=16, n_probe=12, shortlist=50
    ).toPandas()
    recalls = []
    for qid in range(10):
        top = set(exact[exact.query_id == qid].vec_id)
        recalls.append(len(set(got[got.query_id == qid].vec_id) & top) / 10)
    # uniform-random synthetic vectors are IVF-pessimal (recall tracks
    # list coverage); 12/16 probes measure ~0.89 here, ~0.90 at sf0.01
    assert sum(recalls) / len(recalls) >= 0.85, recalls
    # whatever the index returns, the rerank scores are EXACT cosines
    merged = got.merge(exact, on=["query_id", "vec_id"], suffixes=("", "_x"))
    assert (merged.cos == merged.cos_x).all()


def test_ivfsq_prunes_to_probed_lists_and_broadcasts(spark, emb):
    from task_on_dataframes_spark.operators.similarity import (
        ivf_ann_topk,
        ivfsq_ann_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = ivfsq_ann_topk(emb, queries, k=5, n_centroids=16, n_probe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # stage 1 joins members to broadcast probed pairs on cid — the
    # member table never shuffles for the candidate join and no stage
    # scans the full corpus per query
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan or "TakeOrdered" in plan
    # candidate containment: probing EVERY list must reproduce the
    # plain IVF result set reranked exactly (SQ only reorders stage 1,
    # and a full shortlist covers it)
    full_sq = ivfsq_ann_topk(
        emb, queries, k=5, n_centroids=4, n_probe=4, shortlist=10**6
    ).toPandas()
    full_ivf = ivf_ann_topk(
        emb, queries, k=5, n_centroids=4, n_probe=4
    ).toPandas()
    for qid in range(5):
        a = list(full_sq[full_sq.query_id == qid].vec_id)
        b = list(full_ivf[full_ivf.query_id == qid].vec_id)
        assert a == b, (qid, a, b)


def test_ivf_incremental_matches_full_when_batch_empty(spark, emb):
    from task_on_dataframes_spark.operators.similarity import (
        ivf_ann_incremental,
        ivf_ann_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    empty = emb.filter(F.lit(False))
    inc = ivf_ann_incremental(
        emb, empty, queries, k=5, n_centroids=8, n_probe=3
    ).toPandas()
    full = ivf_ann_topk(
        emb, queries, k=5, n_centroids=8, n_probe=3
    ).toPandas()
    assert not inc.is_new.any()
    a = inc[["query_id", "vec_id", "cos", "rank"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = full[["query_id", "vec_id", "cos", "rank"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ivf_incremental_surfaces_new_batch_hits(spark, emb):
    from task_on_dataframes_spark.operators.similarity import (
        ivf_ann_incremental,
    )

    base = emb.filter(F.col("vec_id") % 10 != 0)
    newb = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") >= 10))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_ann_incremental(
        base, newb, queries, k=10, n_centroids=16, n_probe=4
    ).toPandas()
    # fresh arrivals are searchable immediately: ~10% of the corpus is
    # new, so across 10 queries x 10 hits some must come from the batch
    assert got.is_new.any()
    # and every new hit really is a batch member
    assert (got[got.is_new].vec_id % 10 == 0).all()
    assert (got[got.is_new].vec_id >= 10).all()


def test_ivf_variants_recall_on_clustered_vectors(spark, sf_dir):
    """Uniform-random embeddings are IVF-pessimal (recall ~= probed
    list fraction); on a CLUSTERED table — the regime real embedding
    corpora live in — all three IVF variants must reach recall >= 0.9
    at n_probe 4 and the plain IVF >= 0.85 already at n_probe 2."""
    from pyspark.sql import functions as F

    from task_on_dataframes_spark.operators.pq import ivfpq_ann_topk
    from task_on_dataframes_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivfsq_ann_topk,
    )
    from task_on_dataframes_spark.registry.embeddings import (
        clustered_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clustered = clustered_embeddings(emb).localCheckpoint()
    qs = clustered.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        cosine_topk(clustered, qs, k=10)
        .select("query_id", "vec_id")
        .localCheckpoint()
    )
    n_q = qs.count()

    def recall(approx):
        hits = exact.join(
            approx.select("query_id", "vec_id"),
            on=["query_id", "vec_id"],
            how="left_semi",
        ).count()
        return hits / (10.0 * n_q)

    r_ivf2 = recall(ivf_ann_topk(clustered, qs, k=10, n_probe=2))
    r_ivf4 = recall(ivf_ann_topk(clustered, qs, k=10, n_probe=4))
    r_sq4 = recall(ivfsq_ann_topk(clustered, qs, k=10, n_probe=4))
    # IVFPQ emits an ADC ranking with NO exact rerank stage (the SQ
    # variant has one, hence its strict bar): within a tight cluster
    # the coarse codes can't order near-identical vectors, so the
    # operational metric is SHORTLIST recall — the exact top-10 must
    # sit inside the ADC top-50 a downstream reranker would rescore
    r_pq4 = recall(
        ivfpq_ann_topk(clustered, qs, k_top=50, n_probe=4, dims=64)
    )
    assert r_ivf2 >= 0.85, r_ivf2
    assert r_ivf4 >= 0.9, r_ivf4
    assert r_sq4 >= 0.9, r_sq4
    assert r_pq4 >= 0.9, r_pq4
