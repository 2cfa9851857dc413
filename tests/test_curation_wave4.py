"""Wave-12 curation/retrieval operators: per-key distributed prefix
sum (token-budget capping), hybrid RRF retrieval, overlapping chunking,
language-ID evaluation, and per-dimension embedding stats.

Correctness vs the DuckDB oracles is covered by
``tools/check_correctness.py``; these tests pin the mechanisms — the
partition-invariance of the keyed prefix sum and the plan shapes that
make each operator survive corpus scale.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _base_frame(spark):
    rows = [
        ("a", i, (i * 7) % 13 + 1) for i in range(40)
    ] + [("b", i, (i * 5) % 11 + 1) for i in range(25)] + [("c", 0, 4)]
    return spark.createDataFrame(rows, "k string, i long, v long")


def test_grouped_prefix_sum_matches_window_reference(spark):
    from task_on_dataframes_spark.operators.text import grouped_prefix_sum

    df = _base_frame(spark)
    order = [F.col("v").desc(), F.col("i").asc()]
    got = grouped_prefix_sum(df, "k", order, "v").orderBy("k", "i")
    w = (
        Window.partitionBy("k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn(
        "start_offset", F.sum("v").over(w) - F.col("v")
    ).orderBy("k", "i")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_grouped_prefix_sum_partition_invariant(spark):
    from task_on_dataframes_spark.operators.text import grouped_prefix_sum

    df = _base_frame(spark)
    order = [F.col("v").desc(), F.col("i").asc()]
    a = grouped_prefix_sum(df, "k", order, "v", partitions=2)
    b = grouped_prefix_sum(df, "k", order, "v", partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_grouped_prefix_sum_avoids_per_key_window(spark):
    # the whole point: no Window partitioned ONLY by the key (which
    # would funnel a hot key through one task); local windows are
    # keyed by (partition id, key)
    from task_on_dataframes_spark.operators.text import grouped_prefix_sum

    df = _base_frame(spark)
    plan = _physical(
        grouped_prefix_sum(df, "k", [F.col("i").asc()], "v")
    )
    assert "windowspecdefinition(k#" not in plan.lower().replace(" ", "")


def test_chunk_overlap_plan_has_no_shuffle_or_window(spark, sf_dir, queries):
    plan = _physical(queries["text_chunk_overlap"](spark, sf_dir))
    # chunk starts are arithmetic on the token count: no keyed shuffle,
    # no window, no sort — only the parallelism-floor round-robin
    # repartition of small single-row-group inputs may appear
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Window" not in plan


def test_chunk_overlap_covers_every_token_once_per_stride(spark, sf_dir, queries):
    rows = queries["text_chunk_overlap"](spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in list(by_doc.items())[:50]:
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.start_tok for c in chunks] == [
            i * 96 for i in range(len(chunks))
        ]
        assert all(1 <= c.len_toks <= 128 for c in chunks)
        # consecutive chunks overlap by exactly size - stride except
        # possibly the short last chunk
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == 96


def test_langid_confusion_shares_sum_to_one(spark, sf_dir, queries):
    rows = queries["text_langid_confusion"](spark, sf_dir).collect()
    per_gold: dict = {}
    for r in rows:
        per_gold[r.lang] = per_gold.get(r.lang, 0.0) + r.share
    assert per_gold and all(abs(s - 1.0) < 1e-4 for s in per_gold.values())


def test_hybrid_rrf_is_topk_fusion(spark, sf_dir, queries):
    rows = queries["ann_hybrid_rrf"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.r_lex is None or 1 <= r.r_lex <= 50
        assert r.r_sem is None or 1 <= r.r_sem <= 50
        assert r.rrf_score > 0.0
    # fused list is sorted by rrf desc
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_mix_token_budget_keeps_and_drops(spark, sf_dir, queries):
    rows = queries["mix_token_budget"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept < r.n_docs  # budget binds, but keeps some
        assert r.tokens_kept <= 600 + 1000  # greedy overshoot bounded


def test_emb_dim_stats_shape(spark, sf_dir, queries):
    rows = queries["emb_dim_stats"](spark, sf_dir).collect()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(len(dims)))
    for r in rows:
        assert r.var_pop >= 0.0
        assert r.min_val <= r.mean <= r.max_val


def test_interval_overlap_join_is_equi_bucketed(spark, sf_dir, queries):
    df = queries["j10_interval_overlap_join"](spark, sf_dir)
    plan = _physical(df)
    # the bucket explode turns the theta-join into an equi-join: no
    # nested-loop or cartesian fallback anywhere in the plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows and all(r.n_pairs > 0 for r in rows)


def test_sql_pipe_matches_classic_formulation(spark, sf_dir, queries):
    from pyspark.sql import functions as F

    pipe = queries["sql_pipe_syntax"](spark, sf_dir)
    classic = spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) "
        "AS sum_qty, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) "
        "AS DOUBLE) AS sum_price "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    )
    assert sorted(map(tuple, pipe.collect())) == sorted(
        map(tuple, classic.collect())
    )


def test_ks_drift_stat_is_a_probability_gap(spark, sf_dir, queries):
    row = queries["quality_ks_drift"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.n_a > 0 and r.n_b > 0
