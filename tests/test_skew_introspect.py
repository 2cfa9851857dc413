"""Skew operators + plan introspection helper."""

from pyspark.sql import functions as F

from task_on_dataframes_spark.introspect import plan_facts
from task_on_dataframes_spark.operators.skew import (
    distinct_count_2phase,
    salted_join,
)


def _skewed(spark):
    # key 0 holds 10k rows, keys 1..50 hold 10 each
    hot = spark.range(0, 10000).select(
        F.lit(0).alias("k"), (F.col("id") % 100).alias("v")
    )
    rest = spark.range(0, 500).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(rest)


def test_distinct_count_2phase_matches_exact(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in distinct_count_2phase(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want
    # phase-1 shuffle is keyed on (k, v) — the hot key spreads
    plan = plan_facts(distinct_count_2phase(df, ["k"], "v"))["plan"]
    assert "hashpartitioning(k" in plan and ", v#" in plan


def test_salted_agg_matches_plain_agg(spark):
    from task_on_dataframes_spark.operators.skew import salted_agg

    df = _skewed(spark)
    got = {
        (r["k"]): (r["s"], r["n"])
        for r in salted_agg(
            df,
            ["k"],
            exprs_partial=[
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            ],
            exprs_final=[
                F.sum("s").alias("s"), F.sum("n").alias("n")
            ],
            n_salt=8,
        ).collect()
    }
    want = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_planner_terminates_fast_on_unsatisfiable_goal(spark, sf_dir):
    import time

    from task_on_dataframes_spark.basic_tasks import register_document_tasks
    from task_on_dataframes_spark.plans.solve import find_path

    reg = register_document_tasks(spark, sf_dir)
    t0 = time.perf_counter()
    path = find_path([], [["no.such.column.exists"]], registry=reg)
    dt = time.perf_counter() - t0
    assert path == []
    # generic-task caps + visited-state memo keep the search bounded
    assert dt < 10, f"unsatisfiable-goal search took {dt:.1f}s"


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 51)], "k long, name string"
    )
    salted = salted_join(big, small, on=["k"], n_salt=8)
    plain = big.join(small, on="k")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) and approx percentile: the sketch
    path for cardinalities/quantiles too big for exact computation.
    Engine-specific sketches can't be oracle-hashed; assert bounded
    relative error against the exact answers instead."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50a"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["p50a"] - row["p50"]) / row["p50"] < 0.02


def test_plan_facts_reports_scan_and_joins(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    df = (
        li.filter(F.col("l_quantity") > 10)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_name")
    )
    facts = plan_facts(df)
    assert any("l_quantity" in f for f in facts["pushed_filters"])
    assert facts["broadcast_joins"] == 1
    assert facts["sort_merge_joins"] == 0
    assert ["l_orderkey", "l_partkey", "l_quantity"] == sorted(
        facts["scan_columns"][0]
    )


def test_salted_join_rejects_outer_hows(spark):
    """Replicating the small side n_salt times would emit unmatched
    small-side rows n_salt times under right/full outer — refuse."""
    import pytest

    df = _skewed(spark)
    small = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    for how in ("right", "full", "right_outer", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(df, small, on=["k"], how=how)


def test_salted_join_left_keeps_unmatched_big_rows_once(spark):
    df = _skewed(spark)  # keys 0..50
    small = spark.range(0, 3).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    )
    out = salted_join(df, small, on=["k"], n_salt=4, how="left")
    # row count must equal the unsalted left join's (no dup inflation)
    want = df.join(small, on="k", how="left").count()
    assert out.count() == want


def test_salts_are_deterministic_row_content_hashes(spark):
    """Recomputing the salt expression must give identical values —
    guards against partition-id/monotonic-id salts that change on task
    retry and double-count in phase 2."""
    from pyspark.sql import functions as F2

    df = _skewed(spark)
    salt = F2.pmod(F2.xxhash64(F2.struct(*df.columns)), F2.lit(16))
    a = df.withColumn("s", salt).groupBy("s").count().collect()
    b = df.withColumn("s", salt).groupBy("s").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_brute_force_guards_refuse_oversized_inputs(spark):
    import pytest

    from task_on_dataframes_spark.operators.dedup import embedding_cosine_pairs
    from task_on_dataframes_spark.operators.similarity import cosine_topk_blas
    from task_on_dataframes_spark.operators.text import running_sum

    emb = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        embedding_cosine_pairs(emb, max_rows=10).count()
    with pytest.raises(ValueError, match="collects the query set"):
        cosine_topk_blas(emb, emb.select(F.col("vec_id").alias("query_id"), "embedding"), max_queries=10).count()
    counts = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("c"))
    with pytest.raises(ValueError, match="unpartitioned window"):
        running_sum(counts, "c", "cum", [F.col("k")], max_rows=10).count()
    # partitioned variant is exempt from the guard (scales per key)
    out = running_sum(
        counts.withColumn("g", F.col("k") % 4),
        "c", "cum", [F.col("k")], partition_by=["g"], max_rows=10,
    )
    assert out.count() == 100


def test_connected_components_star_rounds_much_less_than_diameter(spark):
    """A 300-node path graph has diameter 300: plain min-label
    propagation needs 300 rounds. Large-star/small-star contraction
    must finish in ~log2(300)+1 rounds — the stats dict proves the
    round count, not just the answer."""
    from task_on_dataframes_spark.operators.dedup import connected_components

    edges = spark.range(0, 300).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    stats: dict = {}
    labels = connected_components(
        edges, max_iter=14, local_edge_cap=0, stats=stats
    )
    rows = labels.collect()
    assert len(rows) == 301
    assert all(r["rep"] == 0 for r in rows)
    assert stats["rounds"] <= 12, stats


def test_connected_components_star_matches_hashmin(spark):
    """Star contraction and hashmin min-propagation must produce the
    identical (member, rep) labeling on a random multi-component graph
    with self-loops and duplicate edges."""
    import random

    from task_on_dataframes_spark.operators.dedup import (
        connected_components,
        connected_components_hashmin,
    )

    random.seed(42)
    pairs = [
        (random.randrange(400), random.randrange(400)) for _ in range(300)
    ] + [(777, 777)]
    edges = spark.createDataFrame(pairs, "a long, b long")
    star = {
        r["member"]: r["rep"]
        for r in connected_components(edges, local_edge_cap=0).collect()
    }
    local = {
        r["member"]: r["rep"] for r in connected_components(edges).collect()
    }
    hashmin = {
        r["member"]: r["rep"]
        for r in connected_components_hashmin(edges).collect()
    }
    assert star == hashmin
    assert local == hashmin  # driver union-find fast path agrees too
    assert star[777] == 777  # self-loop-only node labels itself


def test_connected_components_raises_when_unconverged(spark):
    import pytest

    from task_on_dataframes_spark.operators.dedup import connected_components

    edges = spark.range(0, 40).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, local_edge_cap=0)
    from task_on_dataframes_spark.operators.dedup import (
        connected_components_hashmin,
    )

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_hashmin(edges, max_iter=2)


def test_connected_components_string_ids_and_adversarial_shapes(spark):
    """Star contraction on STRING node ids (lexicographic min — Python
    `<`, Spark least(), and the union-find fast path must agree) and on
    adversarial topologies: lollipop (clique + tail), two disjoint
    chains, duplicate + reversed edges."""
    from task_on_dataframes_spark.operators.dedup import (
        connected_components,
        connected_components_hashmin,
    )

    # lollipop: clique {a,b,c,d} + tail d-e-f-g; separate chain x-y-z
    pairs = (
        [(p, q) for p in "abcd" for q in "abcd" if p < q]
        + [("d", "e"), ("e", "f"), ("f", "g")]
        + [("x", "y"), ("y", "z"), ("y", "x"), ("x", "y")]  # dups+reverse
    )
    edges = spark.createDataFrame(pairs, "a string, b string")
    local = {
        r["member"]: r["rep"] for r in connected_components(edges).collect()
    }
    star = {
        r["member"]: r["rep"]
        for r in connected_components(edges, local_edge_cap=0).collect()
    }
    hashmin = {
        r["member"]: r["rep"]
        for r in connected_components_hashmin(edges).collect()
    }
    want = {c: "a" for c in "abcdefg"} | {c: "x" for c in "xyz"}
    assert local == want
    assert star == want
    assert hashmin == want
