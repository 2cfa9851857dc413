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
