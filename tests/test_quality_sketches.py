"""Round-4 quality/sketch query behavior tests (plan shapes are in
test_plan_shapes.py; exact values are the DuckDB oracles' job — these
assert the *contracts* hold standalone at smoke scale)."""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_sketch_bounds_all_hold(spark, sf_dir, queries):
    # every sketch query's verdict column must be uniformly true — the
    # advertised accuracy contract, not an engine-specific estimate
    for name, col in [
        ("sketch_hll_bound", "within_bound"),
        ("sketch_quantile_bound", "rank_ok"),
        ("sketch_heavy_hitters", "found"),
    ]:
        df = queries[name](spark, sf_dir)
        n_bad = df.filter(~F.col(col)).count()
        assert n_bad == 0, f"{name}: {n_bad} rows violate {col}"
        assert df.count() > 0, f"{name}: empty result proves nothing"


def test_dq_rules_clean_on_synthetic_data(spark, sf_dir, queries):
    rows = {r["rule"]: r["violations"] for r in queries["dq_rules"](spark, sf_dir).collect()}
    # all 8 rules evaluated; the synthetic tables are referentially clean
    assert len(rows) == 8
    assert rows["lineitem_orphan_orderkey"] == 0
    assert rows["orders_duplicate_pk"] == 0


def test_dq_rules_detects_seeded_violations(spark):
    # seed a dirty frame through the same rule expressions to show the
    # audit actually fires (a clean-data-only test can't tell a rule
    # from a constant)
    li = spark.createDataFrame(
        [(1, -5.0), (2, 3.0), (3, None)],
        "l_orderkey long, l_quantity double",
    )
    bad = li.agg(
        F.sum(
            (F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)).cast("long")
        ).alias("v")
    ).collect()[0]["v"]
    assert bad == 2


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, queries):
    import glob
    import tempfile

    out = tempfile.mkdtemp(prefix="tada_cmp_test_") + "/li"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    li.repartition(16).write.mode("overwrite").parquet(out)
    before = len(glob.glob(f"{out}/*.parquet"))
    from task_on_dataframes_spark.sources.writers import compact_parquet

    compact_parquet(spark, out, target_file_mb=64)
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after < before
    assert spark.read.parquet(out).count() == li.count()


def test_entropy_of_uniform_tokens_is_log2_n(spark):
    # 8 distinct tokens once each -> entropy exactly 3 bits, ttr 1.0
    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh")], "doc_id long, text string"
    )
    import task_on_dataframes_spark.registry.quality as q

    # drive the same expression chain the registry query uses
    toks = (
        df.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("raw"))
        .select("doc_id", F.regexp_replace("raw", r"^\W+|\W+$", "").alias("tok"))
        .filter(F.length("tok") >= 2)
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    row = (
        counts.groupBy("doc_id")
        .agg(
            F.round(
                F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 4
            ).alias("h")
        )
        .collect()[0]
    )
    assert row["h"] == 3.0
