"""Viewer (S8/O2/S6 parity) and bucketed-table co-located joins."""

import os

from pyspark.sql import functions as F

from task_on_dataframes_spark import view
from task_on_dataframes_spark.sources.writers import bucketed_table_sink


def test_page_window_and_negative_pages(spark):
    df = spark.range(0, 205).select(F.col("id"))
    p0 = [r["id"] for r in view.page(df.orderBy("id"), 0, 50).collect()]
    assert p0 == list(range(50))
    p2 = [r["id"] for r in view.page(df.orderBy("id"), 2, 50).collect()]
    assert p2 == list(range(100, 150))
    last = [r["id"] for r in view.page(df.orderBy("id"), -1, 50).collect()]
    assert last == list(range(200, 205))


def test_page_plan_is_a_limit_not_a_full_collect(spark):
    df = spark.range(0, 1000).orderBy("id")
    plan = view.page(df, 3, 50)._jdf.queryExecution().executedPlan().toString()
    # Spark compiles offset+limit to a bounded take, never a full scan
    assert "GlobalLimit" in plan or "TakeOrderedAndProject" in plan


def test_html_escapes_and_truncates(spark):
    df = spark.createDataFrame([("<b>x</b>", "y" * 200)], ["a", "b"])
    out = view.to_html(df, max_col_width=10)
    assert "&lt;b&gt;x&lt;/b&gt;" in out
    assert "y" * 9 + "…" in out
    assert "y" * 11 not in out


def test_csv_roundtrip_and_download_name(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name_long"])
    csv = view.to_csv(df)
    assert csv.splitlines()[0] == "id,name_long"
    assert view.download_name(df) == "name_long.csv"


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key -> SortMergeJoin with ZERO
    Exchange operators: the co-located layout replaces the shuffle."""
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    wh = str(tmp_path / "wh")
    os.makedirs(wh, exist_ok=True)
    bucketed_table_sink(a, "ta_bkt", ["k"], 8, path=f"{wh}/ta")
    bucketed_table_sink(b, "tb_bkt", ["k"], 8, path=f"{wh}/tb")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (broadcast would hide bucketing on
        # tables this small) — the bucketed layout must eliminate every
        # shuffle Exchange from the SortMergeJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("ta_bkt"), spark.table("tb_bkt")
        joined = ta.join(tb, on="k").filter(F.col("va") + F.col("vb") > 0)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 9999  # k=0 fails va+vb>0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS ta_bkt")
        spark.sql("DROP TABLE IF EXISTS tb_bkt")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from task_on_dataframes_spark.sources.writers import compact_parquet

    src = str(tmp_path / "many")
    spark.range(0, 100000).repartition(40).write.parquet(src)
    import glob

    before = len(glob.glob(f"{src}/*.parquet"))
    assert before >= 40
    n = compact_parquet(spark, src, target_file_mb=256, sort_cols=["id"])
    after = glob.glob(f"{src}/*.parquet")
    assert len(after) == n == 1
    back = spark.read.parquet(src)
    assert back.count() == 100000
    # range-sorted rewrite: a range predicate's filter is pushed and the
    # data is clustered for rowgroup min/max pruning
    assert back.filter("id < 10").count() == 10
