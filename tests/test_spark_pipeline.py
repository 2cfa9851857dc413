"""End-to-end Spark tests: planner-driven pipeline, operators, entry()."""

import pytest
from pyspark.sql import functions as F


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.columns == ["top90_token"]
    assert df.count() > 0


def test_planner_pipeline_matches_direct_operators(spark, sf_dir):
    """The planner-composed pipeline and the hand-composed operator
    pipeline must be the same query."""
    import __spark_entry__ as entrymod

    a = entrymod._planner_top90(spark, sf_dir)
    b = entrymod._w2_top90_tokens(spark, sf_dir)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty()


def test_tokenize_explode_carries_columns(spark, sf_dir):
    from task_on_dataframes_spark.operators.text import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize(docs.select("doc_id", "text"), "text", "token", carry=["doc_id"])
    assert toks.columns == ["doc_id", "token"]
    n_docs = docs.count()
    assert toks.select("doc_id").distinct().count() == n_docs


def test_value_counts_desc_order(spark, sf_dir):
    from task_on_dataframes_spark.operators.text import value_counts

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vc = value_counts(li, "l_returnflag", out="cnt")
    rows = vc.collect()
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == li.count()


def test_top_mass_filter_keeps_at_most_fraction(spark, sf_dir):
    from task_on_dataframes_spark.operators.text import (
        clean_tokens,
        tokenize,
        top_mass_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    toks = clean_tokens(
        tokenize(docs, "text", "token", carry=["doc_id"]), "token", "token",
        carry=["doc_id"],
    )
    total = toks.count()
    kept = top_mass_filter(toks, "token", 0.9).count()
    assert 0 < kept < total
    assert kept <= 0.9 * total  # cumsum cut is strictly below the fraction


def test_get_from_keeps_nonmatches_null_beside_originals(spark):
    """Reference get_from semantics (basic_tasks.py:43-51): matching
    lines land in the new column, non-matches stay NULL, every original
    row survives — reached through the planner."""
    import re

    import task_on_dataframes_spark as tada
    from pyspark.sql import functions as F

    reg = tada.TaskRegistry()
    text = "From: alice\nhello\nFrom: bob\nbye"

    @tada.new_task(registry=reg)
    @tada.makes(["docs.text"], appends=False)
    @tada.close_task()
    def src(expects):
        return spark.createDataFrame([(text,)], ["docs.text"])

    from task_on_dataframes_spark.basic_tasks import register_document_tasks

    register_document_tasks(spark, "/root/testdata/sf0.001", registry=reg)
    # get_lines' (.+)\.text captures the prefix 'docs', so the
    # lineage columns are docs.lines / docs.lines.from
    out = tada.solve_goal(
        [], ["docs.lines", "docs.lines.from"], registry=reg
    )
    rows = out.select("`docs.lines`", "`docs.lines.from`").collect()
    got = {r[0]: r[1] for r in rows}
    assert got == {
        "From: alice": "From: alice",
        "hello": None,
        "From: bob": "From: bob",
        "bye": None,
    }


def test_reindex_null_fill_on_spark(spark, sf_dir):
    import warnings

    from task_on_dataframes_spark.runtime import reindex_frame

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.warns(UserWarning):
        out = reindex_frame(li, ["l_orderkey", "ghost"])
    assert out.columns == ["l_orderkey", "ghost"]
    assert out.filter(F.col("ghost").isNotNull()).isEmpty()


def test_plans_are_lazy_until_collected(spark, sf_dir):
    """Executor must not trigger any Spark job — frames stay logical."""
    from task_on_dataframes_spark.basic_tasks import register_document_tasks
    from task_on_dataframes_spark.plans.solve import Executor

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    registry = register_document_tasks(spark, sf_dir)
    frames = Executor([], [["docs.text.clean_tokens.top90"]], registry=registry)
    after = set(tracker.getJobIdsForGroup(None))
    # the only permissible job is the parquet footer/schema read of the
    # source scan — planning/binding must not execute the pipeline
    new_jobs = after - before
    assert len(new_jobs) <= 1, f"binding ran {len(new_jobs)} Spark jobs"
    assert any("docs.text.clean_tokens.top90" in f.columns for f in frames)
