"""Planner-composed LLM data pipeline (SURVEY §7.2 step 5)."""

from pyspark.sql import functions as F

from task_on_dataframes_spark.llm_tasks import register_llm_tasks
from task_on_dataframes_spark.plans.solve import Executor, find_path


def test_planner_composes_quality_filter_chunk_pipeline(spark, sf_dir):
    reg = register_llm_tasks(spark, sf_dir, min_quality=0.2, chunk_tokens=64)
    path = find_path([], [["docs.text.kept.chunks"]], registry=reg)
    plan = [a.Task for a, _ in path if a]
    assert plan == ["get_docs", "score_quality", "filter_quality", "chunk_docs"]

    frames = Executor([], [["docs.text.kept.chunks"]], registry=reg)
    goal = next(
        f for f in reversed(frames) if "docs.text.kept.chunks" in f.columns
    )
    n_chunks = goal.count()
    assert n_chunks > 0
    # every chunk comes from a doc with >= 20 tokens (quality cut)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_kept = docs.filter(
        F.size(F.split(F.lower("text"), r"\s+")) >= 20
    ).count()
    assert n_chunks >= n_kept  # one-or-more chunks per kept doc


def test_planner_reaches_dedup_and_langid_goals(spark, sf_dir):
    reg = register_llm_tasks(spark, sf_dir)
    for goal in (["docs.text.rep_id"], ["docs.text", "docs.text.lang"]):
        frames = Executor([], [goal], registry=reg)
        assert any(all(c in f.columns for c in goal) for f in frames)
