"""Round-4 wave-5 behavior tests: GD linear probe, count-min sketch,
repeated-substring spans (exact values are the DuckDB oracles' job —
these assert the contracts hold standalone at smoke scale)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_probe_descends_and_is_partitioning_invariant(spark, sf_dir):
    from task_on_dataframes_spark.operators.probe import (
        linear_probe_weights,
        probe_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {
        r["feature"]: r["weight_micro"]
        for r in linear_probe_weights(docs, "text", iters=4).collect()
    }
    assert set(w) == {"bias", "len_tok", "len_char", "digit_frac"}
    # the target (stopword fraction) is positive, so GD from zero must
    # move the bias weight up — an all-zero result would mean the loop
    # never descended
    assert w["bias"] > 0
    # exact decimal gradient sums make training independent of the
    # partition layout — THE scale property: same weights from 1
    # partition and from 16
    w1 = {
        r["feature"]: r["weight_micro"]
        for r in linear_probe_weights(
            docs.repartition(16), "text", iters=4
        ).collect()
    }
    assert w == w1
    # loss actually decreases across the fixed iterations
    feat = probe_features(docs, "text").cache()
    try:

        def sse(weights):
            pred = (
                weights["bias"] * F.col("x0")
                + weights["len_tok"] * F.col("x1")
                + weights["len_char"] * F.col("x2")
                + weights["digit_frac"] * F.col("x3")
            )
            return feat.agg(
                F.sum(
                    ((pred - F.col("y")) / 1e9) ** 2
                ).alias("s")
            ).collect()[0]["s"]

        zero = {k: 0 for k in w}
        assert sse(w) < sse(zero)
    finally:
        feat.unpersist()


def test_cms_never_undercounts(spark, sf_dir, queries):
    df = queries["sketch_cms"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["est"] >= r["cnt"] for r in rows), (
        "count-min must never under-estimate"
    )
    assert all(r["overcount"] == r["est"] - r["cnt"] for r in rows)


def test_cms_counter_table_is_fixed_size(spark, sf_dir):
    from task_on_dataframes_spark.operators.sketches import cms_counters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    counters = cms_counters(toks, "tok", depth=3, width=64)
    n = counters.count()
    assert n <= 3 * 64
    # total mass is conserved: every token occurrence lands in exactly
    # one bucket per hash row
    total = counters.agg(F.sum("c").alias("s")).collect()[0]["s"]
    assert total == 3 * toks.count()


def test_repeated_gram_spans_finds_planted_duplicate(spark):
    from task_on_dataframes_spark.operators.dedup import repeated_gram_spans

    boiler = "subscribe to our newsletter for updates every day ok"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + boiler + " delta epsilon"),
            (2, "one two three four five six " + boiler),
            (3, "totally unique text with no repeats at all here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in repeated_gram_spans(
            docs, "doc_id", "text", k=5
        ).collect()
    }
    # the planted 9-token boilerplate shows up in docs 1 and 2 as ONE
    # merged island of 9 duplicated tokens each; doc 3 is clean
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 9
    assert out[1]["n_tokens"] == 14
    assert 0 < out[1]["dup_frac"] < 1


def test_grouped_probe_equals_per_group_training(spark, sf_dir):
    # the grouped single-pass trainer must produce EXACTLY the weights
    # of training each group's subset independently — group isolation
    # is the whole contract of per-domain calibration
    from task_on_dataframes_spark.operators.probe import (
        grouped_probe_weights,
        linear_probe_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grouped = {
        (r["lang"], r["feature"]): r["weight_micro"]
        for r in grouped_probe_weights(docs, "lang", "text", iters=3).collect()
    }
    langs = sorted({k[0] for k in grouped})
    assert len(langs) >= 2, "need multiple groups for the test to bite"
    solo_lang = langs[0]
    solo = {
        (solo_lang, r["feature"]): r["weight_micro"]
        for r in linear_probe_weights(
            docs.filter(F.col("lang") == solo_lang), "text", iters=3
        ).collect()
    }
    for key, wm in solo.items():
        assert grouped[key] == wm
