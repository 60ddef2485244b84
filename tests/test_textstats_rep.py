"""datalib.textstats repetition/heavy-hitter ops and the new sample.py
stratified/mix operators — semantics, degenerate inputs, determinism, and
the scale-critical plan shapes (WindowGroupLimit, narrow filters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcriptpipe.datalib import sample, textstats


def _rep(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        textstats.repetition_features(F.col("text")).alias("r")
    ).collect()[0]["r"]


def test_repetition_counts_known_doc(spark):
    # "a b a b a" -> 2-grams: [a b, b a, a b, b a] total 4 distinct 2 top 2
    #             -> 3-grams: [a b a, b a b, a b a] total 3 distinct 2 top 2
    r = _rep(spark, "a b a b a")
    assert (r["n2_total"], r["n2_distinct"], r["top2_occ"]) == (4, 2, 2)
    assert (r["n3_total"], r["n3_distinct"], r["top3_occ"]) == (3, 2, 2)


def test_repetition_all_unique(spark):
    r = _rep(spark, "one two three four")
    assert r["n2_total"] == 3 and r["n2_distinct"] == 3 and r["top2_occ"] == 1


@pytest.mark.parametrize("text,total", [("", 0), ("solo", 0), ("a b", 1)])
def test_repetition_short_docs_no_descending_sequence(spark, text, total):
    """Docs shorter than n must yield EMPTY gram arrays — Spark's
    sequence(1, 0) is descending [1, 0], the bug word_ngrams guards."""
    r = _rep(spark, text)
    assert r["n2_total"] == total
    assert r["n3_total"] == 0 and r["top3_occ"] == 0


def test_top_ngrams_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("b c b c",), ("a z b c",), ("x y x y",)], "text string"
    )
    # counts: "b c": 3 ("b c b", no — grams per doc1: [b c, c b, b c] -> b c x2)
    out = textstats.top_ngrams(df, n=2, k=3).collect()
    assert [r["ngram"] for r in out][0] == "b c"
    assert out[0]["n"] == 3  # doc1 x2 + doc2 x1
    # ties at n=2: "x y" (doc3 x2)... then ties at 1 sorted lexicographically
    assert out[1]["ngram"] == "x y" and out[1]["n"] == 2


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, "big" if i % 10 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out1 = sample.stratified_sample(df, "lang", 25, key_col="doc_id")
    got1 = sorted((r["lang"], r["doc_id"]) for r in out1.collect())
    from collections import Counter

    c = Counter(lang for lang, _ in got1)
    assert c["big"] == 25 and c["small"] == 25
    # deterministic under repartitioning (cluster-size independence)
    out2 = sample.stratified_sample(df.repartition(13), "lang", 25)
    assert sorted((r["lang"], r["doc_id"]) for r in out2.collect()) == got1


def test_stratified_sample_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    assert sample.stratified_sample(df, "lang", 10).count() == 2


def test_stratified_plan_uses_window_group_limit(spark):
    """The scale claim: rank<=k is pushed below the stratum exchange as a
    partial WindowGroupLimit, so map tasks ship only local top-k."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("lang")
    )
    plan = (
        sample.stratified_sample(df, "lang", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_mix_sources_fraction_and_drop(spark):
    rows = [(i, "keep_all" if i % 2 else "half") for i in range(20000)]
    rows += [(100000 + i, "dropme") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample.mix_sources(
        df, {"keep_all": 1.0, "half": 0.5}, key_col="doc_id"
    )
    from collections import Counter

    c = Counter(r["source"] for r in out.collect())
    assert c["keep_all"] == 10000  # fraction 1.0 keeps everything
    assert 0.45 * 10000 < c["half"] < 0.55 * 10000
    assert "dropme" not in c  # absent from the recipe -> dropped


def test_mix_sources_empty_recipe_and_determinism(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    assert sample.mix_sources(df, {}).count() == 0
    a = {r["doc_id"] for r in sample.mix_sources(df, {"s": 0.3}).collect()}
    b = {r["doc_id"] for r in
         sample.mix_sources(df.repartition(7), {"s": 0.3}).collect()}
    assert a == b


def test_mix_sources_is_narrow(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    plan = (
        sample.mix_sources(df, {"s": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
