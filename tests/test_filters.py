"""datalib.filters — composite corpus filter; textstats.normalize_text."""

from __future__ import annotations

import re

import pytest

from transcriptpipe.datalib import filters, textstats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # keep: distinct words -> dup2 0; en stopwords; no punct; n=22
        (1, "the quick brown fox jumps over that lazy dog and it is "
            "good because words vary nicely across this line of text"),
        (2, "tiny"),                                 # too_short
        (3, "word " * 80),                           # too_long (80 > 70)
        (4, "der hund und die katze und das ist nicht ein zu " * 2),  # bad_lang (de)
        (5, "a b " * 30),                            # repetitive 2-grams
        (6, None),                                   # empty
        (7, "   "),                                  # empty
        # low_quality: punct-heavy 15-char tokens (punct_ok=0, mean word
        # length 15 -> word_ok=0.5, 10 tokens -> length_ok=0.5) but all
        # 2-grams distinct so the repetition rule never sees it
        (8, " ".join(f"!!!???,,,;;;::{i}" for i in range(10))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ann(corpus):
    return {
        r["doc_id"]: r
        for r in filters.annotate_filters(
            corpus, min_tokens=5, max_tokens=70,
            allowed_langs=["en", "und"], min_quality=0.5,
            max_dup2_frac=0.6,
        ).collect()
    }


def test_reason_order_and_decisions(corpus):
    a = _ann(corpus)
    assert a[6]["drop_reason"] == "empty" and not a[6]["keep"]
    assert a[7]["drop_reason"] == "empty"
    assert a[2]["drop_reason"] == "too_short"
    assert a[3]["drop_reason"] == "too_long"
    assert a[4]["drop_reason"] == "bad_lang" and a[4]["lang_pred"] == "de"
    assert a[5]["drop_reason"] == "too_repetitive" and a[5]["dup2_frac"] > 0.6
    assert a[8]["drop_reason"] == "low_quality"
    assert a[1]["drop_reason"] is None and a[1]["keep"]


def test_first_failing_rule_wins(spark):
    # 2 tokens AND wrong lang AND repetitive -> too_short (earliest rule)
    df = spark.createDataFrame([(1, "der der")], "doc_id long, text string")
    r = filters.annotate_filters(
        df, min_tokens=5, allowed_langs=["en"], max_dup2_frac=0.1
    ).first()
    assert r["drop_reason"] == "too_short"


def test_filter_corpus_keeps_original_columns(corpus):
    kept = filters.filter_corpus(
        corpus, min_tokens=5, max_tokens=70,
        allowed_langs=["en", "und"], min_quality=0.5, max_dup2_frac=0.6)
    assert kept.columns == ["doc_id", "text"]
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_filter_report_census(corpus):
    rep = {
        r["outcome"]: r["n_docs"]
        for r in filters.filter_report(
            corpus, min_tokens=5, max_tokens=70,
            allowed_langs=["en", "und"], min_quality=0.5,
            max_dup2_frac=0.6).collect()
    }
    assert rep["empty"] == 2 and rep["kept"] == 1
    assert sum(rep.values()) == 8


# ---- normalize_text ------------------------------------------------------

def _py_normalize(s: str) -> str:
    s = re.sub(r"[\x00-\x08\x0b-\x1f\x7f]", "", s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n\n\n+", "\n\n", s)
    return re.sub(r"^[ \n]+|[ \n]+$", "", s)


@pytest.mark.parametrize("raw", [
    "plain text",
    "  leading and trailing   ",
    "tabs\t\tand  runs",
    "crlf\r\nline",
    "ctrl\x01\x02chars\x7f",
    "a \n b\n\n\n\n\nc",
    "\n\n  \n start",
    "",
])
def test_normalize_matches_python_reference(spark, raw):
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(
        textstats.normalize_text(df["text"]).alias("n")).first()["n"]
    assert got == _py_normalize(raw)


def test_normalize_null_stays_null(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(
        textstats.normalize_text(df["text"]).alias("n")).first()["n"] is None


def test_normalize_idempotent(spark):
    raw = "  a\tb \r\n\n\n c\x02  "
    once = _py_normalize(raw)
    assert _py_normalize(once) == once
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(
        textstats.normalize_text(
            textstats.normalize_text(df["text"])).alias("n")).first()["n"]
    assert got == once
