"""datalib.search — BM25 lexical retrieval."""

from __future__ import annotations

import math

import pytest

from transcriptpipe.datalib import search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "fast table scan over the big table"),
        (2, "slow seek"),
        (3, "table"),
        (4, "scan scan scan scan scan"),
        (5, None),
        (6, "unrelated words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_bm25(docs, terms, k1=search.K1, b=search.B):
    """Independent plain-Python BM25 over tokenized docs."""
    toks = {i: t.lower().strip().split() for i, t in docs.items() if t is not None}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if round(s, 4) > 0:
            out[i] = round(s, 4)
    return out


def test_bm25_matches_reference_formula(corpus):
    got = {r["doc_id"]: r["bm25"]
           for r in search.bm25_topk(corpus, ["table", "scan"], k=10).collect()}
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    want = _ref_bm25(rows, ["table", "scan"])
    assert got == want
    # null-text and no-match docs are excluded
    assert 5 not in got and 6 not in got and 2 not in got


def test_bm25_topk_order_and_ties(corpus, spark):
    # two identical docs -> identical score -> tie broken by doc_id asc
    rows = [(10, "alpha beta"), (11, "alpha beta"), (12, "gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = search.bm25_topk(df, ["alpha"], k=2).collect()
    assert [r["doc_id"] for r in out] == [10, 11]
    assert out[0]["bm25"] == out[1]["bm25"]


def test_bm25_precomputed_stats_equivalent(corpus):
    terms = ["table", "scan"]
    stats = search.corpus_stats(corpus, terms)
    a = search.bm25_topk(corpus, terms, k=10).collect()
    b = search.bm25_topk(corpus, terms, k=10, precomputed_stats=stats).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bm25_empty_terms_raises(corpus):
    with pytest.raises(ValueError):
        search.bm25_topk(corpus, [])


def test_bm25_case_insensitive_terms(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = search.bm25_topk(df, ["HELLO"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]
