"""sql (relational) engine vs arrow on a malformed-heavy corpus across
config space — denser error/edge coverage than the tiny engine matrix
(20% malformed conversations, 10% unknown tools, plus the turn cap)."""

from __future__ import annotations

import pytest

from transcriptpipe import pipeline, schemas, synth

CONFIGS = [
    dict(max_doc_bytes=8192, with_text=True, with_norm=True),
    dict(max_doc_bytes=600, with_text=True, with_norm=True),
    dict(max_doc_bytes=220, with_text=True, with_norm=False),
    dict(max_doc_bytes=None, with_text=False, with_norm=False),
    dict(max_doc_bytes=600, with_text=False, with_norm=True,
         max_turns_per_conv=6),
]


@pytest.fixture(scope="module")
def mal_df(spark):
    pdf = synth.gen_transcripts(n_convs=40, seed=9, malformed_frac=0.2,
                                unknown_tool_frac=0.1)
    return spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(c) for c in CONFIGS])
def test_sql_equals_arrow_on_malformed_corpus(spark, mal_df, cfg):
    sinks_s = pipeline.build(spark, mal_df,
                             pipeline.PipeConf(persist=False, engine="sql", **cfg))
    sinks_a = pipeline.build(spark, mal_df,
                             pipeline.PipeConf(persist=False, engine="arrow", **cfg))
    a = {r["conv_id"]: r for r in sinks_s["json_doc"].collect()}
    b = {r["conv_id"]: r for r in sinks_a["json_doc"].collect()}
    assert set(a) == set(b)
    for cid in a:
        for k in ("doc", "time", "serial", "doc_id", "n_turns", "error"):
            assert a[cid][k] == b[cid][k], (cid, k)
        assert bool(a[cid]["trimmed"]) == bool(b[cid]["trimmed"]), cid
    ax = {r["conv_id"]: r["doc"] for r in sinks_s["xml_doc"].collect()}
    bx = {r["conv_id"]: r["doc"] for r in sinks_a["xml_doc"].collect()}
    assert ax == bx
    es = sorted((r["conv_id"], r["turn_idx"], r["error_code"], r["text"])
                for r in sinks_s["error"].collect())
    ea = sorted((r["conv_id"], r["turn_idx"], r["error_code"], r["text"])
                for r in sinks_a["error"].collect())
    assert es == ea and es  # the corpus must actually produce errors
