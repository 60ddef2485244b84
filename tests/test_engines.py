"""The assembly engines (fused Arrow kernel, grouped Arrow, all-JVM
relational "sql", all-JVM expression "expr") must produce identical sink
contents byte-for-byte."""

from __future__ import annotations

import json

from transcriptpipe import pipeline


def _collect(spark, df, conf):
    sinks = pipeline.build(spark, df, conf)
    jd = {r["conv_id"]: r for r in sinks["json_doc"].collect()}
    xml = {r["conv_id"]: r["doc"] for r in sinks["xml_doc"].collect()}
    err = sorted(
        (r["conv_id"], r["turn_idx"], r["error_code"], r["text"])
        for r in sinks["error"].collect()
    )
    return jd, xml, err


CONFIGS = [
    # (max_doc_bytes, with_text, with_norm)
    (None, True, False),
    (600, True, False),
    (None, False, False),   # P5 suppression (text must survive on errors)
    (None, True, True),     # norm section
    (600, False, True),     # trim cascade through the norm level
    (220, True, True),      # per-line partial trim with norm present
    (60, True, False),      # envelope-only degenerate budget
]


def test_all_engines_agree(spark, tiny_df):
    for max_bytes, with_text, with_norm in CONFIGS:
        mk = lambda eng: pipeline.PipeConf(  # noqa: E731
            engine=eng, max_doc_bytes=max_bytes,
            with_text=with_text, with_norm=with_norm,
        )
        a_jd, a_xml, a_err = _collect(spark, tiny_df, mk("arrow"))
        for other in ("arrow_agg", "sql", "expr"):
            e_jd, e_xml, e_err = _collect(spark, tiny_df, mk(other))
            key = (max_bytes, with_text, with_norm, other)
            assert set(a_jd) == set(e_jd), key
            for cid in a_jd:
                for k in ("doc_id", "serial", "time", "n_turns", "trimmed", "error"):
                    assert a_jd[cid][k] == e_jd[cid][k], (cid, k, key)
                assert json.loads(a_jd[cid]["doc"]) == json.loads(e_jd[cid]["doc"]), (cid, key)
                assert a_jd[cid]["doc"] == e_jd[cid]["doc"], (cid, key)
                assert a_xml[cid] == e_xml[cid], (cid, key)
            assert a_err == e_err, key
