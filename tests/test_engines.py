"""The two assembly engines (Arrow mapInPandas vs all-JVM Catalyst
expressions) must produce identical sink contents."""

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


def test_all_engines_agree(spark, tiny_df):
    for max_bytes in (None, 600):
        a_jd, a_xml, a_err = _collect(
            spark, tiny_df, pipeline.PipeConf(engine="arrow", max_doc_bytes=max_bytes)
        )
        for other in ("arrow_agg", "expr"):
            e_jd, e_xml, e_err = _collect(
                spark, tiny_df, pipeline.PipeConf(engine=other, max_doc_bytes=max_bytes)
            )
            assert set(a_jd) == set(e_jd)
            for cid in a_jd:
                for k in ("doc_id", "serial", "time", "n_turns", "trimmed", "error"):
                    assert a_jd[cid][k] == e_jd[cid][k], (cid, k, max_bytes, other)
                assert json.loads(a_jd[cid]["doc"]) == json.loads(e_jd[cid]["doc"]), cid
                assert a_jd[cid]["doc"] == e_jd[cid]["doc"], (cid, max_bytes, other)
                assert a_xml[cid] == e_xml[cid], (cid, max_bytes, other)
            assert a_err == e_err, other
