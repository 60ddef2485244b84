"""End-to-end equality: Spark pipeline vs single-process oracle.

This is the golden-output analog of aushape's README examples
(/root/reference/README.md:21-74) made executable: per-conversation document
equality, per-sink counts, routed-row equality, and the per-turn text
invariant from BASELINE.json input_hint.
"""

from __future__ import annotations

import json

import pytest

from transcriptpipe import oracle, pipeline


@pytest.fixture(scope="module")
def spark_sinks(spark, tiny_df):
    sinks = pipeline.build(spark, tiny_df, pipeline.PipeConf(max_doc_bytes=None))
    return {
        "json_doc": sinks["json_doc"].collect(),
        "xml_doc": sinks["xml_doc"].collect(),
        "error": sinks["error"].collect(),
        "raw": sinks["raw"].collect(),
    }


@pytest.fixture(scope="module")
def oracle_out(tiny_rows):
    return oracle.run_pipeline(tiny_rows)


def test_per_sink_counts(spark_sinks, oracle_out):
    for sink, n in oracle_out["counts"].items():
        assert len(spark_sinks[sink]) == n, sink


def test_doc_equality(spark_sinks, oracle_out):
    got = {r["conv_id"]: r for r in spark_sinks["json_doc"]}
    assert len(got) == len(oracle_out["json_doc"])
    for want in oracle_out["json_doc"]:
        g = got[want["conv_id"]]
        for k in ("doc_id", "serial", "time", "n_turns", "trimmed", "error"):
            assert g[k] == want[k], (want["conv_id"], k, g[k], want[k])
        # semantic equality of the rendered documents
        assert json.loads(g["doc"]) == json.loads(want["doc"]), want["conv_id"]


def test_doc_exact_string_equality(spark_sinks, oracle_out):
    """to_json and the oracle's json.dumps must agree byte-for-byte — this is
    the analog of aushape's golden-output corpus."""
    got = {r["conv_id"]: r["doc"] for r in spark_sinks["json_doc"]}
    for want in oracle_out["json_doc"]:
        assert got[want["conv_id"]] == want["doc"], want["conv_id"]


def test_routed_row_equality_error_sink(spark_sinks, oracle_out):
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["error_code"], r["text"])
        for r in spark_sinks["error"]
    )
    want = sorted(
        (e["conv_id"], e["turn_idx"], e["error_code"], e["text"])
        for e in oracle_out["error"]
    )
    assert got == want


def test_per_turn_text_invariant(spark_sinks, tiny_rows):
    """input_hint invariant: exploding doc text[] re-joined on
    (conv_id, turn_idx) must equal the input text exactly."""
    input_text = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tiny_rows}
    n_checked = 0
    for r in spark_sinks["json_doc"]:
        doc = json.loads(r["doc"])
        for i, t in enumerate(doc["text"]):
            assert input_text[(r["conv_id"], i)] == t, (r["conv_id"], i)
            n_checked += 1
    assert n_checked == len(tiny_rows)


def test_raw_sink_passthrough(spark_sinks, tiny_rows):
    assert len(spark_sinks["raw"]) == len(tiny_rows)
    got = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in spark_sinks["raw"])
    want = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in tiny_rows)
    assert got == want


def test_xml_well_formed(spark_sinks):
    import xml.etree.ElementTree as ET

    for r in spark_sinks["xml_doc"]:
        root = ET.fromstring(r["doc"])
        assert root.tag == "event"
        assert root.get("serial") == str(r["serial"])
