"""Streaming-mode tests: EOE-driven stateful coalescing must agree with the
batch pipeline on completed conversations, across micro-batch boundaries."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from transcriptpipe import streaming, synth


@pytest.fixture()
def split_input(tmp_path):
    """20 conversations split across 3 files so several conversations span
    micro-batches (maxFilesPerTrigger=1 -> 3 micro-batches)."""
    pdf = synth.gen_transcripts(n_convs=20, seed=42)
    d = tmp_path / "in"
    d.mkdir()
    n = len(pdf)
    cuts = [0, int(n * 0.4), int(n * 0.7), n]
    for i in range(3):
        chunk = pdf.iloc[cuts[i]:cuts[i + 1]]
        chunk.to_parquet(d / f"part-{i}.parquet", index=False)
    return str(d), pdf


def test_stream_matches_batch_oracle(spark, split_input, tmp_path):
    in_dir, pdf = split_input
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    streaming.run_stream_once(spark, in_dir, out, ckpt)

    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    from transcriptpipe import oracle

    want = oracle.run_pipeline(pdf.to_dict("records"))
    want_docs = {d["conv_id"]: d for d in want["json_doc"]}

    # every conversation ends with EOE in the fixture -> all complete
    assert set(got) == set(want_docs)
    for cid, w in want_docs.items():
        g = got[cid]
        assert g["complete"], cid
        assert g["n_turns"] == w["n_turns"], cid
        assert g["error"] == w["error"], cid
        assert json.loads(g["doc"]) == json.loads(w["doc"]), cid


def test_stream_incremental_restart(spark, tmp_path):
    """New files after a drained run are picked up on the next run from the
    same checkpoint (streaming resume)."""
    d = tmp_path / "in2"
    d.mkdir()
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    pdf = synth.gen_transcripts(n_convs=6, seed=7)
    convs = sorted(pdf["conv_id"].unique())
    first, second = convs[:3], convs[3:]
    pdf[pdf["conv_id"].isin(first)].to_parquet(d / "a.parquet", index=False)
    streaming.run_stream_once(spark, str(d), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == len(first)

    pdf[pdf["conv_id"].isin(second)].to_parquet(d / "b.parquet", index=False)
    streaming.run_stream_once(spark, str(d), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == len(convs)
    assert sorted(r["conv_id"] for r in got.collect()) == convs


def _write(pdf, path):
    pdf.to_parquet(path, index=False)


def test_watermark_drops_late_rows(spark, tmp_path):
    """ST3: with a watermark, late rows (behind the watermark) are dropped
    deterministically instead of re-opening state for an emitted conv."""
    import time as _time
    from datetime import datetime, timedelta

    d = tmp_path / "in_wm"
    d.mkdir()
    out = str(tmp_path / "out_wm")
    ckpt = str(tmp_path / "ckpt_wm")
    t0 = datetime(2026, 3, 1)

    def rows(conv, specs, base):
        return pd.DataFrame([
            {"conv_id": conv, "turn_idx": i, "role": role, "text": text,
             "tool": None, "ts": base + timedelta(seconds=i)}
            for i, (role, text) in enumerate(specs)
        ]).astype({"turn_idx": "int32", "tool": "string", "ts": "datetime64[us]"})

    # batch 1: conv W completes; clock conv advances event time by 2 hours
    b1 = pd.concat([
        rows("conv-00000010", [("system", "msg=a"), ("user", "msg=b"), ("EOE", "")], t0),
        rows("conv-00000099", [("system", "msg=clock")], t0 + timedelta(hours=2)),
    ])
    _write(b1, d / "0.parquet")
    _time.sleep(1.1)  # distinct mtime: file source processes oldest first
    # batch 2: LATE duplicate of conv W (hours behind the watermark), with
    # EOE — without the watermark this would emit a second doc for W
    b2 = rows("conv-00000010", [("system", "msg=late"), ("EOE", "")], t0)
    _write(b2, d / "1.parquet")

    q = (
        streaming.stream_coalesce(spark, str(d), ckpt, watermark="10 minutes",
                                  event_time_gap_ms=60_000)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    docs_w = [r for r in got if r["conv_id"] == "conv-00000010"]
    assert len(docs_w) == 1  # the late re-open was dropped
    assert docs_w[0]["complete"]
    assert docs_w[0]["n_turns"] == 3


def test_state_cap_marks_trimmed(spark, tmp_path):
    """Per-key state is bounded: rows past max_turns_per_conv are dropped
    and the emitted doc is marked trimmed (EOE past the cap still completes
    the conversation)."""
    from datetime import datetime, timedelta

    d = tmp_path / "in_cap"
    d.mkdir()
    out = str(tmp_path / "out_cap")
    ckpt = str(tmp_path / "ckpt_cap")
    t0 = datetime(2026, 3, 2)
    rows = pd.DataFrame([
        {"conv_id": "conv-00000042", "turn_idx": i, "role": ("system" if i == 0 else "user"),
         "text": f"msg=m{i}", "tool": None, "ts": t0 + timedelta(seconds=i)}
        for i in range(30)
    ] + [{"conv_id": "conv-00000042", "turn_idx": 30, "role": "EOE", "text": "",
          "tool": None, "ts": t0 + timedelta(seconds=30)}]).astype(
        {"turn_idx": "int32", "tool": "string", "ts": "datetime64[us]"})
    _write(rows, d / "0.parquet")

    q = (
        streaming.stream_coalesce(spark, str(d), ckpt, max_turns_per_conv=10)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["trimmed"] and got[0]["complete"]
    assert got[0]["n_turns"] == 10


def test_processing_time_flush_incomplete(spark, tmp_path):
    """Continuous mode: a conversation that never sees EOE flushes as
    incomplete after the idle timeout (auparse flush analog)."""
    import time
    from datetime import datetime, timedelta

    d = tmp_path / "in_pt"
    d.mkdir()
    out = str(tmp_path / "out_pt")
    ckpt = str(tmp_path / "ckpt_pt")
    t0 = datetime(2026, 3, 3)
    rows = pd.DataFrame([
        {"conv_id": "conv-00000055", "turn_idx": i,
         "role": "system" if i == 0 else "user", "text": f"msg=m{i}",
         "tool": None, "ts": t0 + timedelta(seconds=i)}
        for i in range(4)  # no EOE
    ]).astype({"turn_idx": "int32", "tool": "string", "ts": "datetime64[us]"})
    rows.to_parquet(d / "0.parquet", index=False)

    q = (
        streaming.stream_coalesce(spark, str(d), ckpt, timeout_ms=1000)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        got = []
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                got = spark.read.parquet(out).collect()
            except Exception:
                got = []
            if got:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(got) == 1
    assert not got[0]["complete"]  # timeout flush, not EOE
    assert got[0]["n_turns"] == 4


def test_stream_matches_batch_at_nondefault_conf(spark, split_input, tmp_path):
    """ST parity with PipeConf (VERDICT r2 #5): with_norm + no-text +
    max_doc_bytes trim must behave identically to the batch kernel in
    stream mode, not only at the default config."""
    in_dir, pdf = split_input
    out = str(tmp_path / "out_conf")
    ckpt = str(tmp_path / "ckpt_conf")
    streaming.run_stream_once(spark, in_dir, out, ckpt,
                              with_text=False, with_norm=True,
                              max_doc_bytes=600)
    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}

    from transcriptpipe import fastkernel, oracle

    n_checked = 0
    for conv_id, grp in pdf.groupby("conv_id"):
        rows = sorted(
            (int(r.turn_idx), oracle.ROLE_MAP.get(r.role, r.role), r.text,
             None if pd.isna(r.tool) else r.tool,
             oracle.TOOL_MAP.get(r.tool) if not pd.isna(r.tool) else None)
            for r in grp.itertuples(index=False)
        )
        want = fastkernel.render_conv(conv_id, rows, grp["ts"].min(), False,
                                      600, 100, with_text=False,
                                      with_norm=True, want_xml=False)
        if want is None:
            assert conv_id not in got
            continue
        n_checked += 1
        g = got[conv_id]
        assert g["doc"] == want["doc"], conv_id
        assert g["trimmed"] == want["trimmed"], conv_id
        assert g["error"] == want["error"], conv_id
    assert n_checked >= 18
    docs = [json.loads(g["doc"]) for g in got.values()]
    assert any("norm" in d for d in docs)
    assert all("text" not in d or d.get("error") for d in docs)


def test_stream_xml_matches_batch_xml(spark, split_input, tmp_path):
    """Round 4: --lang xml streams through the same fused kernel — the
    streamed xml docs are byte-equal to the Python oracle's xml rendering
    (and hence to every batch engine's xml_doc sink)."""
    from transcriptpipe import oracle, render

    in_dir, pdf = split_input
    out = str(tmp_path / "out_xml")
    ckpt = str(tmp_path / "ckpt_xml")
    streaming.run_stream_once(spark, in_dir, out, ckpt, lang="xml")

    got = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    want = oracle.run_pipeline(pdf.to_dict("records"))
    want_docs = {d["conv_id"]: d for d in want["json_doc"]}
    assert set(got) == set(want_docs)
    for cid, w in want_docs.items():
        g = got[cid]
        assert g["complete"], cid
        assert g["doc"] == render.xml_from_doc(json.loads(w["doc"])), cid
    # sink schema is the per-language one: the doc column IS the xml
    assert "xml" not in spark.read.parquet(out).columns
