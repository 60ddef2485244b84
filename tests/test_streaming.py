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
