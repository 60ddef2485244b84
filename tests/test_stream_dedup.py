"""datalib.streamdedup — exact dedup on ingest via the engine's streaming
state store: cross-micro-batch suppression, checkpoint resume, and
agreement with the batch dedup on the distinct-text set."""

from __future__ import annotations

import pandas as pd
import pytest

from transcriptpipe.datalib import dedup, streamdedup

SCHEMA = "doc_id long, text string"


def _write(d, name, rows):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        d / name, index=False
    )


@pytest.fixture()
def dup_input(tmp_path):
    """Three files -> three micro-batches (maxFilesPerTrigger=1); dups both
    inside one file and across files."""
    d = tmp_path / "in"
    d.mkdir()
    _write(d, "part-0.parquet", [(0, "alpha"), (1, "beta"), (2, "alpha")])
    _write(d, "part-1.parquet", [(3, "beta"), (4, "gamma")])
    _write(d, "part-2.parquet", [(5, "alpha"), (6, "delta"), (7, "gamma")])
    return d


def test_stream_dedup_across_microbatches(spark, dup_input, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    streamdedup.run_dedup_stream_once(
        spark, str(dup_input), out, ckpt, SCHEMA, max_files_per_trigger=1
    )
    got = {r["text"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    # one survivor per distinct text, and FIRST ARRIVAL won (file order):
    assert got == {"alpha": 0, "beta": 1, "gamma": 4, "delta": 6}


def test_stream_dedup_resumes_from_checkpoint(spark, dup_input, tmp_path):
    """New files in a later run dedup against the checkpointed seen-set:
    duplicates of docs from run 1 stay dropped in run 2."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    streamdedup.run_dedup_stream_once(
        spark, str(dup_input), out, ckpt, SCHEMA
    )
    n_run1 = spark.read.parquet(out).count()
    assert n_run1 == 4
    _write(dup_input, "part-3.parquet",
           [(8, "alpha"), (9, "epsilon"), (10, "delta")])
    streamdedup.run_dedup_stream_once(
        spark, str(dup_input), out, ckpt, SCHEMA
    )
    got = {r["text"]: r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {"alpha", "beta", "gamma", "delta", "epsilon"}
    assert got["epsilon"] == 9
    # the alpha survivor is from RUN 1 (run 2's id-8 dup was suppressed by
    # the checkpointed state); within run 1's single batch the winner among
    # ids {0, 2, 5} is arbitrary
    assert got["alpha"] in {0, 2, 5}


def test_stream_distinct_set_matches_batch_dedup(spark, dup_input, tmp_path):
    out, ckpt = str(tmp_path / "out_b"), str(tmp_path / "ckpt_b")
    streamdedup.run_dedup_stream_once(
        spark, str(dup_input), out, ckpt, SCHEMA, max_files_per_trigger=1
    )
    stream_texts = {r["text"] for r in spark.read.parquet(out).collect()}
    batch = dedup.exact_dedup(spark.read.parquet(f"{dup_input}/*.parquet"))
    batch_texts = {r["text"] for r in batch.collect()}
    assert stream_texts == batch_texts


def test_null_texts_collapse_to_one(spark, tmp_path):
    d = tmp_path / "in_n"
    d.mkdir()
    _write(d, "part-0.parquet", [(0, None), (1, None), (2, "x")])
    out, ckpt = str(tmp_path / "out_n"), str(tmp_path / "ckpt_n")
    streamdedup.run_dedup_stream_once(spark, str(d), out, ckpt, SCHEMA)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # one null survivor + "x", same as batch groupBy


def test_batch_mode_and_arg_validation(spark):
    df = spark.createDataFrame([(0, "a"), (1, "a"), (2, "b")], SCHEMA)
    assert streamdedup.stream_exact_dedup(df).count() == 2
    with pytest.raises(ValueError):
        streamdedup.stream_exact_dedup(df, ttl_column="ts")
    with pytest.raises(ValueError):
        streamdedup.stream_exact_dedup(df, within="1 hour")


def test_ttl_window_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: dups inside the window are
    suppressed; the query runs with bounded state (the 100-TB knob)."""
    d = tmp_path / "in_t"
    d.mkdir()
    rows = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha", "alpha", "beta"],
        "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:30",
                              "2026-01-01 00:01:00"]).astype("datetime64[us]"),
    })
    rows.to_parquet(d / "part-0.parquet", index=False)
    out, ckpt = str(tmp_path / "out_t"), str(tmp_path / "ckpt_t")
    src = spark.readStream.schema(
        "doc_id long, text string, ts timestamp").parquet(str(d))
    q = (
        streamdedup.stream_exact_dedup(src, ttl_column="ts", within="10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [0, 2]
