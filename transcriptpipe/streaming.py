"""Streaming mode — Structured Streaming ingestion with EOE-driven event
completion.

The reference is a true streaming program: auparse buffers records until the
event is complete (EOE marker or timeout) and then fires the event-ready
callback (/root/reference/lib/conv.c:72-173, SURVEY.md §2.9). The Spark
equivalent is a stateful streaming operator keyed by conv_id:

* readStream (file source here; Kafka/Iceberg-CDC on a cluster)
* ``applyInPandasWithState`` keyed by conv_id: turns accumulate in state
  until the EOE marker arrives (AUPARSE_CB_EVENT_READY analog) or — in
  continuous mode — the state times out (auparse's flush analog); then the
  conversation is assembled with the SAME single-conversation semantics as
  the batch oracle (oracle.coalesce_conv) and emitted downstream.

Timeout modes: continuous deployments use ProcessingTimeTimeout so idle
conversations flush; drain-style runs (Trigger.AvailableNow, used by tests
and backfills) use NoTimeout — with a processing-time timeout the
AvailableNow query would keep scheduling timer batches and never terminate.
Un-EOE'd conversations simply stay in the checkpointed state store and
resume on the next run.

Scale notes: state per key is one conversation's turns, bounded by
max_turns_per_conv; the state store shuffles on conv_id exactly like the
batch coalesce. Late rows for an already-emitted conversation start a new
state entry (documented divergence: batch mode would have coalesced them —
with a watermark on ts this becomes the standard late-data drop).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import oracle, schemas

STREAM_DOC = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("serial", T.LongType(), True),
    T.StructField("time", T.StringType(), True),
    T.StructField("n_turns", T.IntegerType(), False),
    T.StructField("doc", T.StringType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("complete", T.BooleanType(), False),  # EOE seen vs timeout flush
])

# state: accumulated raw turns, kept as parallel lists (Arrow-friendly)
STREAM_STATE = T.StructType([
    T.StructField("turn_idx", T.ArrayType(T.IntegerType()), True),
    T.StructField("role", T.ArrayType(T.StringType()), True),
    T.StructField("text", T.ArrayType(T.StringType()), True),
    T.StructField("tool", T.ArrayType(T.StringType()), True),
    T.StructField("ts_us", T.ArrayType(T.LongType()), True),
])


def _assemble(conv_id: str, rows: list[dict]) -> dict:
    """One conversation -> doc row, via the shared single-process semantics."""
    import json
    from datetime import datetime, timezone

    for r in rows:
        r["ts"] = datetime.fromtimestamp(
            r.pop("ts_us") / 1e6, tz=timezone.utc
        ).replace(tzinfo=None)
    turns = [oracle.parse_turn(r) for r in sorted(rows, key=lambda r: r["turn_idx"])]
    conv = oracle.coalesce_conv(turns)
    doc = oracle.doc_object(conv)
    return {
        "conv_id": conv_id,
        "serial": conv["serial"],
        "time": doc["time"],
        "n_turns": conv["n_turns"],
        "doc": json.dumps(doc, ensure_ascii=False, separators=(",", ":")),
        "error": conv["error"],
    }


def _make_coalesce_fn(timeout_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key

        if state.hasTimedOut:
            (ti, ro, te, to, ts) = state.get
            state.remove()
            rows = [
                {"conv_id": conv_id, "turn_idx": a, "role": b, "text": c,
                 "tool": d, "ts_us": e}
                for a, b, c, d, e in zip(ti, ro, te, to, ts)
            ]
            if rows:
                out = _assemble(conv_id, rows)
                out["complete"] = False
                yield pd.DataFrame([out])
            return

        ti, ro, te, to, ts = (
            ([], [], [], [], []) if not state.exists else [list(x) for x in state.get]
        )
        saw_eoe = False
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                ti.append(int(r["turn_idx"]))
                ro.append(r["role"])
                te.append(r["text"])
                to.append(r["tool"] if pd.notna(r["tool"]) else None)
                ts.append(int(pd.Timestamp(r["ts"]).value // 1000))
                if r["role"] in schemas.DROP_ROLES:
                    saw_eoe = True

        if saw_eoe:
            # event complete (the AUPARSE_CB_EVENT_READY moment): emit + clear
            if state.exists:
                state.remove()
            rows = [
                {"conv_id": conv_id, "turn_idx": a, "role": b, "text": c,
                 "tool": d, "ts_us": e}
                for a, b, c, d, e in zip(ti, ro, te, to, ts)
            ]
            out = _assemble(conv_id, rows)
            out["complete"] = True
            yield pd.DataFrame([out])
        else:
            state.update((ti, ro, te, to, ts))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)  # flush-on-idle analog

    return fn


def stream_coalesce(spark: SparkSession, input_path: str,
                    checkpoint: str, timeout_ms: int | None = None) -> DataFrame:
    """readStream(files) -> stateful EOE-driven coalesce. Returns the
    streaming DataFrame; caller attaches writeStream (see run_stream_once).

    timeout_ms=None (drain mode / AvailableNow): incomplete conversations
    wait in the state store for the next run. timeout_ms=N (continuous):
    idle conversations flush as incomplete after N ms.
    """
    raw = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    return raw.groupBy("conv_id").applyInPandasWithState(
        _make_coalesce_fn(timeout_ms),
        outputStructType=STREAM_DOC,
        stateStructType=STREAM_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_stream_once(spark: SparkSession, input_path: str, out_path: str,
                    checkpoint: str) -> None:
    """Drain all currently-available input (Trigger.AvailableNow) into a
    parquet sink — the batch-ish smoke path used by tests."""
    q = (
        stream_coalesce(spark, input_path, checkpoint)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
