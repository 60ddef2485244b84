"""Streaming deduplication — exact dedup on INGEST, before documents ever
land in the lake, so duplicate bytes are never stored or reprocessed.

Spark-first: this is the engine's own streaming-state machinery
(``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` over a content
hash), not a custom stateful UDF — the seen-set lives in the JVM state
store (RocksDB-backed on a real cluster), shuffled by the hash key exactly
like a batch groupBy, checkpointed and resumable with the query. No Python
workers anywhere.

Semantics: FIRST ARRIVAL WINS (the standard streaming-dedup contract).
Batch-mode :func:`transcriptpipe.datalib.dedup.exact_dedup` keeps the
min-id row instead; the two agree whenever arrival order follows ids
(backfills replaying history in order), and on the SET of distinct texts
always. Null texts hash to null and collapse to one surviving row, same
as the batch groupBy.

Scale: unbounded exact dedup means unbounded state — at 10^12 turns that
is the real design decision, not a Spark limitation. Use ``ttl_column`` +
``within`` (→ dropDuplicatesWithinWatermark) to bound state to a time
window, the same trade every ingest dedup makes; cross-window history
dedup belongs to the batch LSH/cluster cascade in ``dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = "_dedup_key"


def stream_exact_dedup(df: DataFrame, text_col: str = "text",
                       ttl_column: str | None = None,
                       within: str | None = None) -> DataFrame:
    """Drop rows whose ``text_col`` content was already seen by the query.

    Works on a streaming OR batch DataFrame (batch dropDuplicates keeps an
    arbitrary row per key — use dedup.exact_dedup when the min-id winner
    matters). With ``ttl_column`` (an event-time timestamp column) and
    ``within`` (e.g. ``"24 hours"``), state is bounded by a watermark and
    duplicates are only suppressed inside the window."""
    keyed = df.withColumn(_KEY, F.md5(F.col(text_col)))
    if ttl_column is not None:
        if within is None:
            raise ValueError("ttl_column requires within (watermark delay)")
        out = keyed.withWatermark(ttl_column, within) \
                   .dropDuplicatesWithinWatermark([_KEY])
    else:
        if within is not None:
            raise ValueError("within requires ttl_column")
        out = keyed.dropDuplicates([_KEY])
    return out.drop(_KEY)


def run_dedup_stream_once(spark, input_path: str, out_path: str,
                          checkpoint: str, schema,
                          text_col: str = "text",
                          max_files_per_trigger: int | None = None) -> None:
    """Drain-mode (Trigger.AvailableNow) file-stream dedup into a parquet
    sink — resumable from ``checkpoint`` like every structured-streaming
    query; re-running after new files arrive dedups against the SAME
    state store, so duplicates of docs from earlier runs stay dropped."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)
    q = (
        stream_exact_dedup(src, text_col=text_col)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
