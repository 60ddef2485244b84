"""End-to-end pipeline: parse → enrich → coalesce → render → route.

Stage boundaries = shuffle boundaries (SURVEY.md §3.3):

1. scan → parse → enrich      narrow (regexp + broadcast hash joins; stays in
                              one whole-stage-codegen span)
2. coalesce                   ONE shuffle of the fact table on conv_id
3. args branch                explode of tool_call kv entries (small fraction)
                              → two partial-aggregated shuffles on conv_id →
                              joined back (AQE-planned, typically broadcast at
                              small scale, shuffle-hash at large — both sides
                              are conv_id-partitioned)
4. render/route               narrow (to_json / XML pandas UDF / filters)
5. metrics                    map-side-combinable count aggregates

Skew (north_rule requirement): unbounded ``collect_list`` on a hot conv_id is
the one operation AQE cannot fix (it re-splits join/sort skew, not grouped
array assembly). Defense in depth:

* ``cap_turns`` — conversations longer than ``max_turns_per_conv`` are capped
  by a NARROW filter (turn_idx is already the per-conv position, so no count
  pass is needed to cap); capped convs are detected with a map-side-combined
  ``max(turn_idx)`` pre-aggregate whose output (only the offending conv_ids)
  broadcasts back to mark docs ``trimmed``. This is the analog of aushape's
  max_event_size trim (format.h:60-63) and bounds per-group state at any
  scale — the 10^4-turn hot conversation costs at most cap rows of state.
* AQE skew-join splitting stays on for the join stages.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import coalesce as C
from . import enrich, parse, render, route


@dataclass
class PipeConf:
    events_per_doc: int = 100
    max_doc_bytes: int | None = 8192
    max_turns_per_conv: int = 2048
    with_text: bool = True  # --with-text analog (P5): include text[] in docs
    persist: bool = True
    """Persist the parsed frame and assembled docs (MEMORY_AND_DISK) so the
    four sinks don't each recompute the full parse+coalesce when they are
    materialized as separate actions. At cluster scale the same role is
    played by a staging table; the flag exists so single-sink runs skip it."""


def cap_turns(df: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
    """Narrow per-conv turn cap + tiny frame of capped conv_ids."""
    capped = (
        df.groupBy("conv_id")
        .agg(F.max("turn_idx").alias("_max_turn"))
        .filter(F.col("_max_turn") >= cap)
        .select("conv_id", F.lit(True).alias("turn_capped"))
    )
    return df.filter(F.col("turn_idx") < cap), capped


def build(spark: SparkSession, transcripts: DataFrame, conf: PipeConf | None = None
          ) -> dict[str, DataFrame]:
    """Build all sink DataFrames (lazy — nothing executes here)."""
    conf = conf or PipeConf()

    fact, capped_convs = cap_turns(transcripts, conf.max_turns_per_conv)

    parsed = parse.parse_turns(fact)
    parsed = enrich.enrich(parsed, spark)
    if conf.persist:
        from pyspark import StorageLevel

        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)

    events = C.coalesce_events(parsed)
    docs = C.assemble_docs(events)

    docs = docs.join(F.broadcast(capped_convs), "conv_id", "left")
    if conf.persist:
        from pyspark import StorageLevel

        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)

    if not conf.with_text:  # P5 raw-text suppression (conv_buf.c:662-666)
        docs = docs.withColumn("texts", F.lit(None).cast("array<string>"))
    json_doc = render.render_json(
        docs,
        max_doc_bytes=conf.max_doc_bytes,
        events_per_doc=conf.events_per_doc,
    )

    xml_doc = render.render_xml(json_doc)
    err = route.error_sink(parsed, docs)
    raw = route.raw_sink(transcripts)

    return {"json_doc": json_doc, "xml_doc": xml_doc, "error": err, "raw": raw}


def metrics_frame(sinks: dict[str, DataFrame], run_id: str) -> DataFrame:
    """Per-sink aggregate counts (A6) as a dataframe aggregate — accumulators
    are unreliable under task retries (SURVEY.md §4.2.4)."""
    parts = []
    for name, df in sinks.items():
        agg = df.agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("conv_id").alias("n_convs"),
            (F.sum(F.octet_length("doc")) if "doc" in df.columns else F.lit(None)).alias("bytes_out"),
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit(name).alias("sink"),
            F.col("n_rows").cast("long"),
            F.col("n_convs").cast("long"),
            F.col("bytes_out").cast("long"),
            F.date_format(F.current_timestamp(), render.TIME_FMT).alias("committed_at"),
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
