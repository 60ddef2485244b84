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

from dataclasses import dataclass, replace

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
    with_norm: bool = False
    """--with-norm analog: include the normalized summary section (norm{})
    in each event doc (ref lib/conv_buf.c:185-353; oracle.norm_object)."""
    persist: bool = True
    """Persist the assembled docs (MEMORY_AND_DISK) so the four sinks don't
    each recompute the full parse+coalesce when they are materialized as
    separate actions. At cluster scale the same role is played by a staging
    table; the flag exists so single-sink runs skip it."""
    stage_dir: str | None = None
    """If set, the rendered doc frame is written once to this parquet path
    and every sink becomes a cheap projection of the staged table. Measured
    (11M turns, local[32]): compute 23.5s + parquet stage ~6s, vs +42s for
    the in-memory columnar cache build that persist=True pays. This is the
    cluster pattern (staging table) and makes build() eager for the staging
    write."""
    engine: str = "arrow"
    """'arrow' (default): assemble+trim+render in ONE fused mapInPandas pass
    (fastkernel — the fastest path). 'sql': the all-JVM RELATIONAL engine
    (relational.py — windows + conditional aggregates + native string
    assembly, no interpreted HOF lambdas on the hot path; the fast JVM
    alternative when Python workers are the constraint). 'expr': the
    original Catalyst array-lambda path (coalesce.assemble_docs +
    render.render_json), kept as the third independent implementation for
    verification. All engines are semantics-identical; tests pin
    byte-equality."""
    doc_batch: int | str | None = None
    """S6 document batching (format.h:52-59): when set, build() adds
    ``json_log`` / ``xml_log`` sinks grouping the per-event docs into
    multi-event documents with prologue/epilogue (see docbatch.py). Values:
    N>1 count mode, 1 one-event docs, 0 bare, -B byte budget, "all"."""
    langs: tuple = ("json", "xml")
    """-l/--lang analog (ref lib/conf.c:31-81): which doc languages the run
    builds AND writes. A deselected language's sinks are never constructed
    and its render work is skipped entirely (the Arrow kernel skips XML
    assembly when "xml" is absent — not just the write)."""
    fold_level: int | None = None
    """--fold analog (F8, ref lib/conf.c:43-70 / gbuf.c:242-280): None
    keeps the canonical compact docs (the comparison target); an int N
    re-renders json_doc/xml_doc with nesting levels <= N unfolded one per
    line (0 == --fold=all == compact; a huge N == --fold=none == fully
    unfolded). Presentation-only; batched log sinks stay compact."""
    indent: int = 4
    """--indent analog (spaces per nesting level when folding; reference
    default 4, lib/conf.c:183-190)."""


def cap_turns(df: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
    """Narrow per-conv turn cap + tiny frame of capped conv_ids."""
    capped = (
        df.groupBy("conv_id")
        .agg(F.max("turn_idx").alias("_max_turn"))
        .filter(F.col("_max_turn") >= cap)
        .select("conv_id", F.lit(True).alias("turn_capped"))
    )
    return df.filter(F.col("turn_idx") < cap), capped


def check_unique_turns(transcripts: DataFrame) -> DataFrame:
    """Validation frame for the (conv_id, turn_idx) primary-key contract
    (schemas.TRANSCRIPTS): one row per duplicated key with its count. Empty
    ⇔ the input honours the contract. One shuffle on the same key the
    pipeline aggregates on; run it as a pre-flight action only when the
    producer of the input table is untrusted — the pipeline itself stays
    lazy and does not pay this scan."""
    return (
        transcripts.groupBy("conv_id", "turn_idx")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def _norm_text(df: DataFrame) -> DataFrame:
    """Boundary normalization: a null text is the empty line. The input
    schema declares text nullable, and the reference's model is a log line
    stream where 'missing' can only mean empty — the Python oracle has
    always coerced ``row["text"] or ""`` (oracle.parse_turn), but the
    engines used to carry the null through, rendering ``null`` text lines
    and dropping the turn's (empty) fields object from the rep collectors
    — an engine-vs-oracle divergence no fixture exercised until round 4's
    edge-input probes. Narrow, one expression; the RAW sink is NOT
    normalized (byte-faithful passthrough)."""
    return df.withColumn("text", F.coalesce("text", F.lit("")))


def build(spark: SparkSession, transcripts: DataFrame, conf: PipeConf | None = None
          ) -> dict[str, DataFrame]:
    """Build all sink DataFrames (lazy — nothing executes here)."""
    conf = conf or PipeConf()

    raw_src = transcripts            # raw sink keeps original bytes
    transcripts = _norm_text(transcripts)

    if conf.engine in ("arrow", "arrow_agg"):
        # fast path: broadcast-enrich the RAW rows (no JVM tokenization),
        # one shuffle of raw turns, then parse+assemble+render in the Arrow
        # stage — the grok/kv tokenizer runs as the vectorized pandas stage
        from . import arrow_docs

        if conf.engine == "arrow":
            # sorted-stream shape: flat binary shuffle + spillable sort,
            # zero per-group JVM object state (the 10^12-row plan). The turn
            # cap is enforced INSIDE the sorted pass (rows are consecutive
            # per conversation), so no cap pre-aggregation scan / shuffle /
            # broadcast is needed at all on this path.
            enriched = enrich.enrich_roles(transcripts, enrich.role_dict_df(spark))
            enriched = enriched.join(
                F.broadcast(enrich.tool_dict_df(spark)),
                enriched["tool"] == F.col("tool_code"),
                "left",
            ).drop("tool_code", "tool_kind")
            rendered = arrow_docs.render_docs_sorted(
                enriched,
                max_doc_bytes=conf.max_doc_bytes,
                events_per_doc=conf.events_per_doc,
                with_text=conf.with_text,
                with_norm=conf.with_norm,
                max_turns_per_conv=conf.max_turns_per_conv,
                want_xml="xml" in conf.langs,
            )
        else:
            fact, capped_convs = cap_turns(transcripts, conf.max_turns_per_conv)
            enriched = enrich.enrich_roles(fact, enrich.role_dict_df(spark))
            enriched = enriched.join(
                F.broadcast(enrich.tool_dict_df(spark)),
                enriched["tool"] == F.col("tool_code"),
                "left",
            ).drop("tool_code", "tool_kind")
            events = C.coalesce_events_raw(enriched)
            events = events.join(F.broadcast(capped_convs), "conv_id", "left")
            rendered = arrow_docs.render_docs_arrow(
                events,
                max_doc_bytes=conf.max_doc_bytes,
                events_per_doc=conf.events_per_doc,
                with_text=conf.with_text,
                with_norm=conf.with_norm,
            )
        # every sink derives from the rendered frame (row errors travel on
        # the doc row), so parse+coalesce+render must run once even though
        # the four sinks are materialized as separate actions
        if conf.stage_dir:
            # staging is transient per-run scratch read a handful of times
            # and discarded — cheap codec (lz4) beats the session's durable
            # zstd here (measured: stage-write 6.3s zstd vs 4.1s lz4, sink
            # projections 1.5s vs 0.6s at 1.1M turns); the real sinks keep
            # the session codec through catalog.write
            (rendered.write.mode("overwrite")
             .option("compression", "lz4").parquet(conf.stage_dir))
            rendered = spark.read.parquet(conf.stage_dir)
        elif conf.persist:
            from pyspark import StorageLevel

            rendered = rendered.persist(StorageLevel.MEMORY_AND_DISK)
        doc_cols = ["conv_id", "doc_id", "serial", "time", "n_turns"]
        sinks = {}
        if "json" in conf.langs:
            sinks["json_doc"] = rendered.select(*doc_cols, "doc", "trimmed", "error")
        if "xml" in conf.langs:
            sinks["xml_doc"] = rendered.select(
                *doc_cols, F.col("xml").alias("doc"), "trimmed", "error"
            )
        sinks["error"] = route.error_sink(rendered)
        sinks["raw"] = route.raw_sink(raw_src)
        _finish_sinks(sinks, conf)
        return sinks

    if conf.engine == "sql":
        # all-JVM relational engine: same rendered-frame shape as arrow.
        # The shuffle carries RAW enriched turns; tokenization runs after.
        from . import relational

        fact, capped_convs = cap_turns(transcripts, conf.max_turns_per_conv)
        enriched = enrich.enrich_roles(fact, enrich.role_dict_df(spark))
        enriched = enriched.join(
            F.broadcast(enrich.tool_dict_df(spark)),
            enriched["tool"] == F.col("tool_code"),
            "left",
        ).drop("tool_code", "tool_kind")
        enriched = enriched.join(F.broadcast(capped_convs), "conv_id", "left")
        rendered = relational.render_docs_relational(
            enriched,
            max_doc_bytes=conf.max_doc_bytes,
            events_per_doc=conf.events_per_doc,
            with_text=conf.with_text,
            with_norm=conf.with_norm,
            want_xml="xml" in conf.langs,
        )
        if conf.stage_dir:
            (rendered.write.mode("overwrite")
             .option("compression", "lz4").parquet(conf.stage_dir))
            rendered = spark.read.parquet(conf.stage_dir)
        elif conf.persist:
            from pyspark import StorageLevel

            rendered = rendered.persist(StorageLevel.MEMORY_AND_DISK)
        doc_cols = ["conv_id", "doc_id", "serial", "time", "n_turns"]
        sinks = {}
        if "json" in conf.langs:
            sinks["json_doc"] = rendered.select(*doc_cols, "doc", "trimmed", "error")
        if "xml" in conf.langs:
            sinks["xml_doc"] = rendered.select(
                *doc_cols, F.col("xml").alias("doc"), "trimmed", "error"
            )
        sinks["error"] = route.error_sink(rendered)
        sinks["raw"] = route.raw_sink(raw_src)
        _finish_sinks(sinks, conf)
        return sinks

    fact, capped_convs = cap_turns(transcripts, conf.max_turns_per_conv)
    parsed = parse.parse_turns(fact)
    parsed = enrich.enrich(parsed, spark)
    events = C.coalesce_events(parsed)
    docs = C.assemble_docs(events)
    docs = docs.join(F.broadcast(capped_convs), "conv_id", "left")
    if conf.persist:
        from pyspark import StorageLevel

        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)

    # P5 raw-text suppression (conv_buf.c:662-666) is handled inside
    # render_json (text survives on errored events, conv_buf.c:663-667)
    json_doc = render.render_json(
        docs,
        max_doc_bytes=conf.max_doc_bytes,
        events_per_doc=conf.events_per_doc,
        with_text=conf.with_text,
        with_norm=conf.with_norm,
    )

    sinks = {}
    if "json" in conf.langs:
        sinks["json_doc"] = json_doc
    if "xml" in conf.langs:
        sinks["xml_doc"] = render.render_xml(json_doc)
    sinks["error"] = route.error_sink(docs)
    sinks["raw"] = route.raw_sink(raw_src)
    _finish_sinks(sinks, conf)
    return sinks


def _finish_sinks(sinks: dict[str, DataFrame], conf: PipeConf) -> None:
    """Shared sink post-processing for every engine branch: S6 doc batching
    (from the canonical compact docs), then the optional F8 fold/indent
    re-render of the per-event doc sinks."""
    _add_doc_batch_sinks(sinks, conf)
    if conf.fold_level is not None:
        if "json_doc" in sinks:
            sinks["json_doc"] = render.prettify_json(
                sinks["json_doc"], indent=conf.indent,
                fold_level=conf.fold_level,
            )
        if "xml_doc" in sinks:
            sinks["xml_doc"] = render.prettify_xml(
                sinks["xml_doc"], fold_level=conf.fold_level
            )


def _add_doc_batch_sinks(sinks: dict[str, DataFrame], conf: PipeConf) -> None:
    """S6: multi-event log documents built from the per-event sinks
    (deselected languages stay deselected — ADVICE r2: --lang must skip)."""
    if conf.doc_batch is None:
        return
    from . import docbatch

    if "json_doc" in sinks:
        sinks["json_log"] = docbatch.batch_documents(
            sinks["json_doc"], events_per_doc=conf.doc_batch, fmt="json"
        )
    if "xml_doc" in sinks:
        sinks["xml_log"] = docbatch.batch_documents(
            sinks["xml_doc"], events_per_doc=conf.doc_batch, fmt="xml"
        )


def rendered_frame(spark: SparkSession, transcripts: DataFrame,
                   conf: PipeConf | None = None) -> DataFrame:
    """The single-pass rendered doc frame (doc + xml + errors + envelope) —
    everything every sink needs, computed once with no materialization.
    Used by the scaling harness: on one host the sink writes hit a shared
    disk that a real 4N cluster would scale, so the CPU-scaling evidence
    times this frame's computation."""
    conf = conf or PipeConf(persist=False)
    from . import arrow_docs

    transcripts = _norm_text(transcripts)
    enriched = enrich.enrich_roles(transcripts, enrich.role_dict_df(spark))
    enriched = enriched.join(
        F.broadcast(enrich.tool_dict_df(spark)),
        enriched["tool"] == F.col("tool_code"),
        "left",
    ).drop("tool_code", "tool_kind")
    return arrow_docs.render_docs_sorted(
        enriched,
        max_doc_bytes=conf.max_doc_bytes,
        events_per_doc=conf.events_per_doc,
        with_text=conf.with_text,
        with_norm=conf.with_norm,
        max_turns_per_conv=conf.max_turns_per_conv,
    )


def jvm_stage_frame(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """The all-JVM prefix of the default pipeline — scan → two broadcast
    dict joins → repartition(conv_id) → Tungsten sortWithinPartitions —
    WITHOUT the Python render stage. Used by the scaling harness to separate
    plan scaling from single-host memory-bandwidth effects: if this stage
    scales across core counts while the full pipeline does not, the gap is
    Python-worker/host bandwidth, not plan serialization."""
    from . import arrow_docs

    enriched = enrich.enrich_roles(transcripts, enrich.role_dict_df(spark))
    enriched = enriched.join(
        F.broadcast(enrich.tool_dict_df(spark)),
        enriched["tool"] == F.col("tool_code"),
        "left",
    ).drop("tool_code", "tool_kind")
    n_parts = spark.sparkContext.defaultParallelism * arrow_docs.PART_MULT
    return (
        enriched.select("conv_id", "turn_idx", "role_name", "text",
                        "tool", "tool_name", "ts")
        .repartition(n_parts, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
    )


def run(spark: SparkSession, transcripts: DataFrame, catalog, run_id: str,
        conf: PipeConf | None = None, source_snapshot: str | None = None) -> dict:
    """End-to-end committed run: build sinks, write each through the catalog
    (skipping sinks already committed for this run_id — the resume path),
    then commit the _metrics table. Returns {sink: snapshot|None}.

    Exactly-once: a killed run leaves some sinks committed; re-running the
    same run_id writes only the missing ones. Readers go through
    catalog.read(), which sees only manifest-committed files.
    """
    import os

    conf = conf or PipeConf()
    if (conf.stage_dir is None and conf.engine == "arrow"
            and os.sep in getattr(catalog, "root", "")):
        # stage the rendered frame under the warehouse so the four sink
        # writes are projections, not recomputations (and a resumed run
        # reuses nothing stale: staging is per run_id). Path-rooted catalogs
        # only: an IcebergCatalog's root is a table namespace — set
        # conf.stage_dir explicitly (a staging table/location) there.
        conf = replace(conf, stage_dir=os.path.join(catalog.root, "_staging", run_id))
    frames = build(spark, transcripts, conf)
    results = {}
    for name, df in frames.items():
        results[name] = catalog.write(df, name, run_id, source_snapshot)
    if not catalog.committed(run_id, "_metrics"):
        m = metrics_frame(frames, run_id)
        results["_metrics"] = catalog.write(m, "_metrics", run_id, source_snapshot)
    else:
        results["_metrics"] = None
    return results


def metrics_frame(sinks: dict[str, DataFrame], run_id: str) -> DataFrame:
    """Per-sink aggregate counts (A6) as a dataframe aggregate — accumulators
    are unreliable under task retries (SURVEY.md §4.2.4).

    ``n_convs_approx`` (A7) is the HLL++ sketch count — at 10^12 rows the
    exact count_distinct pays a full shuffle of the distinct keys while the
    sketch merges map-side; both are emitted so the exact column can be
    dropped at scale."""
    parts = []
    for name, df in sinks.items():
        has_conv = "conv_id" in df.columns
        agg = df.agg(
            F.count("*").alias("n_rows"),
            (F.count_distinct("conv_id") if has_conv else F.lit(None)).alias("n_convs"),
            (F.approx_count_distinct("conv_id") if has_conv else F.lit(None)).alias("n_convs_approx"),
            (F.sum(F.octet_length("doc")) if "doc" in df.columns else F.lit(None)).alias("bytes_out"),
        ).select(
            F.lit(run_id).alias("run_id"),
            F.lit(name).alias("sink"),
            F.col("n_rows").cast("long"),
            F.col("n_convs").cast("long"),
            F.col("n_convs_approx").cast("long"),
            F.col("bytes_out").cast("long"),
            F.date_format(F.current_timestamp(), render.TIME_FMT).alias("committed_at"),
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def error_rollup(error_sink: DataFrame) -> DataFrame:
    """A7 cube: error counts by (error_code, has_turn) with all subtotal
    combinations — the ops-dashboard view of the error sink."""
    return (
        error_sink.withColumn(
            "level",
            F.when(F.col("turn_idx").isNotNull(), "row").otherwise("conversation"),
        )
        .cube("error_code", "level")
        .agg(F.count("*").alias("n"))
    )
