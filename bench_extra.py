"""Round-6 auxiliary benchmarks — noop-sink isolation per query (guide §1.4).

NOT the driver's bench (bench.py is frozen for measurement); this harness
exists to time individual declared queries and the pipeline stages in
isolation, warm, with labelled jobs — the numbers cited in
OPTIMIZATION_r06.md come from here and from the one-off A/B scripts it
reproduces.

Usage:
    python bench_extra.py queries [name ...]   # warm per-query noop timing
    python bench_extra.py pipeline             # stage decomposition
    python bench_extra.py kernel               # pure-Python render kernel

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
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
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark(app: str):
    from transcriptpipe.session import get_spark

    spark = get_spark(app_name=app, cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_queries(names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _spark("bench-extra-queries")
    qs = entry.queries()
    names = names or list(qs)
    out = {}
    for name in names:
        ts = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep {i}")
            t0 = time.monotonic()
            noop(qs[name](spark, SF_DIR))
            ts.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"samples": ts, "min": min(ts)}
        print(f"{name:28s} {ts} min={min(ts):.2f}", flush=True)
    print(json.dumps(out))


def bench_pipeline() -> None:
    import shutil
    import tempfile

    from transcriptpipe import pipeline

    spark = _spark("bench-extra-pipeline")
    tpath = "/tmp/transcriptpipe_bench/transcripts_100000_s42.parquet"
    if not os.path.exists(tpath):
        from transcriptpipe import synth

        os.makedirs("/tmp/transcriptpipe_bench", exist_ok=True)
        synth.write_transcripts(tpath, n_convs=100000, seed=42,
                                hot_frac=0.001, hot_turns=2000)
    tdf = spark.read.parquet(tpath)
    print("turns:", tdf.count())

    def tm(name, fn, reps=REPS):
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep {i}")
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:36s} {ts} min={min(ts):.2f}", flush=True)

    def full(engine, langs=("json", "xml")):
        stage = tempfile.mkdtemp(prefix="tp_bx_")
        sinks = pipeline.build(spark, tdf, pipeline.PipeConf(
            stage_dir=stage, engine=engine, langs=langs))
        for s in ("json_doc", "xml_doc", "error"):
            if s in sinks:
                noop(sinks[s])
        shutil.rmtree(stage, ignore_errors=True)

    tm("jvm prefix (shuffle+sort)",
       lambda: noop(pipeline.jvm_stage_frame(spark, tdf)))
    tm("rendered frame (arrow)",
       lambda: noop(pipeline.rendered_frame(spark, tdf)))
    tm("FULL arrow json+xml", lambda: full("arrow"))
    tm("FULL arrow json only", lambda: full("arrow", langs=("json",)))
    tm("FULL sql json+xml", lambda: full("sql"))


def bench_kernel() -> None:
    from transcriptpipe import fastkernel, oracle, synth

    df = synth.gen_transcripts(n_convs=20000, seed=7)
    role_map, tool_map = oracle.ROLE_MAP, oracle.TOOL_MAP
    convs: dict = {}
    for r in df.itertuples(index=False):
        convs.setdefault(r.conv_id, []).append(
            (r.turn_idx, role_map.get(r.role, r.role), r.text, r.tool,
             tool_map.get(r.tool) if r.tool else None, r.ts))
    print(f"{len(df)} turns / {len(convs)} convs")

    def run(want_xml: bool):
        for cid, rows in convs.items():
            min_ts = min(t[5] for t in rows)
            fastkernel.render_conv(cid, [t[:5] for t in rows], min_ts, False,
                                   8192, 100, True, False, want_xml=want_xml)

    for wx in (True, False):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run(wx)
            ts.append(time.perf_counter() - t0)
        print(f"want_xml={wx}: min {min(ts):.2f}s "
              f"{len(df) / min(ts):,.0f} turns/s/core")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        bench_queries(sys.argv[2:])
    elif mode == "pipeline":
        bench_pipeline()
    elif mode == "kernel":
        bench_kernel()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
