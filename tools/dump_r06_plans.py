"""Dump .explain('formatted') for bench queries into plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_r06_plans.py <tag> [query ...]
With no query names, dumps every bench-suite query.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from transcriptpipe.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parents[1] / "plans" / "r06"

BENCH_QUERIES = [
    "ev_coalesce", "ev_sessionize", "ev_route_counts",
    "ev_doc_assemble", "ev_cube",
    "tpch_q1", "tpch_q3", "tpch_q5",
    "doc_dedup_exact", "doc_minhash_lsh", "doc_jaccard_verified",
    "doc_dup_clusters", "doc_simhash", "emb_ann_cosine",
    "doc_decontam", "doc_packed", "emb_decontam",
    "doc_pii_mask", "doc_top_ngrams", "doc_stratified_sample",
    "doc_boilerplate", "doc_bm25", "doc_filter_chain", "doc_shards",
]


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF)
        (OUT / f"{name}_{tag}.txt").write_text(plan_of(df))
        print("dumped", name)


if __name__ == "__main__":
    main()
