"""As-of join tests: expression path vs pandas merge_asof path vs a tiny
hand-computed fixture."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", datetime(2026, 1, 1, 0, 0, 10), 1),
            ("a", datetime(2026, 1, 1, 0, 0, 20), 2),
            ("a", datetime(2026, 1, 1, 0, 0, 5), 3),
            ("b", datetime(2026, 1, 1, 0, 0, 15), 4),
            ("c", datetime(2026, 1, 1, 0, 0, 1), 5),
        ],
        "k string, ts timestamp, lv int",
    )
    right = spark.createDataFrame(
        [
            ("a", datetime(2026, 1, 1, 0, 0, 8), "x"),
            ("a", datetime(2026, 1, 1, 0, 0, 20), "y"),
            ("b", datetime(2026, 1, 1, 0, 0, 1), "z"),
        ],
        "k string, ts timestamp, rv string",
    )
    return left, right


EXPECTED = {1: "x", 2: "y", 3: None, 4: "z", 5: None}


def test_asof_expression(spark, frames):
    from transcriptpipe.datalib import asof

    left, right = frames
    got = {r["lv"]: r["r_rv"] for r in asof.asof_join(left, right, "k", "ts").collect()}
    assert got == EXPECTED


def test_asof_pandas(spark, frames):
    from transcriptpipe.datalib import asof

    left, right = frames
    got = {
        r["lv"]: r["r_rv"]
        for r in asof.asof_join_pandas(left, right, "k", "ts").collect()
    }
    assert got == EXPECTED


def test_asof_tolerance(spark, frames):
    from transcriptpipe.datalib import asof

    left, right = frames
    got = {
        r["lv"]: r["r_rv"]
        for r in asof.asof_join(left, right, "k", "ts", tolerance_us=3_000_000).collect()
    }
    # lv=1: gap 2s ok; lv=2: exact 0s ok; lv=4: gap 14s > 3s -> null
    assert got == {1: "x", 2: "y", 3: None, 4: None, 5: None}


def test_asof_paths_agree_on_events(spark):
    from transcriptpipe.datalib import asof

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("sid")
    )
    a = {
        r["event_id"]: r["r_sid"]
        for r in asof.asof_join(left, right, "user_id", "ts").collect()
    }
    b = {
        r["event_id"]: r["r_sid"]
        for r in asof.asof_join_pandas(left, right, "user_id", "ts").collect()
    }
    assert a == b and len(a) > 0
