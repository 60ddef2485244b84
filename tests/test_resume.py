"""M6 resume/checkpoint tests: kill-between-sinks → re-run is exactly-once.

The reference has no resumability (process restart reprocesses input,
SURVEY.md §2.9); this is a north_rule requirement, so the tests define the
contract: snapshot-committed sinks, idempotent re-runs keyed by run_id,
per-partition lineage in the manifest.
"""

from __future__ import annotations

import pytest

from transcriptpipe import pipeline
from transcriptpipe.sinks import SinkCatalog


@pytest.fixture()
def catalog(tmp_path):
    return SinkCatalog(root=str(tmp_path / "warehouse"))


def test_full_run_commits_all_sinks(spark, tiny_df, catalog):
    res = pipeline.run(spark, tiny_df, catalog, run_id="r1")
    for name in ("json_doc", "xml_doc", "error", "raw", "_metrics"):
        assert res[name] is not None, name
        assert catalog.committed("r1", name)
    # lineage present and consistent
    snap = catalog.manifest("json_doc")["snapshots"][0]
    assert snap["n_rows"] == sum(p["n_rows"] for p in snap["partition_lineage"])
    assert catalog.read(spark, "json_doc").count() == snap["n_rows"]


def test_kill_and_resume_exactly_once(spark, tiny_df, catalog):
    # simulate a run killed after the first two sinks committed
    frames = pipeline.build(spark, tiny_df)
    catalog.write(frames["json_doc"], "json_doc", "r2")
    catalog.write(frames["error"], "error", "r2")
    pre = catalog.total_rows("json_doc")

    # resume: same run_id — only missing sinks get written
    res = pipeline.run(spark, tiny_df, catalog, run_id="r2")
    assert res["json_doc"] is None and res["error"] is None  # skipped
    assert res["xml_doc"] is not None and res["raw"] is not None

    # exactly-once: no duplicate rows in the already-committed sink
    assert catalog.total_rows("json_doc") == pre
    assert len(catalog.manifest("json_doc")["snapshots"]) == 1


def test_distinct_runs_append(spark, tiny_df, catalog):
    pipeline.run(spark, tiny_df, catalog, run_id="a")
    pipeline.run(spark, tiny_df, catalog, run_id="b")
    m = catalog.manifest("raw")
    assert [s["run_id"] for s in m["snapshots"]] == ["a", "b"]
    assert catalog.read(spark, "raw").count() == 2 * tiny_df.count()


def test_metrics_match_sink_counts(spark, tiny_df, catalog):
    pipeline.run(spark, tiny_df, catalog, run_id="m1")
    metrics = {
        r["sink"]: r["n_rows"]
        for r in catalog.read(spark, "_metrics").collect()
    }
    for name in ("json_doc", "xml_doc", "error", "raw"):
        assert metrics[name] == catalog.total_rows(name), name
