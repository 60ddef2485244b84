"""datalib.pii — masking semantics, ordering, degenerate inputs, and the
Spark↔DuckDB pattern-compatibility contract (same pattern strings must
match the same spans in java.util.regex and RE2)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from transcriptpipe.datalib import pii

CASES = [
    # (input, expected masked, {type: count})
    ("mail me at jo.doe+x@sub.example.org today",
     "mail me at [EMAIL] today", {"email": 1}),
    ("card 4111 1111 1111 1234 and 5500-0000-0000-0004",
     "card [CARD] and [CARD]", {"card": 2}),
    ("ssn 123-45-6789.", "ssn [SSN].", {"ssn": 1}),
    ("call 555-867-5309 or 555.867.5309",
     "call [PHONE] or [PHONE]", {"phone": 2}),
    ("host 192.168.0.1 gw 10.0.0.254", "host [IP] gw [IP]", {"ip": 2}),
    # ordering: the card masks FIRST, so its 4-digit runs never re-match
    # as phone/ssn; the ip's dotted runs never match phone (no 4-digit arm)
    ("x 4111 1111 1111 1111 y 1.2.3.4", "x [CARD] y [IP]",
     {"card": 1, "ip": 1}),
    # no PII at all
    ("plain words only", "plain words only", {}),
    # digits that are NOT pii: 12-345 (wrong shapes) stay
    ("order 12-345 qty 7", "order 12-345 qty 7", {}),
]


@pytest.fixture(scope="module")
def masked_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in pii.mask_pii(df).collect()}


def test_mask_values(masked_rows):
    for i, (_, want, counts) in enumerate(CASES):
        r = masked_rows[i]
        assert r["masked_text"] == want, (i, r["masked_text"])
        for name, _, _ in pii.PII_PATTERNS:
            assert r[f"n_{name}"] == counts.get(name, 0), (i, name)


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = pii.mask_pii(df).collect()[0]
    assert r["masked_text"] is None
    assert all(r[f"n_{n}"] == 0 for n, _, _ in pii.PII_PATTERNS)


def test_duckdb_re2_agrees_on_every_case():
    """The SAME pattern strings drive the DuckDB oracle — assert RE2
    produces the identical masked text and counts on the torture cases."""
    con = duckdb.connect()
    masked_expr, count_exprs = pii.sql_mask_chain("t")
    selects = ", ".join(
        f"{c} AS n_{name}"
        for (name, _, _), c in zip(pii.PII_PATTERNS, count_exprs)
    )
    for i, (text, want, counts) in enumerate(CASES):
        row = con.execute(
            f"SELECT {masked_expr} AS m, {selects} FROM (SELECT ? AS t)",
            [text],
        ).fetchone()
        assert row[0] == want, (i, row[0])
        for j, (name, _, _) in enumerate(pii.PII_PATTERNS):
            assert row[1 + j] == counts.get(name, 0), (i, name)


def test_pii_stats_census(spark):
    df = spark.createDataFrame(
        [(1, "a", "x 1.2.3.4"), (2, "a", "clean"), (3, "b", "a@b.co c@d.io")],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in pii.pii_stats(df).collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["n_docs_with_pii"] == 1
    assert out["a"]["total_ip"] == 1
    assert out["b"]["total_email"] == 2 and out["b"]["n_docs_with_pii"] == 1


def test_mask_is_narrow_no_shuffle(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a@b.co").alias("text")
    )
    plan = pii.mask_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
