"""Parse-stage unit tests: Spark tokenizer vs the pure-Python oracle tokenizer.

The reference's field syntax (key=value, quoted values with escapes, hex
payloads) is exercised token-by-token; SURVEY.md §2.8 F5-F7.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from transcriptpipe import oracle, parse, schemas

CASES = [
    'msg="hello world" seq=1',
    'msg="escaped \\" quote" seq=2',
    'msg="back\\\\slash" seq=3',
    "bare=token x=1 y=2",
    "hex=4A6F seq=4",          # valid hex -> "Jo"
    "hex=4A6 seq=5",           # odd length -> INVALID_HEX
    "hex=ZZZZ seq=6",          # junk -> INVALID_HEX
    ";; no tokens here ;;",    # PARSE_FAIL
    "",                        # empty: fine (EOE analog)
    "a0_len=5 a0[0]=68656C a0[1]=6C6F item=3",
    'dup=1 dup=2',             # LAST_WIN
]


def _mk_df(spark, texts):
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user",
         "text": t, "tool": None, "ts": datetime(2026, 1, 1)}
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS), rows


def test_tokenizer_matches_oracle(spark):
    df, rows = _mk_df(spark, CASES)
    got = {r["conv_id"]: r for r in parse.parse_turns(df).collect()}
    for row in rows:
        o = oracle.parse_turn(row)
        g = got[row["conv_id"]]
        assert list(g["keys"]) == o.keys, row["text"]
        assert list(g["vals"]) == o.vals, row["text"]
        assert {k: list(v) for k, v in g["fields"].items()} == o.fields, row["text"]
        assert g["item_idx"] == o.item_idx, row["text"]
        assert g["row_error"] == o.row_error, row["text"]


def test_hex_two_representations(spark):
    df, _ = _mk_df(spark, ["hex=4A6F"])
    r = parse.parse_turns(df).collect()[0]
    assert list(r["fields"]["hex"]) == ["Jo", "4A6F"]


def test_parse_is_narrow(spark):
    """The parse stage must not introduce a shuffle."""
    df, _ = _mk_df(spark, CASES)
    plan = parse.parse_turns(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
