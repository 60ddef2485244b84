"""Property tests for the native Catalyst XML escape and hex decode paths
(round 4): the Column expressions must agree with the Python reference
implementations on arbitrary input, including control characters and
invalid UTF-8 — the classes of input the synth grammar never emits."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from transcriptpipe.render import xml_escape_str


# text() minus surrogates (Spark/Arrow cannot transport lone surrogates)
_CHARS = st.characters(blacklist_categories=("Cs",))
_TEXT = st.text(_CHARS, max_size=60)


@pytest.fixture(scope="module")
def _esc_runner(spark):
    """One reusable evaluator: batch many strings through the _xml_esc
    Column in a single Spark job per example-batch (hypothesis drives the
    python side; Spark evaluates in bulk at the end for speed)."""
    from pyspark.sql import functions as F

    from transcriptpipe.relational import _xml_esc

    def run(samples: list[str]) -> list[str]:
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        return [r["e"] for r in
                df.select(_xml_esc(F.col("s")).alias("e")).collect()]

    return run


@settings(max_examples=30, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_xml_esc_matches_python(_esc_runner, samples):
    got = _esc_runner(samples)
    want = [xml_escape_str(s) for s in samples]
    assert got == want


def test_xml_esc_control_chars_exact(_esc_runner):
    """Every control char the escape maps (0x00-0x1F minus \\t\\n\\r) plus
    the 5 entities, in one adversarial batch."""
    samples = [chr(i) for i in range(0x20) if chr(i) not in "\t\n\r"]
    samples += ['&', '<', '>', '"', "'", 'a&b<c>d"e\'f', '&amp;', '\x01&\x1f']
    got = _esc_runner(samples)
    want = [xml_escape_str(s) for s in samples]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=24), min_size=1, max_size=20))
def test_hex_decode_matches_python_replace(spark, payloads):
    """parse._decode_hex (unhex + make_valid_utf8) == bytes.fromhex +
    decode(errors='replace') for ARBITRARY byte payloads (invalid UTF-8
    included) — the ADVICE-r3 alignment, as a property."""
    from pyspark.sql import functions as F

    from transcriptpipe.parse import _decode_hex

    hexes = [p.hex().upper() for p in payloads]
    df = spark.createDataFrame([(h,) for h in hexes], "h string")
    got = [r["d"] for r in
           df.select(_decode_hex(F.col("h")).alias("d")).collect()]
    want = [p.decode("utf-8", errors="replace") for p in payloads]
    assert got == want
