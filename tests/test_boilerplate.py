"""datalib.boilerplate — pinned line-removal semantics: trim-normalized
identity, distinct-doc frequency (within-doc repeats don't count), blank
lines untouchable, all-boilerplate docs survive as '', null text absent."""

from __future__ import annotations

import pytest

from transcriptpipe.datalib import boilerplate

SCHEMA = "doc_id long, text string"


def _run(spark, rows, min_docs=2):
    df = spark.createDataFrame(rows, SCHEMA)
    out = boilerplate.remove_boilerplate(df, min_docs=min_docs)
    return {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in out.collect()}


def test_shared_lines_removed_unique_kept(spark):
    got = _run(spark, [
        (0, "BANNER\nunique zero\nfooter"),
        (1, "BANNER\nunique one\nfooter"),
        (2, "BANNER\nunique two"),
    ])
    assert got[0] == ("unique zero", 3, 2)
    assert got[1] == ("unique one", 3, 2)
    assert got[2] == ("unique two", 2, 1)


def test_trim_normalized_identity_removes_original_bytes(spark):
    # '  BANNER  ' matches 'BANNER' after trim; the padded original line is
    # what disappears from doc 1
    got = _run(spark, [(0, "BANNER\nkeep a"), (1, "  BANNER  \nkeep b")])
    assert got[0] == ("keep a", 2, 1)
    assert got[1] == ("keep b", 2, 1)


def test_within_doc_repeats_do_not_count(spark):
    # doc 0 repeats its own header 3x — still only ONE distinct doc, so
    # the line stays everywhere at min_docs=2
    got = _run(spark, [(0, "hdr\nhdr\nhdr\nbody"), (1, "other text")])
    assert got[0] == ("hdr\nhdr\nhdr\nbody", 4, 0)


def test_blank_lines_never_removed(spark):
    # the empty line appears in both docs but is structural, not boilerplate
    got = _run(spark, [(0, "a\n\nb"), (1, "c\n\nd"), (2, "a\nz")])
    assert got[0] == ("\nb", 3, 1)          # 'a' shared with doc 2
    assert got[1] == ("c\n\nd", 3, 0)
    assert got[2] == ("z", 2, 1)


def test_all_boilerplate_doc_survives_empty(spark):
    got = _run(spark, [(0, "x\ny"), (1, "x\ny"), (2, "x\ny\nmine")])
    assert got[0] == ("", 2, 2)
    assert got[2] == ("mine", 3, 2)


def test_null_and_empty_text(spark):
    got = _run(spark, [(0, None), (1, ""), (2, "solo")])
    assert 0 not in got                      # null text emits no row
    assert got[1] == ("", 1, 0)              # one blank line, kept
    assert got[2] == ("solo", 1, 0)


def test_min_docs_validation(spark):
    df = spark.createDataFrame([(0, "a")], SCHEMA)
    with pytest.raises(ValueError):
        boilerplate.remove_boilerplate(df, min_docs=1)


def test_line_frequencies_counts_distinct_docs(spark):
    df = spark.createDataFrame(
        [(0, "dup\ndup\nsolo"), (1, "dup"), (2, "\n \n")], SCHEMA)
    freq = {r["key"]: r["n_docs"]
            for r in boilerplate.line_frequencies(df).collect()}
    import hashlib
    k = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert freq[k("dup")] == 2               # not 3: doc 0 counts once
    assert freq[k("solo")] == 1
    assert k("") not in freq                 # blanks excluded from census
