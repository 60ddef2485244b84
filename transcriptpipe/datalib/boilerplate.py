"""Boilerplate removal — drop lines that recur across many documents
(nav bars, cookie banners, footers), the C4/RefinedWeb line-level cleanup
that runs between raw extraction and dedup in a training-data pipeline.

Semantics (pinned by the ``doc_boilerplate`` oracle and unit tests):

* a line's identity is ``md5(trim(line))``; the original bytes (leading /
  trailing spaces included) are what is kept or removed,
* frequency counts DISTINCT documents containing the line — a doc
  repeating its own header 50x contributes 1, so within-doc repetition
  (handled by :func:`textstats.repetition_features`) cannot promote a
  line to corpus boilerplate,
* blank lines (``trim(line) = ''``) never count and are never removed —
  removing them would collapse paragraph structure corpus-wide,
* a doc whose every line is boilerplate survives with ``text = ''``
  (documents are filtered by quality scores downstream, never silently
  dropped here); a NULL-text doc emits no row (same contract as
  ``sample.chunk_text``).

Scale (100 TB): two shuffles carry only narrow projections — the
(doc_id, line-hash) distinct + count pass — and the frequent-line set that
comes back is tiny by construction (only lines appearing in >= min_docs
documents), so the removal join is a BROADCAST left join; the only
full-text shuffle is the per-doc reassembly groupBy, which moves the
corpus exactly once. If a pathological corpus yields a frequent set too
big to broadcast, pass ``broadcast_frequent=False`` to fall back to a
shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, idx, line, key, blank) — one row per line, NULL text excluded
    (split(NULL) is NULL so posexplode emits nothing)."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        .withColumn("key", F.md5(F.trim(F.col("line"))))
        .withColumn("blank", F.trim(F.col("line")) == "")
    )


def line_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(key, n_docs) for every distinct non-blank line: how many DISTINCT
    documents contain it. The census behind :func:`remove_boilerplate`,
    exposed for corpus inspection / threshold tuning."""
    lines = _lines(df, id_col, text_col)
    return (
        lines.filter(~F.col("blank"))
        .select(id_col, "key")
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("n_docs"))
    )


def remove_boilerplate(df: DataFrame, min_docs: int = 2,
                       id_col: str = "doc_id", text_col: str = "text",
                       broadcast_frequent: bool = True) -> DataFrame:
    """Remove every non-blank line occurring in >= ``min_docs`` distinct
    documents; returns (id, text, n_lines, n_removed) with ``text``
    reassembled from the surviving lines in original order."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would erase every line)")
    lines = _lines(df, id_col, text_col)
    freq = (
        line_frequencies(df, id_col, text_col)
        .filter(F.col("n_docs") >= min_docs)
        .select("key", F.lit(True).alias("_boiler"))
    )
    if broadcast_frequent:
        freq = F.broadcast(freq)
    marked = (
        lines.join(freq, "key", "left")
        .withColumn("boiler", (~F.col("blank")) & F.col("_boiler").isNotNull())
    )
    ent = F.struct(F.col("idx"), F.col("line"), F.col("boiler"))
    kept = F.filter(F.array_sort(F.collect_list(ent)), lambda e: ~e["boiler"])
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(kept.getField("line"), "\n").alias(text_col),
            F.count("*").alias("n_lines"),
            F.sum(F.col("boiler").cast("int")).alias("n_removed"),
        )
    )
