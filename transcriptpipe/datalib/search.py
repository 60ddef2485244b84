"""Lexical retrieval (BM25) over document text — the keyword-search path
complementing the embedding ANN in :mod:`similarity` (brute/LSH/IVF).

Spark-first shape: for a literal query (a handful of terms), per-document
term frequencies and lengths are pure narrow column expressions — no
explode, no inverted-index shuffle. The corpus statistics BM25 needs
(N, avgdl, per-term document frequency) are ONE tiny aggregate over the
same narrow projection, broadcast back with a single-row crossJoin; the
final ranking is a TakeOrdered top-k. Two scans of the text column total
(stats + scoring) and zero wide shuffles.

Scale: at 100 TB a search service would persist the stats pass (N, avgdl,
and a term->df table are corpus constants between ingests) and feed them
via ``precomputed_stats`` — then a query is ONE narrow scan + top-k.

Determinism: scores are rounded to 4 decimals BEFORE ranking and ties
break by doc id, so the result set is stable across engines and cluster
sizes (the doc_bm25 oracle hash-checks it against a DuckDB mirror of the
identical formula)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _toks(text: Column) -> Column:
    """Lowercase whitespace tokens — the same tokenizer the DuckDB oracle
    runs (string_split_regex(lower(trim(text)), '\\s+'))."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _eq(term: str):
    # a closure, NOT a defaulted 2nd lambda arg: Spark reads a 2-param
    # lambda as (value, index) and would bind the term name to the index
    return lambda x: x == term


def _base(df: DataFrame, terms: list[str], id_col: str,
          text_col: str) -> DataFrame:
    """(id, _dl, _tf0..) — the narrow per-doc projection both the stats
    pass and the scoring pass run on. The token array is bound to an
    attribute column first (round 6): an inline split is otherwise
    evaluated once per ``size``/``filter`` call — 1 + len(terms)
    tokenizations per row instead of one."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), _toks(F.col(text_col)).alias("_t")
    ).select(
        F.col(id_col),
        F.size("_t").alias("_dl"),
        *[
            F.size(F.filter(F.col("_t"), _eq(t))).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )


def _stats_of(base: DataFrame, n_terms: int) -> DataFrame:
    return base.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
            for i in range(n_terms)
        ],
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = K1, b: float = B,
              precomputed_stats: DataFrame | None = None) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of literal query terms
    (lowercased). Docs matching no term are excluded; NULL-text docs are
    excluded (no tokens). Returns (id, bm25)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    base = _base(df, terms, id_col, text_col)
    stats = precomputed_stats
    if stats is None:
        stats = _stats_of(base, len(terms))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
        score = part if score is None else score + part
    return (
        base.crossJoin(F.broadcast(stats))
        .select(id_col, F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def corpus_stats(df: DataFrame, query_terms: list[str],
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The single-row stats frame ``bm25_topk`` derives when not given one
    — persist this between ingests to make each query one narrow scan."""
    terms = [t.lower() for t in query_terms]
    return _stats_of(_base(df, terms, id_col, text_col), len(terms))
