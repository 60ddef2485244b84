"""Composite corpus filtering — the keep/drop policy pass a training-data
pipeline runs after ingest, composing the datalib's per-document signals
(token counts, language ID, quality score, repetition) into one decision
with an audit trail.

Shape: a NARROW cascade of stacked projections computes every signal plus
`keep` and the FIRST failing rule as `drop_reason` (C4/Gopher-style
cascades report the first tripped rule, and one canonical reason keeps
downstream census queries deterministic). All signals are pure column
expressions with the token/2-gram arrays bound to attribute columns
(higher-order lambdas are interpreted, so an inline split inside them is
O(doc²) — see annotate_filters); zero shuffle, and at 100 TB the pass
rides the ingest scan for free. The reason census (`filter_report`) is one
partial-aggregated groupBy.

The rule ORDER is part of the contract (documented below and pinned by the
doc_filter_chain DuckDB oracle): empty → too_short → too_long → bad_lang →
low_quality → too_repetitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textstats

# defaults tuned for "drop obvious junk, keep prose"; callers override
MIN_TOKENS = 5
MAX_TOKENS = 50_000
MIN_QUALITY = 0.4
MAX_DUP2_FRAC = 0.5


def annotate_filters(df: DataFrame, text_col: str = "text",
                     min_tokens: int = MIN_TOKENS,
                     max_tokens: int = MAX_TOKENS,
                     allowed_langs: list[str] | None = None,
                     min_quality: float = MIN_QUALITY,
                     max_dup2_frac: float = MAX_DUP2_FRAC) -> DataFrame:
    """Add the filter signals and the decision to ``df``: ``n_tokens``,
    ``lang_pred``, ``quality``, ``dup2_frac``, ``drop_reason`` (null when
    the doc passes every rule) and ``keep``. ``allowed_langs=None``
    disables the language rule.

    Built as STAGED projections that bind the token and 2-gram arrays to
    attribute columns before any higher-order function consumes them.
    Higher-order lambdas are not whole-stage-codegen'd, so an inline
    ``split(text)`` inside a lambda body is re-evaluated PER ELEMENT —
    O(doc²) on a long document, the kind of expression that silently
    works at test scale and melts on a real corpus. CollapseProject will
    not undo the staging: it only inlines aliases that are cheap or
    referenced once, and the split/transform aliases are neither."""
    t = F.col(text_col)
    orig = list(df.columns)
    bound = df.select(
        "*",
        F.split(F.trim(t), r"\s+").alias("_toks"),
        F.split(F.lower(t), r"\s+").alias("_ltoks"),
    ).select("*", textstats.word_ngrams(F.col("_toks"), 2).alias("_g2"))

    n_tok = F.coalesce(
        F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.col("_toks"))),
        F.lit(0),
    )
    dup2 = (
        F.lit(1.0)
        - F.size(F.array_distinct(F.col("_g2"))).cast("double")
        / F.greatest(F.size(F.col("_g2")), F.lit(1))
    )
    sig = bound.select(
        "*",
        n_tok.alias("n_tokens"),
        textstats.lang_id(t, toks=F.col("_ltoks")).alias("lang_pred"),
        textstats.quality_score(t, toks=F.col("_toks")).alias("quality"),
        dup2.alias("_dup2"),
    )

    reason = F.when(t.isNull() | (F.length(F.trim(t)) == 0), F.lit("empty"))
    reason = reason.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
    reason = reason.when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
    if allowed_langs is not None:
        reason = reason.when(~F.col("lang_pred").isin(list(allowed_langs)),
                             F.lit("bad_lang"))
    reason = reason.when(F.col("quality") < min_quality, F.lit("low_quality"))
    reason = reason.when(F.col("_dup2") > max_dup2_frac,
                         F.lit("too_repetitive"))

    return sig.select(
        *orig,
        "n_tokens",
        "lang_pred",
        "quality",
        F.round(F.col("_dup2"), 4).alias("dup2_frac"),
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


def filter_corpus(df: DataFrame, **kwargs) -> DataFrame:
    """The kept subset (original columns only) — annotate + filter + strip
    the audit columns."""
    added = ["n_tokens", "lang_pred", "quality", "dup2_frac",
             "drop_reason", "keep"]
    return (
        annotate_filters(df, **kwargs)
        .filter(F.col("keep"))
        .drop(*added)
    )


def filter_report(df: DataFrame, group_col: str | None = None,
                  **kwargs) -> DataFrame:
    """Census of filter outcomes: rows per (group,) drop_reason with kept
    docs under reason 'kept' — the artifact a cleanup run publishes."""
    ann = annotate_filters(df, **kwargs)
    outcome = F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome")
    keys = ([F.col(group_col)] if group_col else []) + [outcome]
    return ann.groupBy(*keys).agg(F.count("*").alias("n_docs"))
