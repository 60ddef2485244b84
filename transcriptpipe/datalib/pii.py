"""PII detection and masking — the scrubbing pass a training-data pipeline
runs before anything else touches raw text.

Pure JVM-side ``regexp_replace`` chains (no Python per row, no shuffle —
this runs inside the 100 TB scan, so it must stay narrow and codegen'd).
The pattern set is deliberately written in the Java-regex ∩ RE2 common
subset (``\\d``, ``\\b``, bounded repeats, simple classes) so the DuckDB
oracle can run the *identical* pattern strings: one source of truth,
two engines.

Masking is sequential and ordered (EMAIL → CARD → SSN → PHONE → IP): each
pattern sees the text state left by the previous one, which makes the
output well-defined when patterns could otherwise overlap (e.g. the digit
runs inside an already-masked card never re-match as a phone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER MATTERS, see module docstring.
# Patterns use only syntax shared by java.util.regex and RE2 so the same
# string drives Spark and the DuckDB oracle.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def _count(col: Column, pattern: str) -> Column:
    # F.regexp_count exists in recent Spark, but size(extract_all) has an
    # exact DuckDB mirror (len(regexp_extract_all(...))) — use that form.
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def mask_pii(df: DataFrame, text_col: str = "text",
             out_col: str = "masked_text") -> DataFrame:
    """Replace every PII span with its type token and attach per-type match
    counts (``n_email``, ``n_card``, ...). Null text stays null with zero
    counts. Narrow: a single projection, fully whole-stage-codegen."""
    state = F.col(text_col)
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            F.coalesce(_count(state, pattern), F.lit(0)).alias(f"n_{name}")
        )
        state = F.regexp_replace(state, pattern, repl)
    return df.select("*", *counts, state.alias(out_col))


def pii_stats(df: DataFrame, group_col: str = "source",
              text_col: str = "text") -> DataFrame:
    """Per-group PII census: docs scanned, docs containing any PII, and
    total masked spans by type. One partial-aggregated groupBy."""
    masked = mask_pii(df, text_col=text_col)
    any_pii = sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS) > 0
    return masked.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(any_pii.cast("long")).alias("n_docs_with_pii"),
        *[F.sum(f"n_{n}").alias(f"total_{n}") for n, _, _ in PII_PATTERNS],
    )


def sql_mask_chain(expr: str) -> tuple[str, list[str]]:
    """Build the DuckDB mirror of :func:`mask_pii` over SQL expression
    ``expr``: returns (masked_expr, [count_expr per type]) applying the
    SAME pattern strings in the SAME order. Count i is evaluated on the
    state AFTER masks 0..i-1, exactly like the Spark chain."""
    state = expr
    counts = []
    for _, pattern, repl in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({state}, '{pattern}'))")
        state = f"regexp_replace({state}, '{pattern}', '{repl}', 'g')"
    return state, counts
