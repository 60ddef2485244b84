"""Parse stage — vectorized grok/kv field extraction + hex decoding.

The aushape analog is auparse's key=value tokenizer consumed at
/root/reference/lib/record.c:42-55 plus the hex-vs-quoted value heuristic at
lib/execve_coll.c:363-375. Everything here is JVM-side Catalyst expressions
(regexp_extract_all / higher-order functions) — no Python in the hot path, so
the stage stays inside whole-stage codegen and scales linearly with input
splits (narrow, no shuffle).

Output columns added to the transcript frame:

* ``keys``, ``vals``     — token arrays (vals unquoted/unescaped)
* ``fields``             — map<string, array<string>> of [interpreted, raw?]
                           two-representation values (ref lib/field.c:116-130:
                           raw emitted only when it differs)
* ``item_idx``           — int slot index when an ``item=N`` token is present
                           (ref lib/path_coll.c:143-156)
* ``row_error``          — PARSE_FAIL / INVALID_HEX, else null
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import schemas

# key = ident or ident[digits]; value = quoted-with-escapes or bare token.
# Same grammar the synth generator emits (synth.py) and the reference's field
# syntax models (lib/record.c:42-55).
TOKEN_PATTERN = r'([A-Za-z_][A-Za-z0-9_]*(?:\[\d+\])?)=("(?:[^"\\]|\\.)*"|\S+)'


def _unquote(v: Column) -> Column:
    """Strip surrounding quotes and unescape \\" and \\\\ (single pass)."""
    stripped = v.substr(F.lit(2), F.length(v) - 2)
    return F.when(
        v.startswith('"') & v.endswith('"') & (F.length(v) >= 2),
        F.regexp_replace(stripped, r"\\(.)", "$1"),
    ).otherwise(v)


def strict_int(v: Column) -> Column:
    """Checked nonneg int parse of a free-form token value (F5), with the
    SAME acceptance grammar as oracle.try_int: ASCII digits only — no sign,
    no whitespace, no '_' separators, no unicode digits (all of which
    Python's bare int() or Spark's bare try_cast would accept on one side
    only, diverging the engines on adversarial input — ADVICE r3); int32
    overflow → null on both sides."""
    return F.when(v.rlike(r"^[0-9]+$"), v.try_cast("int"))


def _decode_hex(v: Column) -> Column:
    """Hex → UTF-8 string; null when not decodable (odd length or bad chars).

    make_valid_utf8 replaces invalid byte sequences with U+FFFD using the
    same maximal-subpart strategy as Python's bytes.decode(errors="replace")
    (verified on surrogate/truncation/overlong vectors — a bare
    binary→string cast instead passes raw bytes through, so octet_length
    of the decoded value and the rendered doc bytes would diverge from the
    Python engines on adversarial hex, ADVICE r3)."""
    return F.when(
        F.length(v) % 2 == 0, F.make_valid_utf8(F.unhex(v).cast("string"))
    ).otherwise(F.lit(None))


def parse_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenize ``text`` into two-representation field maps. Narrow op."""
    text = F.col(text_col)
    df = df.withColumn("keys", F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 1)) \
           .withColumn("_rawvals", F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 2))
    df = df.withColumn("vals", F.transform("_rawvals", _unquote)).drop("_rawvals")

    # interpreted/raw pair: hex fields decode; everything else is identity.
    pair = F.zip_with(
        "keys",
        "vals",
        lambda k, v: F.when(
            k == "hex",
            F.when(_decode_hex(v).isNull(), F.array(v)).otherwise(F.array(_decode_hex(v), v)),
        ).otherwise(F.array(v)),
    )
    df = df.withColumn("fields", F.map_from_arrays("keys", pair))

    kv = F.map_from_arrays("keys", "vals")
    df = df.withColumn("item_idx", strict_int(F.element_at(kv, "item")))

    # strict lower bound on this turn's contribution to the rendered data
    # section (field values appear verbatim in the JSON; escaping only adds
    # bytes) — lets render.py skip rendering oversized docs entirely.
    # NATIVE array_join instead of an aggregate lambda: same byte total,
    # no interpreted-HOF projection (round 3)
    df = df.withColumn(
        "vals_bytes", F.octet_length(F.array_join("vals", "")).cast("int")
    )

    parse_fail = (F.size("keys") == 0) & (F.length(F.trim(text)) > 0)
    bad_hex = F.map_contains_key(kv, "hex") & _decode_hex(F.element_at(kv, "hex")).isNull()
    df = df.withColumn(
        "row_error",
        F.when(parse_fail, F.lit(schemas.ERR_PARSE_FAIL))
         .when(bad_hex, F.lit(schemas.ERR_INVALID_HEX))
         .otherwise(F.lit(None).cast("string")),
    )
    return df
