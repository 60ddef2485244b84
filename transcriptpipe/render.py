"""Render stage — JSON/XML document rendering, trimming, doc batching.

JSON rendering is Spark's own ``to_json`` (JVM, whole-stage codegen, null
fields omitted — the analog of aushape's optional event members,
/root/reference/lib/aushape.schema.json:270-503). XML has no Catalyst
renderer, so it is one Arrow-batched pandas UDF implementing the escaping
rules of lib/gbuf.c:282-342 (&quot; &apos; &lt; &gt; &amp;, control chars →
&#xNN;).

Trimming is the analog of gbtree priority-trim (lib/gbtree.c:555-606,
invoked at conv_buf.c:668-693): documents over ``max_doc_bytes`` drop
components in a fixed priority order — text[] first, then the data section —
and are marked ``trimmed`` (schema.json:293-299). A deterministic `when`
cascade, not a dynamic priority queue: at Spark scale the cascade costs two
extra to_json evaluations only on the oversized minority.

Doc batching (S6, lib/conv.c:85-172 / format.h:52-59 events_per_doc): we
assign ``doc_id = floor(serial / events_per_doc)``. This is deterministic,
retry-stable, and requires NO global window (a row_number over an unpartitioned
window would serialize on one task at 10^12 rows — SURVEY.md §7.3.4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TIME_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"  # ISO-8601, UTC ('Z'), ms precision
# matches conv_buf.c:399-404's %Y-%m-%dT%H:%M:%S.mmm±HH:MM except we pin UTC
# (documented divergence, SURVEY.md §7.3.5)


def _doc_struct(with_text: bool, with_data: bool, trimmed: bool) -> Column:
    parts = [
        F.col("serial"),
        F.col("time"),
        (F.col("texts") if with_text else F.lit(None).cast("array<string>")).alias("text"),
        (F.col("data") if with_data else F.lit(None)).alias("data"),
        F.col("error"),
    ]
    parts.append((F.lit(True) if trimmed else F.lit(None).cast("boolean")).alias("trimmed"))
    return F.struct(*parts)


def render_json(docs: DataFrame, max_doc_bytes: int | None = None,
                events_per_doc: int = 100) -> DataFrame:
    """Assembled event frame → JSON_DOC sink frame."""
    df = docs.withColumn("time", F.date_format("min_ts", TIME_FMT))
    # turn-capped conversations (max_event_size analog) are trimmed by definition
    pre_trimmed = (
        F.coalesce(F.col("turn_capped"), F.lit(False))
        if "turn_capped" in df.columns
        else F.lit(False)
    )
    full = F.to_json(_doc_struct(True, True, False))
    no_text = F.to_json(_doc_struct(False, True, True))
    envelope = F.to_json(_doc_struct(False, False, True))
    if max_doc_bytes is None:
        doc, trimmed = full, pre_trimmed
    else:
        cap = F.lit(max_doc_bytes)
        # strict lower bounds computed upstream (raw text / field-value bytes
        # can only inflate under JSON syntax+escaping), so an oversized doc is
        # detected WITHOUT rendering it — inverting aushape's format-then-cut
        # (notes.txt:242-246), which would make a megabyte conversation a
        # straggler: est > cap ⟹ rendered > cap, skip that render entirely.
        # errored docs carry no data section (P6), so field bytes don't count
        est_data = F.when(
            F.col("error").isNull(), F.coalesce(F.col("fields_bytes"), F.lit(0))
        ).otherwise(F.lit(0))
        est_full = F.coalesce(F.col("text_bytes"), F.lit(0)) + est_data
        full_fits = (est_full <= cap) & (F.octet_length(full) <= cap)
        doc = (
            F.when(full_fits, full)
            .when((est_data <= cap) & (F.octet_length(no_text) <= cap), no_text)
            .otherwise(envelope)
        )
        trimmed = ~full_fits | pre_trimmed
    return df.select(
        "conv_id",
        F.floor(F.col("serial") / events_per_doc).alias("doc_id"),
        "serial",
        "time",
        "n_turns",
        doc.alias("doc"),
        trimmed.alias("trimmed"),
        "error",
    )


_XML_CONTROL = {i: f"&#x{i:X};" for i in range(0x20) if chr(i) not in "\t\n\r"}
_XML_ESCAPES = {**_XML_CONTROL,
                ord("&"): "&amp;", ord("<"): "&lt;", ord(">"): "&gt;",
                ord('"'): "&quot;", ord("'"): "&apos;"}


def xml_escape_str(s: str) -> str:
    return s.translate(_XML_ESCAPES)


def _fields_xml(fields: dict) -> str:
    out = []
    for k, v in fields.items():
        vals = "".join(f"<v>{xml_escape_str(x)}</v>" for x in v)
        out.append(f'<f name="{xml_escape_str(k)}">{vals}</f>')
    return "".join(out)


def xml_from_doc(e: dict) -> str:
    """Event doc object -> XML string. Element layout mirrors
    lib/aushape.xsd: <event serial time [error] [trimmed]>
    <text><line/>*</text> <data><role>...</role>*</data> </event>."""
    attrs = f' serial="{e["serial"]}" time="{e["time"]}"'
    if e.get("error"):
        attrs += f' error="{xml_escape_str(e["error"])}"'
    if e.get("trimmed"):
        attrs += ' trimmed="true"'
    parts = [f"<event{attrs}>"]
    if "text" in e and e["text"] is not None:
        parts.append(
            "<text>"
            + "".join(f"<line>{xml_escape_str(t) if t is not None else ''}</line>" for t in e["text"])
            + "</text>"
        )
    data = e.get("data")
    if data is not None:
        parts.append("<data>")
        if data.get("system") is not None:
            parts.append(f"<system>{_fields_xml(data['system'])}</system>")
        for role in ("user", "assistant", "tool_call", "tool_result"):
            for item in data.get(role) or []:
                parts.append(f"<{role}>{_fields_xml(item)}</{role}>")
        if data.get("args") is not None:
            parts.append(
                "<args>" + "".join(f"<a>{xml_escape_str(a)}</a>" for a in data["args"]) + "</args>"
            )
        if data.get("tools") is not None:
            parts.append(
                "<tools>" + "".join(f"<t>{xml_escape_str(t)}</t>" for t in data["tools"]) + "</tools>"
            )
        parts.append("</data>")
    parts.append("</event>")
    return "".join(parts)


@pandas_udf(T.StringType())
def _json_to_xml(doc_json: pd.Series) -> pd.Series:
    """Render the event JSON into the XML representation (Arrow batches)."""
    import json

    return doc_json.map(lambda j: xml_from_doc(json.loads(j)))


def render_xml(json_docs: DataFrame) -> DataFrame:
    """JSON_DOC frame → XML_DOC frame (same envelope, doc column is XML)."""
    return json_docs.withColumn("doc", _json_to_xml("doc"))
