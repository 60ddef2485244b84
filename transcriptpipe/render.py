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


def _member(col: Column, name: str) -> Column:
    """One rendered JSON object member ('"name":<value>') or null when the
    column is null. Composition trick: to_json of a one-field struct, outer
    braces stripped — byte-identical to the member inside a one-shot to_json
    (JSON is context-free), so the assembled doc stays byte-equal to the
    Python oracle's json.dumps."""
    j = F.to_json(F.struct(col.alias(name)))
    return F.when(col.isNotNull(), j.substr(F.lit(2), F.length(j) - 2))


def _doc_json(text_on: Column, norm_on: bool, data_on: bool,
              trimmed_attr: bool, with_norm: bool,
              text_limit: Column | None = None) -> Column:
    """Assemble the event doc JSON from member pieces. Member order mirrors
    oracle.doc_object: serial, time, text?, data?(+catch-all), norm?, error?,
    trimmed?. The catch-all ``extra`` map splices into the end of the data
    object (unknown record types appear in data{} under their lowercased
    name, ref lib/conv_buf.c:86-90). ``text_limit`` keeps only the first k
    text lines (the per-line trim)."""
    m_serial = F.coalesce(_member(F.col("serial"), "serial"), F.lit('"serial":null'))
    m_time = _member(F.col("time"), "time")
    texts_col = (
        F.slice(F.col("texts"), F.lit(1), text_limit)
        if text_limit is not None
        else F.col("texts")
    )
    m_text = F.when(text_on, _member(texts_col, "text"))

    data_json = _member(F.col("data"), "data")
    extra_body = F.to_json(F.col("extra"))
    extra_body = extra_body.substr(F.lit(2), F.length(extra_body) - 2)
    has_extra = F.col("extra").isNotNull() & (F.size(F.map_keys(F.col("extra"))) > 0)
    inner_empty = data_json == F.lit('"data":{}')
    spliced = F.concat(
        data_json.substr(F.lit(1), F.length(data_json) - 1),
        F.when(inner_empty, F.lit("")).otherwise(F.lit(",")),
        extra_body,
        F.lit("}"),
    )
    if data_on:
        m_data = F.when(has_extra, spliced).otherwise(data_json)
    else:
        m_data = F.lit(None).cast("string")

    m_norm = (
        _member(F.col("norm"), "norm") if (with_norm and norm_on) else F.lit(None).cast("string")
    )
    m_error = _member(F.col("error"), "error")
    m_trimmed = F.lit('"trimmed":true') if trimmed_attr else F.lit(None).cast("string")
    return F.concat(
        F.lit("{"),
        F.concat_ws(",", m_serial, m_time, m_text, m_data, m_norm, m_error, m_trimmed),
        F.lit("}"),
    )


def render_json(docs: DataFrame, max_doc_bytes: int | None = None,
                events_per_doc: int = 100, with_text: bool = True,
                with_norm: bool = False) -> DataFrame:
    """Assembled event frame → JSON_DOC sink frame.

    ``with_text=False`` still keeps text on errored events (the reference
    voids the text node only when no error occurred, conv_buf.c:663-667) —
    and the size estimate excludes text exactly when the doc excludes it."""
    df = docs.withColumn("time", F.date_format("min_ts", TIME_FMT))
    # turn-capped conversations (max_event_size analog) are trimmed by definition
    pre_trimmed = (
        F.coalesce(F.col("turn_capped"), F.lit(False))
        if "turn_capped" in df.columns
        else F.lit(False)
    )
    text_on = F.lit(with_text) | F.col("error").isNotNull()
    full = _doc_json(text_on, True, True, False, with_norm)
    no_text = _doc_json(F.lit(False), True, True, True, with_norm)
    no_norm = _doc_json(F.lit(False), False, True, True, with_norm)
    envelope = _doc_json(F.lit(False), False, False, True, with_norm)
    if max_doc_bytes is None:
        doc, trimmed = full, pre_trimmed
    else:
        cap = F.lit(max_doc_bytes)
        # materialize the full render ONCE as a column: the cascade and the
        # fit check then reference the string column instead of duplicating
        # the render tree. (Expression trees containing higher-order
        # functions get pulled into their own eagerly-evaluated projections
        # — round-3 measurement: the old per-row quadratic prefix-sum lambda
        # cost ~80s of the expr engine's 95s render at 1.1M turns.)
        df = df.withColumn("_full", full)
        full = F.col("_full")
        # per-line text trim (gbtree.c:468-553 analog; mirrors
        # oracle.max_text_lines byte-for-byte): k = max prefix of text lines
        # such that inserting the member into the no_text doc stays <= cap.
        # cum_costs is the NATIVE window cumsum computed in coalesce_events;
        # the budget derives from byte identities instead of rendering
        # no_text: octet(no_text) = octet(full) - (9 + cum_last) + 15
        # (whole-text-member insert cost is 9 + cum_last — the
        # oracle.max_text_lines arithmetic — and no_text adds
        # ',"trimmed":true' = 15 bytes), so
        # budget = cap - octet(no_text) = cap - octet(full) + cum_last - 6.
        cum = F.col("cum_costs")
        text_budget = (
            cap - F.octet_length(full)
            + F.coalesce(F.try_element_at(cum, F.lit(-1)), F.lit(0).cast("long"))
            - 6
        )
        partial_k = F.size(F.filter(cum, lambda p: p + 9 <= text_budget))
        partial = _doc_json(text_on, True, True, True, with_norm,
                            text_limit=partial_k)
        # strict lower bounds computed upstream (raw text / field-value bytes
        # can only inflate under JSON syntax+escaping), so an oversized doc is
        # detected WITHOUT rendering it — inverting aushape's format-then-cut
        # (notes.txt:242-246), which would make a megabyte conversation a
        # straggler: est > cap ⟹ rendered > cap, skip that render entirely.
        # errored docs carry no data section (P6), so field bytes don't count;
        # text bytes count only when the doc will carry text
        est_data = F.when(
            F.col("error").isNull(), F.coalesce(F.col("fields_bytes"), F.lit(0))
        ).otherwise(F.lit(0))
        est_text = F.when(text_on, F.coalesce(F.col("text_bytes"), F.lit(0))).otherwise(F.lit(0))
        est_full = est_text + est_data
        full_fits = (est_full <= cap) & (F.octet_length(full) <= cap)
        # priority trim (gbtree.c:555-606 analog): drop text, then norm,
        # then the data section
        doc = (
            F.when(full_fits, full)
            .when(text_on & (partial_k > 0)
                  & (F.octet_length(no_text) <= cap), partial)
            .when((est_data <= cap) & (F.octet_length(no_text) <= cap), no_text)
        )
        if with_norm:
            doc = doc.when((est_data <= cap) & (F.octet_length(no_norm) <= cap), no_norm)
        doc = doc.otherwise(envelope)
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
import re as _re

_XML_NEEDS_ESCAPE = _re.compile(r"[&<>\"'\x00-\x08\x0b\x0c\x0e-\x1f]")
_XML_HAS_CONTROL = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def xml_escape_str(s: str) -> str:
    # fast path: most strings need no escaping — one C-level regex scan.
    # Escaping strings take 5 chained C replaces (beats str.translate on the
    # short-string common case); the rare control chars translate after
    # (safe order: replacements introduce no control chars, & goes first).
    if _XML_NEEDS_ESCAPE.search(s) is None:
        return s
    s = (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )
    if _XML_HAS_CONTROL.search(s) is not None:
        s = s.translate(_XML_CONTROL)
    return s


# bounded memo for field/attr names — names come from the token grammar so
# they repeat massively; the cap keeps adversarial inputs from growing it
_NAME_CACHE: dict[str, str] = {}


def _xml_name(k: str) -> str:
    v = _NAME_CACHE.get(k)
    if v is None:
        v = xml_escape_str(k)
        if len(_NAME_CACHE) < 4096:
            _NAME_CACHE[k] = v
    return v


def _fields_xml(fields: dict, _srch=_XML_NEEDS_ESCAPE.search) -> str:
    out = []
    ap = out.append
    for k, v in fields.items():
        if len(v) == 1:  # single-value fast path (the vast majority)
            x = v[0]
            ap(f'<f name="{_xml_name(k)}"><v>'
               f'{x if _srch(x) is None else xml_escape_str(x)}</v></f>')
        else:
            vals = "".join(
                [f"<v>{x if _srch(x) is None else xml_escape_str(x)}</v>"
                 for x in v]
            )
            ap(f'<f name="{_xml_name(k)}">{vals}</f>')
    return "".join(out)


def xml_from_doc(e: dict, _srch=_XML_NEEDS_ESCAPE.search) -> str:
    """Event doc object -> XML string. Element layout mirrors
    lib/aushape.xsd: <event serial time [error] [trimmed]>
    <text><line/>*</text> <data><role>...</role>*</data> </event>."""
    attrs = f' serial="{e["serial"]}" time="{e["time"]}"'
    if e.get("error"):
        attrs += f' error="{xml_escape_str(e["error"])}"'
    if e.get("trimmed"):
        attrs += ' trimmed="true"'
    parts = [f"<event{attrs}>"]
    ap = parts.append
    texts = e.get("text")
    if texts is not None:
        ap("<text>")
        ap("".join(
            [f"<line>{t if _srch(t) is None else xml_escape_str(t)}</line>"
             if t is not None else "<line></line>" for t in texts]
        ))
        ap("</text>")
    data = e.get("data")
    if data is not None:
        ap("<data>")
        # generalized over data keys in document order, so catch-all roles
        # (unknown record types, disp_coll.c:191-228 analog) render too
        for key, v in data.items():
            if v is None:
                continue
            if key == "args":
                ap("<args>"
                   + "".join([f"<a>{xml_escape_str(a)}</a>" for a in v])
                   + "</args>")
            elif key == "tools":
                ap("<tools>"
                   + "".join([f"<t>{xml_escape_str(t)}</t>" for t in v])
                   + "</tools>")
            elif isinstance(v, dict):  # uniq-collected (system / catch-all)
                ap(f"<{key}>{_fields_xml(v)}</{key}>")
            else:  # rep / slot collected: one element per instance
                for item in v:
                    ap(f"<{key}>{_fields_xml(item)}</{key}>")
        ap("</data>")
    norm = e.get("norm")
    if norm is not None:
        ap("<norm>")
        for k, v in norm.items():
            vals = v if isinstance(v, list) else [v]
            ap(f'<f name="{_xml_name(k)}">'
               + "".join([f"<v>{xml_escape_str(str(x))}</v>" for x in vals])
               + "</f>")
        ap("</norm>")
    ap("</event>")
    return "".join(parts)


@pandas_udf(T.StringType())
def _json_to_xml(doc_json: pd.Series) -> pd.Series:
    """Render the event JSON into the XML representation (Arrow batches)."""
    import json

    return doc_json.map(lambda j: xml_from_doc(json.loads(j)))


def render_xml(json_docs: DataFrame) -> DataFrame:
    """JSON_DOC frame → XML_DOC frame (same envelope, doc column is XML)."""
    return json_docs.withColumn("doc", _json_to_xml("doc"))


# ------------------------------------------------------ pretty-print (F8) --

def dumps_folded(obj, fold_level: int, nest_indent: int = 4,
                 init_indent: int = 0, _level: int = 0) -> str:
    """JSON rendering with the reference's fold semantics
    (lib/gbuf.c:242-280 space_opening/space_closing; defaults
    lib/conf.c:183-190 fold_level=4 nest_indent=4): a node at nesting level
    <= fold_level starts on its own line indented
    ``init_indent + nest_indent * level`` spaces; anything deeper is folded
    into a single compact line. fold_level=0 == compact ("fold all");
    a huge fold_level == full unfold (byte-equal to json.dumps(indent=...)
    modulo the indent width)."""
    import json as _json

    if not isinstance(obj, (dict, list)) or not obj:
        return _json.dumps(obj, ensure_ascii=False, separators=(",", ":"))
    child = _level + 1
    if child > fold_level:  # children fold into one line (space_opening no-op)
        return _json.dumps(obj, ensure_ascii=False, separators=(",", ":"))
    pad = " " * (init_indent + nest_indent * child)
    close_pad = " " * (init_indent + nest_indent * _level)
    if isinstance(obj, dict):
        body = ",\n".join(
            f"{pad}{_json.dumps(k, ensure_ascii=False)}: "
            f"{dumps_folded(v, fold_level, nest_indent, init_indent, child)}"
            for k, v in obj.items()
        )
        return "{\n" + body + "\n" + close_pad + "}"
    body = ",\n".join(
        f"{pad}{dumps_folded(v, fold_level, nest_indent, init_indent, child)}"
        for v in obj
    )
    return "[\n" + body + "\n" + close_pad + "]"


def prettify_json(json_docs: DataFrame, indent: int = 2,
                  fold_level: int | None = None) -> DataFrame:
    """F8 fold/indent analog (reference --fold/--indent, lib/gbuf.c space
    helpers): re-render the doc column pretty-printed with `indent` spaces
    per nesting level. ``fold_level=None`` unfolds fully (reference
    --fold=none); an integer N unfolds only nesting levels <= N and keeps
    deeper structures on one line (the reference's intermediate fold
    levels, default 4 in lib/conf.c:183). A presentation-only pass over the
    sink — the canonical compact form stays the comparison target."""

    @pandas_udf(T.StringType())
    def pretty(doc: pd.Series) -> pd.Series:
        import json

        if fold_level is None:
            return doc.map(lambda j: json.dumps(json.loads(j),
                                                ensure_ascii=False,
                                                indent=indent))
        return doc.map(
            lambda j: dumps_folded(json.loads(j), fold_level, nest_indent=indent)
        )

    return json_docs.withColumn("doc", pretty("doc"))


def _fold_xml(x: str, fold_level: float, indent: int = 2) -> str:
    """XML fold with the reference's level semantics (gbuf.c:242-280): an
    element at nesting level <= fold_level starts on its own line; deeper
    elements stay inline. Closing tags take their own line exactly when
    their children were unfolded (space_closing: level+1 <= fold_level)."""
    import re as _re2

    out, depth = [], 0
    pad = " " * indent
    for tok in _re2.split(r"(<[^>]+>)", x):
        if not tok:
            continue
        if tok.startswith("</"):
            depth -= 1
            if depth + 1 <= fold_level:
                out.append("\n" + pad * depth + tok)
            else:
                out.append(tok)
        elif tok.startswith("<") and not tok.endswith("/>") and "</" not in tok:
            if depth <= fold_level:
                out.append("\n" + pad * depth + tok)
            else:
                out.append(tok)
            depth += 1
        else:
            out.append(tok)
    return "".join(out).lstrip("\n")


def prettify_xml(xml_docs: DataFrame, fold_level: int | None = None) -> DataFrame:
    """XML fold: one element per line up to ``fold_level`` (None = unfold
    fully, reference --fold=none), two-space nesting indent."""
    lvl = float("inf") if fold_level is None else fold_level

    @pandas_udf(T.StringType())
    def pretty(doc: pd.Series) -> pd.Series:
        return doc.map(lambda x: _fold_xml(x, lvl))

    return xml_docs.withColumn("doc", pretty("doc"))
