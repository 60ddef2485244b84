"""Coalesce stage — group turns into per-conversation event documents.

This is THE core operator (SURVEY.md §2.4 A1): the analog of aushape
coalescing all records that share a serial into one event object
(/root/reference/lib/conv_buf.c:355-709). The collector semantics map as:

* uniq collector  (lib/uniq_coll.c)  → ``system`` must appear at most once,
  else REPEATED_RECORD at the duplicate's turn
* rep collector   (lib/rep_coll.c)   → ``user``/``assistant``/``tool_call``
  collect into arrays in turn order
* path collector  (lib/path_coll.c)  → ``tool_result`` rows carry ``item=N``
  slots, placed by slot regardless of arrival order; holes/dups → INVALID_PATH
* execve collector(lib/execve_coll.c)→ ``aN`` / ``aN_len`` / ``aN[j]`` tokens
  across the conversation's tool_call turns reassemble into an args array,
  hex slices concatenated in slice order and decoded; argc/len mismatch →
  INVALID_EXECVE
* drop collector  (lib/drop_coll.c)  → ``EOE`` rows appear in text[] but
  contribute nothing to data

Execution shape — ONE shuffle total:

The whole coalesce is a single ``groupBy(conv_id)`` collecting one
turn-sorted struct array per conversation; every collector INCLUDING the
execve arg reassembly is then pure Catalyst array/lambda expressions over
that array (no second shuffle, no explode branch, no join-back, no Python).
Per-group state is bounded by the turn cap applied upstream (pipeline.py),
so a hot conversation cannot OOM an executor at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import schemas


def _cmp_by(name: str):
    """array_sort comparator over struct arrays keyed by one int field
    (structs containing MapType are not orderable, so plain array_sort
    would fail analysis). Nulls sort first."""

    def cmp(l: Column, r: Column) -> Column:  # noqa: E741
        a, b = l[name], r[name]
        return (
            F.when(a.isNull() & b.isNull(), F.lit(0))
            .when(a.isNull(), F.lit(-1))
            .when(b.isNull(), F.lit(1))
            .when(a < b, F.lit(-1))
            .when(a > b, F.lit(1))
            .otherwise(F.lit(0))
        )

    return cmp


def coalesce_events(parsed: DataFrame) -> DataFrame:
    """The one shuffle: per conversation, a turn-ordered array of everything.

    Expects columns: conv_id, turn_idx, role_name, text, fields, keys, vals,
    item_idx, tool_name, ts, row_error.
    """
    turn = F.struct(
        "turn_idx", "role_name", "text", "fields",
        "item_idx", "tool_name", "row_error",
    )
    return parsed.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(turn), _cmp_by("turn_idx")).alias("turns"),
        F.min("ts").alias("min_ts"),
        F.count("*").cast("int").alias("n_turns"),
        # strict lower bounds on rendered sizes (see render.py trim skip)
        F.sum(F.octet_length("text")).alias("text_bytes"),
        F.sum("vals_bytes").alias("fields_bytes"),
    )


def coalesce_events_raw(enriched: DataFrame) -> DataFrame:
    """Fast-path A1 aggregation: shuffle RAW turns only (turn_idx, role_name,
    text, tool, tool_name) — tokenization happens downstream in the Arrow
    stage (arrow_docs), so the exchange carries ~half the bytes of the
    pre-parsed variant and the struct is fully orderable (plain array_sort,
    no comparator lambda). Expects enrich_roles/enrich_tools applied.
    """
    turn = F.struct("turn_idx", "role_name", "text", "tool", "tool_name")
    return enriched.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(turn)).alias("turns"),
        F.min("ts").alias("min_ts"),
        F.count("*").cast("int").alias("n_turns"),
    )


ARG_KEY_ANY = r"^a\d+(_len)?$|^a\d+\[\d+\]$"
ARG_IDX_RE = r"^a(\d+)"
SLICE_IDX_RE = r"^a\d+\[(\d+)\]$"


def _args_and_error(turns: Column) -> tuple[Column, Column]:
    """EXECVE-style arg reassembly (A5) as pure array expressions.

    Token stream = every aN / aN_len / aN[j] / argc entry across the
    conversation's tool_call turns, read from the per-turn fields map (so a
    duplicate key within one turn deduplicates LAST_WIN — the map semantics
    of the parse stage). Mirrors the end-of-event validation of
    /root/reference/lib/execve_coll.c:519-577.
    """
    tc = F.filter(turns, lambda t: t["role_name"] == "tool_call")
    entries = F.flatten(
        F.transform(tc, lambda t: F.transform(
            F.map_entries(t["fields"]),
            lambda e: F.struct(
                e["key"].alias("k"), F.try_element_at(e["value"], F.lit(1)).alias("v")
            ),
        ))
    )
    argc_vals = F.transform(
        F.filter(entries, lambda e: e["k"] == "argc"),
        lambda e: e["v"].try_cast("int"),
    )
    argc_decl = F.array_max(F.filter(argc_vals, lambda x: x.isNotNull()))
    has_any = (F.size(F.filter(entries, lambda e: e["k"].rlike(ARG_KEY_ANY))) > 0) | (
        F.size(argc_vals) > 0
    )

    arg_entries = F.filter(entries, lambda e: e["k"].rlike(ARG_KEY_ANY))
    idxs = F.array_sort(
        F.array_distinct(
            F.transform(
                arg_entries,
                lambda e: F.regexp_extract(e["k"], ARG_IDX_RE, 1).try_cast("int"),
            )
        )
    )

    def per_arg(ii: Column) -> Column:
        i = ii.cast("string")
        whole = F.filter(arg_entries, lambda e: e["k"] == F.concat(F.lit("a"), i))
        lens = F.filter(
            arg_entries, lambda e: e["k"] == F.concat(F.lit("a"), i, F.lit("_len"))
        )
        decl = F.array_max(
            F.filter(
                F.transform(lens, lambda e: e["v"].try_cast("int")),
                lambda x: x.isNotNull(),
            )
        )
        slices = F.array_sort(
            F.transform(
                F.filter(
                    arg_entries,
                    lambda e: e["k"].startswith(F.concat(F.lit("a"), i, F.lit("["))),
                ),
                lambda e: F.struct(
                    F.regexp_extract(e["k"], SLICE_IDX_RE, 1)
                    .try_cast("int")
                    .alias("si"),
                    e["v"].alias("v"),
                ),
            ),
            _cmp_by("si"),
        )
        n_sl = F.size(slices)
        sidx = F.transform(slices, lambda s: s["si"])
        hexcat = F.array_join(F.transform(slices, lambda s: s["v"]), "")
        decoded = F.when(F.length(hexcat) % 2 == 0, F.unhex(hexcat).cast("string"))
        solid = (
            (F.array_min(sidx) == 0)
            & (F.array_max(sidx) == n_sl - 1)
            & (F.size(F.array_distinct(sidx)) == n_sl)
        )
        whole_ok = (F.size(whole) == 1) & (n_sl == 0) & decl.isNull()
        slice_ok = (
            (F.size(whole) == 0)
            & (n_sl > 0)
            & solid
            & decoded.isNotNull()
            & (decl.isNull() | (F.octet_length(decoded) == decl))
        )
        val = (
            F.when(F.size(whole) == 1, F.try_element_at(whole, F.lit(1))["v"])
            .when(n_sl > 0, decoded)
        )
        return F.struct(val.alias("arg"), (~(whole_ok | slice_ok)).alias("bad"))

    arg_structs = F.transform(idxs, per_arg)
    n_args = F.size(idxs)
    solid = (n_args == 0) | (
        ~F.exists(idxs, lambda x: x.isNull())
        & (F.array_min(idxs) == 0)
        & (F.array_max(idxs) == n_args - 1)
    )
    any_bad = F.exists(arg_structs, lambda s: s["bad"])
    argc_ok = argc_decl.isNull() | (argc_decl == n_args)
    valid = solid & ~any_bad & argc_ok

    args = F.when(
        has_any & valid, F.transform(arg_structs, lambda s: s["arg"])
    )
    err = F.when(has_any & ~valid, F.lit(schemas.ERR_INVALID_EXECVE))
    return args, err


def assemble_docs(coalesced: DataFrame) -> DataFrame:
    """All collector assembly + validation over the sorted turns array.

    Error precedence (documented spec, mirroring aushape's first-error-latch
    lib/conv.c:87-141 where add-time errors precede end-of-event validation):
    add-time (PARSE_FAIL/INVALID_HEX/UNKNOWN_TOOL/REPEATED_RECORD, earliest
    turn first, code as tiebreak) → INVALID_EXECVE → INVALID_PATH.
    """
    turns = F.col("turns")

    texts = F.transform(turns, lambda t: t["text"])

    # ---- add-time errors
    first_row_err = F.try_element_at(
        F.filter(turns, lambda t: t["row_error"].isNotNull()), F.lit(1)
    )
    sys_arr = F.filter(turns, lambda t: t["role_name"] == "system")
    rep_turn = F.when(F.size(sys_arr) > 1, F.try_element_at(sys_arr, F.lit(2))["turn_idx"])
    fe_t, fe_c = first_row_err["turn_idx"], first_row_err["row_error"]
    rep_c = F.lit(schemas.ERR_REPEATED_RECORD)
    add_err = (
        F.when(fe_t.isNull() & rep_turn.isNull(), F.lit(None).cast("string"))
        .when(rep_turn.isNull(), fe_c)
        .when(fe_t.isNull(), rep_c)
        .when(fe_t < rep_turn, fe_c)
        .when(fe_t > rep_turn, rep_c)
        .otherwise(F.least(fe_c, rep_c))
    )

    # ---- execve collector
    args, execve_err = _args_and_error(turns)

    # ---- path collector (ordered slots)
    results = F.array_sort(
        F.filter(turns, lambda t: t["role_name"] == schemas.SLOT_ROLE),
        _cmp_by("item_idx"),
    )
    item_idxs = F.transform(results, lambda t: t["item_idx"])
    n_items = F.size(results)
    path_ok = (n_items == 0) | (
        ~F.exists(item_idxs, lambda x: x.isNull())
        & (F.array_min(item_idxs) == 0)
        & (F.array_max(item_idxs) == n_items - 1)
        & (F.size(F.array_distinct(item_idxs)) == n_items)
    )
    path_err = F.when(~path_ok, F.lit(schemas.ERR_INVALID_PATH))

    error = F.coalesce(add_err, execve_err, path_err)

    def role_fields(role: str) -> Column:
        arr = F.transform(
            F.filter(turns, lambda t: t["role_name"] == role), lambda t: t["fields"]
        )
        return F.when(F.size(arr) > 0, arr)

    tools = F.array_distinct(
        F.transform(
            F.filter(turns, lambda t: t["tool_name"].isNotNull()),
            lambda t: t["tool_name"],
        )
    )

    data = F.struct(
        F.when(F.size(sys_arr) == 1, F.try_element_at(sys_arr, F.lit(1))["fields"]).alias("system"),
        role_fields("user").alias("user"),
        role_fields("assistant").alias("assistant"),
        role_fields("tool_call").alias("tool_call"),
        F.when(n_items > 0, F.transform(results, lambda t: t["fields"])).alias("tool_result"),
        args.alias("args"),
        F.when(F.size(tools) > 0, tools).alias("tools"),
    )

    # per-row errors for the error sink, carried on the doc row so the sink
    # fan-out never re-parses the input (one pass, persist docs only)
    row_errs = F.transform(
        F.filter(turns, lambda t: t["row_error"].isNotNull()),
        lambda t: F.struct(
            t["turn_idx"].alias("turn_idx"),
            t["row_error"].alias("error_code"),
            t["text"].alias("text"),
        ),
    )

    return coalesced.select(
        "conv_id",
        F.regexp_extract("conv_id", r"(\d+)$", 1).try_cast("long").alias("serial"),
        "min_ts",
        "n_turns",
        texts.alias("texts"),
        # P6 error demotion (conv_buf.c:627-648): on error void data, keep text
        F.when(error.isNull(), data).alias("data"),
        error.alias("error"),
        row_errs.alias("row_errs"),
        "text_bytes",
        "fields_bytes",
    )
