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
from .parse import strict_int


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

    Also computes the per-turn cumulative text-line render cost (the
    prefix-sum the per-line trim needs) with a NATIVE window cumsum over the
    same conv_id clustering the groupBy uses — one exchange serves both.
    Round 3: the prefix sum used to be an F.aggregate lambda building an
    array per element at render time; Spark pulls higher-order-function
    lambdas into their own eagerly-evaluated projection, so every row paid
    the quadratic scan (~80s of the expr engine's 95s render at 1.1M turns).
    """
    from pyspark.sql.window import Window

    # cost of inserting this text line into the JSON text member:
    # escaped length + 1 (comma/bracket) — mirrors oracle.max_text_lines
    line_cost = (
        F.octet_length(F.to_json(F.array(F.col("text")))) - 2 + 1
    ).cast("long")
    # ROWS frame pinned explicitly: the default frame for an ordered window
    # is RANGE, which gives tied orderBy values the same running sum — a
    # duplicate turn_idx would then break the strict per-row prefix sum the
    # per-line trim arithmetic assumes. (conv_id, turn_idx) is the declared
    # input key (schemas.TRANSCRIPTS; pipeline.check_unique_turns), but the
    # frame is pinned anyway so schema-legal-but-contract-violating input
    # degrades to a well-defined prefix sum instead of tied buckets.
    w = (
        Window.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parsed = parsed.withColumn("cum_cost", F.sum(line_cost).over(w))
    turn = F.struct(
        "turn_idx", "role_name", "text", "fields",
        "item_idx", "tool_name", "row_error", "cum_cost",
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
        lambda e: strict_int(e["v"]),
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
                F.transform(lens, lambda e: strict_int(e["v"])),
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
        # make_valid_utf8: same U+FFFD replacement as the Python engines'
        # bytes.decode(errors="replace") — see parse._decode_hex (ADVICE r3)
        decoded = F.when(
            F.length(hexcat) % 2 == 0,
            F.make_valid_utf8(F.unhex(hexcat).cast("string")),
        )
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

    The role→collector dispatch is driven by schemas.COLLECTORS (U1 registry,
    ref lib/conv_buf.c:60-96); roles absent from the registry fall through to
    the catch-all uniq collector (ref disp_coll.c:191-228): their fields land
    in the ``extra`` map under the lowercased role name and a repeat raises
    REPEATED_RECORD exactly like a duplicate ``system`` record.
    """
    registered = list(schemas.COLLECTORS)
    turns = F.col("turns")

    texts = F.col("turns")["text"]  # native array-field extraction, no lambda

    # ---- add-time errors
    first_row_err = F.try_element_at(
        F.filter(turns, lambda t: t["row_error"].isNotNull()), F.lit(1)
    )
    sys_arr = F.filter(turns, lambda t: t["role_name"] == "system")

    # uniq-collected turns = registered uniq roles + catch-all (unregistered);
    # dedup key is the role (lowercased for catch-all, matching the reference
    # lowercasing record type names). First duplicate's turn_idx latches.
    def _is_uniq(t: Column) -> Column:
        return t["role_name"].isin(schemas.UNIQ_ROLES) | ~t["role_name"].isin(registered)

    def _uniq_key(t: Column) -> Column:
        return F.when(
            t["role_name"].isin(registered), t["role_name"]
        ).otherwise(F.lower(t["role_name"]))

    uniq_turns = F.filter(turns, lambda t: _is_uniq(t) & t["role_name"].isNotNull())
    uniq_keys = F.transform(uniq_turns, _uniq_key)
    dup_turns = F.filter(
        uniq_turns,
        lambda t, i: F.array_contains(
            F.coalesce(F.slice(uniq_keys, F.lit(1), i), F.array()), _uniq_key(t)
        ),
    )
    rep_turn = F.array_min(F.transform(dup_turns, lambda t: t["turn_idx"]))

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

    # ---- data struct built FROM the registry (U1: a new record type is a
    # registry entry, not an edit here)
    data_fields = []
    for role, coll in schemas.COLLECTORS.items():
        if coll == schemas.COLL_UNIQ:
            # NB: a default-arg lambda has two params, which F.filter treats
            # as (element, index) — use a closure factory instead
            def _eq_role(r):
                return lambda t: t["role_name"] == r

            arr = F.filter(turns, _eq_role(role))
            data_fields.append(
                F.when(F.size(arr) == 1, F.try_element_at(arr, F.lit(1))["fields"])
                .alias(role)
            )
        elif coll == schemas.COLL_REP:
            data_fields.append(role_fields(role).alias(role))
        elif coll == schemas.COLL_SLOT:
            data_fields.append(
                F.when(n_items > 0, F.transform(results, lambda t: t["fields"]))
                .alias(role)
            )
        # drop: contributes nothing
    data_fields.append(args.alias("args"))
    data_fields.append(F.when(F.size(tools) > 0, tools).alias("tools"))
    data = F.struct(*data_fields)

    # catch-all entries (appended after args/tools in the rendered data{});
    # lowercased names colliding with a registered role are excluded. Repeats
    # can only survive to here under a latched error (data voided), so the
    # LAST_WIN map dedup never affects rendered output.
    extra_turns = F.filter(
        turns,
        lambda t: t["role_name"].isNotNull()
        & ~t["role_name"].isin(registered)
        & ~F.lower(t["role_name"]).isin(registered),
    )
    extra = F.map_from_entries(
        F.transform(
            extra_turns,
            lambda t: F.struct(
                F.lower(t["role_name"]).alias("key"), t["fields"].alias("value")
            ),
        )
    )

    # ---- normalization section (--with-norm analog; field table mirrors
    # /root/reference/lib/conv_buf.c:185-353 — see oracle.norm_object)
    user_arr = F.filter(turns, lambda t: t["role_name"] == "user")
    tc_arr = F.filter(turns, lambda t: t["role_name"] == "tool_call")
    n_users = F.size(user_arr)

    def _msg_of(t: Column) -> Column:
        return F.try_element_at(F.try_element_at(t["fields"], F.lit("msg")), F.lit(1))

    sys_keys = F.when(
        F.size(sys_arr) == 1,
        F.map_keys(F.try_element_at(sys_arr, F.lit(1))["fields"]),
    )
    serial = F.regexp_extract("conv_id", r"(\d+)$", 1).try_cast("long")
    n_args = F.size(args)
    norm = F.struct(
        F.when(F.size(tc_arr) > 0, F.lit("tool_use")).otherwise("dialogue").alias("event_kind"),
        serial.alias("session"),
        F.when(n_users > 0, F.lit("user"))
        .otherwise(F.try_element_at(turns, F.lit(1))["role_name"])
        .alias("subject_kind"),
        F.when(n_users > 0, _msg_of(F.try_element_at(user_arr, F.lit(1)))).alias("subject_primary"),
        F.when(n_users >= 2, _msg_of(F.try_element_at(user_arr, F.lit(-1)))).alias("subject_secondary"),
        F.when(F.size(sys_keys) > 0, sys_keys).alias("subject_attrs"),
        F.when(F.size(tc_arr) > 0, F.lit("call")).otherwise("converse").alias("action"),
        F.when(n_args > 0, F.lit("tool_args")).alias("object_kind"),
        F.try_element_at(args, F.lit(1)).alias("object_primary"),
        F.try_element_at(args, F.lit(2)).alias("object_secondary"),
        F.try_element_at(args, F.lit(3)).alias("object_primary2"),
        F.when(n_args > 3, F.slice(args, F.lit(4), n_args - 3)).alias("object_attrs"),
        n_items.alias("result"),
        F.try_element_at(
            F.filter(turns, lambda t: t["tool_name"].isNotNull()), F.lit(1)
        )["tool_name"].alias("how"),
        F.col("conv_id").alias("key"),
    )

    # a "record" is a turn that contributed parsed fields; zero records and
    # no error ⇒ the conversation emits nothing (P2, conv_buf.c:570-574)
    n_records = F.size(F.filter(turns, lambda t: F.size(t["fields"]) > 0))

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

    return coalesced.filter(error.isNotNull() | (n_records > 0)).select(
        "conv_id",
        serial.alias("serial"),
        "min_ts",
        "n_turns",
        texts.alias("texts"),
        # per-line cumulative render costs, turn-sorted (native array-field
        # extraction, no lambda) — consumed by render_json's partial trim
        F.col("turns")["cum_cost"].alias("cum_costs"),
        # P6 error demotion (conv_buf.c:627-648): on error void data, keep text
        F.when(error.isNull(), data).alias("data"),
        F.when(error.isNull(), extra).alias("extra"),
        norm.alias("norm"),
        error.alias("error"),
        row_errs.alias("row_errs"),
        "text_bytes",
        "fields_bytes",
    )
