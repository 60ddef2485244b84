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

Execution shape (scale notes):

* ONE shuffle of the fact table on ``conv_id`` for the main aggregation; all
  per-group assembly is Catalyst array/struct expressions (collect_list +
  array_sort with comparators) — zero Python in the hot path.
* The args branch explodes only tool_call field entries (a small fraction of
  rows), aggregates per (conv_id, arg_idx) then per conv_id, and joins back
  on conv_id. Both sides are hash-partitioned on conv_id; AQE picks the join
  strategy and the branch frame is tiny relative to the input.
* Hot-conversation skew is defused in pipeline.py via a per-conv turn cap
  (see cap_turns) before the wide agg — the salted two-phase variant for
  unbounded groups lives there too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import schemas


def _by_first_int(name: str) -> Column:
    """array_sort comparator over struct arrays whose first field is int.

    Needed because structs containing MapType are not orderable, so plain
    array_sort(array<struct<int, map>>) would fail analysis.
    """

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


def _collect_role(role: str) -> Column:
    """Turn-ordered list of field maps for one role (rep collector)."""
    lst = F.collect_list(
        F.when(F.col("role_name") == role, F.struct("turn_idx", "fields"))
    )
    return lst


ARG_KEY_RE = r"^a(\d+)(?:(_len)|\[(\d+)\])?$"


def reassemble_args(parsed: DataFrame) -> DataFrame:
    """EXECVE-style arg reassembly branch (A5). Returns one row per conv_id
    that has any tool_call arg/argc tokens: (conv_id, args array<string>,
    execve_error string|null).

    Mirrors the state machine of lib/execve_coll.c:27-577 as relational ops:
    explode the kv entries, classify by key shape, slice-sort + concat + hex
    decode per arg, then validate argc/arity/length at the end
    (execve_coll.c:519-577's end check).
    """
    ent = (
        parsed.filter(F.col("role_name") == "tool_call")
        .select("conv_id", F.explode(F.map_from_arrays("keys", "vals")).alias("key", "val"))
        .filter(F.col("key").rlike(r"^(a\d+(_len)?|a\d+\[\d+\]|argc)$"))
    )
    ent = ent.select(
        "conv_id",
        "key",
        "val",
        F.regexp_extract("key", ARG_KEY_RE, 1).try_cast("int").alias("arg_idx"),
        F.when(F.col("key") == "argc", F.lit("argc"))
        .when(F.col("key").rlike(r"^a\d+$"), F.lit("whole"))
        .when(F.col("key").rlike(r"^a\d+_len$"), F.lit("len"))
        .otherwise(F.lit("slice"))
        .alias("kind"),
        F.regexp_extract("key", ARG_KEY_RE, 3).try_cast("int").alias("slice_idx"),
    )

    per_arg = (
        ent.filter(F.col("kind") != "argc")
        .groupBy("conv_id", "arg_idx")
        .agg(
            F.max(F.when(F.col("kind") == "whole", F.col("val"))).alias("whole_val"),
            F.count(F.when(F.col("kind") == "whole", 1)).alias("n_whole"),
            F.max(F.when(F.col("kind") == "len", F.col("val").try_cast("int"))).alias("decl_len"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("kind") == "slice", F.struct("slice_idx", "val"))
                )
            ).alias("slices"),
        )
    )
    slice_idxs = F.transform("slices", lambda s: s["slice_idx"])
    hexcat = F.concat_ws(
        "", F.transform("slices", lambda s: s["val"])
    )
    decoded = F.when(
        F.length(hexcat) % 2 == 0, F.unhex(hexcat).cast("string")
    )
    n_slices = F.size("slices")
    slices_solid = (n_slices == 0) | (
        (F.array_min(slice_idxs) == 0)
        & (F.array_max(slice_idxs) == n_slices - 1)
        & (F.size(F.array_distinct(slice_idxs)) == n_slices)
    )
    per_arg = per_arg.select(
        "conv_id",
        "arg_idx",
        F.when(F.col("n_whole") == 1, F.col("whole_val"))
        .when(n_slices > 0, decoded)
        .alias("arg"),
        (
            # exactly one representation, decodable, solid, and matching the
            # declared byte length when one was given
            ~(
                ((F.col("n_whole") == 1) & (n_slices == 0) & F.col("decl_len").isNull())
                | (
                    (F.col("n_whole") == 0)
                    & (n_slices > 0)
                    & slices_solid
                    & decoded.isNotNull()
                    & (
                        F.col("decl_len").isNull()
                        | (F.octet_length(decoded) == F.col("decl_len"))
                    )
                )
            )
        ).alias("arg_bad"),
    )

    argc = (
        ent.filter(F.col("kind") == "argc")
        .groupBy("conv_id")
        .agg(F.max(F.col("val").try_cast("int")).alias("argc_decl"),
             F.count("*").alias("n_argc_tokens"))
    )

    per_conv = (
        per_arg.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("arg_idx", "arg", "arg_bad")),
                _by_first_int("arg_idx"),
            ).alias("arg_structs"),
        )
        .join(argc, "conv_id", "full")
    )
    # a conversation may declare argc but carry no aN tokens at all
    per_conv = per_conv.withColumn(
        "arg_structs",
        F.coalesce(
            "arg_structs",
            F.expr("cast(array() as array<struct<arg_idx:int,arg:string,arg_bad:boolean>>)"),
        ),
    )
    idxs = F.transform("arg_structs", lambda s: s["arg_idx"])
    n_args = F.size("arg_structs")
    solid = (n_args == 0) | (
        (F.array_min(idxs) == 0)
        & (F.array_max(idxs) == n_args - 1)
        & (F.size(F.array_distinct(idxs)) == n_args)
    )
    any_bad = F.exists("arg_structs", lambda s: s["arg_bad"])
    argc_ok = F.col("argc_decl").isNull() | (F.col("argc_decl") == n_args)
    valid = solid & ~any_bad & argc_ok
    return per_conv.select(
        "conv_id",
        F.when(valid, F.transform("arg_structs", lambda s: s["arg"])).alias("args"),
        F.when(~valid, F.lit(schemas.ERR_INVALID_EXECVE)).alias("execve_error"),
    )


def coalesce_events(parsed: DataFrame) -> DataFrame:
    """Main A1 aggregation: one row per conversation with assembled data.

    Expects columns: conv_id, turn_idx, role_name, text, fields, item_idx,
    tool_name, ts, row_error.
    """
    by_turn = _by_first_int("turn_idx")
    by_item = _by_first_int("item_idx")

    agg = parsed.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("_texts"),
        F.min("ts").alias("min_ts"),
        F.count("*").cast("int").alias("n_turns"),
        F.min(
            F.when(F.col("row_error").isNotNull(), F.struct("turn_idx", "row_error"))
        ).alias("_row_err"),
        F.array_sort(_collect_role("system"), by_turn).alias("_sys"),
        F.array_sort(_collect_role("user"), by_turn).alias("_user"),
        F.array_sort(_collect_role("assistant"), by_turn).alias("_assistant"),
        F.array_sort(_collect_role("tool_call"), by_turn).alias("_tool_call"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("role_name") == schemas.SLOT_ROLE,
                    F.struct("item_idx", "turn_idx", "fields"),
                )
            ),
            by_item,
        ).alias("_result"),
        F.array_distinct(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("tool_name").isNotNull(),
                            F.struct("turn_idx", "tool_name"),
                        )
                    )
                ),
                lambda s: s["tool_name"],
            )
        ).alias("tools"),
    )

    # ---- add-time errors: earliest of row errors and REPEATED_RECORD at the
    # duplicate system row's turn (uniq_coll.c:151-153 fires on add).
    rep_err = F.when(
        F.size("_sys") > 1,
        F.struct(
            F.element_at("_sys", 2)["turn_idx"].alias("turn_idx"),
            F.lit(schemas.ERR_REPEATED_RECORD).alias("row_error"),
        ),
    )
    add_err = F.array_min(
        F.filter(F.array(F.col("_row_err"), rep_err), lambda x: x.isNotNull())
    )

    # ---- PATH solidity (path_coll.c:231-233): slots 0..n-1, no holes/dups,
    # every tool_result row must carry an item index.
    item_idxs = F.transform("_result", lambda s: s["item_idx"])
    n_items = F.size("_result")
    path_ok = (n_items == 0) | (
        ~F.exists(item_idxs, lambda x: x.isNull())
        & (F.array_min(item_idxs) == 0)
        & (F.array_max(item_idxs) == n_items - 1)
        & (F.size(F.array_distinct(item_idxs)) == n_items)
    )

    agg = agg.select(
        "*",
        add_err["row_error"].alias("_add_err_code"),
        F.when(~path_ok, F.lit(schemas.ERR_INVALID_PATH)).alias("_path_err"),
    )
    return agg


def assemble_docs(coalesced: DataFrame, args: DataFrame) -> DataFrame:
    """Join the args branch back, settle the final error, build the doc struct.

    Error precedence (documented spec, mirroring aushape's first-error-latch
    lib/conv.c:87-141 where add-time errors precede end-of-event validation):
    add-time (PARSE_FAIL/INVALID_HEX/UNKNOWN_TOOL/REPEATED_RECORD, earliest
    turn first) → INVALID_EXECVE → INVALID_PATH.
    """
    df = coalesced.join(args, "conv_id", "left")
    error = F.coalesce("_add_err_code", "execve_error", "_path_err")

    def _nonempty(c: Column) -> Column:
        return F.when(F.size(c) > 0, c)

    data = F.struct(
        F.when(F.size("_sys") == 1, F.element_at("_sys", 1)["fields"]).alias("system"),
        _nonempty(F.transform("_user", lambda s: s["fields"])).alias("user"),
        _nonempty(F.transform("_assistant", lambda s: s["fields"])).alias("assistant"),
        _nonempty(F.transform("_tool_call", lambda s: s["fields"])).alias("tool_call"),
        _nonempty(F.transform("_result", lambda s: s["fields"])).alias("tool_result"),
        F.col("args"),
        _nonempty(F.col("tools")).alias("tools"),
    )

    return df.select(
        "conv_id",
        F.regexp_extract("conv_id", r"(\d+)$", 1).try_cast("long").alias("serial"),
        "min_ts",
        "n_turns",
        F.transform("_texts", lambda s: s["text"]).alias("texts"),
        # P6 error demotion (conv_buf.c:627-648): on error void data, keep text
        F.when(error.isNull(), data).alias("data"),
        error.alias("error"),
    )
