"""Single-process reference oracle (SURVEY.md §5.2.2).

A deliberately boring pure-Python implementation of the same
parse → enrich → coalesce → route semantics, mirroring the reference's
one-pass-per-event model (aushape touches each event once, in order —
/root/reference/lib/conv.c:72-173). Tests compare the Spark pipeline's output
to this row-for-row; it stands in for auparse/aushape as the independent
implementation.

No Spark imports here — dicts/lists/regex only.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from . import schemas, synth

TOKEN_RE = re.compile(r'([A-Za-z_][A-Za-z0-9_]*(?:\[\d+\])?)=("(?:[^"\\]|\\.)*"|\S+)')
ARG_KEY_RE = re.compile(r"^a(\d+)(?:(_len)|\[(\d+)\])?$")
UNESCAPE_RE = re.compile(r"\\(.)")

ROLE_MAP = {r["role_code"]: r["role_name"] for r in synth.role_dict_rows()}
TOOL_MAP = {t["tool_code"]: t["tool_name"] for t in synth.tool_dict_rows()}


def unquote(v: str) -> str:
    if len(v) >= 2 and v.startswith('"') and v.endswith('"'):
        return UNESCAPE_RE.sub(r"\1", v[1:-1])
    return v


def decode_hex(v: str) -> str | None:
    if len(v) % 2 != 0:
        return None
    try:
        return bytes.fromhex(v).decode("utf-8", errors="replace")
    except ValueError:
        return None


def try_int(v: str) -> int | None:
    try:
        return int(v)
    except (ValueError, TypeError):
        return None


@dataclass
class ParsedTurn:
    conv_id: str
    turn_idx: int
    role: str          # canonical after enrichment
    text: str
    tool: str | None
    tool_name: str | None
    ts: object
    keys: list = field(default_factory=list)
    vals: list = field(default_factory=list)
    fields: dict = field(default_factory=dict)  # key -> [interpreted, raw?]
    item_idx: int | None = None
    row_error: str | None = None


def parse_text(text: str):
    """Tokenize one turn's text. Returns (keys, vals, fields, item_idx,
    text_error) — the pure F5-F7/F9 part, shared by parse_turn and the
    Arrow fast path (arrow_docs)."""
    keys, vals = [], []
    for m in TOKEN_RE.finditer(text):
        keys.append(m.group(1))
        vals.append(unquote(m.group(2)))
    fields = {}
    for k, v in zip(keys, vals):
        if k == "hex":
            d = decode_hex(v)
            fields[k] = [v] if d is None else [d, v]
        else:
            fields[k] = [v]
    kv = dict(zip(keys, vals))
    text_error = None
    if not keys and text.strip():
        text_error = schemas.ERR_PARSE_FAIL
    elif "hex" in kv and decode_hex(kv["hex"]) is None:
        text_error = schemas.ERR_INVALID_HEX
    return keys, vals, fields, try_int(kv.get("item")), text_error


def parse_turn(row: dict) -> ParsedTurn:
    text = row["text"] or ""
    keys, vals, fields, item_idx, row_error = parse_text(text)

    role = ROLE_MAP.get(row["role"], row["role"])
    tool = row.get("tool")
    tool_name = TOOL_MAP.get(tool) if tool else None
    if row_error is None and tool is not None and tool_name is None:
        row_error = schemas.ERR_UNKNOWN_TOOL
    return ParsedTurn(
        conv_id=row["conv_id"], turn_idx=row["turn_idx"], role=role,
        text=text, tool=tool, tool_name=tool_name, ts=row["ts"],
        keys=keys, vals=vals, fields=fields,
        item_idx=item_idx, row_error=row_error,
    )


def reassemble_args(turns: list[ParsedTurn]):
    """Mirror of coalesce.reassemble_args — returns (args|None, error|None, seen)."""
    whole: dict[int, list[str]] = {}
    lens: dict[int, list[int | None]] = {}
    slices: dict[int, list[tuple[int, str]]] = {}
    argc_vals: list[int | None] = []
    seen_any = False
    for t in turns:
        if t.role != "tool_call":
            continue
        # per-turn LAST_WIN dedup matches the parse stage's map semantics
        for k, v in dict(zip(t.keys, t.vals)).items():
            if k == "argc":
                argc_vals.append(try_int(v))
                seen_any = True
                continue
            m = ARG_KEY_RE.match(k)
            if not m:
                continue
            seen_any = True
            idx = int(m.group(1))
            if m.group(2):  # _len
                lens.setdefault(idx, []).append(try_int(v))
            elif m.group(3) is not None:  # slice
                slices.setdefault(idx, []).append((int(m.group(3)), v))
            else:
                whole.setdefault(idx, []).append(v)
    if not seen_any:
        return None, None, False

    all_idxs = sorted(set(whole) | set(lens) | set(slices))
    args, any_bad = [], False
    for idx in all_idxs:
        w = whole.get(idx, [])
        sl = sorted(slices.get(idx, []))
        decl = max((x for x in lens.get(idx, []) if x is not None), default=None)
        if len(w) == 1 and not sl and decl is None:
            args.append(max(w))
            continue
        if not w and sl:
            idxs = [i for i, _ in sl]
            solid = idxs == list(range(len(sl)))
            decoded = decode_hex("".join(v for _, v in sl))
            ok = (
                solid
                and decoded is not None
                and (decl is None or len(decoded.encode("utf-8")) == decl)
            )
            args.append(decoded)
            if not ok:
                any_bad = True
            continue
        args.append(max(w) if w else None)
        any_bad = True

    argc_decl = max((x for x in argc_vals if x is not None), default=None)
    solid = all_idxs == list(range(len(all_idxs)))
    argc_ok = argc_decl is None or argc_decl == len(all_idxs)
    if solid and not any_bad and argc_ok:
        return args, None, True
    return None, schemas.ERR_INVALID_EXECVE, True


def coalesce_conv(turns: list[ParsedTurn]) -> dict:
    """Mirror of coalesce.coalesce_events + assemble_docs for one conversation."""
    turns = sorted(turns, key=lambda t: t.turn_idx)
    texts = [t.text for t in turns]
    min_ts = min(t.ts for t in turns)

    # add-time errors: earliest (turn, code); REPEATED_RECORD at 2nd system turn
    add_errs = [(t.turn_idx, t.row_error) for t in turns if t.row_error]
    sys_turns = [t for t in turns if t.role == "system"]
    if len(sys_turns) > 1:
        add_errs.append((sys_turns[1].turn_idx, schemas.ERR_REPEATED_RECORD))
    add_err = min(add_errs)[1] if add_errs else None

    args, execve_err, _ = reassemble_args(turns)

    results = sorted(
        (t for t in turns if t.role == schemas.SLOT_ROLE),
        key=lambda t: (t.item_idx is None, t.item_idx if t.item_idx is not None else 0),
    )
    item_idxs = [t.item_idx for t in results]
    path_ok = not results or (
        all(i is not None for i in item_idxs)
        and sorted(item_idxs) == list(range(len(results)))
    )
    path_err = None if path_ok else schemas.ERR_INVALID_PATH

    error = add_err or execve_err or path_err

    tools, seen = [], set()
    for t in turns:
        if t.tool_name and t.tool_name not in seen:
            seen.add(t.tool_name)
            tools.append(t.tool_name)

    data = None
    if error is None:
        data = {
            "system": sys_turns[0].fields if len(sys_turns) == 1 else None,
            "user": [t.fields for t in turns if t.role == "user"] or None,
            "assistant": [t.fields for t in turns if t.role == "assistant"] or None,
            "tool_call": [t.fields for t in turns if t.role == "tool_call"] or None,
            "tool_result": [t.fields for t in results] or None,
            "args": args,
            "tools": tools or None,
        }

    return {
        "conv_id": turns[0].conv_id,
        "serial": int(re.search(r"(\d+)$", turns[0].conv_id).group(1)),
        "min_ts": min_ts,
        "n_turns": len(turns),
        "texts": texts,
        "data": data,
        "error": error,
    }


def iso_time(ts) -> str:
    # mirrors date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX") under UTC
    return ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts.microsecond // 1000:03d}Z"


def doc_object(conv: dict, with_text: bool = True) -> dict:
    """The event document as a plain dict (semantic comparison target)."""
    doc = {
        "serial": conv["serial"],
        "time": iso_time(conv["min_ts"]),
    }
    if with_text:
        doc["text"] = conv["texts"]
    if conv["data"] is not None:
        doc["data"] = {k: v for k, v in conv["data"].items() if v is not None}
    if conv["error"]:
        doc["error"] = conv["error"]
    return doc


def run_pipeline(rows: list[dict], max_turns_per_conv: int = 2048,
                 events_per_doc: int = 100) -> dict:
    """Full oracle run. Returns {json_doc: [...], error: [...], raw: [...],
    counts: {...}} with the same sink semantics as pipeline.build."""
    convs: dict[str, list[dict]] = {}
    for r in rows:
        convs.setdefault(r["conv_id"], []).append(r)

    json_docs, errors = [], []
    for conv_id in sorted(convs):
        crows = sorted(convs[conv_id], key=lambda r: r["turn_idx"])
        capped = any(r["turn_idx"] >= max_turns_per_conv for r in crows)
        crows = [r for r in crows if r["turn_idx"] < max_turns_per_conv]
        turns = [parse_turn(r) for r in crows]
        conv = coalesce_conv(turns)
        doc = doc_object(conv)
        json_docs.append({
            "conv_id": conv_id,
            "doc_id": conv["serial"] // events_per_doc,
            "serial": conv["serial"],
            "time": doc["time"],
            "n_turns": conv["n_turns"],
            "doc": json.dumps(doc, ensure_ascii=False, separators=(",", ":")),
            "trimmed": capped,
            "error": conv["error"],
        })
        for t in turns:
            if t.row_error:
                errors.append({
                    "conv_id": conv_id, "turn_idx": t.turn_idx,
                    "error_code": t.row_error, "text": t.text,
                })
        if conv["error"] in (schemas.ERR_REPEATED_RECORD,
                             schemas.ERR_INVALID_EXECVE,
                             schemas.ERR_INVALID_PATH):
            errors.append({
                "conv_id": conv_id, "turn_idx": None,
                "error_code": conv["error"], "text": None,
            })

    return {
        "json_doc": json_docs,
        "error": errors,
        "raw": rows,
        "counts": {
            "json_doc": len(json_docs),
            "xml_doc": len(json_docs),
            "error": len(errors),
            "raw": len(rows),
        },
    }
