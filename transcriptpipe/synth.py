"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the `transcripts` input table — exactly the `input_hint` shape
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp) — as a pandas DataFrame / parquet file, with a seeded grammar
that exercises every collector in the pipeline:

* kv tokens with quoted/escaped values          (ref lib/record.c:42-55 field syntax)
* hex-encoded fields (`hex=...`)                 (ref lib/execve_coll.c:363-375)
* sliced args (`aN_len=`, `aN[j]=` hex chunks)   (ref lib/execve_coll.c:266-429)
* `item=N` ordered slots, emitted shuffled       (ref lib/path_coll.c:143-190)
* raw role codes R0..R4 for dict enrichment      (ref lib/field.c:112-114)
* EOE marker rows                                (ref lib/drop_coll.c:27-34)
* deterministic malformed conversations          (ref include/aushape/rc.h:24-48)

Pure Python/pandas — no Spark dependency — so the single-process oracle
(oracle.py) and Spark both read the same parquet bytes.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

BASE_TS = datetime(2026, 1, 1, 0, 0, 0)  # UTC, tz-naive storage

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu query table scan merge join filter window batch stream"
).split()

ROLE_CODES = {"user": "R0", "assistant": "R1", "system": "R2",
              "tool_call": "R3", "tool_result": "R4"}

TOOL_CODES = [f"T{i:02d}" for i in range(20)]
UNKNOWN_TOOL_CODES = [f"T{i:02d}" for i in range(90, 95)]

MALFORMED_KINDS = ["bad_argc", "item_hole", "dup_system", "bad_hex", "parse_fail"]


def role_dict_rows() -> list[dict]:
    return [{"role_code": c, "role_name": n} for n, c in ROLE_CODES.items()]


def tool_dict_rows() -> list[dict]:
    kinds = ["search", "code", "file", "web", "math"]
    return [
        {"tool_code": c, "tool_name": f"tool_{c[1:].lstrip('0') or '0'}",
         "tool_kind": kinds[i % len(kinds)]}
        for i, c in enumerate(TOOL_CODES)
    ]


def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _msg(rng: random.Random, esc: bool) -> str:
    n = rng.randint(2, 6)
    words = [rng.choice(WORDS) for _ in range(n)]
    if esc:  # exercise escaped quotes/backslashes inside quoted values
        words[rng.randrange(n)] = rng.choice(['say "hi"', "back\\slash", 'mix "q\\w"'])
    return " ".join(words)


def _hex(s: str) -> str:
    return s.encode("utf-8").hex().upper()


def _slice_arg(rng: random.Random, arg: str) -> list[str]:
    """Split arg bytes into 2-4 hex slices (ref execve_coll.c slice handling)."""
    b = arg.encode("utf-8")
    n_slices = rng.randint(2, min(4, max(2, len(b))))
    cuts = sorted(rng.sample(range(1, len(b)), n_slices - 1)) if len(b) > n_slices else [1]
    parts, prev = [], 0
    for c in [*cuts, len(b)]:
        parts.append(b[prev:c])
        prev = c
    return [p.hex().upper() for p in parts]


def gen_conversation(conv_i: int, seed: int, hot_turns: int | None = None,
                     malformed_kind: str | None = None,
                     unknown_tool: bool = False) -> list[dict]:
    """One conversation's rows. Deterministic in (conv_i, seed)."""
    rng = random.Random((seed << 32) | conv_i)
    conv_id = f"conv-{conv_i:08d}"
    n_turns = hot_turns if hot_turns else rng.randint(4, 12)
    rows: list[dict] = []
    ts = BASE_TS + timedelta(seconds=conv_i * 60)

    def emit(role: str, text: str, tool: str | None = None) -> None:
        nonlocal ts
        idx = len(rows)
        use_code = rng.random() < 0.10 and role in ROLE_CODES
        rows.append({
            "conv_id": conv_id, "turn_idx": idx,
            "role": ROLE_CODES[role] if use_code else role,
            "text": text, "tool": tool, "ts": ts,
        })
        ts = ts + timedelta(seconds=rng.randint(1, 5))

    def base_tokens(role: str) -> list[str]:
        toks = [f"msg={_quote(_msg(rng, rng.random() < 0.15))}",
                f"seq={len(rows)}"]
        if rng.random() < 0.25:
            payload = rng.choice(WORDS)
            toks.append(f"hex={_hex(payload)}")
        if role == "system":
            toks.append("policy=standard")
        return toks

    # -- system turn (uniq collector; at most one unless dup_system fixture)
    emit("system", " ".join(base_tokens("system")))
    if malformed_kind == "dup_system":
        emit("system", " ".join(base_tokens("system")))

    # -- decide tool activity for this conversation
    n_tool_calls = rng.randint(1, 2) if rng.random() < 0.5 else 0
    if malformed_kind in ("bad_argc", "item_hole") or unknown_tool:
        n_tool_calls = max(1, n_tool_calls)  # these fixtures need tool traffic
    argc = rng.randint(1, 3) if n_tool_calls else 0
    if malformed_kind == "bad_argc":
        argc = max(2, argc)
    args = [_msg(rng, False) if rng.random() < 0.5 else rng.choice(WORDS)
            for _ in range(argc)]
    # arg tokens: whole (possibly quoted) or sliced-hex
    arg_tokens: list[str] = [f"argc={argc}"] if n_tool_calls else []
    for k, a in enumerate(args):
        if malformed_kind == "bad_argc" and k == argc - 1:
            continue  # declared argc but last arg never arrives
        if rng.random() < 0.5:
            arg_tokens.append(f"a{k}={_quote(a) if ' ' in a else a}")
        else:
            slices = _slice_arg(rng, a)
            arg_tokens.append(f"a{k}_len={len(a.encode('utf-8'))}")
            arg_tokens.extend(f"a{k}[{j}]={h}" for j, h in enumerate(slices))
    rng.shuffle(arg_tokens)  # slices arrive out of order across turns

    n_results = rng.randint(1, 3) if n_tool_calls else 0
    if malformed_kind == "item_hole":
        n_results = max(2, n_results)
    slots = list(range(n_results))
    if malformed_kind == "item_hole" and n_results:
        slots = [s if s < n_results - 1 else n_results for s in slots]  # hole at n-1
    rng.shuffle(slots)  # ordered-slot items arrive shuffled (ref path_coll)

    # -- dialogue turns
    body_turns = max(2, n_turns - 1 - n_tool_calls - n_results)
    pending_tc, pending_tr = n_tool_calls, list(slots)
    for t in range(body_turns):
        role = "user" if t % 2 == 0 else "assistant"
        toks = base_tokens(role)
        if malformed_kind == "bad_hex" and t == 1:
            toks.append("hex=ZZNOTHEX1")
        if malformed_kind == "parse_fail" and t == 1:
            emit(role, ";; unparseable garbage without key value pairs ;;")
            continue
        emit(role, " ".join(toks))
        if pending_tc and t >= 1:
            # tool_call turn carries a chunk of the arg token stream
            chunk = max(1, len(arg_tokens) // pending_tc)
            mine, arg_tokens[:] = arg_tokens[:chunk], arg_tokens[chunk:]
            if pending_tc == 1:
                mine += arg_tokens
                arg_tokens.clear()
            code = (rng.choice(UNKNOWN_TOOL_CODES) if unknown_tool and pending_tc == n_tool_calls
                    else rng.choice(TOOL_CODES))
            emit("tool_call", " ".join(base_tokens("tool_call") + mine), tool=code)
            pending_tc -= 1
        if pending_tr and t >= 2:
            slot = pending_tr.pop()
            emit("tool_result", " ".join(base_tokens("tool_result") + [f"item={slot}"]))
    while pending_tc:  # flush tool_calls that didn't fit in the body
        chunk = max(1, len(arg_tokens) // pending_tc)
        mine, arg_tokens[:] = arg_tokens[:chunk], arg_tokens[chunk:]
        if pending_tc == 1:
            mine += arg_tokens
            arg_tokens.clear()
        code = (rng.choice(UNKNOWN_TOOL_CODES) if unknown_tool and pending_tc == n_tool_calls
                else rng.choice(TOOL_CODES))
        emit("tool_call", " ".join(base_tokens("tool_call") + mine), tool=code)
        pending_tc -= 1
    for slot in pending_tr:
        emit("tool_result", " ".join(base_tokens("tool_result") + [f"item={slot}"]))

    emit("EOE", "")  # end-of-event marker (dropped by the pipeline)
    return rows


def gen_transcripts(n_convs: int = 50, seed: int = 42,
                    hot_frac: float = 0.0, hot_turns: int = 1000,
                    malformed_frac: float = 0.02,
                    unknown_tool_frac: float = 0.01) -> pd.DataFrame:
    """The full table. Deterministic; conversations independent of each other."""
    rows: list[dict] = []
    n_hot = int(n_convs * hot_frac)
    n_mal = max(1, int(n_convs * malformed_frac)) if malformed_frac else 0
    for i in range(n_convs):
        kind = MALFORMED_KINDS[i % len(MALFORMED_KINDS)] if (n_mal and i % max(1, n_convs // n_mal) == 0) else None
        unknown = (n_convs > 10) and (i % max(1, int(1 / unknown_tool_frac)) == 7)
        ht = hot_turns if i < n_hot else None
        rows.extend(gen_conversation(i, seed, hot_turns=ht,
                                     malformed_kind=kind, unknown_tool=unknown))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


def write_transcripts(path: str, row_group_size: int = 50_000, **kw) -> pd.DataFrame:
    """Write with small row groups so Spark can split the scan across tasks
    (one giant row group = one scan task = a serialized pipeline)."""
    df = gen_transcripts(**kw)
    df.to_parquet(path, index=False, row_group_size=row_group_size)
    return df
