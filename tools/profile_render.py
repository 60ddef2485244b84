"""Profile the Arrow render kernel's pure-Python body (no Spark) — the
per-conversation work that mapInPandas runs. Used to direct the columnar
rewrite (round-3 item 1); run:

    python tools/profile_render.py [n_convs] [--cprofile]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from transcriptpipe import arrow_docs, oracle, synth  # noqa: E402


def build_input(n_convs: int):
    df = synth.gen_transcripts(n_convs=n_convs, seed=7)
    # mimic the enrich stage (broadcast dict joins) the kernel sees
    role_map = oracle.ROLE_MAP
    tool_map = oracle.TOOL_MAP
    convs: dict[str, list] = {}
    for r in df.itertuples(index=False):
        role_name = role_map.get(r.role, r.role)
        tool_name = tool_map.get(r.tool) if r.tool else None
        convs.setdefault(r.conv_id, []).append(
            {"turn_idx": r.turn_idx, "role_name": role_name, "text": r.text,
             "tool": r.tool, "tool_name": tool_name, "ts": r.ts}
        )
    return df, convs


def run_kernel(convs, render_one=arrow_docs._render_one):
    out = []
    for conv_id, turns in convs.items():
        min_ts = min(t["ts"] for t in turns)
        rec = render_one(conv_id, turns, min_ts, False, 8192, 100, True, False)
        if rec is not None:
            out.append(rec)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    df, convs = build_input(n)
    n_turns = len(df)
    print(f"{n} convs / {n_turns} turns")
    if "--cprofile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        out = run_kernel(convs)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
    else:
        t0 = time.perf_counter()
        out = run_kernel(convs)
        dt = time.perf_counter() - t0
        print(f"kernel: {dt:.3f}s  {n_turns / dt:,.0f} turns/sec  {len(out)} docs")


if __name__ == "__main__":
    main()
