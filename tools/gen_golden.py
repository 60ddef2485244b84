"""Regenerate the committed golden corpus (tests/golden/).

The corpus is the expected output of the full pipeline over a fixed
synthetic input (n_convs=12, seed=99 — covers every malformed fixture kind),
produced by the pure-Python oracle. tests/test_golden.py holds BOTH the
oracle and the Spark engines to these bytes, which is the analog of the
reference's golden-output test corpus (SURVEY.md §5.2.1).

Usage: python tools/gen_golden.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from transcriptpipe import oracle, render, synth  # noqa: E402

N_CONVS, SEED = 12, 99


def main() -> None:
    out_dir = REPO / "tests" / "golden"
    out_dir.mkdir(exist_ok=True)
    pdf = synth.gen_transcripts(n_convs=N_CONVS, seed=SEED, malformed_frac=0.5,
                                unknown_tool_frac=0.2)
    rows = pdf.to_dict("records")
    result = oracle.run_pipeline(rows, with_norm=True)
    docs = []
    for d in result["json_doc"]:
        docs.append({**d, "xml": render.xml_from_doc(json.loads(d["doc"]))})
    (out_dir / "docs.jsonl").write_text(
        "".join(json.dumps(d, ensure_ascii=False, sort_keys=True) + "\n" for d in docs)
    )
    (out_dir / "errors.jsonl").write_text(
        "".join(json.dumps(e, ensure_ascii=False, sort_keys=True) + "\n"
                for e in result["error"])
    )
    (out_dir / "MANIFEST.json").write_text(json.dumps({
        "n_convs": N_CONVS, "seed": SEED, "malformed_frac": 0.5,
        "unknown_tool_frac": 0.2, "with_norm": True,
        "n_docs": len(docs), "n_errors": len(result["error"]),
    }, indent=2))
    print(f"wrote {len(docs)} docs, {len(result['error'])} errors")


if __name__ == "__main__":
    main()
