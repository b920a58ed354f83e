"""Compare two generation-output JSONL files (reference
debug_utils/text_comparator.py): aligns records by prompt, reports exact
match rate, first-divergence token index, and a unified diff for mismatches.

Record format: {"prompt": ..., "text": ..., "output_ids": [...]} per line.
Usage: python -m ltp_sglang_tpu.debug_utils.text_comparator a.jsonl b.jsonl
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys
from typing import Dict, List


def _load(path: str) -> Dict[str, dict]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            key = json.dumps(rec.get("prompt"), sort_keys=True)
            out[key] = rec
    return out


def first_divergence(a: List[int], b: List[int]) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return -1 if len(a) == len(b) else n


def compare(path_a: str, path_b: str, show_diff: bool = True,
            out=sys.stdout) -> int:
    recs_a, recs_b = _load(path_a), _load(path_b)
    shared = sorted(set(recs_a) & set(recs_b))
    n_mismatch = 0
    for key in shared:
        ra, rb = recs_a[key], recs_b[key]
        ids_a = ra.get("output_ids") or []
        ids_b = rb.get("output_ids") or []
        div = first_divergence(ids_a, ids_b)
        if div == -1 and ra.get("text") == rb.get("text"):
            continue
        n_mismatch += 1
        out.write(f"MISMATCH prompt={key[:80]} first_token_div={div} "
                  f"len_a={len(ids_a)} len_b={len(ids_b)}\n")
        if show_diff and ra.get("text") is not None:
            for line in difflib.unified_diff(
                (ra.get("text") or "").splitlines(),
                (rb.get("text") or "").splitlines(),
                lineterm="", n=1,
            ):
                out.write("  " + line + "\n")
    only = sorted(set(recs_a) ^ set(recs_b))
    for key in only:
        out.write(f"ONLY-IN-ONE prompt={key[:80]}\n")
    out.write(
        f"{len(shared) - n_mismatch}/{len(shared)} matched, "
        f"{len(only)} unpaired\n"
    )
    return n_mismatch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("--no-diff", action="store_true")
    args = p.parse_args()
    bad = compare(args.file_a, args.file_b, show_diff=not args.no_diff)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
