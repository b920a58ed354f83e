"""Compare two dump trees produced by debug_utils.dumper.

Counterpart of debug_utils/dump_comparator.py: aligns dumps by (pass, name,
tags), prints max-abs / rel-err per pair, flags the first divergence.

Usage: python -m ltp_sglang_tpu.debug_utils.dump_comparator --baseline DIR \
    --target DIR [--start-id N] [--rel-tol 1e-3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Dict, Tuple

import numpy as np


def _key(fname: str) -> Tuple:
    """pass=00001__i=000003__name__k=v.npy -> (pass, name, tags); the dump
    index i is ignored so reordered dumps still align."""
    stem = fname[:-4] if fname.endswith(".npy") else fname
    parts = stem.split("__")
    pass_id = name = None
    tags = []
    for p in parts:
        if p.startswith("pass="):
            pass_id = int(p[5:])
        elif p.startswith("i="):
            continue
        elif "=" in p:
            tags.append(p)
        else:
            name = p
    return (pass_id, name, tuple(sorted(tags)))


def load_dir(d: Path) -> Dict[Tuple, Path]:
    return {_key(f.name): f for f in sorted(d.glob("*.npy"))}


def compare(baseline: Path, target: Path, rel_tol: float = 1e-3,
            start_id: int = 0, out=sys.stdout) -> int:
    base = load_dir(baseline)
    tgt = load_dir(target)
    shared = sorted(set(base) & set(tgt))
    missing = sorted(set(base) ^ set(tgt))
    n_bad = 0
    for k in shared:
        if k[0] is not None and k[0] < start_id:
            continue
        a = np.load(base[k]).astype(np.float64)
        b = np.load(tgt[k]).astype(np.float64)
        if a.shape != b.shape:
            out.write(f"SHAPE  {k}: {a.shape} vs {b.shape}\n")
            n_bad += 1
            continue
        diff = np.abs(a - b)
        denom = np.maximum(np.abs(a), 1e-9)
        rel = float((diff / denom).max()) if a.size else 0.0
        mx = float(diff.max()) if a.size else 0.0
        status = "OK " if rel <= rel_tol else "BAD"
        if status == "BAD":
            n_bad += 1
        out.write(
            f"{status} pass={k[0]} {k[1]} {' '.join(k[2])} "
            f"max_abs={mx:.3e} max_rel={rel:.3e}\n"
        )
    for k in missing:
        out.write(f"ONLY-IN-ONE {k}\n")
    return n_bad


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--start-id", type=int, default=0)
    p.add_argument("--rel-tol", type=float, default=1e-3)
    args = p.parse_args()
    bad = compare(Path(args.baseline), Path(args.target),
                  rel_tol=args.rel_tol, start_id=args.start_id)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
