"""Accuracy gates: compare two serving configurations on the same eval.

The north-star quantization gate (BASELINE config 2: INT4 within 0.5% GSM8K
of BF16; reference CI thresholds test_eval_accuracy_large.py:54,72,90) as a
library call: build both engines, run the same eval, assert the delta.
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Callable, Dict, Optional


def accuracy_delta_gate(
    baseline_engine,
    candidate_engine,
    eval_fn: Callable,
    data_path: str,
    num_questions: int = 100,
    max_drop: float = 0.005,
    **eval_kw,
) -> Dict[str, Any]:
    """Runs eval_fn (run_gsm8k / run_mmlu) on both engines; returns the two
    results + delta + pass/fail against max_drop (absolute accuracy)."""
    base = eval_fn(baseline_engine, data_path, num_questions, **eval_kw)
    cand = eval_fn(candidate_engine, data_path, num_questions, **eval_kw)
    delta = base["accuracy"] - cand["accuracy"]
    return {
        "baseline_accuracy": base["accuracy"],
        "candidate_accuracy": cand["accuracy"],
        "delta": delta,
        "max_drop": max_drop,
        "passed": delta <= max_drop,
        "baseline": base,
        "candidate": cand,
    }


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Accuracy delta gate: baseline vs quantized/candidate")
    p.add_argument("--model-path", required=True, help="baseline checkpoint")
    p.add_argument("--candidate-model-path", default=None,
                   help="candidate checkpoint (default: same as baseline)")
    p.add_argument("--candidate-quantization", default=None)
    p.add_argument("--candidate-kv-cache-dtype", default="auto")
    p.add_argument("--eval", choices=["gsm8k", "mmlu"], default="gsm8k")
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=100)
    p.add_argument("--max-drop", type=float, default=0.005)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.eval.gsm8k import run_gsm8k
    from ltp_sglang_tpu.eval.mmlu import run_mmlu

    base_eng = Engine(ServerArgs(model_path=args.model_path, dtype=args.dtype))
    cand_eng = Engine(ServerArgs(
        model_path=args.candidate_model_path or args.model_path,
        dtype=args.dtype,
        quantization=args.candidate_quantization,
        kv_cache_dtype=args.candidate_kv_cache_dtype,
    ))
    eval_fn = run_gsm8k if args.eval == "gsm8k" else run_mmlu
    res = accuracy_delta_gate(
        base_eng, cand_eng, eval_fn, args.data_path, args.num_questions,
        args.max_drop,
    )
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("baseline", "candidate")}))
    raise SystemExit(0 if res["passed"] else 1)


if __name__ == "__main__":
    main()
