"""Few-shot GSM8K eval against the local Engine.

Prompt construction, stop strings, and answer extraction replicate the
reference exactly (python/sglang/test/few_shot_gsm8k.py:22-43,84-88) so
accuracies are comparable: "Question: ...\nAnswer:" few-shot blocks, stop on
["Question", "Assistant:", "<|separator|>"], answer = last integer in the
completion.

Dataset: the standard grade_school_math test.jsonl ({"question", "answer"}
lines; answers end with "#### <n>"). Zero-egress environment: pass a local
path (no download fallback).
"""

from __future__ import annotations

import argparse
import ast
import json
import re
import time
from typing import Any, Dict, List, Optional

INVALID = -9999999

STOP_STRINGS = ["Question", "Assistant:", "<|separator|>"]


def read_jsonl(path: str) -> List[Dict[str, Any]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def get_answer_value(answer_str: str):
    """Last integer in the string (reference few_shot_gsm8k.py:36-43)."""
    answer_str = answer_str.replace(",", "")
    numbers = re.findall(r"\d+", answer_str)
    if len(numbers) < 1:
        return INVALID
    try:
        return ast.literal_eval(numbers[-1])
    except SyntaxError:
        return INVALID


def build_prompts(lines: List[Dict[str, Any]], num_questions: int,
                  num_shots: int):
    """Returns (prompts, labels). Few-shot examples come from the first
    num_shots lines (reference convention), questions from the same head of
    the file."""

    def one(i, include_answer):
        ret = "Question: " + lines[i]["question"] + "\nAnswer:"
        if include_answer:
            ret += " " + lines[i]["answer"]
        return ret

    few_shot = "".join(one(i, True) + "\n\n" for i in range(num_shots))
    prompts, labels = [], []
    for i in range(min(num_questions, len(lines))):
        prompts.append(few_shot + one(i, False))
        labels.append(get_answer_value(lines[i]["answer"]))
    return prompts, labels


def run_gsm8k(
    engine,
    data_path: str,
    num_questions: int = 100,
    num_shots: int = 5,
    max_new_tokens: int = 512,
    temperature: float = 0.0,
) -> Dict[str, Any]:
    """Returns {"accuracy", "invalid", "latency_s", "output_throughput",
    "num_questions", "preds", "labels"}."""
    lines = read_jsonl(data_path)
    prompts, labels = build_prompts(lines, num_questions, num_shots)
    sp = {
        "max_new_tokens": max_new_tokens,
        "temperature": temperature,
        "stop": STOP_STRINGS,
    }
    t0 = time.perf_counter()
    outs = engine.generate(prompt=prompts, sampling_params=sp)
    latency = time.perf_counter() - t0
    if isinstance(outs, dict):
        outs = [outs]
    preds = [get_answer_value(o["text"]) for o in outs]
    n = len(labels)
    acc = sum(p == l for p, l in zip(preds, labels)) / max(n, 1)
    invalid = sum(p == INVALID for p in preds) / max(n, 1)
    out_tokens = sum(o["meta_info"]["completion_tokens"] for o in outs)
    return {
        "accuracy": acc,
        "invalid": invalid,
        "latency_s": latency,
        "output_throughput": out_tokens / latency if latency > 0 else 0.0,
        "num_questions": n,
        "preds": preds,
        "labels": labels,
    }


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description="Few-shot GSM8K eval (local Engine)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True,
                   help="grade_school_math test.jsonl (local; zero egress)")
    p.add_argument("--num-questions", type=int, default=100)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--quantization", default=None)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=args.model_path,
        dtype=args.dtype,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
    ))
    res = run_gsm8k(
        eng, args.data_path, args.num_questions, args.num_shots,
        args.max_new_tokens,
    )
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("preds", "labels")}))


if __name__ == "__main__":
    main()
