"""MMLU multichoice eval against the local Engine.

Question format and answer-letter extraction replicate the reference
simple-evals port (python/sglang/test/simple_eval_mmlu.py +
simple_eval_common.py: format_multichoice_question /
ANSWER_PATTERN_MULTICHOICE) so scores are comparable.

Dataset: mmlu.csv with columns Question, A, B, C, D, Answer, Subject
(the simple-evals layout). Local file only (zero egress).
"""

from __future__ import annotations

import argparse
import csv
import json
import re
import time
from typing import Any, Dict, List, Optional

ANSWER_PATTERN_MULTICHOICE = r"(?i)Answer[ \t]*:[ \t]*\$?([A-D])\$?"

QUERY_TEMPLATE = """
Answer the following multiple choice question. The last line of your response should be of the following format: 'Answer: $LETTER' (without quotes) where LETTER is one of ABCD. Think step by step before answering.

{Question}

A) {A}
B) {B}
C) {C}
D) {D}
""".strip()


def read_mmlu_csv(path: str) -> List[Dict[str, str]]:
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def format_question(row: Dict[str, str]) -> str:
    return QUERY_TEMPLATE.format(**row)


def extract_answer(text: str) -> Optional[str]:
    m = re.search(ANSWER_PATTERN_MULTICHOICE, text)
    return m.group(1).upper() if m else None


def run_mmlu(
    engine,
    data_path: str,
    num_questions: int = 100,
    max_new_tokens: int = 512,
    temperature: float = 0.0,
) -> Dict[str, Any]:
    rows = read_mmlu_csv(data_path)[:num_questions]
    prompts = [format_question(r) for r in rows]
    labels = [r["Answer"].strip().upper() for r in rows]
    sp = {"max_new_tokens": max_new_tokens, "temperature": temperature}
    t0 = time.perf_counter()
    outs = engine.generate(prompt=prompts, sampling_params=sp)
    latency = time.perf_counter() - t0
    if isinstance(outs, dict):
        outs = [outs]
    preds = [extract_answer(o["text"]) for o in outs]
    n = len(labels)
    acc = sum(p == l for p, l in zip(preds, labels)) / max(n, 1)
    invalid = sum(p is None for p in preds) / max(n, 1)
    return {
        "accuracy": acc,
        "invalid": invalid,
        "latency_s": latency,
        "num_questions": n,
        "preds": preds,
        "labels": labels,
    }


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description="MMLU eval (local Engine)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=100)
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
    res = run_mmlu(eng, args.data_path, args.num_questions, args.max_new_tokens)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("preds", "labels")}))


if __name__ == "__main__":
    main()
