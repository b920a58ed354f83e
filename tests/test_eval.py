"""GSM8K / MMLU eval harness + accuracy-delta gate.

Extraction/prompt semantics must match the reference
(few_shot_gsm8k.py:22-43, simple_eval_common ANSWER_PATTERN_MULTICHOICE);
the e2e test drives the harness through a real (tiny) Engine with the
char-level test tokenizer.
"""

import json
import os
import tempfile

import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir, write_tiny_tokenizer

from ltp_sglang_tpu.eval.gates import accuracy_delta_gate
from ltp_sglang_tpu.eval.gsm8k import (
    INVALID,
    build_prompts,
    get_answer_value,
    run_gsm8k,
)
from ltp_sglang_tpu.eval.mmlu import extract_answer, format_question, run_mmlu


def test_gsm8k_answer_extraction():
    assert get_answer_value("... the answer is 42") == 42
    assert get_answer_value("#### 1,234") == 1234
    assert get_answer_value("6 apples, then 18 total #### 18") == 18
    assert get_answer_value("no numbers here") == INVALID


def test_gsm8k_prompt_construction():
    lines = [
        {"question": f"Q{i}?", "answer": f"thinking... #### {i * 3}"}
        for i in range(6)
    ]
    prompts, labels = build_prompts(lines, num_questions=2, num_shots=3)
    assert len(prompts) == 2 and labels == [0, 3]
    # Few-shot block contains the first 3 answered examples, then the bare
    # question with the reference's exact "Question: ...\nAnswer:" framing.
    assert prompts[0].count("Question:") == 4
    assert prompts[0].endswith("Question: Q0?\nAnswer:")
    assert "#### 6" in prompts[0]


def test_mmlu_extraction_and_format():
    assert extract_answer("blah\nAnswer: C") == "C"
    assert extract_answer("answer:  $B$") == "B"
    assert extract_answer("I don't know") is None
    q = format_question(
        {"Question": "2+2?", "A": "3", "B": "4", "C": "5", "D": "6",
         "Answer": "B", "Subject": "math"}
    )
    assert "A) 3" in q and q.startswith("Answer the following")


class _StubEngine:
    """Canned-generation engine for gate logic tests."""

    def __init__(self, texts):
        self.texts = texts

    def generate(self, prompt=None, sampling_params=None, **kw):
        return [
            {"text": t, "meta_info": {"completion_tokens": 5}}
            for t in self.texts[: len(prompt)]
        ]


def _mini_gsm8k(path, n=4):
    lines = [
        {"question": f"What is {i} + {i}?", "answer": f"Adding gives #### {2 * i}"}
        for i in range(n + 5)
    ]
    with open(path, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
    return path


def test_accuracy_delta_gate():
    data = _mini_gsm8k(os.path.join(tempfile.mkdtemp(), "test.jsonl"))
    # Baseline gets questions 0..3 right (#### labels 0,2,4,6); candidate
    # misses one.
    base = _StubEngine(["so #### 0", "so #### 2", "so #### 4", "so #### 6"])
    cand = _StubEngine(["so #### 0", "so #### 2", "so #### 999", "so #### 6"])
    res = accuracy_delta_gate(
        base, cand, run_gsm8k, data, num_questions=4, max_drop=0.005,
        num_shots=2, max_new_tokens=8,
    )
    assert res["baseline_accuracy"] == 1.0
    assert res["candidate_accuracy"] == 0.75
    assert not res["passed"]
    res2 = accuracy_delta_gate(
        base, base, run_gsm8k, data, num_questions=4, max_drop=0.005,
        num_shots=2, max_new_tokens=8,
    )
    assert res2["passed"] and res2["delta"] == 0.0


def test_gsm8k_e2e_tiny_engine():
    """Full harness through a real Engine + tokenizer (tiny random model:
    accuracy is irrelevant, the pipeline mechanics are the test)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="eval_e2e_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    data = _mini_gsm8k(os.path.join(d, "test.jsonl"))

    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=4096, max_running_requests=4,
    ))
    res = run_gsm8k(eng, data, num_questions=3, num_shots=1, max_new_tokens=8)
    assert res["num_questions"] == 3
    assert 0.0 <= res["accuracy"] <= 1.0
    assert 0.0 <= res["invalid"] <= 1.0
    assert len(res["preds"]) == 3
    assert res["output_throughput"] > 0


def test_mmlu_e2e_tiny_engine():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="mmlu_e2e_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    csv_path = os.path.join(d, "mmlu.csv")
    with open(csv_path, "w") as f:
        f.write("Question,A,B,C,D,Answer,Subject\n")
        f.write("What is 2+2?,3,4,5,6,B,math\n")
        f.write("Capital of France?,Rome,Oslo,Paris,Bonn,C,geo\n")

    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=4096, max_running_requests=4,
    ))
    res = run_mmlu(eng, csv_path, num_questions=2, max_new_tokens=8)
    assert res["num_questions"] == 2
    assert 0.0 <= res["accuracy"] <= 1.0
