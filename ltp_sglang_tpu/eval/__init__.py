"""Accuracy eval harnesses (GSM8K few-shot, MMLU multichoice) + delta gates.

Reference analogs: python/sglang/test/few_shot_gsm8k.py,
simple_eval_mmlu.py, and the CI thresholds in
test/srt/test_eval_accuracy_large.py:54-90. These run against the local
Engine (no HTTP round-trip) and read datasets from local files — this
environment has zero egress, so there is no download path; pass
--data-path pointing at the standard test.jsonl / mmlu csv.
"""

from ltp_sglang_tpu.eval.gsm8k import run_gsm8k  # noqa: F401
from ltp_sglang_tpu.eval.mmlu import run_mmlu  # noqa: F401
from ltp_sglang_tpu.eval.gates import accuracy_delta_gate  # noqa: F401
