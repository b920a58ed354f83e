"""Qwen2 family — llama architecture + QKV biases.

Reference: python/sglang/srt/models/qwen2.py (same stacked mapping as llama
with bias terms on q/k/v projections).
"""

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    has_bias = True
