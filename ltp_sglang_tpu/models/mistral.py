"""Mistral — llama architecture with optional sliding-window attention.

Reference: python/sglang/srt/models/mistral.py (subclasses llama).
"""

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class MistralForCausalLM(LlamaForCausalLM):
    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        if config.sliding_window:
            self.sliding_window = config.sliding_window
