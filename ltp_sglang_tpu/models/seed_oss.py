"""Seed-OSS (ByteDance): llama body with config-driven attention biases.

Facts verified against HF transformers modeling_seed_oss.py: q/k/v carry a
bias when config.attention_bias (default True); o_proj bias
(attention_out_bias) and mlp bias default off; explicit head_dim (128).
Also Ernie-4.5 (Baidu): a pure llama body (use_bias default False) —
registered here to keep one file per vendor-family.
"""

from __future__ import annotations

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class SeedOssForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.has_bias = bool(hf.get("attention_bias", True))
        if hf.get("attention_out_bias") or hf.get("mlp_bias"):
            raise NotImplementedError(
                "seed_oss attention_out_bias/mlp_bias checkpoints"
            )


class Ernie4_5ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.has_bias = bool(config.hf_config.get("use_bias", False))
