"""IBM Granite (3.x dense): llama body + four scalar multipliers.

Reference: python/sglang/srt/models/granite.py — embedding_multiplier on the
input embeddings, attention_multiplier as the attention scale (replacing
1/sqrt(d)), residual_multiplier on both block outputs, and logits divided by
logits_scaling.
"""

from __future__ import annotations

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.embed_multiplier = hf.get("embedding_multiplier", 1.0)
        self.sm_scale = hf.get("attention_multiplier", config.head_dim**-0.5)
        self.residual_multiplier = hf.get("residual_multiplier", 1.0)
        self.logits_multiplier = 1.0 / hf.get("logits_scaling", 1.0)
