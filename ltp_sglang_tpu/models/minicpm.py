"""MiniCPM (v1/v2 dense) — MiniCPMForCausalLM.

Reference: python/sglang/srt/models/minicpm.py. The body is llama (GQA +
rope + RMSNorm + SwiGLU, llama leaf names); three mup-style constant
scalings differ:
- embeddings scaled by ``scale_emb`` (reference :273,327);
- every residual add scaled by ``scale_depth / sqrt(num_hidden_layers)``
  (reference :220-229) — the body's residual_multiplier hook;
- logits scaled by ``dim_model_base / hidden_size`` (reference :314 divides
  the hidden state by hidden_size/dim_model_base before the head —
  numerically the same applied post-matmul via logits_multiplier).
"""

from __future__ import annotations

import math

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class MiniCPMForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.embed_multiplier = float(hf.get("scale_emb", 1.0))
        if "scale_depth" in hf:
            self.residual_multiplier = float(hf["scale_depth"]) / math.sqrt(
                config.num_layers
            )
        self.logits_multiplier = float(
            hf.get("dim_model_base", config.hidden_size)
        ) / float(config.hidden_size)
