"""MiniCPM3 — MiniCPM3ForCausalLM: MLA attention in a small all-dense body.

Reference: python/sglang/srt/models/minicpm3.py. Facts replicated:
- the attention is deepseek-style MLA verbatim (q_a/q_b with rmsnorm,
  kv_a_proj_with_mqa -> [kv_lora | rope], kv_b per-head [nope | v],
  absorbed latent decode; reference :96-260 mirrors deepseek_v2's
  MiniCPM3AttentionMLA) with sm_scale = (qk_nope+qk_rope)^-0.5 and
  v_head_dim = hidden_size // num_attention_heads (reference :291 — the
  config carries no v_head_dim field);
- every MLP is dense SwiGLU: first_k_dense_replace is forced to the full
  depth (the reference's decoder layer has no MoE branch at all);
- the MiniCPM mup scalings: scale_emb on embeddings (reference :384),
  scale_depth/sqrt(L) on each residual add (reference :331-340), and
  dim_model_base/hidden_size on the logits (reference :425).
- longrope rope_scaling rides layers/rotary.py's longrope branch.
"""

from __future__ import annotations

import math

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        hf = config.hf_config
        hf["first_k_dense_replace"] = config.num_layers
        hf.setdefault(
            "v_head_dim", config.hidden_size // config.num_attention_heads
        )
        super().__init__(config, attn_impl, kv_write_impl)
        self.embed_multiplier = float(hf.get("scale_emb", 1.0))
        if "scale_depth" in hf:
            self.residual_multiplier = float(hf["scale_depth"]) / math.sqrt(
                config.num_layers
            )
        self.logits_multiplier = float(
            hf.get("dim_model_base", config.hidden_size)
        ) / float(config.hidden_size)
