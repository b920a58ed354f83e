"""OLMoE: qwen3-moe-shaped MoE (mlp.gate router + per-expert gate/up/down)
with FULL-WIDTH RMS q/k norms applied before rope (Olmoe q_norm spans the
whole q projection, k_norm the whole kv width).

Reference: python/sglang/srt/models/olmoe.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.models.qwen3_moe import Qwen3MoeForCausalLM


class OlmoeForCausalLM(Qwen3MoeForCausalLM):
    has_qk_norm = False  # replaced by the full-width variant

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.qk_norm_full = True
        self.moe_intermediate = hf.get("intermediate_size", 1024)
        self.norm_topk_prob = hf.get("norm_topk_prob", False)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        # Replace the per-head qwen3 norms with the full-width olmoe ones.
        params["layers"]["q_norm"] = jnp.ones((L, Hq * D), dtype=self.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, Hkv * D), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P(None, "tp")
        specs["layers"]["k_norm"] = P(None, "tp")
        return specs
