"""Hunyuan-V1 dense (Tencent) — HunYuanDenseV1ForCausalLM.

Facts verified against HF transformers modeling_hunyuan_v1_dense.py:
llama-style GQA with per-head query/key RMS norms applied AFTER rope
(query_layernorm/key_layernorm), silu gated MLP, untied head.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # qk norms
    qk_norm_post_rope = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.has_bias = bool(config.hf_config.get("attention_bias", False))

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        L, D = self.config.num_layers, self.config.head_dim
        params["layers"]["q_norm"] = jnp.ones((L, D), dtype=self.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, D), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        L = self.config.num_layers

        def get(n):
            return weights.get(n, weights.get(n.replace("model.", "", 1)))

        for nm, src in (("q_norm", "query_layernorm"), ("k_norm", "key_layernorm")):
            params["layers"][nm] = jnp.asarray(np.stack([
                np.asarray(get(f"model.layers.{i}.self_attn.{src}.weight"))
                for i in range(L)
            ]), self.dtype)
        return params
