"""GLM (glm-4-9b lineage) and GLM-4 (0414 lineage).

Reference: python/sglang/srt/models/glm4.py. Facts replicated:
- partial rotary (factor 0.5), interleaved gptj-style pairs.
- qkv projections carry bias; o_proj does not.
- fused gate_up_proj MLP (split at conversion into gate/up leaves).
- GLM-4 adds sandwich norms: post_self_attn_layernorm on the attention
  output and post_mlp_layernorm on the MLP output (norm_style="sandwich").
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class GlmForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False
    has_bias = True  # qkv bias (attention_bias defaults True)

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.has_bias = bool(hf.get("attention_bias", True))
        self.rope_style = "gptj"
        prf = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * prf)
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim,
            config.context_len,
            base=self.rope_theta,
            rotary_dim=self.rotary_dim,
            rope_scaling=self.rope_scaling,
        )

    # HF stores a fused [2I, Dm] gate_up weight; split into gate/up halves.
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        for i in range(L):
            key = f"model.layers.{i}.mlp.gate_up_proj.weight"
            alt = key.replace("model.", "", 1)
            w = weights.get(key, weights.get(alt))
            gate, up = np.split(np.asarray(w), 2, axis=0)
            weights[f"model.layers.{i}.mlp.gate_proj.weight"] = gate
            weights[f"model.layers.{i}.mlp.up_proj.weight"] = up
        return super().convert_hf_weights(weights)


class Glm4ForCausalLM(GlmForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.norm_style = "sandwich"

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        L, Dm = self.config.num_layers, self.config.hidden_size
        params["layers"]["post_self_attn_layernorm"] = jnp.ones(
            (L, Dm), dtype=self.dtype
        )
        params["layers"]["post_mlp_layernorm"] = jnp.ones((L, Dm), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["post_self_attn_layernorm"] = P(None, None)
        specs["layers"]["post_mlp_layernorm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        L = self.config.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        for name in ("post_self_attn_layernorm", "post_mlp_layernorm"):
            params["layers"][name] = jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.{name}.weight"))
                     for i in range(L)]
                ),
                dtype=self.dtype,
            )
        return params
