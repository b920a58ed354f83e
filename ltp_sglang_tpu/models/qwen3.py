"""Qwen3 — llama architecture + per-head RMS norm on Q and K, no qkv bias.

Reference: python/sglang/srt/models/qwen3.py (q_norm/k_norm applied on the
head dim before RoPE).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.layers.norm import rms_norm
from ltp_sglang_tpu.layers.rotary import apply_rope
from ltp_sglang_tpu.models.llama import LlamaForCausalLM, StepArrays


class Qwen3ForCausalLM(LlamaForCausalLM):
    has_bias = False
    has_qk_norm = True

    # ----- parameters: add q_norm/k_norm [L, D] leaves
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

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        params["layers"]["q_norm"] = jnp.asarray(
            np.stack(
                [np.asarray(get(f"model.layers.{i}.self_attn.q_norm.weight")) for i in range(L)]
            ),
            dtype=self.dtype,
        )
        params["layers"]["k_norm"] = jnp.asarray(
            np.stack(
                [np.asarray(get(f"model.layers.{i}.self_attn.k_norm.weight")) for i in range(L)]
            ),
            dtype=self.dtype,
        )
        return params
