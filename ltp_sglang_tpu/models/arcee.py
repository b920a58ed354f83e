"""Arcee (AFM-4.5B) — ArceeForCausalLM: the llama body with a NON-gated
squared-ReLU MLP (up -> relu^2 -> down, no gate_proj).

Reference: python/sglang/srt/models/arcee.py; MLP verified against HF
transformers modeling_arcee.py ArceeMLP.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class ArceeForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # no gate to fuse with

    def mlp(self, lp, normed, tok_valid=None):
        up = apply_linear(lp["up_proj"], normed)
        return apply_linear(lp["down_proj"], jnp.square(jax.nn.relu(up)))

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        params["layers"].pop("gate_proj", None)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"].pop("gate_proj", None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # Satisfy the base stacker for the gate leaf we drop below.
        Dm = self.config.hidden_size
        for i in range(self.config.num_layers):
            weights.setdefault(
                f"model.layers.{i}.mlp.gate_proj.weight",
                np.zeros((1, Dm), dtype=np.float32),
            )
        params = super().convert_hf_weights(weights)
        params["layers"].pop("gate_proj", None)
        return params
