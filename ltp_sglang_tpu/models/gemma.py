"""Gemma (v1): llama-family with scaled embeddings, (1+w) RMS norms, and a
GeGLU MLP. Reference: python/sglang/srt/models/gemma.py.

The (1+w) norm convention is folded into the weights at conversion time
(rms_norm then runs unmodified), and the sqrt(hidden) embedding scale rides
the base class's embed_multiplier hook — no forward override needed."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # the fused-quant branch assumes silu

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.tie_word_embeddings = True  # gemma always ties
        self.embed_multiplier = float(config.hidden_size) ** 0.5

    def mlp(self, lp, normed, tok_valid=None):
        gs = self.quant_group_size
        gate = apply_linear(lp["gate_proj"], normed, gs)
        up = apply_linear(lp["up_proj"], normed, gs)
        return apply_linear(
            lp["down_proj"], jax.nn.gelu(gate, approximate=True) * up, gs
        )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        params.pop("lm_head", None)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        # HF gemma stores norm weights w with effective scale (1 + w).
        import jax.numpy as jnp

        for name in ("input_layernorm", "post_attention_layernorm"):
            params["layers"][name] = params["layers"][name] + jnp.asarray(
                1.0, params["layers"][name].dtype
            )
        params["norm"] = params["norm"] + jnp.asarray(1.0, params["norm"].dtype)
        params.pop("lm_head", None)
        return params
