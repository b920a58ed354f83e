"""Apertus (Swiss AI Initiative) — ApertusForCausalLM.

Facts verified against HF transformers modeling_apertus.py:
- llama-style GQA attention with per-head RMS q/k norms (applied before
  rope), no attention bias by default.
- NON-gated MLP: down(xielu(up(x))) with the LEARNABLE xIELU activation
  (activations.XIELUActivation): alpha_p/alpha_n are per-layer scalars
  stored softplus-inverse; beta/eps are constant buffers.
      xielu(x) = softplus(alpha_p) * x^2 + beta * x              (x > 0)
               = (expm1(min(x, eps)) - x) * (beta + softplus(alpha_n))
                 + beta * x                                      (x <= 0)
- Pre-norm names attention_layernorm / feedforward_layernorm (mapped onto
  the body's input/post_attention leaves at conversion).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class ApertusForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # non-gated MLP; q/k norms

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.has_bias = bool(hf.get("attention_bias", False))
        self.has_qk_norm = True  # per-head RMS, pre-rope
        self.xielu_beta = float(hf.get("xielu_beta", 0.5))
        self.xielu_eps = float(hf.get("xielu_eps", -1e-6))

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        layers = params["layers"]
        L = self.config.num_layers
        D = self.config.head_dim
        layers["q_norm"] = jnp.ones((L, D), dtype=self.dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype=self.dtype)
        for name in ("gate_proj",):
            layers.pop(name, None)
        # softplus-inverse storage like the HF parameters (0.8 / 0.8-beta).
        layers["xielu_alpha_p"] = jnp.full(
            (L, 1), float(np.log(np.expm1(0.8))), jnp.float32
        )
        layers["xielu_alpha_n"] = jnp.full(
            (L, 1), float(np.log(np.expm1(0.8 - self.xielu_beta))), jnp.float32
        )
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"].pop("gate_proj", None)
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        specs["layers"]["xielu_alpha_p"] = P(None, None)
        specs["layers"]["xielu_alpha_n"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        renamed = {}
        for name, w in weights.items():
            name = name.replace(".attention_layernorm.", ".input_layernorm.")
            name = name.replace(
                ".feedforward_layernorm.", ".post_attention_layernorm."
            )
            renamed[name] = w
        # The llama converter requires a gate_proj; alias up (dropped below).
        for i in range(L):
            renamed.setdefault(
                f"model.layers.{i}.mlp.gate_proj.weight",
                renamed[f"model.layers.{i}.mlp.up_proj.weight"],
            )
        params = super().convert_hf_weights(renamed)
        layers = params["layers"]
        layers.pop("gate_proj", None)
        for nm in ("q_norm", "k_norm"):
            layers[nm] = jnp.asarray(np.stack([
                np.asarray(renamed[f"model.layers.{i}.self_attn.{nm}.weight"])
                for i in range(L)
            ]), self.dtype)
        layers["xielu_alpha_p"] = jnp.asarray(np.stack([
            np.asarray(renamed[f"model.layers.{i}.mlp.act_fn.alpha_p"]).reshape(1)
            for i in range(L)
        ]), jnp.float32)
        layers["xielu_alpha_n"] = jnp.asarray(np.stack([
            np.asarray(renamed[f"model.layers.{i}.mlp.act_fn.alpha_n"]).reshape(1)
            for i in range(L)
        ]), jnp.float32)
        return params

    def mlp(self, lp, normed, tok_valid=None):
        h = apply_linear(lp["up_proj"], normed).astype(jnp.float32)
        beta = self.xielu_beta
        eps = self.xielu_eps
        a_p = jax.nn.softplus(lp["xielu_alpha_p"].astype(jnp.float32))
        a_n = beta + jax.nn.softplus(lp["xielu_alpha_n"].astype(jnp.float32))
        act = jnp.where(
            h > 0,
            a_p * h * h + beta * h,
            (jnp.expm1(jnp.minimum(h, eps)) - h) * a_n + beta * h,
        ).astype(normed.dtype)
        return apply_linear(lp["down_proj"], act)
