"""NVIDIA Nemotron: llama body with LayerNorm1P ((1+w)·LN + bias), a squared-
ReLU up/down MLP (no gate), and partial rotary (factor 0.5).

Reference: python/sglang/srt/models/nemotron.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _ln1p(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * (w.astype(jnp.float32) + 1.0)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


class NemotronForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("norm_eps", 1e-5)
        prf = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * prf)
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim,
            config.context_len,
            base=self.rope_theta,
            rotary_dim=self.rotary_dim,
            rope_scaling=self.rope_scaling,
        )

    def norm(self, x, w):
        return _ln1p(x, w["w"], w["b"], self.norm_eps)

    def mlp(self, lp, normed, tok_valid=None):
        up = apply_linear(lp["up_proj"], normed)
        return apply_linear(lp["down_proj"], jnp.square(jax.nn.relu(up)))

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        ls = params["layers"]
        ls.pop("gate_proj", None)
        for name in ("input_layernorm", "post_attention_layernorm"):
            ls[name] = {
                "w": jnp.ones((L, Dm), self.dtype),
                "b": jnp.zeros((L, Dm), self.dtype),
            }
        params["norm"] = {
            "w": jnp.ones((Dm,), self.dtype),
            "b": jnp.zeros((Dm,), self.dtype),
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        ls.pop("gate_proj", None)
        for name in ("input_layernorm", "post_attention_layernorm"):
            ls[name] = {"w": P(None, None), "b": P(None, None)}
        specs["norm"] = {"w": P(None), "b": P(None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        # Satisfy the base stacker for leaves we replace below.
        ones = np.ones((Dm,), dtype=np.float32)
        for i in range(L):
            weights.setdefault(f"model.layers.{i}.input_layernorm.weight", ones)
            weights.setdefault(
                f"model.layers.{i}.post_attention_layernorm.weight", ones
            )
            weights.setdefault(
                f"model.layers.{i}.mlp.gate_proj.weight",
                np.zeros((1, Dm), dtype=np.float32),
            )
        weights.setdefault("model.norm.weight", ones)
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        ls.pop("gate_proj", None)

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def ln(sub):
            return {
                "w": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.weight"))
                     for i in range(L)]), self.dtype),
                "b": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.bias"))
                     for i in range(L)]), self.dtype),
            }

        ls["input_layernorm"] = ln("input_layernorm")
        ls["post_attention_layernorm"] = ln("post_attention_layernorm")
        params["norm"] = {
            "w": jnp.asarray(np.asarray(get("model.norm.weight")), self.dtype),
            "b": jnp.asarray(np.asarray(get("model.norm.bias")), self.dtype),
        }
        return params
