"""StableLM (stablelm-2 / stablelm-3b-4e1t lineage): llama body with
LayerNorm (weight+bias), partial rotary (factor 0.25 default), optional qkv
bias, and a gated-silu MLP.

Reference: python/sglang/srt/models/stablelm.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


class StableLmForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_eps", 1e-5)
        self.has_bias = bool(hf.get("use_qkv_bias", False))
        if hf.get("qk_layernorm") or hf.get("use_parallel_residual"):
            raise NotImplementedError(
                "stablelm qk_layernorm / parallel residual variants"
            )
        prf = hf.get("partial_rotary_factor", 0.25)
        self.rotary_dim = int(config.head_dim * prf)
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim,
            config.context_len,
            base=self.rope_theta,
            rotary_dim=self.rotary_dim,
            rope_scaling=self.rope_scaling,
        )

    def norm(self, x, w):
        return _layer_norm(x, w["w"], w["b"], self.norm_eps)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        ls = params["layers"]
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
        for name in ("input_layernorm", "post_attention_layernorm"):
            ls[name] = {"w": P(None, None), "b": P(None, None)}
        specs["norm"] = {"w": P(None), "b": P(None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        params = super().convert_hf_weights(weights)
        ls = params["layers"]

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
