"""OLMo (v1) and OLMo2.

Reference: python/sglang/srt/models/olmo.py and olmo2.py. Facts replicated:
- OLMo: NON-PARAMETRIC LayerNorm (no weight/bias, eps=1e-5, computed in f32),
  optional clip_qkv clamp on the q/k/v projections, SwiGLU MLP, untied head.
- OLMo2: no pre-norms — RMS norms are applied to the attention and MLP block
  OUTPUTS before the residual add (post_attention_layernorm /
  post_feedforward_layernorm); q/k get a full-projection-width RMS norm
  BEFORE rope (hooks norm_style="post_out" / qk_norm_full in llama.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _ln_noparam(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class OlmoForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.clip_qkv = config.hf_config.get("clip_qkv")

    # Norm leaves exist (ones) but OLMo's LayerNorm is non-parametric.
    def norm(self, x, w):
        return _ln_noparam(x)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # The checkpoint has no norm weights; synthesize unit leaves so the
        # base-class stacker finds them (norm() ignores the values).
        cfg = self.config
        ones = np.ones((cfg.hidden_size,), dtype=np.float32)
        for i in range(cfg.num_layers):
            weights.setdefault(f"model.layers.{i}.input_layernorm.weight", ones)
            weights.setdefault(
                f"model.layers.{i}.post_attention_layernorm.weight", ones
            )
        weights.setdefault("model.norm.weight", ones)
        return super().convert_hf_weights(weights)


class Olmo2ForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False
    qk_norm_full = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.norm_style = "post_out"
        self.qk_norm_full = True

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        ls = params["layers"]
        ls.pop("input_layernorm", None)
        ls["post_feedforward_layernorm"] = jnp.ones((L, Dm), dtype=self.dtype)
        ls["q_norm"] = jnp.ones((L, Hq * D), dtype=self.dtype)
        ls["k_norm"] = jnp.ones((L, Hkv * D), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        ls.pop("input_layernorm", None)
        ls["post_feedforward_layernorm"] = P(None, None)
        ls["q_norm"] = P(None, "tp")
        ls["k_norm"] = P(None, "tp")
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        # No input_layernorm in the checkpoint; feed a dummy for the base
        # stacker, then drop the leaf.
        ones = np.ones((cfg.hidden_size,), dtype=np.float32)
        for i in range(L):
            weights.setdefault(f"model.layers.{i}.input_layernorm.weight", ones)
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        ls.pop("input_layernorm", None)

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def stack(sub):
            return jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.weight"))
                     for i in range(L)]
                ),
                dtype=self.dtype,
            )

        ls["post_feedforward_layernorm"] = stack("post_feedforward_layernorm")
        ls["q_norm"] = stack("self_attn.q_norm")
        ls["k_norm"] = stack("self_attn.k_norm")
        return params
