"""Cohere Command-R family.

Reference: python/sglang/srt/models/commandr.py. Facts replicated:
- LayerNorm WITHOUT bias (mean-centered, learned weight only).
- Parallel block: one input norm feeds both attention and MLP;
  h = h + attn_out + mlp_out (norm_style="parallel").
- Interleaved (gptj-style) rotary; logits multiplied by logit_scale;
  embeddings always tied.
- Optional use_qk_norm: per-head LayerNorm on q/k before rope.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _ln_nobias(x, w, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype
    )


class CohereForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_eps = hf.get("layer_norm_eps", 1e-5)
        self.tie_word_embeddings = True
        self.norm_style = "parallel"
        self.rope_style = "gptj"
        self.logits_multiplier = hf.get("logit_scale", 1.0)
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        if self.use_qk_norm:
            # Per-head LayerNorm (weight [H, D], no bias).
            self.qk_norm_fn = lambda x, w: _ln_nobias(x, w, self.norm_eps)

    def norm(self, x, w):
        return _ln_nobias(x, w, self.norm_eps)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        ls = params["layers"]
        ls.pop("post_attention_layernorm", None)  # parallel block: one norm
        if self.use_qk_norm:
            ls["q_norm"] = jnp.ones((L, Hq, D), dtype=self.dtype)
            ls["k_norm"] = jnp.ones((L, Hkv, D), dtype=self.dtype)
        params.pop("lm_head", None)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        ls.pop("post_attention_layernorm", None)
        if self.use_qk_norm:
            ls["q_norm"] = P(None, "tp", None)
            ls["k_norm"] = P(None, "tp", None)
        specs.pop("lm_head", None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        ones = np.ones((cfg.hidden_size,), dtype=np.float32)
        for i in range(L):
            weights.setdefault(
                f"model.layers.{i}.post_attention_layernorm.weight", ones
            )
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        ls.pop("post_attention_layernorm", None)

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        if self.use_qk_norm:
            ls["q_norm"] = jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.self_attn.q_norm.weight"))
                     for i in range(L)]
                ),
                dtype=self.dtype,
            )
            ls["k_norm"] = jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.self_attn.k_norm.weight"))
                     for i in range(L)]
                ),
                dtype=self.dtype,
            )
        params.pop("lm_head", None)
        return params


class Cohere2ForCausalLM(CohereForCausalLM):
    """Command-R7B / Cohere2: cohere's parallel block + interleaved sliding
    windows (3 sliding : 1 full via layer_types or sliding_window_pattern);
    rope applies ONLY on sliding layers (full layers are NoPE). Verified
    against HF modeling_cohere2.py."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        sw = hf.get("sliding_window")
        layer_types = hf.get("layer_types")
        if layer_types is None and hf.get("sliding_window_pattern"):
            pat = int(hf["sliding_window_pattern"])
            layer_types = [
                "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
                for i in range(config.num_layers)
            ]
        if sw and layer_types:
            is_sliding = np.array(
                [t == "sliding_attention" for t in layer_types], bool
            )
            self.layer_windows = jnp.asarray(
                np.where(is_sliding, int(sw), config.context_len + 1),
                jnp.int32,
            )
            self.rope_layer_on = jnp.asarray(is_sliding)
            self.forward_window_token_paged = None
