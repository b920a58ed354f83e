"""Phi-3.5-MoE (PhiMoE): mixtral-style MoE with LayerNorm (weight+bias),
sparsemixer top-2 routing, qkv/lm-head biases.

Reference: python/sglang/srt/models/phimoe.py; routing verified against HF
transformers modeling_phimoe.py sparsemixer(): at inference the two experts
are picked greedily in sequence (argmax, then argmax with the first expert
masked out), and each multiplier is the softmax — over the logits masked to
the near-max set ((max - s)/max(|s|, max) <= 2*jitter_eps) — evaluated at
the selected expert. The two weights are NOT renormalized to sum to 1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.layers.moe import moe_ffn_auto
from ltp_sglang_tpu.models.mixtral import MixtralForCausalLM


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def sparsemixer_infer(scores, jitter_eps, top_k=2):
    """Inference-time sparsemixer (top_k=2): returns (weights [T,2],
    idx [T,2])."""
    assert top_k == 2

    def pick(s):
        mx = jnp.max(s, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(s), mx)
        masked = jnp.where((mx - s) / factor > 2 * jitter_eps, -jnp.inf, s)
        sel = jnp.argmax(s, axis=-1)
        p = jax.nn.softmax(masked, axis=-1)
        w = jnp.take_along_axis(p, sel[:, None], axis=-1)[:, 0]
        return w, sel

    w1, i1 = pick(scores)
    masked2 = jnp.where(
        jax.nn.one_hot(i1, scores.shape[-1], dtype=bool), -jnp.inf, scores
    )
    w2, i2 = pick(masked2)
    return (jnp.stack([w1, w2], axis=-1).astype(jnp.float32),
            jnp.stack([i1, i2], axis=-1).astype(jnp.int32))


class PhiMoEForCausalLM(MixtralForCausalLM):
    has_bias = True  # qkv biases
    lm_head_bias = True
    supports_quant_fusion = False

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.has_bias = bool(hf.get("attention_bias", True))
        self.lm_head_bias = bool(hf.get("lm_head_bias", True))
        self.router_jitter = float(hf.get("router_jitter_noise", 0.01))
        self.norm_eps = hf.get("rms_norm_eps", 1e-5)

    # LayerNorm with bias: norm leaves are {"w", "b"} dicts.
    def norm(self, x, w):
        return _layer_norm(x, w["w"], w["b"], self.norm_eps)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        L, Dm = self.config.num_layers, self.config.hidden_size

        def ln(*lead):
            return {"w": jnp.ones((*lead, Dm), self.dtype),
                    "b": jnp.zeros((*lead, Dm), self.dtype)}

        params["layers"]["input_layernorm"] = ln(L)
        params["layers"]["post_attention_layernorm"] = ln(L)
        params["norm"] = ln()
        if self.lm_head_bias:
            params["lm_head"]["bias"] = jnp.zeros(
                (self.config.hf_config["vocab_size"],), self.dtype
            )
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["input_layernorm"] = {"w": P(None, None), "b": P(None, None)}
        specs["layers"]["post_attention_layernorm"] = {
            "w": P(None, None), "b": P(None, None)}
        specs["norm"] = {"w": P(None), "b": P(None)}
        if self.lm_head_bias:
            specs["lm_head"]["bias"] = P("tp")
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        ones = np.ones((cfg.hidden_size,), np.float32)
        # Base stacker expects bare norm weights; feed dummies, rebuild below.
        for i in range(L):
            weights.setdefault(f"model.layers.{i}.input_layernorm.weight", ones)
            weights.setdefault(
                f"model.layers.{i}.post_attention_layernorm.weight", ones)
        weights.setdefault("model.norm.weight", ones)
        params = super().convert_hf_weights(weights)

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        def ln_stack(sub):
            return {
                "w": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.weight"))
                     for i in range(L)]), self.dtype),
                "b": jnp.asarray(np.stack(
                    [np.asarray(get(f"model.layers.{i}.{sub}.bias"))
                     for i in range(L)]), self.dtype),
            }

        params["layers"]["input_layernorm"] = ln_stack("input_layernorm")
        params["layers"]["post_attention_layernorm"] = ln_stack(
            "post_attention_layernorm")
        params["norm"] = {
            "w": jnp.asarray(np.asarray(get("model.norm.weight")), self.dtype),
            "b": jnp.asarray(np.asarray(get("model.norm.bias")), self.dtype),
        }
        if self.lm_head_bias:
            params["lm_head"]["bias"] = jnp.asarray(
                np.asarray(weights["lm_head.bias"]), self.dtype)
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        w, idx = sparsemixer_infer(logits, self.router_jitter, self.top_k)
        if tok_valid is not None:
            w = jnp.where(tok_valid.reshape(-1)[:, None], w, 0.0)
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
        )
        return out.reshape(*lead, Dm)
