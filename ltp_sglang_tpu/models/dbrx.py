"""DBRX: fused Wqkv with clip_qkv, bias-free LayerNorms, and a GLU MoE whose
expert weights are stored FLATTENED ([E·I, D] w1/v1/w2).

Reference: python/sglang/srt/models/dbrx.py. Config is nested: attn_config
(clip_qkv, kv_n_heads, rope_theta) and ffn_config (ffn_hidden_size,
moe_num_experts, moe_top_k, moe_normalize_expert_weights).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _ln_nobias(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype
    )


class DbrxForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        ac = hf.get("attn_config") or {}
        fc = hf.get("ffn_config") or {}
        self.clip_qkv = ac.get("clip_qkv")
        self.rope_theta = ac.get("rope_theta", 10000.0)
        self.cos_sin_cache = build_cos_sin_cache(
            config.head_dim, config.context_len, base=self.rope_theta
        )
        self.moe_intermediate = fc.get("ffn_hidden_size", 1024)
        self.num_experts = fc.get("moe_num_experts", 16)
        self.top_k = fc.get("moe_top_k", 4)
        # moe_normalize_expert_weights=1.0 is an L1 norm over positive
        # softmax weights == sum-normalization.
        self.norm_topk_prob = bool(fc.get("moe_normalize_expert_weights"))

    def norm(self, x, w):
        return _ln_nobias(x, w)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        E, I = self.num_experts, self.moe_intermediate
        key = jax.random.PRNGKey(seed + 1)

        def w(key, *shape):
            return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 4)
        ls = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": w(ks[0], L, Dm, E)}
        ls["experts_gate"] = w(ks[1], L, E, Dm, I)
        ls["experts_up"] = w(ks[2], L, E, Dm, I)
        ls["experts_down"] = w(ks[3], L, E, I, Dm)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": P(None, None, None)}
        ls["experts_gate"] = P(None, "tp", None, None)
        ls["experts_up"] = P(None, "tp", None, None)
        ls["experts_down"] = P(None, "tp", None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, E, I = cfg.num_layers, self.num_experts, self.moe_intermediate
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        def get(name):
            return np.asarray(weights[name])

        def stack_ln(fmt):
            return jnp.asarray(
                np.stack([get(fmt.format(i)) for i in range(L)]), self.dtype
            )

        qs, ks_, vs = [], [], []
        for i in range(L):
            w = get(f"transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight")
            q = w[: Hq * D]
            k = w[Hq * D: (Hq + Hkv) * D]
            v = w[(Hq + Hkv) * D:]
            qs.append(q.T); ks_.append(k.T); vs.append(v.T)

        def stack_lin(fmt, transpose=True):
            ws = [get(fmt.format(i)) for i in range(L)]
            if transpose:
                ws = [w.T for w in ws]
            return {"kernel": jnp.asarray(np.stack(ws), self.dtype)}

        gates, ups, downs, routers = [], [], [], []
        for i in range(L):
            w1 = get(f"transformer.blocks.{i}.ffn.experts.mlp.w1")  # [E·I, D]
            v1 = get(f"transformer.blocks.{i}.ffn.experts.mlp.v1")
            w2 = get(f"transformer.blocks.{i}.ffn.experts.mlp.w2")
            Dm = w1.shape[1]
            gates.append(w1.reshape(E, I, Dm).transpose(0, 2, 1))  # [E, Dm, I]
            ups.append(v1.reshape(E, I, Dm).transpose(0, 2, 1))
            downs.append(w2.reshape(E, I, Dm))  # x@[I, Dm] per expert
            routers.append(
                get(f"transformer.blocks.{i}.ffn.router.layer.weight").T
            )
        layers = {
            "input_layernorm": stack_ln(
                "transformer.blocks.{}.norm_attn_norm.norm_1.weight"),
            "post_attention_layernorm": stack_ln(
                "transformer.blocks.{}.norm_attn_norm.norm_2.weight"),
            "q_proj": {"kernel": jnp.asarray(np.stack(qs), self.dtype)},
            "k_proj": {"kernel": jnp.asarray(np.stack(ks_), self.dtype)},
            "v_proj": {"kernel": jnp.asarray(np.stack(vs), self.dtype)},
            "o_proj": stack_lin(
                "transformer.blocks.{}.norm_attn_norm.attn.out_proj.weight"),
            "router": {"kernel": jnp.asarray(np.stack(routers), self.dtype)},
            "experts_gate": jnp.asarray(np.stack(gates), self.dtype),
            "experts_up": jnp.asarray(np.stack(ups), self.dtype),
            "experts_down": jnp.asarray(np.stack(downs), self.dtype),
            "k_scale": jnp.ones((L,), jnp.float32),
            "v_scale": jnp.ones((L,), jnp.float32),
        }
        params = {
            "embed": {"weight": jnp.asarray(
                get("transformer.wte.weight"), self.dtype)},
            "layers": layers,
            "norm": jnp.asarray(get("transformer.norm_f.weight"), self.dtype),
            "lm_head": {"kernel": jnp.asarray(
                get("lm_head.weight").T, self.dtype)},
        }
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        w, idx = moe_topk(
            logits, self.top_k, self.norm_topk_prob,
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
        )
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False), expert_perm=lp.get("expert_perm"),
        )
        return out.reshape(*lead, Dm)
