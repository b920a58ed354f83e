"""Qwen2-MoE (Qwen1.5-MoE-A2.7B lineage): qwen2 attention (qkv bias) +
MoE FFN with an always-on shared expert gated by a sigmoid scalar.

Reference: python/sglang/srt/models/qwen2_moe.py. Uniform sparse layers only
(decoder_sparse_step == 1 and no mlp_only_layers).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.layers.linear import apply_linear
from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


class Qwen2MoeForCausalLM(Qwen2ForCausalLM):
    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.num_experts = hf.get("num_experts", 60)
        self.top_k = hf.get("num_experts_per_tok", 4)
        self.moe_intermediate = hf.get("moe_intermediate_size", 1408)
        self.shared_intermediate = hf.get("shared_expert_intermediate_size", 5632)
        self.norm_topk_prob = hf.get("norm_topk_prob", False)
        if hf.get("mlp_only_layers") or hf.get("decoder_sparse_step", 1) != 1:
            raise NotImplementedError("non-uniform qwen2-moe layers not supported yet")

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        E, I, Is = self.num_experts, self.moe_intermediate, self.shared_intermediate
        key = jax.random.PRNGKey(seed + 1)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 8)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)
        layers["router"] = {"kernel": w(ks[0], L, Dm, E)}
        layers["experts_gate"] = w(ks[1], L, E, Dm, I)
        layers["experts_up"] = w(ks[2], L, E, Dm, I)
        layers["experts_down"] = w(ks[3], L, E, I, Dm)
        layers["shared_gate_proj"] = {"kernel": w(ks[4], L, Dm, Is)}
        layers["shared_up_proj"] = {"kernel": w(ks[5], L, Dm, Is)}
        layers["shared_down_proj"] = {"kernel": w(ks[6], L, Is, Dm)}
        layers["shared_expert_gate"] = {"kernel": w(ks[7], L, Dm, 1)}
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
        ls["shared_gate_proj"] = {"kernel": P(None, None, "tp")}
        ls["shared_up_proj"] = {"kernel": P(None, None, "tp")}
        ls["shared_down_proj"] = {"kernel": P(None, "tp", None)}
        ls["shared_expert_gate"] = {"kernel": P(None, None, None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, E = cfg.num_layers, self.num_experts

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        for i in range(L):
            for tgt in ("gate_proj", "up_proj", "down_proj"):
                weights.setdefault(
                    f"model.layers.{i}.mlp.{tgt}.weight",
                    np.asarray(get(f"model.layers.{i}.mlp.experts.0.{tgt}.weight")),
                )
        params = super().convert_hf_weights(weights)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)

        def lin(i, sub):
            return np.asarray(get(f"model.layers.{i}.{sub}.weight")).T

        def stack_experts(src):
            return jnp.asarray(
                np.stack(
                    [
                        np.stack([lin(i, f"mlp.experts.{e}.{src}") for e in range(E)])
                        for i in range(L)
                    ]
                ),
                dtype=self.dtype,
            )

        layers["router"] = {
            "kernel": jnp.asarray(
                np.stack([lin(i, "mlp.gate") for i in range(L)]), dtype=self.dtype
            )
        }
        layers["experts_gate"] = stack_experts("gate_proj")
        layers["experts_up"] = stack_experts("up_proj")
        layers["experts_down"] = stack_experts("down_proj")
        for tgt, src in (
            ("shared_gate_proj", "mlp.shared_expert.gate_proj"),
            ("shared_up_proj", "mlp.shared_expert.up_proj"),
            ("shared_down_proj", "mlp.shared_expert.down_proj"),
            ("shared_expert_gate", "mlp.shared_expert_gate"),
        ):
            layers[tgt] = {
                "kernel": jnp.asarray(
                    np.stack([lin(i, src) for i in range(L)]), dtype=self.dtype
                )
            }
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"], preferred_element_type=jnp.float32
        )
        w, idx = moe_topk(logits, self.top_k, self.norm_topk_prob,
                          valid=None if tok_valid is None else tok_valid.reshape(-1),
                          layer_tag=lp.get("moe_layer_idx"))
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
        )
        g = apply_linear(lp["shared_gate_proj"], x)
        u = apply_linear(lp["shared_up_proj"], x)
        shared = apply_linear(lp["shared_down_proj"], jax.nn.silu(g) * u)
        gate_scalar = jax.nn.sigmoid(
            jnp.einsum("td,dk->tk", x, lp["shared_expert_gate"]["kernel"]).astype(
                jnp.float32
            )
        )
        out = out + shared * gate_scalar.astype(shared.dtype)
        return out.reshape(*lead, Dm)
