"""Mixtral (block-sparse MoE llama).

Reference: python/sglang/srt/models/mixtral.py. Uniform MoE layers: router
(gate) + 8 experts with w1 (gate), w3 (up), w2 (down); top-2 routing with
renormalized weights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class MixtralForCausalLM(LlamaForCausalLM):
    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.num_experts = hf.get("num_local_experts", 8)
        self.top_k = hf.get("num_experts_per_tok", 2)
        self.moe_intermediate = hf.get("intermediate_size")
        self.norm_topk_prob = True

    # ------------------------------------------------------------- parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        E, I = self.num_experts, self.moe_intermediate
        key = jax.random.PRNGKey(seed + 1)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 4)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)
        layers["router"] = {"kernel": w(ks[0], L, Dm, E)}
        layers["experts_gate"] = w(ks[1], L, E, Dm, I)
        layers["experts_up"] = w(ks[2], L, E, Dm, I)
        layers["experts_down"] = w(ks[3], L, E, I, Dm)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": P(None, None, None)}
        # Expert dim sharded over tp (acts as the "ep" axis on a 2D mesh).
        ls["experts_gate"] = P(None, "tp", None, None)
        ls["experts_up"] = P(None, "tp", None, None)
        ls["experts_down"] = P(None, "tp", None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L, E = cfg.num_layers, self.num_experts

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        # Dense parts reuse the llama mapping minus the mlp projections.
        saved = {}
        for i in range(L):
            for tgt, src in (("gate_proj", "w1"), ("down_proj", "w2"), ("up_proj", "w3")):
                # Fabricate llama-style names so super() can run: point mlp.X
                # at expert 0 (discarded below).
                weights.setdefault(
                    f"model.layers.{i}.mlp.{tgt}.weight",
                    np.asarray(get(f"model.layers.{i}.block_sparse_moe.experts.0.{src}.weight")),
                )
        params = super().convert_hf_weights(weights)
        layers = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            layers.pop(name, None)

        def stack_experts(src):
            return jnp.asarray(
                np.stack(
                    [
                        np.stack(
                            [
                                np.asarray(
                                    get(f"model.layers.{i}.block_sparse_moe.experts.{e}.{src}.weight")
                                ).T
                                for e in range(E)
                            ]
                        )
                        for i in range(L)
                    ]
                ),
                dtype=self.dtype,
            )

        layers["router"] = {
            "kernel": jnp.asarray(
                np.stack(
                    [
                        np.asarray(get(f"model.layers.{i}.block_sparse_moe.gate.weight")).T
                        for i in range(L)
                    ]
                ),
                dtype=self.dtype,
            )
        }
        layers["experts_gate"] = stack_experts("w1")
        layers["experts_up"] = stack_experts("w3")
        layers["experts_down"] = stack_experts("w2")
        return params

    # ---------------------------------------------------------------- forward
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
        return out.reshape(*lead, Dm)
