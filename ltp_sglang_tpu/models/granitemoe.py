"""IBM GraniteMoE: granite's four scalar multipliers + a gated MoE whose
router takes top-k of the RAW logits and softmaxes only the selected pair
(GraniteMoeTopKGating), with fused per-expert input_linear [E, 2I, D]
(chunk -> silu(gate) * up) and output_linear [E, D, I].

Reference: python/sglang/srt/models/granitemoe.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class GraniteMoeForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.embed_multiplier = hf.get("embedding_multiplier", 1.0)
        self.sm_scale = hf.get("attention_multiplier", config.head_dim**-0.5)
        self.residual_multiplier = hf.get("residual_multiplier", 1.0)
        self.logits_multiplier = 1.0 / hf.get("logits_scaling", 1.0)
        self.num_experts = hf.get("num_local_experts", 8)
        self.top_k = hf.get("num_experts_per_tok", 2)

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        E = self.num_experts
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
        L, E = cfg.num_layers, self.num_experts
        Dm, I = cfg.hidden_size, cfg.intermediate_size

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        # Satisfy the base stacker, then replace with MoE leaves.
        for i in range(L):
            for tgt, shape in (("gate_proj", (I, Dm)), ("up_proj", (I, Dm)),
                               ("down_proj", (Dm, I))):
                weights.setdefault(
                    f"model.layers.{i}.mlp.{tgt}.weight",
                    np.zeros(shape, dtype=np.float32),
                )
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)

        gates, ups, downs, routers = [], [], [], []
        for i in range(L):
            inp = np.asarray(
                get(f"model.layers.{i}.block_sparse_moe.input_linear.weight")
            )  # [E, 2I, Dm]
            outp = np.asarray(
                get(f"model.layers.{i}.block_sparse_moe.output_linear.weight")
            )  # [E, Dm, I]
            g, u = np.split(inp, 2, axis=1)  # chunk(2, dim=-2 of [2I, Dm])
            gates.append(g.transpose(0, 2, 1))  # [E, Dm, I]
            ups.append(u.transpose(0, 2, 1))
            downs.append(outp.transpose(0, 2, 1))  # [E, I, Dm]
            routers.append(
                np.asarray(
                    get(f"model.layers.{i}.block_sparse_moe.router.layer.weight")
                ).T
            )
        ls["router"] = {"kernel": jnp.asarray(np.stack(routers), self.dtype)}
        ls["experts_gate"] = jnp.asarray(np.stack(gates), self.dtype)
        ls["experts_up"] = jnp.asarray(np.stack(ups), self.dtype)
        ls["experts_down"] = jnp.asarray(np.stack(downs), self.dtype)
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        w, idx = moe_topk(
            logits, self.top_k, False, scoring="topk_softmax",
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
        )
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False), expert_perm=lp.get("expert_perm"),
        )
        return out.reshape(*lead, Dm)


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """GraniteMoeShared (granite-4.0 preview lineage): GraniteMoe plus an
    always-on shared MLP with a FUSED input_linear [Dm, 2*Is] (chunk ->
    silu(a) * b -> output_linear), summed with the routed output.
    Verified against HF modeling_granitemoeshared.py."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.shared_intermediate = config.hf_config.get(
            "shared_intermediate_size", 0
        )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        if self.shared_intermediate:
            cfg = self.config
            L, Dm, Is = cfg.num_layers, cfg.hidden_size, self.shared_intermediate
            key = jax.random.PRNGKey(seed + 5)
            k1, k2 = jax.random.split(key)

            def w(key, *shape):
                return (
                    jax.random.normal(key, shape, jnp.float32) * 0.02
                ).astype(self.dtype)

            params["layers"]["shared_input_linear"] = {
                "kernel": w(k1, L, Dm, 2 * Is)
            }
            params["layers"]["shared_output_linear"] = {
                "kernel": w(k2, L, Is, Dm)
            }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        if self.shared_intermediate:
            specs["layers"]["shared_input_linear"] = {"kernel": P(None, None, "tp")}
            specs["layers"]["shared_output_linear"] = {"kernel": P(None, "tp", None)}
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        if self.shared_intermediate:
            L = self.config.num_layers

            def get(name):
                return weights.get(name, weights.get(name.replace("model.", "", 1)))

            for tgt, src in (
                ("shared_input_linear", "shared_mlp.input_linear"),
                ("shared_output_linear", "shared_mlp.output_linear"),
            ):
                params["layers"][tgt] = {
                    "kernel": jnp.asarray(np.stack([
                        np.asarray(get(f"model.layers.{i}.{src}.weight")).T
                        for i in range(L)
                    ]), self.dtype)
                }
        return params

    def mlp(self, lp, normed, tok_valid=None):
        out = super().mlp(lp, normed, tok_valid)
        if not self.shared_intermediate:
            return out
        fused = jnp.einsum(
            "...d,dk->...k", normed, lp["shared_input_linear"]["kernel"],
            preferred_element_type=jnp.float32,
        ).astype(normed.dtype)
        a, b = jnp.split(fused, 2, axis=-1)
        shared = jnp.einsum(
            "...k,kd->...d", jax.nn.silu(a.astype(jnp.float32)).astype(
                normed.dtype) * b,
            lp["shared_output_linear"]["kernel"],
            preferred_element_type=jnp.float32,
        ).astype(normed.dtype)
        return out + shared
