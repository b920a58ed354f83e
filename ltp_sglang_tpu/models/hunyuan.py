"""Hunyuan-V1 dense (Tencent) — HunYuanDenseV1ForCausalLM.

Facts verified against HF transformers modeling_hunyuan_v1_dense.py:
llama-style GQA with per-head query/key RMS norms applied AFTER rope
(query_layernorm/key_layernorm), silu gated MLP, untied head.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # qk norms
    qk_norm_post_rope = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        self.has_bias = bool(config.hf_config.get("attention_bias", False))

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        L, D = self.config.num_layers, self.config.head_dim
        params["layers"]["q_norm"] = jnp.ones((L, D), dtype=self.dtype)
        params["layers"]["k_norm"] = jnp.ones((L, D), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().convert_hf_weights(weights)
        L = self.config.num_layers

        def get(n):
            return weights.get(n, weights.get(n.replace("model.", "", 1)))

        for nm, src in (("q_norm", "query_layernorm"), ("k_norm", "key_layernorm")):
            params["layers"][nm] = jnp.asarray(np.stack([
                np.asarray(get(f"model.layers.{i}.self_attn.{src}.weight"))
                for i in range(L)
            ]), self.dtype)
        return params


class HunYuanMoEV1ForCausalLM(HunYuanDenseV1ForCausalLM):
    """Hunyuan-V1 MoE (Hunyuan-A13B lineage): the dense body's post-rope
    qk-norm attention + MoE FFN with an ALWAYS-ON ungated shared MLP.

    Facts verified against HF modeling_hunyuan_v1_moe.py: router `gate.wg`
    scores in fp32, softmax over all experts -> top-k -> renormalize
    (always), expert MLPs use `intermediate_size`, and the shared MLP adds
    without a gate scalar (HunYuanMoEV1Moe.forward). Reference:
    python/sglang/srt/models/hunyuan.py."""

    def __init__(self, config, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.num_experts = hf.get("num_experts", 16)
        topk = hf.get("moe_topk", 2)
        self.top_k = topk[0] if isinstance(topk, (list, tuple)) else topk
        if not isinstance(self.num_experts, int):
            raise NotImplementedError("per-layer num_experts lists")
        self.moe_intermediate = hf.get(
            "moe_intermediate_size", hf.get("intermediate_size")
        )
        if isinstance(self.moe_intermediate, (list, tuple)):
            self.moe_intermediate = self.moe_intermediate[0]

    def init_params(self, seed: int = 0):
        import jax

        params = super().init_params(seed)
        cfg = self.config
        L, Dm = cfg.num_layers, cfg.hidden_size
        E, I = self.num_experts, self.moe_intermediate
        Is = cfg.intermediate_size
        key = jax.random.PRNGKey(seed + 3)

        def w(key, *shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02
                    ).astype(self.dtype)

        ks = jax.random.split(key, 7)
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
        return params

    def param_specs(self):
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
        return specs

    def convert_hf_weights(self, weights):
        cfg = self.config
        L, E = cfg.num_layers, self.num_experts

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        # Satisfy the base dense stacker, then replace with the MoE leaves.
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
                np.stack([
                    np.stack([lin(i, f"mlp.experts.{e}.{src}") for e in range(E)])
                    for i in range(L)
                ]),
                dtype=self.dtype,
            )

        layers["router"] = {"kernel": jnp.asarray(
            np.stack([lin(i, "mlp.gate.wg") for i in range(L)]), dtype=self.dtype
        )}
        layers["experts_gate"] = stack_experts("gate_proj")
        layers["experts_up"] = stack_experts("up_proj")
        layers["experts_down"] = stack_experts("down_proj")
        for tgt, src in (
            ("shared_gate_proj", "mlp.shared_mlp.gate_proj"),
            ("shared_up_proj", "mlp.shared_mlp.up_proj"),
            ("shared_down_proj", "mlp.shared_mlp.down_proj"),
        ):
            layers[tgt] = {"kernel": jnp.asarray(
                np.stack([lin(i, src) for i in range(L)]), dtype=self.dtype
            )}
        return params

    def mlp(self, lp, normed, tok_valid=None):
        import jax

        from ltp_sglang_tpu.layers.linear import apply_linear
        from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk

        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x.astype(jnp.float32), lp["router"]["kernel"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        w, idx = moe_topk(logits, self.top_k, norm_topk_prob=True,
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
        out = out + apply_linear(lp["shared_down_proj"], jax.nn.silu(g) * u)
        return out.reshape(*lead, Dm)
