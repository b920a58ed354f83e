"""GPT-OSS (OpenAI, 20B/120B) — GptOssForCausalLM.

Facts verified against HF transformers modeling_gpt_oss.py:
- GQA attention with biases everywhere + per-head learnable ATTENTION SINKS
  (an extra softmax logit whose mass is dropped — reference sinks in
  eager_attention_forward; ops/attention/reference.py `sinks`), alternating
  sliding/full layers (layer_types), yarn rope.
- MoE every layer: router = linear + bias, top-k of raw logits, softmax
  over the SELECTED values, output-combined (topk_softmax semantics);
  experts hold fused INTERLEAVED gate_up stacks [E, Dm, 2I] (gate =
  [..., ::2], up = [..., 1::2]) with per-expert biases and the clamped
  glu activation:
      gate = min(gate, limit); up = clip(up, -limit, limit)
      out  = (up + 1) * gate * sigmoid(1.702 * gate)
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


class GptOssForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False
    has_attn_sinks = True
    has_bias = True
    # Sinks/per-layer windows ride the generic per-token path only.
    forward_window_token = None
    forward_window_token_paged = None

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.num_experts = hf.get("num_local_experts", 32)
        self.top_k = hf.get("num_experts_per_tok", 4)
        self.swiglu_limit = float(hf.get("swiglu_limit") or 7.0)
        sw = hf.get("sliding_window")
        layer_types = hf.get("layer_types") or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(config.num_layers)
        ]
        if sw:
            is_sliding = np.array(
                [t == "sliding_attention" for t in layer_types], bool
            )
            self.layer_windows = jnp.asarray(
                np.where(is_sliding, int(sw), config.context_len + 1),
                jnp.int32,
            )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        cfg = self.config
        L, Dm, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        E = self.num_experts
        key = jax.random.PRNGKey(seed + 3)

        def w(key, *shape):
            return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
                self.dtype
            )

        ks = jax.random.split(key, 5)
        ls = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": w(ks[0], L, Dm, E),
                        "bias": jnp.zeros((L, E), self.dtype)}
        ls["experts_gate"] = w(ks[1], L, E, Dm, I)
        ls["experts_up"] = w(ks[2], L, E, Dm, I)
        ls["experts_down"] = w(ks[3], L, E, I, Dm)
        ls["experts_gate_bias"] = jnp.zeros((L, E, I), self.dtype)
        ls["experts_up_bias"] = jnp.zeros((L, E, I), self.dtype)
        ls["experts_down_bias"] = jnp.zeros((L, E, Dm), self.dtype)
        ls["sinks"] = w(ks[4], L, cfg.num_attention_heads)
        # gpt-oss biases EVERY projection incl. o_proj (the llama base only
        # covers qkv biases).
        HqD = cfg.num_attention_heads * cfg.head_dim
        ls["o_proj"]["bias"] = jnp.zeros((L, Dm), self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        ls = specs["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["router"] = {"kernel": P(None, None, None), "bias": P(None, None)}
        ls["experts_gate"] = P(None, "tp", None, None)
        ls["experts_up"] = P(None, "tp", None, None)
        ls["experts_down"] = P(None, "tp", None, None)
        ls["experts_gate_bias"] = P(None, "tp", None)
        ls["experts_up_bias"] = P(None, "tp", None)
        ls["experts_down_bias"] = P(None, "tp", None)
        ls["sinks"] = P(None, None)
        ls["o_proj"]["bias"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return np.asarray(weights[name])
            return np.asarray(weights[name.replace("model.", "", 1)])

        # The llama converter expects per-layer dense mlp names; synthesize
        # placeholders (dropped below — gpt-oss MLPs are the fused expert
        # stacks).
        Dm, I = cfg.hidden_size, cfg.intermediate_size
        for i in range(L):
            weights.setdefault(
                f"model.layers.{i}.mlp.gate_proj.weight", np.zeros((1, Dm), np.float32)
            )
            weights.setdefault(
                f"model.layers.{i}.mlp.up_proj.weight", np.zeros((1, Dm), np.float32)
            )
            weights.setdefault(
                f"model.layers.{i}.mlp.down_proj.weight", np.zeros((Dm, 1), np.float32)
            )
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        for name in ("gate_proj", "up_proj", "down_proj"):
            ls.pop(name, None)
        ls["o_proj"]["bias"] = jnp.asarray(np.stack([
            get(f"model.layers.{i}.self_attn.o_proj.bias") for i in range(L)
        ]), self.dtype)
        ls["router"] = {
            "kernel": jnp.asarray(np.stack([
                get(f"model.layers.{i}.mlp.router.weight").T for i in range(L)
            ]), self.dtype),
            "bias": jnp.asarray(np.stack([
                get(f"model.layers.{i}.mlp.router.bias") for i in range(L)
            ]), self.dtype),
        }
        gu = np.stack([
            get(f"model.layers.{i}.mlp.experts.gate_up_proj") for i in range(L)
        ])  # [L, E, Dm, 2I] INTERLEAVED
        gub = np.stack([
            get(f"model.layers.{i}.mlp.experts.gate_up_proj_bias")
            for i in range(L)
        ])  # [L, E, 2I]
        ls["experts_gate"] = jnp.asarray(gu[..., ::2], self.dtype)
        ls["experts_up"] = jnp.asarray(gu[..., 1::2], self.dtype)
        ls["experts_gate_bias"] = jnp.asarray(gub[..., ::2], self.dtype)
        ls["experts_up_bias"] = jnp.asarray(gub[..., 1::2], self.dtype)
        ls["experts_down"] = jnp.asarray(np.stack([
            get(f"model.layers.{i}.mlp.experts.down_proj") for i in range(L)
        ]), self.dtype)
        ls["experts_down_bias"] = jnp.asarray(np.stack([
            get(f"model.layers.{i}.mlp.experts.down_proj_bias")
            for i in range(L)
        ]), self.dtype)
        ls["sinks"] = jnp.asarray(np.stack([
            get(f"model.layers.{i}.self_attn.sinks") for i in range(L)
        ]), self.dtype)
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        ) + lp["router"]["bias"].astype(jnp.float32)
        w, idx = moe_topk(
            logits, self.top_k, False, scoring="topk_softmax",
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
        )
        lim = self.swiglu_limit

        def act_fn(gate, up):
            gate = jnp.minimum(gate, lim)
            up = jnp.clip(up, -lim, lim)
            glu = gate * jax.nn.sigmoid(gate * 1.702)
            return (up + 1.0) * glu

        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
            gate_bias=lp["experts_gate_bias"],
            up_bias=lp["experts_up_bias"],
            down_bias=lp["experts_down_bias"],
            act_fn=act_fn,
        )
        return out.reshape(*lead, Dm)
