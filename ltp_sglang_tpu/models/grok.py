"""Grok-1 (xAI) — Grok1ForCausalLM / Grok1ModelForCausalLM.

Reference: python/sglang/srt/models/grok.py. Facts replicated:
- mixtral-shaped MoE body with SANDWICH norms per block: pre_attn_norm →
  attn → post_attn_norm → +residual → pre_moe_norm → moe → post_moe_norm →
  +residual (reference :353-409's deferred fused_dual_residual_rmsnorm is
  exactly this order), mapped onto the body's sandwich leaves
  input_layernorm / post_self_attn_layernorm / post_attention_layernorm /
  post_mlp_layernorm.
- attention tanh score softcap attn_logit_softcapping=30 (reference
  :218-226) — rides the body's attn_logit_cap hook through the XLA, window
  and Pallas paged decode paths.
- router: fp32 gate, tanh softcap 30 on the router logits, softmax over all
  experts, top-2 WITHOUT renormalization (reference :107-116 + layers/moe/
  router.py:114-149 fused_moe_router_kernel: cap → softmax → topk).
- experts activate with exact (erf) GELU: gelu(w1·x) * (w3·x) → w2
  (reference :138 activation="gelu" → GeluAndMul).
- embedding_multiplier_scale on the embedding (reference :456) and
  output_multiplier_scale on the logits (the reference fuses it into
  lm_head rows at load, :640-644 — numerically identical).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.moe import moe_ffn_auto, moe_topk
from ltp_sglang_tpu.models.mixtral import MixtralForCausalLM


class Grok1ForCausalLM(MixtralForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_style = "sandwich"
        self.norm_topk_prob = False
        self.attn_logit_cap = float(hf.get("attn_logit_softcapping", 30.0) or 0.0)
        self.router_logit_cap = float(
            hf.get("router_logit_softcapping", 30.0) or 0.0
        )
        self.embed_multiplier = float(hf.get("embedding_multiplier_scale", 1.0))
        self.logits_multiplier = float(hf.get("output_multiplier_scale", 1.0))
        self.moe_intermediate = hf.get(
            "moe_intermediate_size", hf.get("intermediate_size")
        )

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        L, Dm = self.config.num_layers, self.config.hidden_size
        params["layers"]["post_self_attn_layernorm"] = jnp.ones(
            (L, Dm), dtype=self.dtype
        )
        params["layers"]["post_mlp_layernorm"] = jnp.ones((L, Dm), dtype=self.dtype)
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs["layers"]["post_self_attn_layernorm"] = P(None, None)
        specs["layers"]["post_mlp_layernorm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        renamed = {}
        for name, w in weights.items():
            name = (
                name.replace(".pre_attn_norm.", ".input_layernorm.")
                .replace(".post_attn_norm.", ".post_self_attn_layernorm.")
                .replace(".pre_moe_norm.", ".post_attention_layernorm.")
                .replace(".post_moe_norm.", ".post_mlp_layernorm.")
            )
            renamed[name] = w
        params = super().convert_hf_weights(renamed)
        L = self.config.num_layers

        def get(name):
            if name in renamed:
                return renamed[name]
            return renamed[name.replace("model.", "", 1)]

        for name in ("post_self_attn_layernorm", "post_mlp_layernorm"):
            params["layers"][name] = jnp.asarray(
                np.stack(
                    [np.asarray(get(f"model.layers.{i}.{name}.weight"))
                     for i in range(L)]
                ),
                dtype=self.dtype,
            )
        return params

    def mlp(self, lp, normed, tok_valid=None):
        lead, Dm = normed.shape[:-1], normed.shape[-1]
        x = normed.reshape(-1, Dm)
        logits = jnp.einsum(
            "td,de->te", x, lp["router"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        if self.router_logit_cap:
            cap = jnp.float32(self.router_logit_cap)
            logits = cap * jnp.tanh(logits / cap)
        w, idx = moe_topk(
            logits, self.top_k, self.norm_topk_prob,
            valid=None if tok_valid is None else tok_valid.reshape(-1),
            layer_tag=lp.get("moe_layer_idx"),
        )
        out = moe_ffn_auto(
            x, w, idx, lp["experts_gate"], lp["experts_up"], lp["experts_down"],
            mesh_ctx=self.mesh_ctx,
            tbo=getattr(self, "moe_tbo", False),
            expert_perm=lp.get("expert_perm"),
            act_fn=lambda gate, up: jax.nn.gelu(gate, approximate=False) * up,
        )
        return out.reshape(*lead, Dm)


# Some grok configs name the architecture with "Model" in the middle.
Grok1ModelForCausalLM = Grok1ForCausalLM
