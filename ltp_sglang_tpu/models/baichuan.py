"""Baichuan / Baichuan2 — BaichuanForCausalLM (also the BaiChuan 7B spelling).

Reference: python/sglang/srt/models/baichuan.py. Facts replicated:
- llama body (MHA, RMSNorm, SwiGLU, no biases) with a fused ``W_pack`` qkv
  projection (reference :152-208 splits it q/k/v in thirds).
- 7B geometry (hidden_size == 4096) uses rope; 13B (5120) uses ALIBI with
  the standard closest-power-of-two slope schedule and NO rotary at all
  (reference :426-437 picks by hidden_size, :52-74 slopes — identical
  formula to bloom's build_alibi_tensor slopes).
- Baichuan2 checkpoints (vocab_size == 125696) store an unnormalized
  NormHead; the lm_head rows are L2-normalized at load (reference :395-404).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.gpt_classics import bloom_alibi_slopes
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class BaichuanForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        # The released configs carry no explicit flag; the reference picks by
        # hidden_size (:426-437). Honor an explicit "position_embedding"
        # field first so non-production geometries remain testable.
        pe = config.hf_config.get("position_embedding")
        if pe:
            self.use_alibi = str(pe).upper() == "ALIBI"
        else:
            self.use_alibi = config.hidden_size != 4096
        if self.use_alibi:
            self.rope_layer_on = jnp.zeros((config.num_layers,), dtype=bool)
            self.alibi_slopes = jnp.asarray(
                bloom_alibi_slopes(config.num_attention_heads), dtype=jnp.float32
            )
            # The Pallas paged decode kernel has no bias input; the
            # two-source window fn applies ALiBi in-softmax instead.
            self.forward_window_token_paged = None

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.config.num_layers
        for i in range(L):
            key = f"model.layers.{i}.self_attn.W_pack.weight"
            alt = key.replace("model.", "", 1)
            w = np.asarray(weights.pop(key, None) if key in weights else weights.pop(alt))
            q, k, v = np.split(w, 3, axis=0)
            weights[f"model.layers.{i}.self_attn.q_proj.weight"] = q
            weights[f"model.layers.{i}.self_attn.k_proj.weight"] = k
            weights[f"model.layers.{i}.self_attn.v_proj.weight"] = v
        if self.config.vocab_size == 125696 and "lm_head.weight" in weights:
            head = np.asarray(weights["lm_head.weight"], dtype=np.float32)
            norms = np.linalg.norm(head, axis=-1, keepdims=True)
            weights["lm_head.weight"] = head / np.maximum(norms, 1e-12)
        return super().convert_hf_weights(weights)
