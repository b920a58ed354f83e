"""Qwen (v1) — QWenLMHeadModel.

Reference: python/sglang/srt/models/qwen.py. Facts replicated:
- qwen2 math (rope + RMSNorm + SwiGLU, bias ONLY on the fused qkv
  projection — reference :107-123 hardcodes c_attn bias=True, everything
  else bias=False), MHA (no GQA).
- the config's ``intermediate_size`` is the CONCATENATED gate+up width; the
  MLP hidden is half of it (reference :262 builds QWenMLP with
  ``intermediate_size // 2``).
- checkpoint layout: transformer.h.N.{ln_1,ln_2}, attn.c_attn (fused qkv,
  with bias), attn.c_proj, mlp.w2 = gate, mlp.w1 = up (reference :329-330),
  mlp.c_proj = down, transformer.{wte,ln_f}, lm_head.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


class QWenLMHeadModel(Qwen2ForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        config.intermediate_size = config.hf_config["intermediate_size"] // 2
        super().__init__(config, attn_impl, kv_write_impl)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        H, D = cfg.num_attention_heads, cfg.head_dim
        out: Dict[str, np.ndarray] = {}
        for name, w in weights.items():
            name = (
                name.replace("transformer.wte.", "model.embed_tokens.")
                .replace("transformer.ln_f.", "model.norm.")
                .replace("transformer.h.", "model.layers.")
                .replace(".ln_1.", ".input_layernorm.")
                .replace(".ln_2.", ".post_attention_layernorm.")
                .replace(".attn.c_proj.", ".self_attn.o_proj.")
                .replace(".mlp.w2.", ".mlp.gate_proj.")
                .replace(".mlp.w1.", ".mlp.up_proj.")
                .replace(".mlp.c_proj.", ".mlp.down_proj.")
            )
            out[name] = w
        for i in range(L):
            for field in ("weight", "bias"):
                w = np.asarray(out.pop(f"model.layers.{i}.attn.c_attn.{field}"))
                q, k, v = np.split(w, 3, axis=0)
                out[f"model.layers.{i}.self_attn.q_proj.{field}"] = q
                out[f"model.layers.{i}.self_attn.k_proj.{field}"] = k
                out[f"model.layers.{i}.self_attn.v_proj.{field}"] = v
        return super().convert_hf_weights(out)
