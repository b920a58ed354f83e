"""Phi-3 — llama architecture with fused qkv_proj / gate_up_proj checkpoints.

Reference: python/sglang/srt/models/phi3* (vllm lineage). The fused weights
are split at load time into our separate projection layout.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        I = cfg.intermediate_size

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        # Split fused tensors into llama-style names, then reuse the base
        # converter.
        for i in range(L):
            qkv = np.asarray(get(f"model.layers.{i}.self_attn.qkv_proj.weight"))
            q, k, v = np.split(qkv, [Hq * D, Hq * D + Hkv * D], axis=0)
            weights[f"model.layers.{i}.self_attn.q_proj.weight"] = q
            weights[f"model.layers.{i}.self_attn.k_proj.weight"] = k
            weights[f"model.layers.{i}.self_attn.v_proj.weight"] = v
            gu = np.asarray(get(f"model.layers.{i}.mlp.gate_up_proj.weight"))
            g, u = np.split(gu, [I], axis=0)
            weights[f"model.layers.{i}.mlp.gate_proj.weight"] = g
            weights[f"model.layers.{i}.mlp.up_proj.weight"] = u
        return super().convert_hf_weights(weights)
