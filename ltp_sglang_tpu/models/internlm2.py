"""InternLM2 — InternLM2ForCausalLM.

Reference: python/sglang/srt/models/internlm2.py. The architecture is the
llama body (GQA + rope + RMSNorm + SwiGLU, no biases); only the checkpoint
layout differs:

- ``model.tok_embeddings`` / ``output`` replace embed_tokens / lm_head.
- ``attention.wqkv`` packs q/k/v GROUPED PER KV HEAD: the weight reshapes to
  [Hkv, q_per_kv + 2, D, hidden] where rows [0:q_per_kv] are that group's q
  heads, row q_per_kv is k and row q_per_kv+1 is v (reference
  internlm2.py:335-345 splits with exactly this reshape).
- ``feed_forward.w1/w3/w2`` are gate/up/down (reference :312-313) and
  ``attention_norm``/``ffn_norm`` the two pre-norms.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        q_per = Hq // Hkv
        out: Dict[str, np.ndarray] = {}
        for name, w in weights.items():
            name = (
                name.replace("model.tok_embeddings.", "model.embed_tokens.")
                .replace(".attention_norm.", ".input_layernorm.")
                .replace(".ffn_norm.", ".post_attention_layernorm.")
                .replace(".attention.wo.", ".self_attn.o_proj.")
                .replace(".feed_forward.w1.", ".mlp.gate_proj.")
                .replace(".feed_forward.w3.", ".mlp.up_proj.")
                .replace(".feed_forward.w2.", ".mlp.down_proj.")
            )
            if name == "output.weight":
                name = "lm_head.weight"
            out[name] = w
        for i in range(L):
            key = f"model.layers.{i}.attention.wqkv.weight"
            wqkv = np.asarray(out.pop(key)).reshape(Hkv, q_per + 2, D, -1)
            out[f"model.layers.{i}.self_attn.q_proj.weight"] = wqkv[
                :, :q_per
            ].reshape(Hq * D, -1)
            out[f"model.layers.{i}.self_attn.k_proj.weight"] = wqkv[
                :, q_per
            ].reshape(Hkv * D, -1)
            out[f"model.layers.{i}.self_attn.v_proj.weight"] = wqkv[
                :, q_per + 1
            ].reshape(Hkv * D, -1)
        return super().convert_hf_weights(out)
