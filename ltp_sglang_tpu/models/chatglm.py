"""ChatGLM (THUDM glm-2/3/4 checkpoint format) — ChatGLMModel /
ChatGLMForCausalLM / ChatGLMForConditionalGeneration.

Reference: python/sglang/srt/models/chatglm.py. Facts replicated:
- the math is the HF ``glm`` architecture our GlmForCausalLM already
  implements bit-for-bit: partial interleaved rotary (rotary_dim =
  head_dim // 2, gptj pair layout, reference :103-109 is_neox_style=False,
  base = 10000 * rope_ratio), MQA via multi_query_group_num, RMSNorm,
  SwiGLU with the gate in the FIRST half of the fused projection
  (reference :158-166 MergedColumnParallelLinear + SiluAndMul).
- qkv carries bias when add_qkv_bias (all released chatglm2/3/glm4
  checkpoints); dense/o_proj does not (add_bias_linear False).
- pre-norm residual (apply_residual_connection_post_layernorm is False in
  every released config; reference :245-252 only then matches pre-norm).
- checkpoint layout: transformer.embedding.word_embeddings,
  transformer.encoder.layers.N.{self_attention.query_key_value,
  self_attention.dense, mlp.dense_h_to_4h, mlp.dense_4h_to_h,
  input_layernorm, post_attention_layernorm},
  transformer.encoder.final_layernorm, transformer.output_layer.

Config translation (ffn_hidden_size, multi_query_group_num, kv_channels,
padded_vocab_size, seq_length, layernorm_epsilon) happens in
config/model_config.py's alias table.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.glm4 import GlmForCausalLM


class ChatGLMForCausalLM(GlmForCausalLM):
    supports_quant_fusion = False

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        if hf.get("apply_residual_connection_post_layernorm", False):
            raise NotImplementedError(
                "chatglm post-layernorm residual variant (no released config)"
            )
        if not hf.get("rmsnorm", True):
            raise NotImplementedError("chatglm LayerNorm variant (glm-1 era)")
        self.has_bias = bool(hf.get("add_qkv_bias", True))
        rope_ratio = float(hf.get("rope_ratio", 1.0))
        self.rope_theta = 10000.0 * rope_ratio
        self.rotary_dim = self.config.head_dim // 2
        self.cos_sin_cache = build_cos_sin_cache(
            self.config.head_dim,
            self.config.context_len,
            base=self.rope_theta,
            rotary_dim=self.rotary_dim,
        )

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cfg = self.config
        Hq, Hkv, D = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        out: Dict[str, np.ndarray] = {}
        for name, w in weights.items():
            if "rotary_pos_emb" in name:
                continue
            name = (
                name.replace(
                    "transformer.embedding.word_embeddings.",
                    "model.embed_tokens.",
                )
                .replace("transformer.encoder.final_layernorm.", "model.norm.")
                .replace("transformer.output_layer.", "lm_head.")
                .replace("transformer.encoder.layers.", "model.layers.")
                .replace(".self_attention.dense.", ".self_attn.o_proj.")
                .replace(".mlp.dense_h_to_4h.", ".mlp.gate_up_proj.")
                .replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            )
            out[name] = w
        for i in range(cfg.num_layers):
            for field in ("weight", "bias") if self.has_bias else ("weight",):
                key = f"model.layers.{i}.self_attention.query_key_value.{field}"
                qkv = np.asarray(out.pop(key))
                q, k, v = np.split(qkv, [Hq * D, Hq * D + Hkv * D], axis=0)
                out[f"model.layers.{i}.self_attn.q_proj.{field}"] = q
                out[f"model.layers.{i}.self_attn.k_proj.{field}"] = k
                out[f"model.layers.{i}.self_attn.v_proj.{field}"] = v
        return super().convert_hf_weights(out)


# THUDM configs name the same model all three ways across releases.
ChatGLMModel = ChatGLMForCausalLM
ChatGLMForConditionalGeneration = ChatGLMForCausalLM
