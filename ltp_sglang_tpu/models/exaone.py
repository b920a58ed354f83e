"""EXAONE 3.x (LG AI) — ExaoneForCausalLM: llama math under GPT-style
checkpoint names.

Reference: python/sglang/srt/models/exaone.py (load_weights maps c_fc_0 ->
gate, c_fc_1 -> up, ln_1/ln_2 -> the two RMS norms, transformer.h.{i} ->
layers, transformer.wte -> embeddings, transformer.ln_f -> final norm).
Config carries `num_layers` / `activation_function` instead of the llama
field names; ModelConfig already reads the num_layers fallback.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.models.llama import LlamaForCausalLM

_LEAF_MAP = {
    "attn.attention.q_proj": "self_attn.q_proj",
    "attn.attention.k_proj": "self_attn.k_proj",
    "attn.attention.v_proj": "self_attn.v_proj",
    "attn.attention.out_proj": "self_attn.o_proj",
    "mlp.c_fc_0": "mlp.gate_proj",
    "mlp.c_fc_1": "mlp.up_proj",
    "mlp.c_proj": "mlp.down_proj",
    "ln_1": "input_layernorm",
    "ln_2": "post_attention_layernorm",
}


class ExaoneForCausalLM(LlamaForCausalLM):
    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        out: Dict[str, np.ndarray] = {}
        for name, w in weights.items():
            if "rotary" in name:
                continue
            if name.startswith("transformer.h."):
                rest = name[len("transformer.h."):]
                idx, _, leaf = rest.partition(".")
                leaf = leaf.rsplit(".", 1)  # (sub, "weight"/"bias")
                sub = _LEAF_MAP.get(leaf[0], leaf[0])
                out[f"model.layers.{idx}.{sub}.{leaf[1]}"] = w
            elif name == "transformer.wte.weight":
                out["model.embed_tokens.weight"] = w
            elif name == "transformer.ln_f.weight":
                out["model.norm.weight"] = w
            else:
                out[name] = w
        return super().convert_hf_weights(out)
