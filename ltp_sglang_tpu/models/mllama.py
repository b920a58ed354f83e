"""Mllama (Llama-3.2-Vision) TEXT path — MllamaForCausalLM.

Reference: python/sglang/srt/models/mllama.py. HF transformers
modeling_mllama.py MllamaTextModel.forward skips every layer in
`cross_attention_layers` when no image is present ("For text-only path we
should skip cross attention layers" — the skip requires no weights), so
text-only serving maps EXACTLY onto the llama body with the cross layers
dropped at load: the self-attention layers renumber into a dense scan
stack and the KV pools shrink accordingly (a 40-layer 11B-Vision
checkpoint serves as a 32-layer llama).

The embedding table carries 8 extra rows past the vocab for the image
special tokens; text-only serving slices them off (lm_head never scores
them — HF keeps lm_head at vocab_size).

The vision+cross-attention conditional-generation path is the remaining
half of this family (tracked gap: cross-attention KV is per-request state
the decode-window programs do not yet thread).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class MllamaForCausalLM(LlamaForCausalLM):
    supports_quant_fusion = False  # renumbered-layer checkpoints

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        hf = config.hf_config
        if isinstance(hf.get("text_config"), dict):
            cross = hf["text_config"].get("cross_attention_layers", [])
        else:
            cross = hf.get("cross_attention_layers", [])
        self._cross_layers = sorted(cross)
        self._total_layers = config.num_layers
        # The scan stack holds only the self-attention layers.
        config.num_layers = config.num_layers - len(self._cross_layers)
        super().__init__(config, attn_impl, kv_write_impl)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        cross = set(self._cross_layers)
        keep = [i for i in range(self._total_layers) if i not in cross]
        remap = {old: new for new, old in enumerate(keep)}
        out: Dict[str, np.ndarray] = {}
        for name, w in weights.items():
            if name.startswith("language_model."):
                name = name[len("language_model."):]
            if name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                idx_s, _, leaf = rest.partition(".")
                i = int(idx_s)
                if i in cross:
                    continue  # cross-attn weights: unused without images
                out[f"model.layers.{remap[i]}.{leaf}"] = w
            elif name == "model.embed_tokens.weight":
                # Slice off the 8 image-special rows past the vocab.
                out[name] = np.asarray(w)[: self.config.hf_config["vocab_size"]]
            else:
                out[name] = w
        return super().convert_hf_weights(out)
