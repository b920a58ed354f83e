"""SmolLM3: llama body with NoPE — rope is skipped on every layer where
config.no_rope_layers[i] == 0 (default every 4th layer).

Reference: python/sglang/srt/models/smollm3.py (use_rope per layer).
"""

from __future__ import annotations

import jax.numpy as jnp

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class SmolLM3ForCausalLM(LlamaForCausalLM):
    supports_pp = False  # rope_layer_on indexes global layer ids

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        # HF omits default-valued fields from config.json; smollm3 ties by
        # default (the base class default is untied).
        self.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        L = config.num_layers
        no_rope = hf.get("no_rope_layers")
        if no_rope is None:
            interval = hf.get("no_rope_layer_interval", 4)
            # HF convention: entry is 1 (use rope) unless the layer index is
            # at the interval boundary.
            no_rope = [
                int((i + 1) % interval != 0) for i in range(L)
            ]
        self.rope_layer_on = jnp.asarray(
            [bool(x) for x in no_rope][:L], dtype=bool
        )
        self.has_bias = bool(hf.get("attention_bias", False))
