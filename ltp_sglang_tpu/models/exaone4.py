"""EXAONE-4 (LG AI): llama body + per-head QK-norm, post-block norms, and a
hybrid sliding/global layer pattern where GLOBAL layers use NoPE (no rope).

Reference: python/sglang/srt/models/exaone.py lineage; layer facts verified
against HF transformers modeling_exaone4.py:
- q_norm/k_norm are per-head RMS norms applied before rope (qwen3-style);
- norms are post-block (post_attention_layernorm / post_feedforward_layernorm
  applied to the block OUTPUT before the residual add — olmo2-style);
- config.layer_types marks "sliding_attention" layers; rope is applied ONLY
  on sliding layers when the model is hybrid (global NoPE); an all-global
  config (sliding_window null) ropes everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.qwen3 import Qwen3ForCausalLM


class Exaone4ForCausalLM(Qwen3ForCausalLM):
    has_bias = False
    supports_quant_fusion = False  # post_out norm ordering
    # The Pallas paged decode-window path has no per-layer window masking;
    # hybrid configs use the gathered-pages window path or plain decode.
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.norm_style = "post_out"
        sw = hf.get("sliding_window")
        layer_types = hf.get("layer_types")
        if sw and layer_types:
            is_sliding = np.array(
                [t == "sliding_attention" for t in layer_types], bool
            )
            self.layer_windows = jnp.asarray(
                np.where(is_sliding, int(sw), config.context_len + 1),
                jnp.int32,
            )
            # Global NoPE: rope only on sliding layers.
            self.rope_layer_on = jnp.asarray(is_sliding)
            self.forward_window_token_paged = None

    # post_out style: no input_layernorm; post_feedforward_layernorm added.
    def init_params(self, seed: int = 0):
        params = super().init_params(seed)
        ls = params["layers"]
        ls.pop("input_layernorm", None)
        L, Dm = self.config.num_layers, self.config.hidden_size
        ls["post_feedforward_layernorm"] = jnp.ones((L, Dm), dtype=self.dtype)
        return params

    def param_specs(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_specs()
        specs["layers"].pop("input_layernorm", None)
        specs["layers"]["post_feedforward_layernorm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights):
        cfg = self.config
        ones = np.ones((cfg.hidden_size,), dtype=np.float32)
        for i in range(cfg.num_layers):
            weights.setdefault(f"model.layers.{i}.input_layernorm.weight", ones)
        params = super().convert_hf_weights(weights)
        ls = params["layers"]
        ls.pop("input_layernorm", None)
        L = cfg.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        ls["post_feedforward_layernorm"] = jnp.asarray(
            np.stack([
                np.asarray(get(f"model.layers.{i}.post_feedforward_layernorm.weight"))
                for i in range(L)
            ]), dtype=self.dtype)
        return params
