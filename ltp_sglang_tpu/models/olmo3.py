"""OLMo-3: olmo2 body + hybrid sliding/global layers with DUAL rope.

Facts verified against HF transformers modeling_olmo3.py:
- q_norm/k_norm over the FULL projection width before rope, post-block
  norms (both inherited from Olmo2ForCausalLM);
- config.layer_types marks "sliding_attention" layers;
- sliding layers use DEFAULT (unscaled) rope; full-attention layers use the
  config's rope_scaling (Olmo3Model builds two rotary embeddings).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.olmo import Olmo2ForCausalLM


class Olmo3ForCausalLM(Olmo2ForCausalLM):
    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
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
            self.forward_window_token_paged = None
            if self.rope_scaling:
                # Sliding layers: default rope at the same theta, unscaled.
                self.cos_sin_cache_local = build_cos_sin_cache(
                    config.head_dim, config.context_len, base=self.rope_theta
                )
                self.rope_local_layer = jnp.asarray(is_sliding)
