"""Qwen2-VL / Qwen2.5-VL: qwen2 LM + windowed ViT + M-RoPE.

Reference: python/sglang/srt/models/qwen2_5_vl.py + qwen2_vl.py and
multimodal/processors/qwen_vl.py. TPU design mirrors models/llava.py: image
encoding is a SEPARATE jitted step (`encode_images`, fixed square
resolution so the window partition stays static — models/qwen_vl_vision.py)
and the projected features inject over placeholder positions via
StepArrays.mm_embeds. What qwen adds over llava:

- M-RoPE (needs_mrope): the scheduler ships [B, 3, E] t/h/w rope ids in
  fb.positions (managers/scheduler.py _prepare_mrope; ids computed by
  multimodal/mrope.py per reference get_rope_index) and `_rope_layer` here
  applies layers/rotary.apply_rope_mrope with the config's mrope_section.
- Decode windows STAY ENABLED (the reference runs its overlap scheduler for
  VLMs): at decode time HF's get_rope_index gives every new token the same
  scalar id (cache_len + mrope_delta) in all three t/h/w rows, and mrope
  with three equal indices is exactly plain rope at that index — so the
  inherited llama/qwen2 window paths are exact once the runner shifts the
  window's rope positions by the per-request delta
  (DecodeWindowBatch.rope_delta, managers/schedule_batch.get_window_batch).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import apply_rope_mrope
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM
from ltp_sglang_tpu.models.qwen_vl_vision import QwenVisionTower


class Qwen2_5_VLForConditionalGeneration(Qwen2ForCausalLM):
    supports_quant_fusion = False
    supports_pp = False
    needs_mrope = True
    # forward_window_token / forward_window_token_paged are INHERITED: decode
    # mrope == plain rope at pos + mrope_delta (see module docstring), and the
    # runner shifts window positions by DecodeWindowBatch.rope_delta.
    v25 = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        self.vision_config = hf_raw.get("vision_config", {})
        # Fixed square resolution (processor resizes everything to this; see
        # models/qwen_vl_vision.py). 448px -> 32x32 patches -> 256 llm
        # tokens on the production geometry.
        self.fixed_image_size = int(hf_raw.get("ltp_image_size", 448))
        self.vision = QwenVisionTower(
            self.vision_config, self.fixed_image_size, dtype=self.dtype,
            v25=self.v25,
        )
        self.image_token_index = hf_raw.get("image_token_id", 151655)
        rs = hf_raw.get("rope_scaling") or {}
        half = config.head_dim // 2
        self.mrope_section = tuple(
            rs.get("mrope_section") or (half - 2 * (half // 3), half // 3, half // 3)
        )
        assert sum(self.mrope_section) == half, (self.mrope_section, half)

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_image_tokens

    @property
    def mm_llm_grid(self):
        g = self.vision.grid // self.vision.merge
        return (1, g, g)

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        params["vision"] = self.vision.init_params(jax.random.PRNGKey(seed + 7))
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        dummy = self.vision.init_params(jax.random.PRNGKey(0))
        specs["vision"] = jax.tree.map(lambda a: P(*([None] * a.ndim)), dummy)
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        lm_weights = {}
        vis_prefix = None
        for name, w in weights.items():
            # New-style (transformers >= 4.52): model.language_model.* /
            # model.visual.*; legacy: model.* / visual.*.
            if name.startswith("model.language_model."):
                lm_weights["model." + name[len("model.language_model."):]] = w
            elif name.startswith("language_model."):
                lm_weights["model." + name[len("language_model."):]] = w
            elif name.startswith("lm_head."):
                lm_weights[name] = w
            elif name.startswith("model.visual."):
                vis_prefix = "model.visual."
            elif name.startswith("visual."):
                vis_prefix = vis_prefix or "visual."
            elif not name.startswith(("model.visual.", "visual.")):
                lm_weights.setdefault(name, w)
        params = super().convert_hf_weights(lm_weights)
        params["vision"] = self.vision.convert_hf_weights(
            weights, prefix=vis_prefix or "visual."
        )
        return params

    # ---------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[B, 3, S, S] -> merged features [B, llm_tokens, Dm_text]."""
        return self.vision.forward(params["vision"], pixel_values)

    # ---------------------------------------------------------------- m-rope
    def _rope_layer(self, q, k, positions, li):
        if positions.ndim == 3:  # [B, 3, E] M-RoPE ids
            return apply_rope_mrope(
                q, k, positions, self.cos_sin_cache, self.mrope_section
            )
        return super()._rope_layer(q, k, positions, li)


class Qwen2VLForConditionalGeneration(Qwen2_5_VLForConditionalGeneration):
    """Qwen2-VL: LayerNorm ViT blocks, quick-gelu MLP, full attention at
    every vision layer; the LM/M-RoPE side is identical."""

    v25 = False
