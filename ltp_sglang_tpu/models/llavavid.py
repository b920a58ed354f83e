"""LLaVA video family (LlavaNextVideoForConditionalGeneration) — the first
VIDEO modality in the framework.

Reference: python/sglang/srt/models/llavavid.py (CLIP tower per frame +
AvgPool2d spatial resampler + MLP projector over the llama LM). Behavior
verified against HF transformers modeling_llava_next_video.py
`get_video_features` / `LlavaNextVideoPooler`:

- pixel_values_videos [B, T, 3, S, S] -> per-frame CLIP tower, select
  `vision_feature_layer`, drop CLS (strategy "default"),
- spatial pool each frame grid (mode average/max, `spatial_pool_stride`),
- multi_modal_projector (linear / gelu / linear),
- flatten frames: T * (side/stride)^2 video tokens per clip.

TPU-first: the whole clip encodes in ONE jitted call batched over clips
(frames fold into the batch dim; every frame is a fixed square so the
tower stays compile-time static), and the LM serving program never sees
pixels — projected clip embeddings inject over hash-derived placeholder
ids exactly like the image VLMs (models/llava.py docstring), so radix
prefix caching distinguishes different videos for free.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llava import LlavaForConditionalGeneration


class LlavaNextVideoForConditionalGeneration(LlavaForConditionalGeneration):
    """Video-only serving of the LLaVA-NeXT-Video checkpoints (the AnyRes
    still-image path is served by the base llava family)."""

    video_modality = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        # The placeholder the processor expands is the VIDEO token.
        self.image_token_index = hf_raw.get("video_token_index", 32001)
        self.pool_stride = int(hf_raw.get("spatial_pool_stride", 2))
        self.pool_mode = hf_raw.get("spatial_pool_mode", "average")
        if self.pool_mode not in ("average", "max"):
            raise NotImplementedError(
                f"spatial_pool_mode {self.pool_mode!r}: average/max only "
                "(conv-mode checkpoints are rare; add a conv kernel leaf)"
            )
        # Frames per served clip: fixed at config time so every clip encodes
        # through one compiled tower program (uniform temporal sampling in
        # the processor resamples arbitrary inputs to this length).
        self.num_frames = int(hf_raw.get("num_frames", 8))

    @property
    def num_image_tokens(self) -> int:
        side = self.vision.image_size // self.vision.patch
        pooled = side // self.pool_stride
        return self.num_frames * pooled * pooled

    # -------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[N, T, 3, S, S] clips -> projected embeddings [N, T*p*p, Dm]."""
        N, T = pixel_values.shape[:2]
        flat = pixel_values.reshape((N * T,) + pixel_values.shape[2:])
        feats = self.vision.forward(
            params["vision"], flat, select_layer=self.vision_feature_layer
        )
        if self.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        side = self.vision.image_size // self.vision.patch
        Dv = feats.shape[-1]
        grid = feats.reshape(N * T, side, side, Dv)
        s = self.pool_stride
        p = side // s
        # Window-pool the (side, side) grid: [NT, p, s, p, s, Dv] reduce.
        win = grid[:, : p * s, : p * s].reshape(N * T, p, s, p, s, Dv)
        if self.pool_mode == "average":
            pooled = win.astype(jnp.float32).mean(axis=(2, 4))
        else:
            pooled = win.max(axis=(2, 4)).astype(jnp.float32)
        pooled = pooled.reshape(N * T, p * p, Dv).astype(self.dtype)

        pj = params["projector"]
        h = jnp.einsum("btv,vd->btd", pooled, pj["linear_1"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_1"]["bias"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
        h = jnp.einsum("btd,de->bte", h.astype(self.dtype),
                       pj["linear_2"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_2"]["bias"]
        h = h.astype(self.dtype)
        return h.reshape(N, T * p * p, -1)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # Newer transformers nest everything under "model." and hoist
        # lm_head; normalize to the legacy flat names the base class maps.
        flat = {}
        for name, w in weights.items():
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("image_newline") or "vision_resampler" in name:
                continue  # video path never reads the AnyRes newline
            flat[name] = w
        return super().convert_hf_weights(flat)
