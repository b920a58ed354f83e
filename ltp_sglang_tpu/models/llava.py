"""LLaVA-family VLM: CLIP vision tower + MLP projector + llama LM.

Reference: python/sglang/srt/models/llava.py + multimodal/processors/llava.py.
TPU-first design: image encoding is a SEPARATE jitted step
(`encode_images`) batched over images — the language-model serving program
stays text-shaped, and projected image embeddings are injected over the
placeholder positions via StepArrays.mm_embeds/mm_mask (the reference
instead splices embeddings inside the LM forward, mm_utils.py
general_mm_embed_routine). Placeholder ids in origin_input_ids carry the
image HASH (offset past the vocab), so radix prefix caching distinguishes
different images at the same positions for free
(reference schedule_batch.py:205-375 MultimodalDataItem.pad_value).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.clip_vit import ClipVisionTower
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


class LlavaForConditionalGeneration(LlamaForCausalLM):
    supports_quant_fusion = False  # language_model-prefixed checkpoints

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        self.vision_config = hf_raw.get("vision_config", {})
        self.vision = ClipVisionTower(self.vision_config, dtype=self.dtype)
        self.image_token_index = hf_raw.get("image_token_index", 32000)
        self.vision_feature_layer = hf_raw.get("vision_feature_layer", -2)
        self.vision_feature_select_strategy = hf_raw.get(
            "vision_feature_select_strategy", "default"
        )

    @property
    def num_image_tokens(self) -> int:
        n = self.vision.num_patches
        if self.vision_feature_select_strategy == "full":
            n += 1
        return n

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        key = jax.random.PRNGKey(seed + 7)
        ks = jax.random.split(key, 3)
        Dv, Dm = self.vision.hidden, self.config.hidden_size

        def w(k, *shape):
            return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(self.dtype)

        params["vision"] = self.vision.init_params(ks[0])
        params["projector"] = {
            "linear_1": {"kernel": w(ks[1], Dv, Dm), "bias": jnp.zeros((Dm,), self.dtype)},
            "linear_2": {"kernel": w(ks[2], Dm, Dm), "bias": jnp.zeros((Dm,), self.dtype)},
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        # Vision tower + projector replicate: ~300M params, encoded rarely
        # relative to decode; sharding them would force collectives into the
        # small image batches.
        dummy = self.vision.init_params(jax.random.PRNGKey(0))
        specs["vision"] = jax.tree.map(lambda a: P(*([None] * a.ndim)), dummy)
        specs["projector"] = {
            "linear_1": {"kernel": P(None, None), "bias": P(None)},
            "linear_2": {"kernel": P(None, None), "bias": P(None)},
        }
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        lm_weights = {}
        for name, w in weights.items():
            if name.startswith("language_model."):
                lm_weights[name[len("language_model."):]] = w
        params = super().convert_hf_weights(lm_weights)
        params["vision"] = self.vision.convert_hf_weights(
            weights, prefix="vision_tower.vision_model."
        )

        def lin(name):
            return {
                "kernel": jnp.asarray(
                    np.asarray(weights[f"multi_modal_projector.{name}.weight"]).T,
                    self.dtype),
                "bias": jnp.asarray(
                    np.asarray(weights[f"multi_modal_projector.{name}.bias"]),
                    self.dtype),
            }

        params["projector"] = {"linear_1": lin("linear_1"),
                               "linear_2": lin("linear_2")}
        return params

    # -------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[B, 3, H, W] -> projected embeddings [B, T_img, Dm_text]."""
        feats = self.vision.forward(
            params["vision"], pixel_values, select_layer=self.vision_feature_layer
        )
        if self.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        pj = params["projector"]
        h = jnp.einsum("btv,vd->btd", feats, pj["linear_1"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_1"]["bias"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
        h = jnp.einsum("btd,de->bte", h.astype(self.dtype),
                       pj["linear_2"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_2"]["bias"]
        return h.astype(self.dtype)
