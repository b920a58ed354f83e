"""Gemma-3: gemma2 body + per-head QK-norm, 5:1 local:global layer pattern
with DUAL rope (local theta 10k unscaled; global theta 1M, linear-scaled on
the larger checkpoints), and no logit softcaps.

Reference: python/sglang/srt/models/gemma3_causal.py; layer facts verified
against HF transformers modeling_gemma3.py:
- q_norm/k_norm are per-head zero-centered (1+w) RMS norms applied after
  the head reshape, BEFORE rope (Gemma3RMSNorm(head_dim));
- config.layer_types marks sliding layers (default 5 sliding : 1 full);
  sliding layers rope at rope_local_base_freq, full layers at rope_theta
  (+config rope_scaling);
- attn/final logit softcapping are gone (config defaults None);
- everything else (sandwich norms, gelu_tanh MLP, sqrt(hidden) embed scale,
  query_pre_attn_scalar) is gemma2.

The gemma2 hybrid SWA ring pools carry over unchanged (sliding layers store
KV in per-request rings; swa_pool_capable).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.layers.rotary import build_cos_sin_cache
from ltp_sglang_tpu.models.gemma2 import Gemma2ForCausalLM


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    has_qk_norm = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf = config.hf_config
        self.has_qk_norm = True
        self.attn_logit_softcap = hf.get("attn_logit_softcapping") or 0.0
        self.final_logit_softcap = hf.get("final_logit_softcapping") or 0.0
        L = config.num_layers
        layer_types = hf.get("layer_types") or [
            "full_attention" if (i + 1) % 6 == 0 else "sliding_attention"
            for i in range(L)
        ]
        is_sliding = np.array(
            [t == "sliding_attention" for t in layer_types], bool
        )
        sw = int(hf.get("sliding_window") or 4096)
        self.layer_windows = np.where(
            is_sliding, sw, config.context_len + 1
        ).astype(np.int32)
        # Dual rope: the main cache is the GLOBAL one (rope_theta +
        # rope_scaling, set by the base ctor); sliding layers use the local
        # base frequency, unscaled.
        self.cos_sin_cache_local = build_cos_sin_cache(
            config.head_dim, config.context_len,
            base=hf.get("rope_local_base_freq", 10000.0),
        )
        self.rope_local_layer = jnp.asarray(is_sliding)

    def init_params(self, seed: int = 0):
        params = super().init_params(seed)
        L, D = self.config.num_layers, self.config.head_dim
        # Gemma norms store w with effective weight (1 + w): zeros == unit.
        params["layers"]["q_norm"] = jnp.zeros((L, D), dtype=self.dtype)
        params["layers"]["k_norm"] = jnp.zeros((L, D), dtype=self.dtype)
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        return specs

    def convert_hf_weights(self, weights):
        params = super().convert_hf_weights(weights)
        L = self.config.num_layers

        def get(name):
            if name in weights:
                return weights[name]
            return weights[name.replace("model.", "", 1)]

        for which in ("q_norm", "k_norm"):
            params["layers"][which] = jnp.asarray(
                np.stack([
                    np.asarray(get(f"model.layers.{i}.self_attn.{which}.weight"))
                    for i in range(L)
                ]), dtype=self.dtype)
        return params


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    """Gemma-3 VLM: SigLIP tower + avg-pool projector + gemma3 text.

    Reference: srt/models/gemma3_mm.py + multimodal/processors/gemma3.py.
    Projector (HF Gemma3MultiModalProjector): SigLIP last_hidden_state
    [B, P^2, Dv] -> avg-pool the patch grid down to mm_tokens_per_image
    -> gemma-style RMS norm -> matmul to the text width. Image tokens
    attend bidirectionally within their span (mm_bidirectional; mask built
    in models/gemma2.py forward from the radix pad ids)."""

    mm_bidirectional = True

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        from ltp_sglang_tpu.models.siglip import SiglipVisionTower

        hf_raw = config.hf_config
        self.vision_config = hf_raw.get("vision_config", {})
        self.vision = SiglipVisionTower(self.vision_config, dtype=self.dtype)
        self.image_token_index = hf_raw.get(
            "image_token_index", hf_raw.get("image_token_id", 262144)
        )
        self.num_image_tokens = int(hf_raw.get("mm_tokens_per_image", 256))
        g = self.vision.image_size // self.vision.patch
        ts = int(self.num_image_tokens ** 0.5)
        assert ts * ts == self.num_image_tokens and g % ts == 0, (g, ts)
        self._pool_k = g // ts
        self._patches_side = g

    def init_params(self, seed: int = 0):
        import jax as _jax

        params = super().init_params(seed)
        key = _jax.random.PRNGKey(seed + 7)
        k1, k2 = _jax.random.split(key)
        Dv, Dm = self.vision.hidden, self.config.hidden_size
        params["vision"] = self.vision.init_params(k1)
        params["projector"] = {
            "norm": jnp.zeros((Dv,), self.dtype),  # gemma (1+w) norm
            "proj": (jnp.asarray(
                np.asarray(
                    _jax.random.normal(k2, (Dv, Dm)) * 0.02
                ), self.dtype)),
        }
        return params

    def param_specs(self):
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        specs = super().param_specs()
        dummy = self.vision.init_params(_jax.random.PRNGKey(0))
        specs["vision"] = _jax.tree.map(
            lambda a: P(*([None] * a.ndim)), dummy
        )
        specs["projector"] = {"norm": P(None), "proj": P(None, None)}
        return specs

    def convert_hf_weights(self, weights):
        lm_weights = {}
        vis_prefix = "vision_tower.vision_model."
        proj_prefix = "multi_modal_projector."
        for name, w in weights.items():
            if name.startswith("model.language_model."):
                lm_weights["model." + name[len("model.language_model."):]] = w
            elif name.startswith("language_model.model."):
                lm_weights["model." + name[len("language_model.model."):]] = w
            elif name.startswith("language_model."):
                lm_weights[name[len("language_model."):]] = w
            elif name.startswith("model.vision_tower."):
                vis_prefix = "model.vision_tower.vision_model."
            elif name.startswith("model.multi_modal_projector."):
                proj_prefix = "model.multi_modal_projector."
        if not lm_weights:
            lm_weights = weights
        params = super().convert_hf_weights(lm_weights)
        params["vision"] = self.vision.convert_hf_weights(weights, vis_prefix)
        params["projector"] = {
            "norm": jnp.asarray(
                np.asarray(weights[proj_prefix + "mm_soft_emb_norm.weight"]),
                self.dtype),
            "proj": jnp.asarray(
                np.asarray(
                    weights[proj_prefix + "mm_input_projection_weight"]
                ), self.dtype),
        }
        return params

    def encode_images(self, params, pixel_values):
        """[B, 3, S, S] -> projected features [B, mm_tokens, Dm_text]."""
        from ltp_sglang_tpu.layers.norm import rms_norm

        feats = self.vision.forward(params["vision"], pixel_values)
        B, P2, Dv = feats.shape
        g, k = self._patches_side, self._pool_k
        x = feats.reshape(B, g, g, Dv)
        x = x.reshape(B, g // k, k, g // k, k, Dv).mean(axis=(2, 4))
        x = x.reshape(B, -1, Dv)
        x = rms_norm(x, params["projector"]["norm"],
                     self.vision.eps, gemma_style=True)
        return jnp.einsum(
            "bnd,de->bne", x, params["projector"]["proj"],
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
