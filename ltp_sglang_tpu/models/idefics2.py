"""Idefics2 (HuggingFaceM4/idefics2-8b): SigLIP-style vision transformer +
gated-MLP modality projection + PERCEIVER RESAMPLER over a mistral LM.

Reference: python/sglang/srt/models/idefics2.py ships the vision
transformer this family (and MiniCPM-V) uses; the connector behavior is
verified against HF transformers modeling_idefics2.py:
- vision: patch conv (+bias) + learned per-patch positions, pre-LN encoder
  blocks with biased attention and gelu-tanh MLP, post_layernorm — exactly
  the SigLIP recipe, so the shared SiglipVisionTower serves it.
- modality_projection: silu-gated MLP, vision_hidden -> text_intermediate
  -> text_hidden (Idefics2MLP).
- perceiver_resampler: 64 learned latents; each of `resampler_depth`
  layers RMS-norms latents and context separately, runs GQA cross
  attention with keys/values over [context ; latents] (queries = latents
  only), then a silu-gated MLP (intermediate = 4*hidden); final RMSNorm.
  Each image compresses to exactly n_latents tokens regardless of patch
  count — the resampler is what keeps long-document multi-image prompts
  cheap.

TPU-first: every image is a fixed square so tower + resampler compile once
and batch over images; the 64-token output rides the generic placeholder
injection (models/llava.py docstring), radix-distinguished by image hash.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.mistral import MistralForCausalLM
from ltp_sglang_tpu.models.siglip import SiglipVisionTower


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    return (
        x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    ).astype(x.dtype) * w


class Idefics2ForConditionalGeneration(MistralForCausalLM):
    supports_quant_fusion = False  # text_model-prefixed checkpoints

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        self.vision = SiglipVisionTower(
            hf_raw.get("vision_config", {}), dtype=self.dtype
        )
        pc = hf_raw.get("perceiver_config", {})
        self.n_latents = pc.get("resampler_n_latents", 64)
        self.p_depth = pc.get("resampler_depth", 3)
        self.p_heads = pc.get("resampler_n_heads", 16)
        self.p_kv_heads = pc.get("num_key_value_heads", 4)
        self.p_head_dim = pc.get("resampler_head_dim", 96)
        self.p_eps = pc.get("rms_norm_eps", 1e-6)
        self.image_token_index = hf_raw.get(
            "image_token_id", hf_raw.get("image_token_index", 32001)
        )
        self.fixed_image_size = self.vision.image_size
        self.num_image_tokens = self.n_latents

    # ------------------------------------------------------------ parameters
    def _connector_shapes(self):
        Dv = self.vision.hidden
        Dt = self.config.hidden_size
        It = self.config.hf_config.get("text_config", {}).get(
            "intermediate_size", self.config.hf_config.get("intermediate_size")
        )
        return Dv, Dt, It

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        key_box = [jax.random.PRNGKey(seed + 17)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, jnp.float32) * scale
            ).astype(self.dtype)

        params["vision"] = self.vision.init_params(jax.random.PRNGKey(seed + 19))
        Dv, Dt, It = self._connector_shapes()
        nh, kvh, hd = self.p_heads, self.p_kv_heads, self.p_head_dim
        D = self.p_depth
        ones = lambda *s: jnp.ones(s, self.dtype)
        params["connector"] = {
            "mp_gate": {"kernel": w(Dv, It)},
            "mp_up": {"kernel": w(Dv, It)},
            "mp_down": {"kernel": w(It, Dt)},
            "latents": ones(self.n_latents, Dt),
            "layers": {
                "latents_norm": ones(D, Dt),
                "context_norm": ones(D, Dt),
                "q_proj": {"kernel": w(D, Dt, nh * hd)},
                "k_proj": {"kernel": w(D, Dt, kvh * hd)},
                "v_proj": {"kernel": w(D, Dt, kvh * hd)},
                "o_proj": {"kernel": w(D, nh * hd, Dt)},
                "post_norm": ones(D, Dt),
                "mlp_gate": {"kernel": w(D, Dt, 4 * Dt)},
                "mlp_up": {"kernel": w(D, Dt, 4 * Dt)},
                "mlp_down": {"kernel": w(D, 4 * Dt, Dt)},
            },
            "norm": ones(Dt),
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        probe_v = self.vision.init_params(jax.random.PRNGKey(0))
        specs["vision"] = jax.tree.map(lambda a: P(*([None] * a.ndim)), probe_v)
        # Connector replicates (rarely-run relative to decode).
        probe_c = self.init_params(0)["connector"]
        specs["connector"] = jax.tree.map(
            lambda a: P(*([None] * a.ndim)), probe_c
        )
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        flat = {}
        for name, wv in weights.items():
            if name.startswith("model."):
                name = name[len("model."):]
            flat[name] = wv
        lm = {"model." + k[len("text_model."):]: v for k, v in flat.items()
              if k.startswith("text_model.")}
        if "lm_head.weight" in flat:
            lm["lm_head.weight"] = flat["lm_head.weight"]
        params = super().convert_hf_weights(lm)
        params["vision"] = self.vision.convert_hf_weights(
            flat, prefix="vision_model."
        )

        pre = "connector.perceiver_resampler."

        def lin(n):
            return {"kernel": jnp.asarray(np.asarray(flat[n + ".weight"]).T,
                                          self.dtype)}

        def stack_lin(sub):
            return {
                "kernel": jnp.asarray(
                    np.stack(
                        [np.asarray(flat[f"{pre}layers.{i}.{sub}.weight"]).T
                         for i in range(self.p_depth)]
                    ),
                    self.dtype,
                )
            }

        def stack_norm(sub):
            return jnp.asarray(
                np.stack([flat[f"{pre}layers.{i}.{sub}.weight"]
                          for i in range(self.p_depth)]),
                self.dtype,
            )

        params["connector"] = {
            "mp_gate": lin("connector.modality_projection.gate_proj"),
            "mp_up": lin("connector.modality_projection.up_proj"),
            "mp_down": lin("connector.modality_projection.down_proj"),
            "latents": jnp.asarray(flat[pre + "latents"], self.dtype),
            "layers": {
                "latents_norm": stack_norm("input_latents_norm"),
                "context_norm": stack_norm("input_context_norm"),
                "q_proj": stack_lin("self_attn.q_proj"),
                "k_proj": stack_lin("self_attn.k_proj"),
                "v_proj": stack_lin("self_attn.v_proj"),
                "o_proj": stack_lin("self_attn.o_proj"),
                "post_norm": stack_norm("post_attention_layernorm"),
                "mlp_gate": stack_lin("mlp.gate_proj"),
                "mlp_up": stack_lin("mlp.up_proj"),
                "mlp_down": stack_lin("mlp.down_proj"),
            },
            "norm": jnp.asarray(flat[pre + "norm.weight"], self.dtype),
        }
        return params

    # --------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> [N, n_latents, Dt] resampled image tokens."""
        cn = params["connector"]
        feats = self.vision.forward(params["vision"], pixel_values)
        g = jax.nn.silu(
            jnp.einsum("btv,vi->bti", feats, cn["mp_gate"]["kernel"],
                       preferred_element_type=jnp.float32)
        )
        u = jnp.einsum("btv,vi->bti", feats, cn["mp_up"]["kernel"],
                       preferred_element_type=jnp.float32)
        ctx = jnp.einsum(
            "bti,id->btd", (g * u).astype(self.dtype), cn["mp_down"]["kernel"],
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)  # [N, P, Dt]

        N = ctx.shape[0]
        nh, kvh, hd = self.p_heads, self.p_kv_heads, self.p_head_dim
        rep = nh // kvh
        lat = jnp.broadcast_to(
            cn["latents"][None], (N,) + cn["latents"].shape
        ).astype(self.dtype)
        nL = self.n_latents

        def layer(lat, lp):
            ln = _rms(lat, lp["latents_norm"], self.p_eps)
            cnn = _rms(ctx, lp["context_norm"], self.p_eps)
            kv_in = jnp.concatenate([cnn, ln], axis=1)  # [N, P+nL, Dt]
            T = kv_in.shape[1]
            q = (ln @ lp["q_proj"]["kernel"]).reshape(N, nL, nh, hd)
            k = (kv_in @ lp["k_proj"]["kernel"]).reshape(N, T, kvh, hd)
            v = (kv_in @ lp["v_proj"]["kernel"]).reshape(N, T, kvh, hd)
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            sc = jnp.einsum("nthd,nshd->nhts", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
            p = jax.nn.softmax(sc, axis=-1).astype(ln.dtype)
            o = jnp.einsum("nhts,nshd->nthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(N, nL, nh * hd).astype(ln.dtype)
            lat = lat + o @ lp["o_proj"]["kernel"]
            y = _rms(lat, lp["post_norm"], self.p_eps)
            g = jax.nn.silu((y @ lp["mlp_gate"]["kernel"]).astype(jnp.float32))
            u = (y @ lp["mlp_up"]["kernel"]).astype(jnp.float32)
            lat = lat + (g * u).astype(y.dtype) @ lp["mlp_down"]["kernel"]
            return lat, None

        lat, _ = jax.lax.scan(layer, lat, cn["layers"])
        return _rms(lat, cn["norm"], self.p_eps)
