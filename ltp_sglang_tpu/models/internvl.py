"""InternVL 2.5/3 family (InternVLForConditionalGeneration).

Reference: python/sglang/srt/models/internvl.py. Facts verified against HF
transformers modeling_internvl.py:
- Vision tower (InternViT): conv patch embed + CLS token + absolute position
  embeddings; pre-norm layers with LAYER SCALE (lambda_1/lambda_2 vectors);
  attention q/k/v (+bias) with optional full-width RMS qk norms and a
  projection_layer; fc1/fc2 gelu MLP; final LayerNorm unless
  use_mean_pooling.
- get_image_features: drop CLS -> reshape to the (side, side) grid ->
  PIXEL SHUFFLE downsample (default ratio 0.5: 4x fewer tokens, 4x wider
  channels) -> projector (LayerNorm + linear + gelu + linear).
- The LM is the nested text_config model (qwen2/2.5 for InternVL3), served
  here over the qwen2 body with `language_model.`-prefixed checkpoints.

Served through the generic multimodal pipeline (fixed-resolution square
images keep the tower compile-time static, like the other towers here).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.qwen2 import Qwen2ForCausalLM


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    return (
        x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps) * w
    ).astype(x.dtype)


class InternVLForConditionalGeneration(Qwen2ForCausalLM):
    supports_quant_fusion = False  # language_model-prefixed checkpoints

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        hf_raw = config.hf_config
        tc = hf_raw.get("text_config", {})
        if tc.get("model_type", "qwen2") not in ("qwen2", "qwen2_5"):
            raise NotImplementedError(
                f"internvl text model {tc.get('model_type')!r}: qwen2-family only"
            )
        super().__init__(config, attn_impl, kv_write_impl)
        vc = hf_raw.get("vision_config", {})
        self.vc = vc
        self.v_dim = vc.get("hidden_size", 1024)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_inter = vc.get("intermediate_size", 4096)
        img = vc.get("image_size", 448)
        self.v_img = img[0] if isinstance(img, (list, tuple)) else img
        pat = vc.get("patch_size", 14)
        self.v_patch = pat[0] if isinstance(pat, (list, tuple)) else pat
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.v_qk_norm = bool(vc.get("use_qk_norm", False))
        self.v_mean_pool = bool(vc.get("use_mean_pooling", True))
        self.v_norm_type = vc.get("norm_type", "layer_norm")
        self.downsample = float(hf_raw.get("downsample_ratio", 0.5))
        self.image_token_index = hf_raw.get(
            "image_token_id", hf_raw.get("image_token_index", 151667)
        )
        self.fixed_image_size = self.v_img
        side = self.v_img // self.v_patch
        self.num_image_tokens = int((side * self.downsample) ** 2)

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        key_box = [jax.random.PRNGKey(seed + 13)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, jnp.float32) * scale
            ).astype(self.dtype)

        Dv, F, H = self.v_dim, self.v_inter, self.v_layers
        side = self.v_img // self.v_patch
        zeros = lambda *s: jnp.zeros(s, self.dtype)
        ones = lambda *s: jnp.ones(s, self.dtype)
        vision = {
            "patch": {"kernel": w(Dv, 3, self.v_patch, self.v_patch),
                      "bias": zeros(Dv)},
            "cls": w(1, Dv),
            "pos": w(side * side + 1, Dv),
            "layers": {
                "q_proj": {"kernel": w(H, Dv, Dv), "bias": zeros(H, Dv)},
                "k_proj": {"kernel": w(H, Dv, Dv), "bias": zeros(H, Dv)},
                "v_proj": {"kernel": w(H, Dv, Dv), "bias": zeros(H, Dv)},
                "out_proj": {"kernel": w(H, Dv, Dv), "bias": zeros(H, Dv)},
                "ln1_w": ones(H, Dv), "ln1_b": zeros(H, Dv),
                "ln2_w": ones(H, Dv), "ln2_b": zeros(H, Dv),
                "lambda1": ones(H, Dv), "lambda2": ones(H, Dv),
                "fc1": {"kernel": w(H, Dv, F), "bias": zeros(H, F)},
                "fc2": {"kernel": w(H, F, Dv), "bias": zeros(H, Dv)},
            },
        }
        if self.v_qk_norm:
            vision["layers"]["q_norm"] = ones(H, Dv)
            vision["layers"]["k_norm"] = ones(H, Dv)
        if not self.v_mean_pool:
            vision["ln_w"] = ones(Dv)
            vision["ln_b"] = zeros(Dv)
        params["vision"] = vision
        Dm = self.config.hidden_size
        r = int(1 / self.downsample) ** 2
        params["projector"] = {
            "ln_w": ones(Dv * r), "ln_b": zeros(Dv * r),
            "linear_1": {"kernel": w(Dv * r, Dm), "bias": zeros(Dm)},
            "linear_2": {"kernel": w(Dm, Dm), "bias": zeros(Dm)},
        }
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        probe = self.init_params(0)
        for key in ("vision", "projector"):
            specs[key] = jax.tree.map(
                lambda a: P(*([None] * a.ndim)), probe[key]
            )
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        lm_weights = {}
        for name, wv in weights.items():
            if name.startswith("language_model."):
                lm_weights[name[len("language_model."):]] = wv
            elif name.startswith("model.language_model."):
                lm_weights["model." + name[len("model.language_model."):]] = wv
        if "lm_head.weight" in weights:
            lm_weights["lm_head.weight"] = weights["lm_head.weight"]
        params = super().convert_hf_weights(lm_weights)

        def g(n):
            for pref in ("vision_tower.", "model.vision_tower."):
                if pref + n in weights:
                    return np.asarray(weights[pref + n])
            raise KeyError(n)

        H = self.v_layers

        def stack_lin(sub):
            kern = np.stack(
                [g(f"encoder.layer.{i}.{sub}.weight").T for i in range(H)]
            )

            def maybe_bias(i):
                try:
                    return g(f"encoder.layer.{i}.{sub}.bias")
                except KeyError:  # attention_bias=False checkpoints
                    return np.zeros(kern.shape[-1], np.float32)

            return {
                "kernel": jnp.asarray(kern, self.dtype),
                "bias": jnp.asarray(
                    np.stack([maybe_bias(i) for i in range(H)]), self.dtype
                ),
            }

        def stack_vec(sub):
            return jnp.asarray(
                np.stack([g(f"encoder.layer.{i}.{sub}") for i in range(H)]),
                self.dtype,
            )

        layers = {
            "q_proj": stack_lin("attention.q_proj"),
            "k_proj": stack_lin("attention.k_proj"),
            "v_proj": stack_lin("attention.v_proj"),
            "out_proj": stack_lin("attention.projection_layer"),
            "ln1_w": stack_vec("layernorm_before.weight"),
            "ln1_b": stack_vec("layernorm_before.bias"),
            "ln2_w": stack_vec("layernorm_after.weight"),
            "ln2_b": stack_vec("layernorm_after.bias"),
            "lambda1": stack_vec("lambda_1"),
            "lambda2": stack_vec("lambda_2"),
            "fc1": stack_lin("mlp.fc1"),
            "fc2": stack_lin("mlp.fc2"),
        }
        if self.v_qk_norm:
            layers["q_norm"] = stack_vec("attention.q_norm.weight")
            layers["k_norm"] = stack_vec("attention.k_norm.weight")
        vision = {
            "patch": {
                "kernel": jnp.asarray(
                    g("embeddings.patch_embeddings.projection.weight"), self.dtype
                ),
                "bias": jnp.asarray(
                    g("embeddings.patch_embeddings.projection.bias"), self.dtype
                ),
            },
            "cls": jnp.asarray(g("embeddings.cls_token")[0], self.dtype),
            "pos": jnp.asarray(g("embeddings.position_embeddings")[0], self.dtype),
            "layers": layers,
        }
        if not self.v_mean_pool:
            vision["ln_w"] = jnp.asarray(g("layernorm.weight"), self.dtype)
            vision["ln_b"] = jnp.asarray(g("layernorm.bias"), self.dtype)
        params["vision"] = vision

        def pw(n):
            for pref in ("multi_modal_projector.", "model.multi_modal_projector."):
                if pref + n in weights:
                    return np.asarray(weights[pref + n])
            raise KeyError(n)

        def proj(n):
            return {
                "kernel": jnp.asarray(pw(f"{n}.weight").T, self.dtype),
                "bias": jnp.asarray(pw(f"{n}.bias"), self.dtype),
            }

        params["projector"] = {
            "ln_w": jnp.asarray(pw("layer_norm.weight"), self.dtype),
            "ln_b": jnp.asarray(pw("layer_norm.bias"), self.dtype),
            "linear_1": proj("linear_1"),
            "linear_2": proj("linear_2"),
        }
        return params

    # --------------------------------------------------------------- vision
    def _norm(self, x, w, b):
        if self.v_norm_type == "rms_norm":
            return _rms(x, w, self.v_eps)
        return _ln(x, w, b, self.v_eps)

    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> projected embeddings [N, T_img, Dm]."""
        vp = params["vision"]
        x = pixel_values.astype(jnp.float32)
        patches = jax.lax.conv_general_dilated(
            x, vp["patch"]["kernel"].astype(jnp.float32),
            window_strides=(self.v_patch, self.v_patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + vp["patch"]["bias"].astype(jnp.float32)[None, :, None, None]
        N = patches.shape[0]
        side = self.v_img // self.v_patch
        h = patches.reshape(N, self.v_dim, side * side).transpose(0, 2, 1)
        h = jnp.concatenate(
            [jnp.broadcast_to(vp["cls"][None], (N, 1, self.v_dim)), h], axis=1
        ).astype(self.dtype)
        h = h + vp["pos"][None]

        Dv, nh = self.v_dim, self.v_heads
        hd = Dv // nh
        scale = hd ** -0.5

        def layer(h, lp):
            x = self._norm(h, lp["ln1_w"], lp["ln1_b"])
            q = x @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]
            k = x @ lp["k_proj"]["kernel"] + lp["k_proj"]["bias"]
            v = x @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]
            if self.v_qk_norm:
                q = _rms(q, lp["q_norm"], self.v_eps)
                k = _rms(k, lp["k_norm"], self.v_eps)
            T = x.shape[1]
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            sc = jnp.einsum("nthd,nshd->nhts", q, k,
                            preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(sc, axis=-1).astype(x.dtype)
            o = jnp.einsum("nhts,nshd->nthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(N, T, Dv).astype(x.dtype)
            o = o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"]
            h = h + lp["lambda1"] * o
            x = self._norm(h, lp["ln2_w"], lp["ln2_b"])
            x = jax.nn.gelu(
                (x @ lp["fc1"]["kernel"] + lp["fc1"]["bias"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype)
            x = x @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
            h = h + lp["lambda2"] * x
            return h, None

        h, _ = jax.lax.scan(layer, h, vp["layers"])
        if not self.v_mean_pool:
            h = _ln(h, vp["ln_w"], vp["ln_b"], self.v_eps)
        feats = h[:, 1:]  # drop CLS

        # Pixel shuffle (HF pixel_shuffle, scale 0.5 default): [N, s, s, C]
        # -> [N, s*r, s*r, C/r^2] via the exact reshape/permute sequence.
        r = self.downsample
        C = self.v_dim
        feats = feats.reshape(N, side, side, C)
        feats = feats.reshape(N, side, int(side * r), int(C / r))
        feats = feats.transpose(0, 2, 1, 3)
        feats = feats.reshape(
            N, int(side * r), int(side * r), int(C / (r * r))
        )
        feats = feats.transpose(0, 2, 1, 3)
        feats = feats.reshape(N, -1, int(C / (r * r)))

        pj = params["projector"]
        z = _ln(feats, pj["ln_w"], pj["ln_b"], 1e-5)
        z = z.astype(jnp.float32) @ pj["linear_1"]["kernel"].astype(jnp.float32) \
            + pj["linear_1"]["bias"].astype(jnp.float32)
        z = jax.nn.gelu(z, approximate=False)
        z = z @ pj["linear_2"]["kernel"].astype(jnp.float32) \
            + pj["linear_2"]["bias"].astype(jnp.float32)
        return z.astype(self.dtype)
