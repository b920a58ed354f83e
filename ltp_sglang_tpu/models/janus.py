"""Janus-Pro (DeepSeek) — JanusForConditionalGeneration, the multimodal
UNDERSTANDING path (text generation conditioned on images).

Reference: python/sglang/srt/models/deepseek_janus_pro.py. Behavior
verified against HF transformers modeling_janus.py:
- vision tower: conv patch embed (+bias) + learned per-patch positions
  (no CLS), pre-LN blocks with a FUSED qkv projection whose bias packs
  [q_bias | zeros | v_bias] (JanusAttention), a `projection` output
  linear, gelu MLP at `mlp_ratio`, final post_layernorm;
- aligner: fc1 then (depth-1) hidden linears with the activation BETWEEN
  layers (JanusVisionAlignerMLP) projecting to the LM width;
- language model: llama-family text_config.

Janus's image GENERATION path (VQ head) is out of scope for serving text;
the generation-head weights are skipped at load.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llama import LlamaForCausalLM


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


class JanusForConditionalGeneration(LlamaForCausalLM):
    supports_quant_fusion = False  # language_model-prefixed checkpoints

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        vc = hf_raw.get("vision_config", {})
        self.vc = vc
        self.v_dim = vc.get("hidden_size", 1024)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_inter = int(self.v_dim * vc.get("mlp_ratio", 4.0))
        self.v_img = vc.get("image_size", 384)
        self.v_patch = vc.get("patch_size", 16)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.v_act = vc.get("hidden_act", "gelu")
        self.v_depth = vc.get("depth", 2)
        self.v_proj_dim = vc.get("projection_dim", config.hidden_size)
        self.image_token_index = hf_raw.get(
            "image_token_id", hf_raw.get("image_token_index", 100581)
        )
        self.fixed_image_size = self.v_img
        side = self.v_img // self.v_patch
        self.num_image_tokens = side * side

    def _act(self, x):
        return jax.nn.gelu(
            x.astype(jnp.float32), approximate=(self.v_act == "gelu_pytorch_tanh")
        )

    # ------------------------------------------------------------ parameters
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_params(seed)
        key_box = [jax.random.PRNGKey(seed + 23)]

        def w(*shape, scale=0.02):
            key_box[0], sub = jax.random.split(key_box[0])
            return (
                jax.random.normal(sub, shape, jnp.float32) * scale
            ).astype(self.dtype)

        Dv, F, H = self.v_dim, self.v_inter, self.v_layers
        side = self.v_img // self.v_patch
        zeros = lambda *s: jnp.zeros(s, self.dtype)
        ones = lambda *s: jnp.ones(s, self.dtype)
        params["vision"] = {
            "patch": {"kernel": w(Dv, 3, self.v_patch, self.v_patch),
                      "bias": zeros(Dv)},
            "pos": w(side * side, Dv),
            "layers": {
                "ln1_w": ones(H, Dv), "ln1_b": zeros(H, Dv),
                "qkv": {"kernel": w(H, Dv, 3 * Dv), "bias": zeros(H, 3 * Dv)},
                "proj": {"kernel": w(H, Dv, Dv), "bias": zeros(H, Dv)},
                "ln2_w": ones(H, Dv), "ln2_b": zeros(H, Dv),
                "fc1": {"kernel": w(H, Dv, F), "bias": zeros(H, F)},
                "fc2": {"kernel": w(H, F, Dv), "bias": zeros(H, Dv)},
            },
            "post_ln_w": ones(Dv), "post_ln_b": zeros(Dv),
        }
        Dp = self.v_proj_dim
        aligner = {"fc1": {"kernel": w(Dv, Dp), "bias": zeros(Dp)}}
        for j in range(self.v_depth - 1):
            aligner[f"hidden_{j}"] = {"kernel": w(Dp, Dp), "bias": zeros(Dp)}
        params["aligner"] = aligner
        return params

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        probe = self.init_params(0)
        for key in ("vision", "aligner"):
            specs[key] = jax.tree.map(
                lambda a: P(*([None] * a.ndim)), probe[key]
            )
        return specs

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        flat = {}
        for name, wv in weights.items():
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith(("generation_", "vqmodel", "gen_")):
                continue  # image-generation path (VQ) is not served
            flat[name] = wv
        lm = {"model." + k[len("language_model."):]: v for k, v in flat.items()
              if k.startswith("language_model.")}
        if "lm_head.weight" in flat:
            lm["lm_head.weight"] = flat["lm_head.weight"]
        params = super().convert_hf_weights(lm)

        def g(n):
            return np.asarray(flat["vision_model." + n])

        H = self.v_layers

        def stack_lin(sub):
            return {
                "kernel": jnp.asarray(
                    np.stack([g(f"encoder.layers.{i}.{sub}.weight").T
                              for i in range(H)]), self.dtype),
                "bias": jnp.asarray(
                    np.stack([g(f"encoder.layers.{i}.{sub}.bias")
                              for i in range(H)]), self.dtype),
            }

        def stack_vec(sub):
            return jnp.asarray(
                np.stack([g(f"encoder.layers.{i}.{sub}") for i in range(H)]),
                self.dtype,
            )

        params["vision"] = {
            "patch": {
                "kernel": jnp.asarray(
                    g("embeddings.patch_embedding.weight"), self.dtype),
                "bias": jnp.asarray(
                    g("embeddings.patch_embedding.bias"), self.dtype),
            },
            "pos": jnp.asarray(
                g("embeddings.position_embedding.weight"), self.dtype),
            "layers": {
                "ln1_w": stack_vec("layer_norm1.weight"),
                "ln1_b": stack_vec("layer_norm1.bias"),
                "qkv": stack_lin("self_attn.qkv"),
                "proj": stack_lin("self_attn.projection"),
                "ln2_w": stack_vec("layer_norm2.weight"),
                "ln2_b": stack_vec("layer_norm2.bias"),
                "fc1": stack_lin("mlp.fc1"),
                "fc2": stack_lin("mlp.fc2"),
            },
            "post_ln_w": jnp.asarray(g("post_layernorm.weight"), self.dtype),
            "post_ln_b": jnp.asarray(g("post_layernorm.bias"), self.dtype),
        }

        aligner = {}

        def al(n):
            return {
                "kernel": jnp.asarray(
                    np.asarray(flat[f"aligner.{n}.weight"]).T, self.dtype),
                "bias": jnp.asarray(
                    np.asarray(flat[f"aligner.{n}.bias"]), self.dtype),
            }

        aligner["fc1"] = al("fc1")
        for j in range(self.v_depth - 1):
            aligner[f"hidden_{j}"] = al(f"hidden_layers.{j}")
        params["aligner"] = aligner
        return params

    # --------------------------------------------------------------- vision
    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> aligned embeddings [N, P, Dm]."""
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
        h = h.astype(self.dtype) + vp["pos"][None]

        Dv, nh = self.v_dim, self.v_heads
        hd = Dv // nh
        scale = hd ** -0.5

        def layer(h, lp):
            x = _ln(h, lp["ln1_w"], lp["ln1_b"], self.v_eps)
            qkv = x @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
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
            h = h + (o @ lp["proj"]["kernel"] + lp["proj"]["bias"])
            x = _ln(h, lp["ln2_w"], lp["ln2_b"], self.v_eps)
            x = self._act(x @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
            x = x.astype(h.dtype) @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
            return h + x, None

        h, _ = jax.lax.scan(layer, h, vp["layers"])
        h = _ln(h, vp["post_ln_w"], vp["post_ln_b"], self.v_eps)

        al = params["aligner"]
        z = h @ al["fc1"]["kernel"] + al["fc1"]["bias"]
        for j in range(self.v_depth - 1):
            z = self._act(z).astype(h.dtype)
            z = z @ al[f"hidden_{j}"]["kernel"] + al[f"hidden_{j}"]["bias"]
        return z.astype(self.dtype)
