"""SigLIP vision transformer (gemma3 / paligemma vision tower).

Faithful to HF `SiglipVisionModel` (modeling_siglip.py), the tower the
reference uses via gemma3_mm / multimodal processors. Differences from CLIP
(models/clip_vit.py): no CLS token, no pre-layernorm, patch conv has a
bias, learned position embeddings over patches only, gelu_tanh MLP, and the
final post_layernorm IS applied (gemma3 consumes last_hidden_state).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.models.clip_vit import _layer_norm


class SiglipVisionTower:
    def __init__(self, vision_config: Dict[str, Any], dtype=jnp.float32):
        c = vision_config
        self.dtype = dtype
        self.hidden = c.get("hidden_size", 768)
        self.layers = c.get("num_hidden_layers", 12)
        self.heads = c.get("num_attention_heads", 12)
        self.intermediate = c.get("intermediate_size", 3072)
        self.image_size = c.get("image_size", 224)
        self.patch = c.get("patch_size", 16)
        self.eps = c.get("layer_norm_eps", 1e-6)
        self.num_patches = (self.image_size // self.patch) ** 2

    def init_params(self, key) -> Dict[str, Any]:
        D, L, I = self.hidden, self.layers, self.intermediate
        ks = jax.random.split(key, 8)

        def w(k, *shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(self.dtype)

        def ln(lead=()):
            return {"w": jnp.ones(lead + (D,), self.dtype),
                    "b": jnp.zeros(lead + (D,), self.dtype)}

        def lin(k, K, N, lead=()):
            return {"kernel": w(k, *lead, K, N),
                    "bias": jnp.zeros(lead + (N,), self.dtype)}

        return {
            "patch_embedding": {
                "kernel": w(ks[0], self.patch * self.patch * 3, D),
                "bias": jnp.zeros((D,), self.dtype),
            },
            "position_embedding": w(ks[1], self.num_patches, D),
            "post_ln": ln(),
            "layers": {
                "ln1": ln((L,)), "ln2": ln((L,)),
                "q": lin(ks[2], D, D, (L,)), "k": lin(ks[3], D, D, (L,)),
                "v": lin(ks[4], D, D, (L,)), "o": lin(ks[5], D, D, (L,)),
                "fc1": lin(ks[6], D, I, (L,)), "fc2": lin(ks[7], I, D, (L,)),
            },
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray], prefix: str):
        L = self.layers

        def get(name):
            return np.asarray(weights[prefix + name])

        def lin(sub):
            return {
                "kernel": jnp.asarray(np.stack(
                    [get(f"encoder.layers.{i}.{sub}.weight").T for i in range(L)]
                ), self.dtype),
                "bias": jnp.asarray(np.stack(
                    [get(f"encoder.layers.{i}.{sub}.bias") for i in range(L)]
                ), self.dtype),
            }

        def ln(sub, lead=True):
            if lead:
                return {
                    "w": jnp.asarray(np.stack(
                        [get(f"encoder.layers.{i}.{sub}.weight") for i in range(L)]
                    ), self.dtype),
                    "b": jnp.asarray(np.stack(
                        [get(f"encoder.layers.{i}.{sub}.bias") for i in range(L)]
                    ), self.dtype),
                }
            return {"w": jnp.asarray(get(f"{sub}.weight"), self.dtype),
                    "b": jnp.asarray(get(f"{sub}.bias"), self.dtype)}

        conv = get("embeddings.patch_embedding.weight")  # [D, 3, P, P]
        kern = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
        return {
            "patch_embedding": {
                "kernel": jnp.asarray(kern, self.dtype),
                "bias": jnp.asarray(
                    get("embeddings.patch_embedding.bias"), self.dtype),
            },
            "position_embedding": jnp.asarray(
                get("embeddings.position_embedding.weight"), self.dtype),
            "post_ln": ln("post_layernorm", lead=False),
            "layers": {
                "ln1": ln("layer_norm1"), "ln2": ln("layer_norm2"),
                "q": lin("self_attn.q_proj"), "k": lin("self_attn.k_proj"),
                "v": lin("self_attn.v_proj"), "o": lin("self_attn.out_proj"),
                "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2"),
            },
        }

    def forward(self, params, pixel_values):
        """[B, 3, H, W] -> last_hidden_state [B, P, D] (post_layernorm
        applied, HF last_hidden_state semantics)."""
        B = pixel_values.shape[0]
        D, H = self.hidden, self.heads
        Dh = D // H
        P = self.patch
        g = self.image_size // P
        x = pixel_values.astype(self.dtype)
        x = x.reshape(B, 3, g, P, g, P).transpose(0, 2, 4, 3, 5, 1)
        x = x.reshape(B, g * g, P * P * 3)
        h = (jnp.einsum("bnk,kd->bnd", x, params["patch_embedding"]["kernel"],
                        preferred_element_type=jnp.float32)
             + params["patch_embedding"]["bias"]).astype(self.dtype)
        h = h + params["position_embedding"][None]
        T = h.shape[1]

        def layer(hh, lp):
            y = _layer_norm(hh, lp["ln1"]["w"], lp["ln1"]["b"], self.eps)
            q = jnp.einsum("btd,de->bte", y, lp["q"]["kernel"]) + lp["q"]["bias"]
            k = jnp.einsum("btd,de->bte", y, lp["k"]["kernel"]) + lp["k"]["bias"]
            v = jnp.einsum("btd,de->bte", y, lp["v"]["kernel"]) + lp["v"]["bias"]
            q = q.reshape(B, T, H, Dh)
            k = k.reshape(B, T, H, Dh)
            v = v.reshape(B, T, H, Dh)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           preferred_element_type=jnp.float32) * (Dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(B, T, D).astype(hh.dtype)
            o = jnp.einsum("btd,de->bte", o, lp["o"]["kernel"]) + lp["o"]["bias"]
            hh = hh + o.astype(hh.dtype)
            y = _layer_norm(hh, lp["ln2"]["w"], lp["ln2"]["b"], self.eps)
            y = jnp.einsum("btd,di->bti", y, lp["fc1"]["kernel"]) + lp["fc1"]["bias"]
            y = jax.nn.gelu(y, approximate=True)
            y = jnp.einsum("bti,id->btd", y, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
            return hh + y.astype(hh.dtype), None

        h, _ = jax.lax.scan(layer, h, params["layers"])
        return _layer_norm(h, params["post_ln"]["w"], params["post_ln"]["b"],
                           self.eps)
