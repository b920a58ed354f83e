"""CLIP vision transformer (the llava-family vision tower).

Faithful to HF `CLIPVisionModel` (transformers clip/modeling_clip.py), which
the reference uses via vision_tower wrappers (models/llava.py,
layers/attention/vision.py). TPU notes: the whole tower is one jittable
function over [B, 3, H, W] pixel batches — full (non-causal) attention over
~577 patch tokens is a plain fused MXU matmul, no paging needed; images are
encoded in a SEPARATE jit step from the language model so the serving
buckets stay text-shaped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"quick_gelu": _quick_gelu, "gelu": jax.nn.gelu,
         "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}


class ClipVisionTower:
    def __init__(self, vision_config: Dict[str, Any], dtype=jnp.float32):
        c = vision_config
        self.dtype = dtype
        self.hidden = c.get("hidden_size", 1024)
        self.layers = c.get("num_hidden_layers", 24)
        self.heads = c.get("num_attention_heads", 16)
        self.intermediate = c.get("intermediate_size", 4096)
        self.image_size = c.get("image_size", 336)
        self.patch = c.get("patch_size", 14)
        self.eps = c.get("layer_norm_eps", 1e-5)
        self.act = _ACTS[c.get("hidden_act", "quick_gelu")]
        self.num_patches = (self.image_size // self.patch) ** 2
        self.num_positions = self.num_patches + 1  # + CLS

    # ------------------------------------------------------------ parameters
    def init_params(self, key) -> Dict[str, Any]:
        D, L, I = self.hidden, self.layers, self.intermediate
        ks = jax.random.split(key, 8)

        def w(k, *shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(self.dtype)

        def ln():
            return {"w": jnp.ones((L, D), self.dtype), "b": jnp.zeros((L, D), self.dtype)}

        return {
            "class_embedding": w(ks[0], D),
            "patch_embedding": w(ks[1], self.patch, self.patch, 3, D),
            "position_embedding": w(ks[2], self.num_positions, D),
            "pre_ln": {"w": jnp.ones((D,), self.dtype), "b": jnp.zeros((D,), self.dtype)},
            "layers": {
                "ln1": ln(),
                "ln2": ln(),
                "q": {"kernel": w(ks[3], L, D, D), "bias": jnp.zeros((L, D), self.dtype)},
                "k": {"kernel": w(ks[4], L, D, D), "bias": jnp.zeros((L, D), self.dtype)},
                "v": {"kernel": w(ks[5], L, D, D), "bias": jnp.zeros((L, D), self.dtype)},
                "o": {"kernel": w(ks[6], L, D, D), "bias": jnp.zeros((L, D), self.dtype)},
                "fc1": {"kernel": w(ks[7], L, D, I), "bias": jnp.zeros((L, I), self.dtype)},
                "fc2": {"kernel": w(ks[0], L, I, D), "bias": jnp.zeros((L, D), self.dtype)},
            },
        }

    def convert_hf_weights(self, weights: Dict[str, np.ndarray], prefix: str):
        """prefix e.g. 'vision_tower.vision_model.'."""
        L = self.layers

        def get(name):
            return np.asarray(weights[prefix + name])

        def lin(sub):
            return {
                "kernel": jnp.asarray(
                    np.stack([get(f"encoder.layers.{i}.{sub}.weight").T
                              for i in range(L)]), self.dtype),
                "bias": jnp.asarray(
                    np.stack([get(f"encoder.layers.{i}.{sub}.bias")
                              for i in range(L)]), self.dtype),
            }

        def ln(sub):
            return {
                "w": jnp.asarray(np.stack(
                    [get(f"encoder.layers.{i}.{sub}.weight") for i in range(L)]
                ), self.dtype),
                "b": jnp.asarray(np.stack(
                    [get(f"encoder.layers.{i}.{sub}.bias") for i in range(L)]
                ), self.dtype),
            }

        # HF conv weight [D, 3, P, P] -> [P, P, 3, D]
        conv = get("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
        # NOTE "pre_layrnorm" is HF CLIP's actual (misspelled) name.
        return {
            "class_embedding": jnp.asarray(
                get("embeddings.class_embedding"), self.dtype),
            "patch_embedding": jnp.asarray(conv, self.dtype),
            "position_embedding": jnp.asarray(
                get("embeddings.position_embedding.weight"), self.dtype),
            "pre_ln": {
                "w": jnp.asarray(get("pre_layrnorm.weight"), self.dtype),
                "b": jnp.asarray(get("pre_layrnorm.bias"), self.dtype),
            },
            "layers": {
                "ln1": ln("layer_norm1"), "ln2": ln("layer_norm2"),
                "q": lin("self_attn.q_proj"), "k": lin("self_attn.k_proj"),
                "v": lin("self_attn.v_proj"), "o": lin("self_attn.out_proj"),
                "fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2"),
            },
        }

    # ------------------------------------------------------------- forward
    def forward(self, params, pixel_values, select_layer: int = -2):
        """pixel_values [B, 3, H, W] -> hidden states [B, 1+P, D] of encoder
        layer `select_layer` (llava uses -2; post_layernorm NOT applied,
        matching HF hidden_states semantics)."""
        B = pixel_values.shape[0]
        D, H = self.hidden, self.heads
        Dh = D // H
        x = pixel_values.astype(self.dtype)
        # Patchify: conv stride=patch == unfold + matmul (MXU-friendly).
        P = self.patch
        g = self.image_size // P
        x = x.reshape(B, 3, g, P, g, P).transpose(0, 2, 4, 3, 5, 1)
        x = x.reshape(B, g * g, P * P * 3)
        kern = params["patch_embedding"].reshape(P * P * 3, D)
        # Match conv semantics: kernel laid out [P, P, 3, D] -> rows (p, p, c).
        patches = jnp.einsum("bnk,kd->bnd", x, kern,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        cls = jnp.broadcast_to(params["class_embedding"][None, None], (B, 1, D))
        h = jnp.concatenate([cls, patches], axis=1)
        h = h + params["position_embedding"][None]
        h = _layer_norm(h, params["pre_ln"]["w"], params["pre_ln"]["b"], self.eps)

        n_run = self.layers + select_layer + 1 if select_layer < 0 else select_layer
        T = h.shape[1]

        def layer(hh, xs):
            lp = xs
            y = _layer_norm(hh, lp["ln1"]["w"], lp["ln1"]["b"], self.eps)
            q = (jnp.einsum("btd,de->bte", y, lp["q"]["kernel"]) + lp["q"]["bias"])
            k = (jnp.einsum("btd,de->bte", y, lp["k"]["kernel"]) + lp["k"]["bias"])
            v = (jnp.einsum("btd,de->bte", y, lp["v"]["kernel"]) + lp["v"]["bias"])
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
            y = self.act(y)
            y = jnp.einsum("bti,id->btd", y, lp["fc2"]["kernel"]) + lp["fc2"]["bias"]
            return hh + y.astype(hh.dtype), None

        # Slice the stacked layer params to the first n_run layers.
        lp_run = jax.tree.map(lambda a: a[:n_run], params["layers"])
        h, _ = jax.lax.scan(layer, h, lp_run)
        return h
