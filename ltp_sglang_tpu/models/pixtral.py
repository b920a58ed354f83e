"""Pixtral vision tower (Mistral's ViT) + the LLaVA wiring that serves
Pixtral-12B-style checkpoints (`LlavaForConditionalGeneration` with
`vision_config.model_type == "pixtral"`).

Reference: python/sglang/srt/models/pixtral.py. Behavior verified against HF
transformers modeling_pixtral.py:
- patch_conv (stride = patch, no bias) -> flatten -> RMSNorm ln_pre,
- 2D rope: position = h * max_side + w; freqs_h takes the EVEN-indexed
  inverse frequencies, freqs_w the ODD ones (PixtralRotaryEmbedding),
  applied rotate-half style to q and k,
- pre-norm blocks: attention_norm -> MHA -> ffn_norm -> silu-gated MLP,
  all projections bias-free; no CLS token, no final norm.

TPU-first: the reference concatenates every image into one ragged sequence
under a block-diagonal mask; here each (fixed-resolution square) image is a
BATCH row so attention is a plain dense batched einsum and the tower
compiles once — ragged masks would defeat MXU tiling for zero benefit at a
fixed resolution.

Serving detail: a Pixtral prompt carries one [IMG_BREAK] token after each
patch row and [IMG_END] after the last (the tokenizer's ids 12/13, override
via config image_break_token_id / image_end_token_id). The multimodal
placeholder expands to rows*(cols+1) positions and `encode_images` emits
the TEXT embedding of the break/end token at those positions, so injection
reproduces the reference token layout bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.models.llava import LlavaForConditionalGeneration


def _rms(x, w, eps=1e-5):
    x32 = x.astype(jnp.float32)
    return (
        x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    ).astype(x.dtype) * w


class PixtralVisionTower:
    def __init__(self, cfg: Dict[str, Any], dtype=jnp.float32):
        self.dtype = dtype
        self.hidden = cfg.get("hidden_size", 1024)
        self.layers = cfg.get("num_hidden_layers", 24)
        self.heads = cfg.get("num_attention_heads", 16)
        self.inter = cfg.get("intermediate_size", 4096)
        self.image_size = cfg.get("image_size", 1024)
        self.patch = cfg.get("patch_size", 16)
        self.head_dim = cfg.get("head_dim", self.hidden // self.heads)
        self.rope_theta = float(cfg.get("rope_theta", 10000.0))
        self.side = self.image_size // self.patch
        self.num_patches = self.side * self.side

    # -------------------------------------------------------------- params
    def init_params(self, key) -> Dict[str, Any]:
        D, F, H, hd = self.hidden, self.inter, self.layers, self.head_dim
        ks = iter(jax.random.split(key, 16))

        def w(*shape, scale=0.02):
            return (jax.random.normal(next(ks), shape, jnp.float32) * scale
                    ).astype(self.dtype)

        nh = self.heads
        return {
            "patch_conv": {"kernel": w(D, 3, self.patch, self.patch)},
            "ln_pre": jnp.ones((D,), self.dtype),
            "layers": {
                "attention_norm": jnp.ones((H, D), self.dtype),
                "q_proj": {"kernel": w(H, D, nh * hd)},
                "k_proj": {"kernel": w(H, D, nh * hd)},
                "v_proj": {"kernel": w(H, D, nh * hd)},
                "o_proj": {"kernel": w(H, nh * hd, D)},
                "ffn_norm": jnp.ones((H, D), self.dtype),
                "gate_proj": {"kernel": w(H, D, F)},
                "up_proj": {"kernel": w(H, D, F)},
                "down_proj": {"kernel": w(H, F, D)},
            },
        }

    def convert_hf_weights(self, weights, prefix="vision_tower.") -> Dict[str, Any]:
        def g(n):
            for p in (prefix, "model." + prefix):
                if p + n in weights:
                    return np.asarray(weights[p + n])
            raise KeyError(prefix + n)

        H = self.layers

        def stack(sub):
            return {
                "kernel": jnp.asarray(
                    np.stack(
                        [g(f"transformer.layers.{i}.{sub}.weight").T
                         for i in range(H)]
                    ),
                    self.dtype,
                )
            }

        def stack_norm(sub):
            return jnp.asarray(
                np.stack([g(f"transformer.layers.{i}.{sub}.weight")
                          for i in range(H)]),
                self.dtype,
            )

        return {
            "patch_conv": {"kernel": jnp.asarray(g("patch_conv.weight"), self.dtype)},
            "ln_pre": jnp.asarray(g("ln_pre.weight"), self.dtype),
            "layers": {
                "attention_norm": stack_norm("attention_norm"),
                "q_proj": stack("attention.q_proj"),
                "k_proj": stack("attention.k_proj"),
                "v_proj": stack("attention.v_proj"),
                "o_proj": stack("attention.o_proj"),
                "ffn_norm": stack_norm("ffn_norm"),
                "gate_proj": stack("feed_forward.gate_proj"),
                "up_proj": stack("feed_forward.up_proj"),
                "down_proj": stack("feed_forward.down_proj"),
            },
        }

    # ------------------------------------------------------------- forward
    def _rope_tables(self):
        """cos/sin [P, head_dim] for the square meshgrid (HF
        PixtralRotaryEmbedding: even inv-freqs index rows, odd index cols)."""
        hd = self.head_dim
        freqs = 1.0 / (self.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
        pos = np.arange(self.side)
        fh = np.outer(pos, freqs[0::2])  # [side, hd/4]
        fw = np.outer(pos, freqs[1::2])
        grid = np.concatenate(
            [
                np.repeat(fh[:, None, :], self.side, 1),
                np.repeat(fw[None, :, :], self.side, 0),
            ],
            axis=-1,
        ).reshape(self.num_patches, hd // 2)
        full = np.concatenate([grid, grid], axis=-1)  # [P, hd]
        return (
            jnp.asarray(np.cos(full), jnp.float32),
            jnp.asarray(np.sin(full), jnp.float32),
        )

    def forward(self, params, pixel_values, select_layer=-1):
        """[N, 3, S, S] -> [N, P, D] final hidden states (pixtral has no CLS
        and no final norm; only the last layer is served)."""
        if select_layer not in (-1, self.layers):
            raise NotImplementedError("pixtral serves the final hidden layer")
        x = pixel_values.astype(jnp.float32)
        patches = jax.lax.conv_general_dilated(
            x, params["patch_conv"]["kernel"].astype(jnp.float32),
            window_strides=(self.patch, self.patch), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        N = patches.shape[0]
        h = patches.reshape(N, self.hidden, self.num_patches).transpose(0, 2, 1)
        h = _rms(h.astype(self.dtype), params["ln_pre"])

        nh, hd = self.heads, self.head_dim
        cos, sin = self._rope_tables()
        scale = hd ** -0.5

        def rot_half(t):
            a, b = jnp.split(t, 2, axis=-1)
            return jnp.concatenate([-b, a], axis=-1)

        def layer(h, lp):
            x = _rms(h, lp["attention_norm"])
            T = x.shape[1]
            q = (x @ lp["q_proj"]["kernel"]).reshape(N, T, nh, hd)
            k = (x @ lp["k_proj"]["kernel"]).reshape(N, T, nh, hd)
            v = (x @ lp["v_proj"]["kernel"]).reshape(N, T, nh, hd)
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
            q = (qf * c + rot_half(qf) * s).astype(x.dtype)
            k = (kf * c + rot_half(kf) * s).astype(x.dtype)
            sc = jnp.einsum("nthd,nshd->nhts", q, k,
                            preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(sc, axis=-1).astype(x.dtype)
            o = jnp.einsum("nhts,nshd->nthd", p, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(N, T, nh * hd).astype(x.dtype)
            h = h + o @ lp["o_proj"]["kernel"]
            x = _rms(h, lp["ffn_norm"])
            g = jax.nn.silu((x @ lp["gate_proj"]["kernel"]).astype(jnp.float32))
            u = (x @ lp["up_proj"]["kernel"]).astype(jnp.float32)
            h = h + (g * u).astype(x.dtype) @ lp["down_proj"]["kernel"]
            return h, None

        h, _ = jax.lax.scan(layer, h, params["layers"])
        return h


class PixtralLlavaForConditionalGeneration(LlavaForConditionalGeneration):
    """LLaVA wiring over the pixtral tower, with the [IMG_BREAK]/[IMG_END]
    row layout baked into the placeholder expansion (module docstring)."""

    def __init__(self, config: ModelConfig, attn_impl=None, kv_write_impl=None):
        super().__init__(config, attn_impl, kv_write_impl)
        hf_raw = config.hf_config
        self.vision = PixtralVisionTower(self.vision_config, dtype=self.dtype)
        self.fixed_image_size = self.vision.image_size
        self.image_break_token_id = hf_raw.get("image_break_token_id", 12)
        self.image_end_token_id = hf_raw.get("image_end_token_id", 13)

    @property
    def num_image_tokens(self) -> int:
        side = self.vision.side
        return side * (side + 1)  # +1 break/end column per row

    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> [N, side*(side+1), Dm]: projected patch rows with
        the break/end TEXT embeddings appended to each row."""
        feats = self.vision.forward(params["vision"], pixel_values)
        pj = params["projector"]
        h = jnp.einsum("btv,vd->btd", feats, pj["linear_1"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_1"]["bias"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
        h = jnp.einsum("btd,de->bte", h.astype(self.dtype),
                       pj["linear_2"]["kernel"],
                       preferred_element_type=jnp.float32) + pj["linear_2"]["bias"]
        h = h.astype(self.dtype)
        N = h.shape[0]
        side = self.vision.side
        Dm = h.shape[-1]
        rows = h.reshape(N, side, side, Dm)
        embed = params["embed"]["weight"]
        brk = embed[self.image_break_token_id].astype(h.dtype)
        end = embed[self.image_end_token_id].astype(h.dtype)
        tail = jnp.broadcast_to(brk, (N, side, 1, Dm))
        tail = tail.at[:, -1, 0].set(end)
        out = jnp.concatenate([rows, tail], axis=2)
        return out.reshape(N, side * (side + 1), Dm)

    def convert_hf_weights(self, weights: Dict[str, np.ndarray]) -> Dict[str, Any]:
        flat = {}
        for name, w in weights.items():
            if name.startswith("model."):
                name = name[len("model."):]
            flat[name] = w
        lm = {k[len("language_model."):]: v for k, v in flat.items()
              if k.startswith("language_model.")}
        if "lm_head.weight" in flat:
            lm["lm_head.weight"] = flat["lm_head.weight"]
        # Grandparent conversion: llava's own convert assumes a CLIP tower.
        from ltp_sglang_tpu.models.llama import LlamaForCausalLM

        params = LlamaForCausalLM.convert_hf_weights(self, lm)
        params["vision"] = self.vision.convert_hf_weights(flat, prefix="vision_tower.")

        def lin(name):
            out = {
                "kernel": jnp.asarray(
                    np.asarray(flat[f"multi_modal_projector.{name}.weight"]).T,
                    self.dtype),
            }
            bias = flat.get(f"multi_modal_projector.{name}.bias")
            out["bias"] = (
                jnp.asarray(np.asarray(bias), self.dtype)
                if bias is not None
                else jnp.zeros((out["kernel"].shape[-1],), self.dtype)
            )
            return out

        params["projector"] = {"linear_1": lin("linear_1"),
                               "linear_2": lin("linear_2")}
        return params
