"""Qwen2-VL / Qwen2.5-VL vision transformer.

Reference: python/sglang/srt/models/qwen2_5_vl.py vision tower; semantics
verified against HF transformers modeling_qwen2_5_vl.py:
- Conv3D patchify over (temporal_patch=2, patch, patch) — still images are
  duplicated into 2 frames; implemented as reshape + one MXU matmul.
- 2D rotary over (row, col) patch coordinates, half the head dim each.
- Qwen2.5: RMSNorm blocks, gated SiLU MLP, WINDOW attention (window_size
  pixels -> blocks of (window/merge/patch)^2 llm cells) with full attention
  at fullatt_block_indexes; Qwen2-VL: LayerNorm blocks, quick-gelu MLP,
  full attention everywhere.
- 2x2 spatial merger: RMSNorm (2.5) / LayerNorm (2.0) + 2-layer MLP to the
  text width.

TPU design: this build fixes the processor resolution per model (grid is a
compile-time constant), so the window partition, its inverse permutation,
and the 2D rope tables are all STATIC numpy — the whole tower is one jitted
function over [B, 3, H, W] pixel batches; window attention is a batched
dense attention over equal [n_windows, win_len] blocks (no ragged masks),
and per-image isolation comes free from the batch dimension.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class QwenVisionTower:
    def __init__(self, vision_config: Dict[str, Any], image_size: int,
                 dtype=jnp.float32, v25: bool = True):
        c = vision_config
        self.v25 = v25
        self.dtype = dtype
        # v2.5 names: hidden_size = working width, out_hidden_size = output;
        # v2.0 names: embed_dim = working width, hidden_size = output.
        if v25:
            self.hidden = c.get("hidden_size", 1280)
        else:
            self.hidden = c.get("embed_dim", 1280)
        self.depth = c.get("depth", 32)
        self.heads = c.get("num_heads", 16)
        self.head_dim = self.hidden // self.heads
        if v25:
            self.intermediate = c.get("intermediate_size", self.hidden * 4)
        else:
            self.intermediate = c.get(
                "intermediate_size",
                int(self.hidden * c.get("mlp_ratio", 4)),
            ) or int(self.hidden * c.get("mlp_ratio", 4))
        self.patch = c.get("patch_size", 14)
        self.tpatch = c.get("temporal_patch_size", 2)
        self.merge = c.get("spatial_merge_size", 2)
        if v25:
            self.out_hidden = c.get("out_hidden_size", 3584)
        else:
            self.out_hidden = c.get("hidden_size", 3584)
        self.window = c.get("window_size", 112)
        self.fullatt = set(c.get("fullatt_block_indexes", []) or [])
        self.image_size = image_size
        g = image_size // self.patch
        assert g % self.merge == 0, (image_size, self.patch, self.merge)
        self.grid = g  # static square grid (fixed-resolution processor)
        self.grid_thw = (1, g, g)
        self.num_patches = g * g
        llm_g = g // self.merge
        self.num_image_tokens = llm_g * llm_g

        # ---- static window partition (HF get_window_index for one square
        # grid): order merge-units window-major; equal windows when the llm
        # grid divides the window size, else fall back to full attention.
        self.win_cells = max(self.window // self.merge // self.patch, 1)
        if v25 and llm_g % self.win_cells == 0 and len(self.fullatt) < self.depth:
            nw = llm_g // self.win_cells
            idx = np.arange(llm_g * llm_g).reshape(
                nw, self.win_cells, nw, self.win_cells
            ).transpose(0, 2, 1, 3).reshape(-1)
            self.window_index = idx  # [llm_cells] merge-unit permutation
            self.n_windows = nw * nw
        else:
            self.window_index = np.arange(llm_g * llm_g)
            self.n_windows = 1
        self.inv_window_index = np.argsort(self.window_index)

        # ---- static 2D rope tables in WINDOW order, [N, head_dim/2] each.
        hpos = np.arange(g)[:, None].repeat(g, 1)
        wpos = np.arange(g)[None, :].repeat(g, 0)

        def merge_order(a):  # HF rot_pos_emb: flatten by merge units
            return a.reshape(
                llm_g, self.merge, llm_g, self.merge
            ).transpose(0, 2, 1, 3).reshape(-1)

        hp, wp = merge_order(hpos), merge_order(wpos)
        # reorder patches by the window permutation of their merge units
        u = self.merge * self.merge
        perm_p = (self.window_index[:, None] * u + np.arange(u)[None, :]).reshape(-1)
        hp, wp = hp[perm_p], wp[perm_p]  # coords arrays are unit-major
        # The patchify below emits ROW-MAJOR patches; um maps unit-major
        # sequence position -> row-major patch index (the HF processor's
        # flatten order), so the full gather is um o perm_p.
        um = np.arange(g * g).reshape(
            llm_g, self.merge, llm_g, self.merge
        ).transpose(0, 2, 1, 3).reshape(-1)
        perm_p = um[perm_p]
        half = self.head_dim // 2
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, half, 2) / half))
        hf_ = np.outer(hp, inv_freq)  # [N, head_dim/4]
        wf_ = np.outer(wp, inv_freq)
        freqs = np.concatenate([hf_, wf_], axis=-1)  # [N, head_dim/2]
        emb = np.concatenate([freqs, freqs], axis=-1)  # [N, head_dim]
        self._cos = jnp.asarray(np.cos(emb), jnp.float32)
        self._sin = jnp.asarray(np.sin(emb), jnp.float32)
        self._perm_p = jnp.asarray(perm_p)
        self._inv_perm_units = jnp.asarray(self.inv_window_index)

    # --------------------------------------------------------------- params
    def init_params(self, key) -> Dict[str, Any]:
        D, L, I = self.hidden, self.depth, self.intermediate
        ks = jax.random.split(key, 10)
        pdim = 3 * self.tpatch * self.patch * self.patch

        def w(k, *shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(self.dtype)

        def norm(lead=()):
            if self.v25:
                return jnp.ones(lead + (D,), self.dtype)
            return {"w": jnp.ones(lead + (D,), self.dtype),
                    "b": jnp.zeros(lead + (D,), self.dtype)}

        merged = D * self.merge * self.merge
        p = {
            "patch_embed": w(ks[0], pdim, D),
            "layers": {
                "norm1": norm((L,)),
                "norm2": norm((L,)),
                "qkv": {"kernel": w(ks[1], L, D, 3 * D),
                        "bias": jnp.zeros((L, 3 * D), self.dtype)},
                "proj": {"kernel": w(ks[2], L, D, D),
                         "bias": jnp.zeros((L, D), self.dtype)},
            },
            "merger": {
                "ln_q": norm(),
                "fc1": {"kernel": w(ks[6], merged, merged),
                        "bias": jnp.zeros((merged,), self.dtype)},
                "fc2": {"kernel": w(ks[7], merged, self.out_hidden),
                        "bias": jnp.zeros((self.out_hidden,), self.dtype)},
            },
        }
        if self.v25:
            p["layers"]["gate"] = {"kernel": w(ks[3], L, D, I),
                                   "bias": jnp.zeros((L, I), self.dtype)}
            p["layers"]["up"] = {"kernel": w(ks[4], L, D, I),
                                 "bias": jnp.zeros((L, I), self.dtype)}
            p["layers"]["down"] = {"kernel": w(ks[5], L, I, D),
                                   "bias": jnp.zeros((L, D), self.dtype)}
        else:
            p["layers"]["fc1"] = {"kernel": w(ks[3], L, D, I),
                                  "bias": jnp.zeros((L, I), self.dtype)}
            p["layers"]["fc2"] = {"kernel": w(ks[4], L, I, D),
                                  "bias": jnp.zeros((L, D), self.dtype)}
        return p

    def convert_hf_weights(self, weights, prefix: str):
        L = self.depth

        def get(name):
            return np.asarray(weights[prefix + name])

        def lin(sub):
            return {
                "kernel": jnp.asarray(np.stack(
                    [get(f"blocks.{i}.{sub}.weight").T for i in range(L)]
                ), self.dtype),
                "bias": jnp.asarray(np.stack(
                    [get(f"blocks.{i}.{sub}.bias") for i in range(L)]
                ), self.dtype),
            }

        def norm(sub, lead=True):
            idx = range(L) if lead else [None]
            if self.v25:
                vals = [get(f"blocks.{i}.{sub}.weight") if lead else
                        get(f"{sub}.weight") for i in idx]
                out = jnp.asarray(np.stack(vals) if lead else vals[0], self.dtype)
                return out
            ws = [get(f"blocks.{i}.{sub}.weight") if lead else
                  get(f"{sub}.weight") for i in idx]
            bs = [get(f"blocks.{i}.{sub}.bias") if lead else
                  get(f"{sub}.bias") for i in idx]
            return {"w": jnp.asarray(np.stack(ws) if lead else ws[0], self.dtype),
                    "b": jnp.asarray(np.stack(bs) if lead else bs[0], self.dtype)}

        # Conv3d [D, 3, T, P, P] -> flat [3*T*P*P, D] matching the patchify
        # layout below (c, t, ph, pw).
        conv = get("patch_embed.proj.weight")
        pe = conv.reshape(conv.shape[0], -1).T
        p = {
            "patch_embed": jnp.asarray(pe, self.dtype),
            "layers": {
                "norm1": norm("norm1"),
                "norm2": norm("norm2"),
                "qkv": lin("attn.qkv"),
                "proj": lin("attn.proj"),
            },
            "merger": {
                "ln_q": norm("merger.ln_q", lead=False),
                "fc1": {
                    "kernel": jnp.asarray(get("merger.mlp.0.weight").T, self.dtype),
                    "bias": jnp.asarray(get("merger.mlp.0.bias"), self.dtype),
                },
                "fc2": {
                    "kernel": jnp.asarray(get("merger.mlp.2.weight").T, self.dtype),
                    "bias": jnp.asarray(get("merger.mlp.2.bias"), self.dtype),
                },
            },
        }
        if self.v25:
            p["layers"]["gate"] = lin("mlp.gate_proj")
            p["layers"]["up"] = lin("mlp.up_proj")
            p["layers"]["down"] = lin("mlp.down_proj")
        else:
            p["layers"]["fc1"] = lin("mlp.fc1")
            p["layers"]["fc2"] = lin("mlp.fc2")
        return p

    # -------------------------------------------------------------- forward
    def _norm(self, x, w):
        if self.v25:
            return _rms(x, w)
        return _ln(x, w["w"], w["b"])

    def forward(self, params, pixel_values):
        """[B, 3, H, W] -> merged features [B, llm_tokens, out_hidden] in
        LLM (row-major merge-unit) order."""
        B = pixel_values.shape[0]
        D, H, Dh = self.hidden, self.heads, self.head_dim
        P, g = self.patch, self.grid
        x = pixel_values.astype(self.dtype)
        # Patchify (c, t, ph, pw layout per HF Conv3d, frames duplicated).
        x = x.reshape(B, 3, g, P, g, P).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(B, g * g, 3, P * P)
        x = jnp.concatenate([x, x], axis=2).reshape(B, g * g, 3 * 2 * P * P)
        # HF layout is (c, t, ph*pw): interleave the duplicate per channel.
        x = x.reshape(B, g * g, 2, 3, P * P).transpose(0, 1, 3, 2, 4).reshape(
            B, g * g, 3 * self.tpatch * P * P
        )
        h = jnp.einsum("bnk,kd->bnd", x, params["patch_embed"],
                       preferred_element_type=jnp.float32).astype(self.dtype)
        # Reorder patches window-major (static permutation).
        h = h[:, self._perm_p]
        N = h.shape[1]
        cos = self._cos[None, :, None, :]
        sin = self._sin[None, :, None, :]

        def rope2d(t):  # [B, N, H, Dh]
            t1, t2 = jnp.split(t.astype(jnp.float32), 2, axis=-1)
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return (t * cos + rot * sin).astype(t.dtype)

        win_len = N // self.n_windows

        def block(hh, xs):
            lp, full = xs
            y = self._norm(hh, lp["norm1"])
            qkv = jnp.einsum("bnd,de->bne", y, lp["qkv"]["kernel"],
                             preferred_element_type=jnp.float32) + lp["qkv"]["bias"]
            q, k, v = jnp.split(qkv.astype(hh.dtype), 3, axis=-1)
            q = rope2d(q.reshape(B, N, H, Dh))
            k = rope2d(k.reshape(B, N, H, Dh))
            v = v.reshape(B, N, H, Dh)

            def attend(q, k, v, nw):
                wl = N // nw
                qw = q.reshape(B * nw, wl, H, Dh)
                kw = k.reshape(B * nw, wl, H, Dh)
                vw = v.reshape(B * nw, wl, H, Dh)
                s = jnp.einsum("bthd,bshd->bhts", qw, kw,
                               preferred_element_type=jnp.float32) * (Dh ** -0.5)
                pr = jax.nn.softmax(s, axis=-1).astype(vw.dtype)
                o = jnp.einsum("bhts,bshd->bthd", pr, vw,
                               preferred_element_type=jnp.float32)
                return o.reshape(B, N, H * Dh).astype(hh.dtype)

            if self.n_windows > 1:
                o = jax.lax.cond(
                    full,
                    lambda q, k, v: attend(q, k, v, 1),
                    lambda q, k, v: attend(q, k, v, self.n_windows),
                    q, k, v,
                )
            else:
                o = attend(q, k, v, 1)
            o = jnp.einsum("bnd,de->bne", o, lp["proj"]["kernel"],
                           preferred_element_type=jnp.float32) + lp["proj"]["bias"]
            hh = hh + o.astype(hh.dtype)
            y = self._norm(hh, lp["norm2"])
            if self.v25:
                gate = jnp.einsum("bnd,di->bni", y, lp["gate"]["kernel"],
                                  preferred_element_type=jnp.float32) + lp["gate"]["bias"]
                up = jnp.einsum("bnd,di->bni", y, lp["up"]["kernel"],
                                preferred_element_type=jnp.float32) + lp["up"]["bias"]
                m = jax.nn.silu(gate) * up
                m = jnp.einsum("bni,id->bnd", m.astype(hh.dtype),
                               lp["down"]["kernel"],
                               preferred_element_type=jnp.float32) + lp["down"]["bias"]
            else:
                m = jnp.einsum("bnd,di->bni", y, lp["fc1"]["kernel"],
                               preferred_element_type=jnp.float32) + lp["fc1"]["bias"]
                m = m * jax.nn.sigmoid(1.702 * m)  # quick_gelu
                m = jnp.einsum("bni,id->bnd", m.astype(hh.dtype),
                               lp["fc2"]["kernel"],
                               preferred_element_type=jnp.float32) + lp["fc2"]["bias"]
            return hh + m.astype(hh.dtype), None

        full_flags = jnp.asarray(
            np.array([i in self.fullatt for i in range(self.depth)], bool)
        )
        h, _ = jax.lax.scan(block, h, (params["layers"], full_flags))

        # Merger: group 2x2 merge units (window order groups them
        # contiguously), then restore LLM order with the inverse permutation.
        u = self.merge * self.merge
        mp = params["merger"]
        y = self._norm(h, mp["ln_q"]).reshape(B, N // u, u * D)
        y = jnp.einsum("bnm,mo->bno", y, mp["fc1"]["kernel"],
                       preferred_element_type=jnp.float32) + mp["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("bno,oe->bne", y.astype(h.dtype), mp["fc2"]["kernel"],
                       preferred_element_type=jnp.float32) + mp["fc2"]["bias"]
        y = y.astype(self.dtype)
        return y[:, self._inv_perm_units]
