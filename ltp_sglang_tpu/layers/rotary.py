"""Rotary position embeddings (functional, table-driven).

Reference: sgl-kernel fused rope `apply_rope_pos_ids_cos_sin_cache` and the
vllm-lineage rotary_embedding layers. TPU design: precompute the cos/sin cache
once at model build ([max_pos, rot_dim]) and gather rows by position inside the
jitted step; XLA fuses the elementwise rotation into neighboring ops.

Supports the HF "Neox style" non-interleaved layout (rotate_half), which is
what Llama/Qwen/Mistral/Gemma checkpoints use, plus GPT-J interleaved style,
linear/dynamic-NTK/llama3/yarn scaling variants.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _compute_inv_freq(rotary_dim: int, base: float) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim))


def _apply_llama3_scaling(inv_freq: np.ndarray, scaling: Dict[str, Any]) -> np.ndarray:
    factor = scaling.get("factor", 8.0)
    low_freq_factor = scaling.get("low_freq_factor", 1.0)
    high_freq_factor = scaling.get("high_freq_factor", 4.0)
    old_context_len = scaling.get("original_max_position_embeddings", 8192)

    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    new_freqs = []
    for freq in inv_freq:
        wavelen = 2 * math.pi / freq
        if wavelen < high_freq_wavelen:
            new_freqs.append(freq)
        elif wavelen > low_freq_wavelen:
            new_freqs.append(freq / factor)
        else:
            smooth = (old_context_len / wavelen - low_freq_factor) / (
                high_freq_factor - low_freq_factor
            )
            new_freqs.append((1 - smooth) * freq / factor + smooth * freq)
    return np.array(new_freqs, dtype=np.float64)


def _yarn_find_correction_dim(num_rot, dim, base, max_pos):
    return (dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (2 * math.log(base))


def _yarn_linear_ramp(low, high, dim):
    if low == high:
        high += 0.001
    ramp = (np.arange(dim, dtype=np.float64) - low) / (high - low)
    return np.clip(ramp, 0, 1)


def build_cos_sin_cache(
    head_dim: int,
    max_position: int,
    base: float = 10000.0,
    rotary_dim: Optional[int] = None,
    rope_scaling: Optional[Dict[str, Any]] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns [max_position, rotary_dim] with cos||sin concatenated halves."""
    rotary_dim = rotary_dim or head_dim
    inv_freq = _compute_inv_freq(rotary_dim, base)
    mscale = 1.0
    max_pos = max_position

    if rope_scaling:
        rope_type = rope_scaling.get("rope_type") or rope_scaling.get("type")
        factor = rope_scaling.get("factor", 1.0)
        if rope_type == "llama3":
            inv_freq = _apply_llama3_scaling(inv_freq, rope_scaling)
        elif rope_type == "linear":
            inv_freq = inv_freq / factor
            max_pos = int(max_position * factor)
        elif rope_type == "dynamic":
            # dynamic NTK: adjust base assuming max length usage
            max_pos = int(max_position * factor)
            adj_base = base * ((factor * max_pos / max_position) - (factor - 1)) ** (
                rotary_dim / (rotary_dim - 2)
            )
            inv_freq = _compute_inv_freq(rotary_dim, adj_base)
        elif rope_type == "yarn":
            orig_max = rope_scaling.get("original_max_position_embeddings", max_position)
            beta_fast = rope_scaling.get("beta_fast", 32)
            beta_slow = rope_scaling.get("beta_slow", 1)
            extrapolation = _compute_inv_freq(rotary_dim, base)
            interpolation = extrapolation / factor
            low = math.floor(
                _yarn_find_correction_dim(beta_fast, rotary_dim, base, orig_max)
            )
            high = math.ceil(
                _yarn_find_correction_dim(beta_slow, rotary_dim, base, orig_max)
            )
            low, high = max(low, 0), min(high, rotary_dim - 1)
            mask = 1.0 - _yarn_linear_ramp(low, high, rotary_dim // 2)
            inv_freq = interpolation * (1 - mask) + extrapolation * mask
            mscale_all = rope_scaling.get("mscale_all_dim", 0)
            ms = rope_scaling.get("mscale", 1.0)
            def _get_mscale(scale, m=1.0):
                if scale <= 1:
                    return 1.0
                return 0.1 * m * math.log(scale) + 1.0
            if mscale_all:
                mscale = float(
                    _get_mscale(factor, ms) / _get_mscale(factor, mscale_all)
                )
            else:
                mscale = float(_get_mscale(factor, ms))
            max_pos = int(orig_max * factor)
        elif rope_type in ("longrope", "su"):
            # Phi-3 / MiniCPM3 LongRoPE (reference layers/rotary_embedding.py
            # Phi3LongRoPEScaledRotaryEmbedding): per-dim rescale factors —
            # positions below original_max use short_factor, beyond use
            # long_factor; each half scaled by its attention mscale
            # (default sqrt(1 + ln(scale)/ln(orig))).
            orig_max = int(
                rope_scaling.get(
                    "original_max_position_embeddings", max_position
                )
            )
            short_f = np.asarray(rope_scaling["short_factor"], np.float64)
            long_f = np.asarray(rope_scaling["long_factor"], np.float64)
            scale = max(max_position / orig_max, 1.0)
            default_m = (
                math.sqrt(1.0 + math.log(scale) / math.log(orig_max))
                if scale > 1.0
                else 1.0
            )
            short_m = float(rope_scaling.get("short_mscale") or default_m)
            long_m = float(rope_scaling.get("long_mscale") or default_m)
            t = np.arange(max(max_position, orig_max), dtype=np.float64)
            f_short = np.einsum("i,j->ij", t[:orig_max], inv_freq / short_f)
            f_long = np.einsum("i,j->ij", t[orig_max:], inv_freq / long_f)
            cache = np.concatenate(
                [
                    np.concatenate(
                        [np.cos(f_short) * short_m, np.sin(f_short) * short_m],
                        axis=-1,
                    ),
                    np.concatenate(
                        [np.cos(f_long) * long_m, np.sin(f_long) * long_m],
                        axis=-1,
                    ),
                ],
                axis=0,
            )
            return jnp.asarray(cache, dtype=dtype)
        elif rope_type in ("default", "mrope", None):
            pass

    max_pos = max(max_pos, max_position)
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    cos = np.cos(freqs) * mscale
    sin = np.sin(freqs) * mscale
    cache = np.concatenate([cos, sin], axis=-1)
    return jnp.asarray(cache, dtype=dtype)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray,
    cos_sin_cache: jnp.ndarray,
    is_neox_style: bool = True,
    rotary_dim: Optional[int] = None,
    style: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q: [..., T, H, D], k: [..., T, Hkv, D], positions: [..., T].

    style: "neox" (rotate-half pairs (j, j+rot/2), freq j) or "gptj"
    (interleaved pairs (2j, 2j+1), freq j — glm/glm4/cohere/gpt-j)."""
    if style is None:
        style = "neox" if is_neox_style else "gptj"
    rot_dim = cos_sin_cache.shape[-1]
    cos, sin = jnp.split(cos_sin_cache[positions], 2, axis=-1)  # [..., T, rot/2]
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]

    def rotate(x):
        x_rot = x[..., :rot_dim]
        x_pass = x[..., rot_dim:]
        if style == "neox":
            x1, x2 = jnp.split(x_rot, 2, axis=-1)
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        else:  # gptj
            x1 = x_rot[..., ::2]
            x2 = x_rot[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)


def apply_rope_mrope(
    q: jnp.ndarray,  # [B, E, H, D]
    k: jnp.ndarray,  # [B, E, Hkv, D]
    mrope_positions: jnp.ndarray,  # [B, 3, E] (t, h, w) position ids
    cos_sin_cache: jnp.ndarray,  # [max_pos, D]
    sections,  # (t, h, w) frequency-slot counts, sum == D/2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal rotary (Qwen2-VL M-RoPE, neox style): frequency slot j
    takes its rotation angle from the t/h/w position id per `sections`
    (reference: transformers apply_multimodal_rotary_pos_emb; the reference
    serving stack computes the same in MRotaryEmbedding). Text tokens carry
    three equal ids, which reduces to standard RoPE."""
    rot = cos_sin_cache.shape[-1]
    half = rot // 2
    # [B, 3, E, D] -> cos/sin [B, 3, E, D/2]
    rows = cos_sin_cache[mrope_positions]
    cos3, sin3 = jnp.split(rows, 2, axis=-1)
    sec_id = np.repeat(np.arange(3), np.asarray(sections))  # [D/2]
    sel = jnp.asarray(np.eye(3, dtype=np.float32)[sec_id])  # [D/2, 3]
    cos = jnp.einsum("bseh,hs->beh", cos3, sel)[:, :, None, :]
    sin = jnp.einsum("bseh,hs->beh", sin3, sel)[:, :, None, :]

    def rotate(x):
        x_rot = x[..., :rot]
        x_pass = x[..., rot:]
        x1, x2 = jnp.split(x_rot, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                              axis=-1)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out.astype(x.dtype)

    return rotate(q), rotate(k)
