"""W8A8-INT8 quantization: int8 weights AND int8 activations.

Reference analog: python/sglang/srt/layers/quantization/w8a8_int8.py
(W8A8Int8Config / W8A8Int8LinearMethod) — int8 weights with per-channel
scales, activations quantized per-token dynamically, GEMM via
`int8_scaled_mm` (sgl-kernel csrc/gemm).

TPU design: unlike FP8 (v5e has no fp8 MXU), INT8 is a REAL compute format
here — the v5e MXU runs int8xint8->int32 at 2x bf16 peak (~394 TOPS), and
XLA lowers `lax.dot_general` on int8 operands straight to it. So this path
wins twice: half the weight bytes streamed from HBM (decode is
weight-bound) and double the matmul throughput for prefill. Activation
quantization is per-token symmetric dynamic, matching the reference's
`per_token_quant_int8` semantics:

    s_x[t]  = max|x[t,:]| / 127          (f32)
    xq[t,k] = round(x[t,k] / s_x[t])     (int8)
    out     = (xq @ wq) * s_x[:,None] * s_w[None,:]

Checkpoint format handled (compressed-tensors / neuralmagic INT8 and the
reference's own dummy convention): `weight` int8 [out, in] +
`weight_scale` scalar or [out]/[out, 1] per-channel (+ optional ignored
`input_scale` — we always re-derive per-token scales dynamically, which is
strictly more accurate than a static activation scale).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

INT8_MAX = 127.0


def quantize_int8(w: np.ndarray, mode: str = "channel") -> Dict[str, np.ndarray]:
    """Quantize float [out, in] -> int8 + scales (tests / dummy loader);
    returns HF-checkpoint-shaped tensors."""
    w = np.asarray(w, dtype=np.float32)
    if mode == "tensor":
        scale = np.maximum(np.abs(w).max() / INT8_MAX, 1e-12)
        q = np.clip(np.rint(w / scale), -128, 127)
        scales = np.float32(scale)
    elif mode == "channel":
        scale = np.maximum(np.abs(w).max(axis=1) / INT8_MAX, 1e-12)  # [out]
        q = np.clip(np.rint(w / scale[:, None]), -128, 127)
        scales = scale.astype(np.float32)
    else:
        raise ValueError(f"unknown int8 quant mode {mode}")
    return {"weight": q.astype(np.int8), "weight_scale": scales, "mode": mode}


def unpack_int8_to_internal(
    weight: np.ndarray,  # [out, in] int8 (HF layout)
    weight_scale: Optional[np.ndarray],
) -> Dict[str, Any]:
    """HF int8 tensors -> internal apply_linear leaves.

    Internal layout: `w8i` int8 [K=in, N=out] + `weight_scale` f32
    broadcastable to [1, N] (scalar kept as shape ())."""
    w = np.asarray(weight)
    assert w.dtype == np.int8, w.dtype
    out_d, in_d = w.shape
    w8i = jnp.asarray(np.ascontiguousarray(w.T))
    s = np.asarray(weight_scale, dtype=np.float32)
    if s.ndim == 0 or s.size == 1:
        return {"w8i": w8i, "weight_scale": jnp.asarray(s.reshape(()))}
    s = s.reshape(-1)
    assert s.shape[0] == out_d, (s.shape, w.shape)
    return {"w8i": w8i, "weight_scale": jnp.asarray(s[None, :])}


def int8_matmul(x: jnp.ndarray, p: Dict[str, Any], li=None) -> jnp.ndarray:
    """x [..., K] @ int8-weights -> [..., N] in x.dtype, per-token dynamic
    activation quant. `li` selects the layer of stacked [L, K, N] leaves (a
    dynamic slice of an int8 array is cheap — 1 byte/elem — unlike the int4
    packed case which needs the in-kernel gather)."""
    w = p["w8i"]
    s_w = p["weight_scale"]
    if w.ndim == 3:
        w = w[li]
        s_w = s_w[li] if s_w.ndim >= 1 else s_w
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(x2), axis=1, keepdims=True), 1e-10) / INT8_MAX
    xq = jnp.clip(jnp.round(x2 / s_x), -128, 127).astype(jnp.int8)
    acc = jnp.dot(xq, w, preferred_element_type=jnp.int32)  # MXU int8 path
    out = acc.astype(jnp.float32) * s_x  # [M, N] * [M, 1]
    out = out * (s_w if s_w.ndim == 0 else s_w.astype(jnp.float32))
    return out.reshape(*lead, w.shape[-1]).astype(x.dtype)
