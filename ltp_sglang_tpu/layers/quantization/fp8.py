"""FP8 weight quantization: checkpoint ingestion + dequant semantics.

Reference analog: python/sglang/srt/layers/quantization/fp8.py:110 (Fp8Config /
Fp8LinearMethod) — per-tensor, per-channel, and 128x128 block-wise scales for
float8_e4m3 weights, plus activation scales.

TPU design decision: v5e has no FP8 MXU, so the w8a8 fast path the reference
gets from CUTLASS fp8 GEMMs does not exist here. What FP8 buys on TPU is
*weight bandwidth* (1 byte/elem streamed from HBM — decode is weight-bound)
and *KV-cache bandwidth/capacity*. We therefore ingest FP8 checkpoints
bit-faithfully (same scale conventions, so accuracy matches the reference),
keep weights fp8 in HBM, and fuse dequant into the matmul (XLA convert+scale
fusion; Pallas fused kernel for the hot path). Activation `input_scale`
tensors are accepted and ignored — activations stay bf16, which is strictly
more accurate than e4m3 activations and costs nothing on this hardware.

Checkpoint formats handled (all observed in HF fp8 checkpoints):
- per-tensor: `weight` fp8 [out, in] + `weight_scale` scalar
  (+ optional `input_scale`) — e.g. neuralmagic FP8 checkpoints.
- per-channel: `weight_scale` [out] or [out, 1] (compressed-tensors).
- block-wise: `weight_scale_inv` [ceil(out/bs), ceil(in/bs)] (DeepSeek V3
  convention; despite the name it MULTIPLIES the weight, fp8.py:556).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

FP8_E4M3_MAX = 448.0

# Default block shape for block-wise scales (reference fp8.py weight_block_size).
DEFAULT_BLOCK = 128


def quantize_fp8(
    w: np.ndarray, mode: str = "channel", block: int = DEFAULT_BLOCK
) -> Dict[str, np.ndarray]:
    """Quantize a float weight [out, in] to fp8 + scales (for tests and the
    dummy loader). Returns HF-checkpoint-shaped tensors."""
    w = np.asarray(w, dtype=np.float32)
    out_d, in_d = w.shape
    if mode == "tensor":
        scale = np.maximum(np.abs(w).max() / FP8_E4M3_MAX, 1e-12)
        q = w / scale
        scales = np.float32(scale)
    elif mode == "channel":
        scale = np.maximum(np.abs(w).max(axis=1) / FP8_E4M3_MAX, 1e-12)  # [out]
        q = w / scale[:, None]
        scales = scale.astype(np.float32)
    elif mode == "block":
        po = (-out_d) % block
        pi = (-in_d) % block
        wp = np.pad(w, ((0, po), (0, pi)))
        ob, ib = wp.shape[0] // block, wp.shape[1] // block
        wb = wp.reshape(ob, block, ib, block)
        scale = np.maximum(
            np.abs(wb).max(axis=(1, 3)) / FP8_E4M3_MAX, 1e-12
        )  # [ob, ib]
        q = (wb / scale[:, None, :, None]).reshape(wp.shape)[:out_d, :in_d]
        scales = scale.astype(np.float32)
    else:
        raise ValueError(f"unknown fp8 quant mode {mode}")
    q = np.clip(q, -FP8_E4M3_MAX, FP8_E4M3_MAX)
    return {
        "weight": q.astype(jnp.float8_e4m3fn),
        "weight_scale": scales,
        "mode": mode,
    }


def unpack_fp8_to_internal(
    weight: np.ndarray,  # [out, in] fp8 (HF layout)
    weight_scale: Optional[np.ndarray],
    weight_scale_inv: Optional[np.ndarray] = None,
    block: int = DEFAULT_BLOCK,
) -> Dict[str, Any]:
    """HF fp8 tensors -> internal apply_linear leaves.

    Internal layout: `w8` [K, N] fp8 (in-major, matching dense kernels) +
    `weight_scale` broadcastable to the dequantized [K, N]:
      scalar         -> per-tensor
      [1, N]         -> per-channel (HF [out]/[out, 1] transposed)
      [K/bs, N/bs]   -> block-wise ([ceil] padded shapes handled)
    """
    w = np.asarray(weight)
    out_d, in_d = w.shape
    w8 = jnp.asarray(np.ascontiguousarray(w.T))  # [K=in, N=out], stays fp8
    if weight_scale_inv is not None:
        s = np.asarray(weight_scale_inv, dtype=np.float32)  # [ob, ib]
        # Block size rides in the leaf NAME: the param dict is scanned over
        # layers by lax.scan, which only tolerates array leaves with a
        # uniform leading dim — a static int leaf would break the scan.
        return {"w8": w8, f"weight_scale_block{block}": jnp.asarray(s.T)}
    s = np.asarray(weight_scale, dtype=np.float32)
    if s.ndim == 0 or s.size == 1:
        return {"w8": w8, "weight_scale": jnp.asarray(s.reshape(()))}
    s = s.reshape(-1)  # [out]
    assert s.shape[0] == out_d, (s.shape, w.shape)
    return {"w8": w8, "weight_scale": jnp.asarray(s[None, :])}  # [1, N]


def fp8_scale_key(p: Dict[str, Any]):
    """Returns (key, block_or_None) for the scale leaf of an fp8 param dict."""
    if "weight_scale" in p:
        return "weight_scale", None
    for k in p:
        if k.startswith("weight_scale_block"):
            return k, int(k[len("weight_scale_block"):])
    raise KeyError(f"no fp8 scale leaf in {sorted(p)}")


def dequant_fp8(p: Dict[str, Any], out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize internal fp8 leaves to a dense [K, N] matrix. XLA fuses the
    convert+scale into the consuming matmul; this is the fallback compute
    path (the Pallas fused kernel streams fp8 directly)."""
    w8 = p["w8"]
    skey, bs = fp8_scale_key(p)
    s = p[skey]
    K, N = w8.shape
    if bs is not None:
        kb, nb = s.shape
        # Padded block grids (ceil division in the checkpoint) are cropped
        # after the blockwise multiply.
        Kp, Np = kb * bs, nb * bs
        w = w8.astype(out_dtype)
        if (Kp, Np) != (K, N):
            w = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
        w = (
            w.reshape(kb, bs, nb, bs) * s[:, None, :, None].astype(out_dtype)
        ).reshape(Kp, Np)
        return w[:K, :N]
    return w8.astype(out_dtype) * s.astype(out_dtype)
