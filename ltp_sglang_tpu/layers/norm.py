"""Normalization layers (functional).

Reference semantics: sgl-kernel fused (add+)rmsnorm (csrc/elementwise/) and the
gemma variant (weight+1). On TPU, XLA fuses these elementwise chains into the
surrounding matmuls, so plain jnp is the idiomatic implementation; a Pallas
fused rmsnorm+quant variant lives in ops/quant when the quantized path needs
the extra fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-6, gemma_style: bool = False):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if gemma_style:
        w = w + 1.0
    return (xf * w).astype(orig_dtype)


def fused_add_rms_norm(x, residual, weight, eps: float = 1e-6, gemma_style: bool = False):
    """Returns (normed, new_residual = x + residual)."""
    resid = x + residual if residual is not None else x
    return rms_norm(resid, weight, eps, gemma_style), resid


def layer_norm(x, weight, bias, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
