"""Linear application with quantization dispatch.

The TPU translation of the reference's parallel-linear + quant_method.apply
stack (layers/linear.py:113-1123 + quantization method classes): here a
"linear layer" is just a param dict, and `apply_linear` dispatches on its
structure:

  {"kernel": [K, N]}                         -> dense matmul (bf16/f32)
  {"w4", "scales", "zeros"[, "perm"]}        -> INT4 weight-only (AWQ/GPTQ)
  {"w8", "weight_scale"}                     -> FP8/INT8 weight (+bias opt.)

Tensor parallelism stays a PartitionSpec concern (no per-method classes).
The INT4 fast path uses the fused Pallas dequant+matmul kernel on TPU; other
backends dequantize inline (XLA fuses what it can).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ltp_sglang_tpu.layers.quantization.int4 import quantized_matmul_ref


def apply_linear(p: Dict[str, Any], x: jnp.ndarray, group_size: int = 128,
                 li=None):
    """x: [..., K] -> [..., N].

    `li`: layer index for LAYER-STACKED quantized leaves ([L, ...]). Models
    keep int4 leaves out of their lax.scan xs and index them inside the
    Pallas kernel instead — XLA cannot fuse a slice into a custom-call
    operand, so scanned quant weights would be copied in full every step.
    """
    if "kernel" in p:
        out = jnp.einsum(
            "...k,kn->...n", x, p["kernel"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
    elif "w4" in p:
        if jax.default_backend() == "tpu":
            from ltp_sglang_tpu.ops.quant_matmul import int4_matmul_pallas

            out = int4_matmul_pallas(
                x, p["w4"], p["scales"], p["zeros"], group_size,
                perm=p.get("perm"), layer_idx=li,
            )
        else:
            if p["w4"].ndim == 3:  # stacked: slice the layer for the ref path
                p = {
                    k: (v[li] if hasattr(v, "ndim") and v.ndim >= 2 else v)
                    for k, v in p.items()
                }
            out = quantized_matmul_ref(x, p, group_size)
    elif "w8i" in p:
        # W8A8-INT8: int8 weights AND per-token-quantized int8 activations on
        # the MXU's int8 path (quantization/w8a8_int8.py).
        from ltp_sglang_tpu.layers.quantization.w8a8_int8 import int8_matmul

        out = int8_matmul(x, p, li=li)
    elif "w8" in p:
        # FP8 weights (per-tensor / per-channel / block-wise scales): stream
        # fp8 from HBM, dequant fused into the matmul (quantization/fp8.py).
        from ltp_sglang_tpu.layers.quantization.fp8 import dequant_fp8

        cdt = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
        w = dequant_fp8(p, out_dtype=cdt)
        out = jnp.einsum(
            "...k,kn->...n", x.astype(cdt), w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        raise ValueError(f"unknown linear param structure: {sorted(p)}")
    if "bias" in p:
        out = out + p["bias"]
    return out
