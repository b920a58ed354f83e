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


def fuse_dense_projections(layers: Dict) -> None:
    """Fuse dense q/k/v -> qkv_proj and gate/up -> gate_up_proj (column
    concat along N; bit-exact). The quant analog is
    quantization/int4.fuse_quant_projections; this is the bf16/fp32 path.

    Why: at decode batch sizes the projection matmuls are HBM-bound and a
    [Dm, 1024] K-proj stream runs well below the bandwidth a [Dm, 5120]
    fused stream sustains (same effect the reference gets structurally from
    QKVParallelLinear / MergedColumnParallelLinear, layers/linear.py).
    Measured on v5e llama-3B shapes: 7 matmuls/layer -> 4 moved decode
    12.5 -> ~11.5 ms/step.

    Only fuses groups where every part is a plain {kernel[, bias]} dict with
    a stacked [L, K, N] kernel sharing K, and bias presence matches.
    """

    def fusable(names):
        parts = [layers.get(n) for n in names]
        if any(
            p is None or not isinstance(p, dict) or "kernel" not in p
            or getattr(p["kernel"], "ndim", 0) != 3
            for p in parts
        ):
            return None
        if any(set(p) - {"kernel", "bias"} for p in parts):
            return None
        if len({p["kernel"].shape[-2] for p in parts}) != 1:
            return None
        has_bias = [("bias" in p) for p in parts]
        if any(has_bias) != all(has_bias):
            return None
        return parts

    def fuse(names, out_name):
        parts = fusable(names)
        if parts is None:
            return
        fused = {"kernel": jnp.concatenate([p["kernel"] for p in parts], axis=-1)}
        if "bias" in parts[0]:
            fused["bias"] = jnp.concatenate([p["bias"] for p in parts], axis=-1)
        for n in names:
            del layers[n]
        layers[out_name] = fused

    fuse(("q_proj", "k_proj", "v_proj"), "qkv_proj")
    fuse(("gate_proj", "up_proj"), "gate_up_proj")
