"""INT4 weight-only quantization: AWQ and GPTQ checkpoint ingestion.

Semantics replicated bit-faithfully from the reference (SURVEY §7 "hard
parts"): AWQ layout per layers/quantization/awq_triton.py:14-110 —
qweight int32 [K, N/8] with nibble order [0,4,1,5,2,6,3,7] along N,
qzeros int32 [K/G, N/8] same packing, scales [K/G, N], w = (q - z) * s.
GPTQ per layers/quantization/gptq.py — qweight int32 [K/8, N] packed
sequentially along K, qzeros packed along N, v1 checkpoints store z-1
(dequant adds 1), optional g_idx row->group map for act-order.

Internal TPU-native format (our design, not the reference's):
  w4:     int8  [K/2, N]  — row k in the LOW nibble of byte-row k (k < K/2),
                             row k in the HIGH nibble of byte-row k - K/2.
                             ("split-halves" along the REDUCTION axis: both
                             unpacked halves feed the same output block, so
                             the fused matmul kernel accumulates two row-block
                             matmuls per grid step — no lane interleave, no
                             disjoint output blocks.)
  scales: f32/bf16 [K/G, N]
  zeros:  f32/bf16 [K/G, N] — dequantized zero VALUES (z as float)
Dequant: w[k, n] = (nibble(k, n) - zeros[k//G, n]) * scales[k//G, n].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


# --------------------------------------------------------- HF layout unpack
def _unpack_awq_nibbles(packed: np.ndarray) -> np.ndarray:
    """int32 [R, C/8-packed] -> uint8 [R, C] in logical column order."""
    R, Cp = packed.shape
    shifts = (AWQ_REVERSE_ORDER * 4)[None, None, :]  # [1, 1, 8]
    vals = (packed[:, :, None].view(np.uint32) >> shifts) & 0xF
    return vals.reshape(R, Cp * 8).astype(np.uint8)


def _unpack_gptq_rows(packed: np.ndarray) -> np.ndarray:
    """int32 [K/8, N] packed along K sequentially -> uint8 [K, N]."""
    Kp, N = packed.shape
    shifts = (np.arange(8) * 4)[None, :, None]  # [1, 8, 1]
    vals = (packed[:, None, :].view(np.uint32) >> shifts) & 0xF
    return vals.reshape(Kp * 8, N).astype(np.uint8)


def _unpack_gptq_cols(packed: np.ndarray) -> np.ndarray:
    """int32 [G, N/8] packed along N sequentially -> uint8 [G, N]."""
    G, Np = packed.shape
    shifts = (np.arange(8) * 4)[None, None, :]
    vals = (packed[:, :, None].view(np.uint32) >> shifts) & 0xF
    return vals.reshape(G, Np * 8).astype(np.uint8)


def _pack_internal(q: np.ndarray) -> np.ndarray:
    """uint8 [K, N] (values 0..15) -> int8 [K/2, N] split-halves-K layout."""
    K, N = q.shape
    assert K % 2 == 0
    lo = q[: K // 2]
    hi = q[K // 2 :]
    return (lo | (hi << 4)).astype(np.uint8).view(np.int8)


def unpack_internal(w4: np.ndarray) -> np.ndarray:
    """int8 [K/2, N] -> uint8 [K, N] logical nibbles (numpy; test helper)."""
    b = w4.view(np.uint8)
    return np.concatenate([b & 0xF, (b >> 4) & 0xF], axis=0)


def unpack_awq_to_internal(
    qweight: np.ndarray,  # int32 [K, N/8]
    qzeros: np.ndarray,  # int32 [K/G, N/8]
    scales: np.ndarray,  # [K/G, N]
) -> Dict[str, np.ndarray]:
    q = _unpack_awq_nibbles(np.ascontiguousarray(qweight))  # [K, N]
    z = _unpack_awq_nibbles(np.ascontiguousarray(qzeros))  # [K/G, N]
    return {
        "w4": _pack_internal(q),
        "scales": np.asarray(scales, dtype=np.float32),
        "zeros": z.astype(np.float32),
    }


def unpack_gptq_to_internal(
    qweight: np.ndarray,  # int32 [K/8, N]
    qzeros: np.ndarray,  # int32 [K/G, N/8]
    scales: np.ndarray,  # [K/G, N]
    g_idx: Optional[np.ndarray] = None,  # [K] row -> group
    checkpoint_format: str = "gptq",  # "gptq" (v1: z+1) | "gptq_v2"
) -> Dict[str, np.ndarray]:
    q = _unpack_gptq_rows(np.ascontiguousarray(qweight))  # [K, N]
    z = _unpack_gptq_cols(np.ascontiguousarray(qzeros)).astype(np.float32)
    if checkpoint_format != "gptq_v2":
        z = z + 1.0  # v1 stores zero-point minus one
    K = q.shape[0]
    G = scales.shape[0]
    group_size = K // G
    if g_idx is not None and len(g_idx) and not np.array_equal(
        np.asarray(g_idx), np.arange(K) // group_size
    ):
        # Act-order: sort rows so that groups are contiguous; the caller must
        # permute the activation's K axis with `perm` before the matmul.
        perm = np.argsort(np.asarray(g_idx), kind="stable").astype(np.int32)
        q = q[perm]
        return {
            "w4": _pack_internal(q),
            "scales": np.asarray(scales, dtype=np.float32),
            "zeros": z,
            "perm": perm,
        }
    return {
        "w4": _pack_internal(q),
        "scales": np.asarray(scales, dtype=np.float32),
        "zeros": z,
    }


# ------------------------------------------------------------ test packers
def quantize_to_awq(w: np.ndarray, group_size: int = 128):
    """float [K, N] -> (qweight, qzeros, scales) in HF AWQ layout + the
    dequantized reference. Used by tests to fabricate checkpoints."""
    K, N = w.shape
    G = K // group_size
    wg = w.reshape(G, group_size, N)
    mx = wg.max(axis=1)
    mn = wg.min(axis=1)
    scales = np.maximum((mx - mn) / 15.0, 1e-8)  # [G, N]
    zeros = np.clip(np.round(-mn / scales), 0, 15)  # [G, N]
    q = np.clip(
        np.round(wg / scales[:, None, :]) + zeros[:, None, :], 0, 15
    ).astype(np.uint8)
    w_ref = ((q.astype(np.float32) - zeros[:, None, :]) * scales[:, None, :]).reshape(K, N)
    q = q.reshape(K, N)

    # Pack along N with the AWQ nibble order.
    def pack_awq(vals):  # [R, C] -> int32 [R, C/8]
        R, C = vals.shape
        out = np.zeros((R, C // 8), dtype=np.uint32)
        v8 = vals.reshape(R, C // 8, 8).astype(np.uint32)
        for j in range(8):
            out |= v8[:, :, j] << np.uint32(AWQ_REVERSE_ORDER[j] * 4)
        return out.view(np.int32)

    return (
        pack_awq(q),
        pack_awq(np.round(zeros).astype(np.uint8)),
        scales.astype(np.float32),
        w_ref,
    )


def quantize_to_gptq(w: np.ndarray, group_size: int = 128, v2: bool = False,
                     act_order: bool = False, seed: int = 0):
    """float [K, N] -> (qweight, qzeros, scales, g_idx) in HF GPTQ layout."""
    K, N = w.shape
    G = K // group_size
    if act_order:
        # Real GPTQ act-order: rows are processed in a permuted order, so
        # each group still has exactly group_size members.
        rng = np.random.default_rng(seed)
        perm = rng.permutation(K)
        g_idx = np.empty(K, np.int32)
        g_idx[perm] = np.arange(K, dtype=np.int32) // group_size
    else:
        g_idx = (np.arange(K) // group_size).astype(np.int32)
    # Per-group ranges computed over the rows belonging to each group.
    scales = np.zeros((G, N), np.float32)
    zeros = np.zeros((G, N), np.float32)
    q = np.zeros((K, N), np.uint8)
    for g in range(G):
        rows = np.nonzero(g_idx == g)[0]
        wg = w[rows]
        mx, mn = wg.max(axis=0), wg.min(axis=0)
        s = np.maximum((mx - mn) / 15.0, 1e-8)
        z = np.clip(np.round(-mn / s), 0, 15)
        scales[g], zeros[g] = s, z
        q[rows] = np.clip(np.round(wg / s) + z, 0, 15).astype(np.uint8)
    w_ref = (q.astype(np.float32) - zeros[g_idx]) * scales[g_idx]

    def pack_rows(vals):  # pack along K sequential: [K, N] -> int32 [K/8, N]
        Kv, Nv = vals.shape
        v8 = vals.reshape(Kv // 8, 8, Nv).astype(np.uint32)
        out = np.zeros((Kv // 8, Nv), dtype=np.uint32)
        for j in range(8):
            out |= v8[:, j, :] << np.uint32(j * 4)
        return out.view(np.int32)

    def pack_cols(vals):  # pack along N sequential: [G, N] -> int32 [G, N/8]
        Gv, Nv = vals.shape
        v8 = vals.reshape(Gv, Nv // 8, 8).astype(np.uint32)
        out = np.zeros((Gv, Nv // 8), dtype=np.uint32)
        for j in range(8):
            out |= v8[:, :, j] << np.uint32(j * 4)
        return out.view(np.int32)

    stored_zeros = zeros if v2 else np.maximum(zeros - 1, 0)
    return (
        pack_rows(q),
        pack_cols(np.round(stored_zeros).astype(np.uint8)),
        scales,
        g_idx,
        w_ref,
    )


# ----------------------------------------------------------- jnp reference
def dequantize_int4(w4, scales, zeros, group_size: int, out_dtype=jnp.bfloat16):
    """Internal format [K/2, N] -> dense [K, N]. jnp; any backend."""
    b = (
        jax.lax.bitcast_convert_type(w4, jnp.uint8)
        if w4.dtype == jnp.int8
        else w4.astype(jnp.uint8)
    )
    lo = (b & 0xF).astype(jnp.float32)
    hi = ((b >> 4) & 0xF).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-2)  # [K, N]
    K = q.shape[-2]
    s = jnp.repeat(scales.astype(jnp.float32), group_size, axis=-2)[:K]
    z = jnp.repeat(zeros.astype(jnp.float32), group_size, axis=-2)[:K]
    return ((q - z) * s).astype(out_dtype)


def quantized_matmul_ref(x, qparams: Dict, group_size: int):
    """x [..., K] @ dequant(W) [K, N] — reference path (CPU/tests)."""
    if "perm" in qparams:
        x = jnp.take(x, qparams["perm"], axis=-1)
    # The leaves are the ground truth for the group size — load-time
    # normalization (normalize_int4_scales) may have pre-repeated the
    # scales to the fused kernel's effective group.
    group_size = (2 * qparams["w4"].shape[-2]) // qparams["scales"].shape[-2]
    w = dequantize_int4(
        qparams["w4"], qparams["scales"], qparams["zeros"], group_size, x.dtype
    )
    return jnp.einsum("...k,kn->...n", x, w, preferred_element_type=jnp.float32).astype(
        x.dtype
    )


# ------------------------------------------------------- projection fusion
def fuse_quant_projections(layers: Dict) -> Dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj for weight-only
    quantized layers (column concat along N; bit-exact).

    Why: the fused Pallas kernel has a fixed per-call cost (pipeline
    prologue, small grids at N<=2560 run ~30% of HBM bandwidth while
    N=16384 runs ~70%, measured on v5e); 7 kernel calls per layer become 4
    with strictly larger N. The reference fuses the same projections at
    module level (QKVParallelLinear / MergedColumnParallelLinear,
    layers/linear.py) — here it is a pure checkpoint-time transform.

    Only fuses groups where every part is int4 ("w4"), shares K and scale
    grouping, and has identical (or absent) act-order perms — GPTQ g_idx
    permutes x along K, so differing perms cannot share one input.
    """
    import numpy as _np

    def fusable(names):
        parts = [layers.get(n) for n in names]
        if any(p is None or "w4" not in p for p in parts):
            return None
        k_dims = {p["w4"].shape[-2] for p in parts}
        g_dims = {p["scales"].shape[-2] for p in parts}
        if len(k_dims) != 1 or len(g_dims) != 1:
            return None
        perms = [p.get("perm") for p in parts]
        if any(x is None for x in perms) != all(x is None for x in perms):
            return None
        if perms[0] is not None:
            ref = _np.asarray(perms[0])
            if not all(_np.array_equal(ref, _np.asarray(x)) for x in perms[1:]):
                return None
        has_bias = [("bias" in p) for p in parts]
        if any(has_bias) != all(has_bias):
            return None
        return parts

    def fuse(names, out_name):
        parts = fusable(names)
        if parts is None:
            return
        fused = {
            "w4": jnp.concatenate([p["w4"] for p in parts], axis=-1),
            "scales": jnp.concatenate([p["scales"] for p in parts], axis=-1),
            "zeros": jnp.concatenate([p["zeros"] for p in parts], axis=-1),
        }
        if parts[0].get("perm") is not None:
            fused["perm"] = parts[0]["perm"]
        if "bias" in parts[0]:
            fused["bias"] = jnp.concatenate([p["bias"] for p in parts], axis=-1)
        for n in names:
            del layers[n]
        layers[out_name] = fused

    fuse(("q_proj", "k_proj", "v_proj"), "qkv_proj")
    fuse(("gate_proj", "up_proj"), "gate_up_proj")
    return layers


def normalize_int4_scales(tree) -> None:
    """Pre-repeat int4 scales/zeros to the fused kernel's EFFECTIVE group
    size, in place, wherever the kernel's block picker would otherwise
    repeat them per call.

    Why: quant_matmul._pick_blocks sometimes legalizes a geometry by
    shrinking the group (Geff < G, scales repeated G//Geff x). Doing that
    repeat inside the kernel wrapper re-materializes the WHOLE stacked
    [L, K/G, N] scales+zeros tensors on every layer-call — XLA does not
    hoist it out of the layer scan; profiled at 3.15 s of the 3.5 s INT4
    decode on the llama-3B geometry (r04). After this pass the checkpoint
    leaves already carry K/Geff rows and the kernel wrapper's repeat is a
    no-op; the kernel infers the group size from the shapes.
    """
    from ltp_sglang_tpu.ops.quant_matmul import _pick_blocks

    def visit(node):
        if not isinstance(node, dict):
            return
        if "w4" in node and "scales" in node:
            w4 = node["w4"]
            Kh, N = w4.shape[-2], w4.shape[-1]
            G = (2 * Kh) // node["scales"].shape[-2]
            picked = _pick_blocks(Kh, N, G)
            if picked is not None and picked[2] != G:
                reps = G // picked[2]
                node["scales"] = jnp.repeat(node["scales"], reps, axis=-2)
                node["zeros"] = jnp.repeat(node["zeros"], reps, axis=-2)
            return
        for v in node.values():
            visit(v)

    visit(tree)
