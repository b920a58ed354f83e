"""Fused INT4 dequant + matmul Pallas kernel (the north-star kernel).

TPU replacement for the reference's Marlin/CUTLASS fused WNA16 GEMMs
(sgl-kernel csrc/gemm/awq_kernel.cu, marlin): weights stream from HBM at
4 bits/element (the whole point — decode is weight-bandwidth-bound), are
unpacked and dequantized on the VPU in VMEM, and feed the MXU in bf16.

Layout (layers/quantization/int4.py): w4 int8 [K/2, N] with nibble-split
along K, so each grid step dequantizes two row half-blocks that accumulate
into the SAME output block (two MXU calls per step, no lane interleaving).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ltp_sglang_tpu.utils import cdiv


def _effective_group(G: int, Kb: int) -> int:
    """Largest divisor of G with Kb // Geff >= 8 (scale-block sublane rule)."""
    geff = G
    while geff > 1 and Kb // geff < 8:
        # G is a power of two times small factors in practice; halve.
        geff //= 2
    return max(geff, 1)


def _int4_matmul_kernel(
    x_lo_ref,  # [Mb, Kb] bf16 (rows k0 .. k0+Kb of x)
    x_hi_ref,  # [Mb, Kb] bf16 (rows K/2+k0 ..)
    w4_ref,  # [Kb, Nb] int8 packed
    s_lo_ref,  # [Kb/G, Nb] f32
    s_hi_ref,
    z_lo_ref,
    z_hi_ref,
    out_ref,  # [Mb, Nb] f32 (revisited across k)
    acc_ref,  # scratch [Mb, Nb] f32
    *,
    group_size: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic can't cast uint8->bf16 directly; widen through int32.
    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = ((w >> 4) & 0xF).astype(jnp.bfloat16)

    def dequant(q, s_ref, z_ref):
        s = jnp.repeat(s_ref[:], group_size, axis=0).astype(jnp.bfloat16)
        z = jnp.repeat(z_ref[:], group_size, axis=0).astype(jnp.bfloat16)
        return (q - z) * s

    w_lo = dequant(lo, s_lo_ref, z_lo_ref)
    w_hi = dequant(hi, s_hi_ref, z_hi_ref)
    acc_ref[:] += jnp.dot(
        x_lo_ref[:], w_lo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi_ref[:], w_hi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group_size",))
def _int4_matmul_2d(x, w4, scales, zeros, group_size: int):
    """x [M, K] -> [M, N] f32. Shapes must satisfy the block constraints
    (guaranteed by the padding wrapper below)."""
    M, K = x.shape
    Kh, N = w4.shape
    G = group_size

    def pick(total, candidates):
        for c in candidates:
            if c <= total and total % c == 0:
                return c
        raise ValueError(f"no block size for dim {total} from {candidates}")

    Mb = pick(M, [256, 128, 64, 32, 16, 8, 4, 2, 1])
    Nb = pick(N, [512, 256, 128])
    # K blocks must hold whole scale groups, and the scale block needs >= 8
    # sublanes: use an effective group size Geff (scales pre-repeated by the
    # caller) so that Kb // Geff >= 8.
    assert G <= Kh, "group_size must not exceed K/2"
    Kb = pick(Kh, [c for c in (1024, 512, 256, 128, 64, 32, 16, 8) if c % G == 0])
    grid = (M // Mb, N // Nb, Kh // Kb)
    kh_blocks = Kh // Kb  # offset (in blocks) of the hi half's x rows
    Geff = _effective_group(G, Kb)
    if Geff != G:
        reps = G // Geff
        scales = jnp.repeat(scales, reps, axis=0)
        zeros = jnp.repeat(zeros, reps, axis=0)
    gb = Kb // Geff  # scale rows per block (>= 8)
    g_hi_off = kh_blocks

    x = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, group_size=Geff),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mb, Kb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Mb, Kb), lambda m, n, k: (m, k + kh_blocks), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Kb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (gb, Nb), lambda m, n, k: (k + g_hi_off, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((gb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (gb, Nb), lambda m, n, k: (k + g_hi_off, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((Mb, Nb), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mb, Nb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * 2 * Kh,
            bytes_accessed=Kh * N + M * 2 * Kh * 2 + M * N * 4,
            transcendentals=0,
        ),
    )(x, x, w4, scales, scales, zeros, zeros)
    return out


def int4_matmul_pallas(x, w4, scales, zeros, group_size: int, perm=None):
    """x [..., K] @ dequant(w4) [K, N] with INT4 weights streamed packed.

    Pads M to the sublane tile; requires K/2 and N to divide into the block
    grid (true for all supported model dims).
    """
    if perm is not None:
        x = jnp.take(x, perm, axis=-1)
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    Kh, N = w4.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp = max(16, 1 << (M - 1).bit_length())  # pow2 >= M, min 16 (bf16 tile)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _int4_matmul_2d(x2, w4, scales, zeros, group_size)
    out = out[:M].reshape(*lead, N)
    return out.astype(orig_dtype)
