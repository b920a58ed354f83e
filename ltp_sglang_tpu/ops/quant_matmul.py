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
    s_lo_ref,  # [Kb/Geff, Nb] f32
    s_hi_ref,
    zs_lo_ref,  # [Kb/Geff, Nb] f32 (zeros * scales, precomputed)
    zs_hi_ref,
    out_ref,  # [Mb, Nb] f32 (revisited across k)
    acc_ref,  # scratch [Mb, Nb] f32
    *,
    group_size: int,
):
    """Group-factored dequant: y = Σ_g s[g]·(x_g @ q_g) − (x @ sel) @ zs.

    The naive form ((q−z)·s then one big matmul) pays O(K·N) VPU work per
    block to broadcast scales/zeros over every weight element (jnp.repeat
    dominated the kernel: measured slower than the bf16 matmul it replaces).
    Factoring the affine dequant moves scaling to the [Mb, Nb] output block
    (O(M·N) per group) and folds the zero correction for ALL groups in the
    block into one rank-ng matmul via per-group activation sums."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic can't cast uint8->bf16 directly; widen through int32.
    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = ((w >> 4) & 0xF).astype(jnp.bfloat16)

    Mb, Kb = x_lo_ref.shape
    geff = group_size
    ng = Kb // geff
    # Group-selector matrix [Kb, ng]: column g sums rows of group g.
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (Kb, ng), 0) // geff
        == jax.lax.broadcasted_iota(jnp.int32, (Kb, ng), 1)
    ).astype(jnp.bfloat16)

    def half(x_ref, q, s_ref, zs_ref):
        x = x_ref[:]
        acc = jnp.zeros_like(acc_ref)
        for g in range(ng):
            mm = jnp.dot(
                x[:, g * geff:(g + 1) * geff],
                q[g * geff:(g + 1) * geff, :],
                preferred_element_type=jnp.float32,
            )
            acc += mm * s_ref[g, :][None, :]
        sx = jnp.dot(x, sel, preferred_element_type=jnp.float32)  # [Mb, ng]
        acc -= jax.lax.dot_general(
            sx, zs_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc

    acc_ref[:] += half(x_lo_ref, lo, s_lo_ref, zs_lo_ref) + half(
        x_hi_ref, hi, s_hi_ref, zs_hi_ref
    )

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

    zs = zeros * scales  # [K/Geff, N] f32, tiny vs the weight stream
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
    )(x, x, w4, scales, scales, zs, zs)
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
