"""Experiment: int4 dequant kernel variants, profiled on device.

Variants:
  A: production kernel (quant_matmul.int4_matmul_pallas)
  B: broadcast-reshape scales, one matmul per half
  D: bitcast nibble->bf16 + per-group dots (affine folded host-side)
  E: DMA floor — stream w4 and dot WITHOUT dequant (wrong math, right bytes)
  F: E + nibble split only (no scales) — isolates nibble-op cost
"""

import functools
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ltp_sglang_tpu.ops.quant_matmul import int4_matmul_pallas

G = 128
R = 16


def _kernel_b(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = (w >> 4).astype(jnp.bfloat16)
    Kb, Nb = w4_ref.shape
    ng = Kb // geff

    def rep(ref):
        # [ng, Nb] -> [Kb, Nb] without jnp.repeat: broadcast + merge leading.
        a = ref[:].astype(jnp.bfloat16)
        return jnp.broadcast_to(a[:, None, :], (ng, geff, Nb)).reshape(Kb, Nb)

    wl = lo * rep(s_lo_ref) - rep(zs_lo_ref)
    wh = hi * rep(s_hi_ref) - rep(zs_hi_ref)
    acc_ref[:] += jnp.dot(x_lo_ref[:], wl, preferred_element_type=jnp.float32) + \
        jnp.dot(x_hi_ref[:], wh, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _kernel_e(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    """DMA floor: no dequant at all (math is wrong; bytes are right)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w4_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_lo_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _kernel_f(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    """Nibble split + both dots, but NO scale/zero application."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = (w >> 4).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32) + \
        jnp.dot(x_hi_ref[:], hi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _kernel_g(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    """Scales applied to the [M, Nb] per-group PARTIAL PRODUCTS, not the
    [Kb, Nb] weights: out = sum_g s[g] * (x_g @ q_g) - (sum_g x_g) @ zs.
    VPU work drops Kb/M-fold; scales stay f32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = (w >> 4).astype(jnp.bfloat16)
    Kb, Nb = w4_ref.shape
    Mb = x_lo_ref.shape[0]
    ng = Kb // geff

    def half(x_ref, q, s_ref, zs_ref):
        x = x_ref[:]
        part = jnp.zeros((Mb, Nb), jnp.float32)
        for g in range(ng):
            mm = jnp.dot(
                x[:, g * geff:(g + 1) * geff],
                q[g * geff:(g + 1) * geff, :],
                preferred_element_type=jnp.float32,
            )
            part += mm * s_ref[g, :][None, :]
        xs = x.reshape(Mb, ng, geff).sum(axis=2).astype(jnp.bfloat16)  # [M, ng]
        part -= jnp.dot(xs, zs_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return part

    acc_ref[:] += half(x_lo_ref, lo, s_lo_ref, zs_lo_ref) + half(
        x_hi_ref, hi, s_hi_ref, zs_hi_ref
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _kernel_h(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    """Like G but one batched dot_general over the group dim."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w4_ref[:].astype(jnp.int32) & 0xFF
    lo = (w & 0xF).astype(jnp.bfloat16)
    hi = (w >> 4).astype(jnp.bfloat16)
    Kb, Nb = w4_ref.shape
    Mb = x_lo_ref.shape[0]
    ng = Kb // geff

    def half(x_ref, q, s_ref, zs_ref):
        x = x_ref[:]
        xg = x.reshape(Mb, ng, geff).transpose(1, 0, 2)  # [ng, M, geff]
        qg = q.reshape(ng, geff, Nb)
        mm = jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [ng, M, Nb]
        part = (mm * s_ref[:].reshape(ng, 1, Nb)).sum(axis=0)
        xs = x.reshape(Mb, ng, geff).sum(axis=2).astype(jnp.bfloat16)
        part -= jnp.dot(xs, zs_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return part

    acc_ref[:] += half(x_lo_ref, lo, s_lo_ref, zs_lo_ref) + half(
        x_hi_ref, hi, s_hi_ref, zs_hi_ref
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _kernel_d(x_lo_ref, x_hi_ref, w4_ref, s_lo_ref, s_hi_ref, zs_lo_ref,
              zs_hi_ref, out_ref, acc_ref, *, geff):
    """Group-loop (as production) but nibbles become bf16 via bitcast:
    0x4380 | q is bf16(256 + 2q), exact for q in [0,16). The affine
    correction folds into scales (s/2) and zs ((z+128)s) host-side."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w16 = w4_ref[:].astype(jnp.int16)
    lo = jax.lax.bitcast_convert_type(
        ((w16 & 0xF) | 0x4380).astype(jnp.uint16), jnp.bfloat16
    )
    hi = jax.lax.bitcast_convert_type(
        (((w16 >> 4) & 0xF) | 0x4380).astype(jnp.uint16), jnp.bfloat16
    )
    Mb, Kb = x_lo_ref.shape
    ng = Kb // geff
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
        sx = jnp.dot(x, sel, preferred_element_type=jnp.float32)
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


def make_variant(kernel, M, K, N, Nb=512, Kb=None):
    Kh = K // 2
    Kb = Kb or Kh
    gb = Kb // G
    kh_blocks = Kh // Kb

    adj = kernel is _kernel_d

    @jax.jit
    def run(x, w4, scales, zeros):
        if adj:
            zs = (zeros + 128.0) * scales
            scales_eff = scales * 0.5
        else:
            zs = zeros * scales
            scales_eff = scales
        xb = x.astype(jnp.bfloat16)
        grid = (1, N // Nb, Kh // Kb)
        return pl.pallas_call(
            functools.partial(kernel, geff=G),
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, Kb), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, Kb), lambda m, n, k: (m, k + kh_blocks), memory_space=pltpu.VMEM),
                pl.BlockSpec((Kb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, Nb), lambda m, n, k: (k + kh_blocks, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, Nb), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, Nb), lambda m, n, k: (k + kh_blocks, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, Nb), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, Nb), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(xb, xb, w4, scales_eff, scales_eff, zs, zs)

    return run


def profile_case(M, K, N, variant_list):
    from xprof.convert import raw_to_tool_data as rtd
    import gzip, json

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
    w4 = jax.device_put(
        np.random.randint(0, 256, size=(K // 2, N), dtype=np.uint8).view(np.int8)
    )
    scales = jax.device_put(np.random.rand(K // G, N).astype(np.float32) * 0.01)
    zeros = jax.device_put(np.full((K // G, N), 8.0, np.float32))

    floor_us = (K // 2 * N + 4 * (K // G) * N * 4) / 819e3  # bytes/(819GB/s) in us
    print(f"\n=== M{M} K{K} N{N} (w4 floor ~{floor_us:.1f} us) ===", flush=True)

    variants = {"A_prod": lambda v: int4_matmul_pallas(v, w4, scales, zeros, G)}
    for name, kern, Nb, Kb in variant_list:
        try:
            fn = make_variant(kern, M, K, N, Nb=Nb, Kb=Kb)
            fn(x, w4, scales, zeros).block_until_ready()
            variants[name] = (lambda v, fn=fn: fn(v, w4, scales, zeros))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:160]}")

    ref = np.asarray(variants["A_prod"](x), dtype=np.float32)
    xs = [jax.device_put(np.asarray(x) * (1 + 0.01 * i)) for i in range(4)]
    for name, fn in variants.items():
        got = np.asarray(fn(x), dtype=np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        outdir = f"/tmp/int4var_{name}_{int(time.time())}"
        with jax.profiler.trace(outdir):
            outs = []
            for i in range(R):
                outs.append(fn(xs[i % 4]))
            jax.block_until_ready(outs)
        files = glob.glob(os.path.join(outdir, "**/*.xplane.pb"), recursive=True)
        data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
        try:
            rows = json.loads(gzip.decompress(data).decode())
        except Exception:
            rows = json.loads(data.decode())
        cols = [c["id"] for c in rows[0]["cols"]]
        for r in rows[0]["rows"]:
            d = dict(zip(cols, [c.get("v") for c in r["c"]]))
            if d.get("host_or_device") == "Device" and "pallas" in str(d.get("operation")):
                occ = float(d.get("occurrences") or 1)
                print(f"  {name:16s} {float(d['total_self_time'])/occ:8.2f} us x{occ:.0f}"
                      f" bw={d.get('measured_memory_bw'):>8.1f} rel_err={err:.1e}", flush=True)


def main():
    cases = [(32, 2048, 2048), (32, 2048, 16384), (32, 8192, 2048)]
    for M, K, N in cases:
        Kh = K // 2
        vl = []
        for Nb in (512, 1024, 2048):
            if N % Nb:
                continue
            for Kb in {min(Kh, 1024), Kh}:
                if Kb * Nb > (6 << 20):
                    continue
                vl += [(f"G_gdot_Nb{Nb}_Kb{Kb}", _kernel_g, Nb, Kb),
                       (f"H_bdot_Nb{Nb}_Kb{Kb}", _kernel_h, Nb, Kb),
                       (f"E_dma_Nb{Nb}_Kb{Kb}", _kernel_e, Nb, Kb)]
        profile_case(M, K, N, vl)


if __name__ == "__main__":
    main()
