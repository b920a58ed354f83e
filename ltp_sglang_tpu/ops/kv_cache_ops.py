"""KV-cache and page-table update kernels.

These are the TPU counterparts of the reference's allocator/pool Triton
kernels (`alloc_extend_kernel`/`alloc_decode_kernel` writing out_cache_loc,
mem_cache/allocator.py:276-403, and `MHATokenToKVPool.set_kv_buffer`,
memory_pool.py:369-407).

Why Pallas and not `jnp .at[].set`: XLA TPU *scatter* lowering is
catastrophically slow to compile for these shapes (hundreds of seconds per
scatter op, measured on v5e), and scatters serialize on the scalar core at
runtime. A row-granular async-DMA kernel compiles in <1s and runs at memory
latency. The jnp implementations remain for the CPU backend (tests) and as a
fallback.

Layout rule (Mosaic): dynamic slicing is only unrestricted on leading dims, so
all DMA'd rows are shaped [..., r, 128] with the last two dims whole. Callers
reshape row-major-compatible views (free bitcasts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# DMA ring depth for row-write kernels.
_NSLOTS = 16


def _row_dims(row_elems: int) -> Tuple[int, int]:
    """Factor a row into (sublanes, 128) for DMA-friendly shaping; falls back
    to a single padded lane row if not divisible."""
    if row_elems % LANE == 0:
        return row_elems // LANE, LANE
    return 1, row_elems


# ----------------------------------------------------------------- KV writes
def _kv_write_kernel(n_ref, li_ref, locs_ref, knew_ref, vnew_ref,
                     kc_in, vc_in, kc_out, vc_out, sems):
    n = n_ref[0]
    li = li_ref[0]

    def issue(i, _):
        slot = jax.lax.rem(i, _NSLOTS // 2)

        @pl.when(i >= _NSLOTS // 2)
        def _():
            j = i - _NSLOTS // 2
            pltpu.make_async_copy(
                knew_ref.at[j], kc_out.at[li, locs_ref[j]], sems.at[0, slot]
            ).wait()
            pltpu.make_async_copy(
                vnew_ref.at[j], vc_out.at[li, locs_ref[j]], sems.at[1, slot]
            ).wait()

        pltpu.make_async_copy(
            knew_ref.at[i], kc_out.at[li, locs_ref[i]], sems.at[0, slot]
        ).start()
        pltpu.make_async_copy(
            vnew_ref.at[i], vc_out.at[li, locs_ref[i]], sems.at[1, slot]
        ).start()
        return 0

    jax.lax.fori_loop(0, n, issue, 0)

    def drain(j, _):
        i = n - _NSLOTS // 2 + j

        @pl.when(i >= 0)
        def _():
            slot = jax.lax.rem(i, _NSLOTS // 2)
            pltpu.make_async_copy(
                knew_ref.at[i], kc_out.at[li, locs_ref[i]], sems.at[0, slot]
            ).wait()
            pltpu.make_async_copy(
                vnew_ref.at[i], vc_out.at[li, locs_ref[i]], sems.at[1, slot]
            ).wait()
        return 0

    jax.lax.fori_loop(0, _NSLOTS // 2, drain, 0)


def kv_write_pallas(k_cache, v_cache, layer_idx, locs, k_new, v_new, num_valid):
    """Write token rows into layer `layer_idx` of both caches in place.

    k_cache/v_cache: [L, S, r, 128] in the native DMA row layout (see
    kv_layout; donated upstream). The caches must be passed in this layout
    unreshaped — a reshape between pallas calls breaks XLA's buffer aliasing
    and silently degrades to a full-cache copy per call. locs: [N] slot ids
    (garbage slot 0 for pads). k_new/v_new: [N, Hkv, D].
    """
    L, S, rk, lnk = k_cache.shape
    rv, lnv = v_cache.shape[2], v_cache.shape[3]
    N = k_new.shape[0]
    hbm = pltpu.MemorySpace.HBM
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_ = pl.BlockSpec(memory_space=hbm)
    kc_o, vc_o = pl.pallas_call(
        _kv_write_kernel,
        in_specs=[smem, smem, smem, any_, any_, any_, any_],
        out_specs=(any_, any_),
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, _NSLOTS // 2))],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.reshape(num_valid, (1,)).astype(jnp.int32),
        jnp.reshape(layer_idx, (1,)).astype(jnp.int32),
        locs.astype(jnp.int32),
        k_new.reshape(N, rk, lnk).astype(k_cache.dtype),
        v_new.reshape(N, rv, lnv).astype(v_cache.dtype),
        k_cache,
        v_cache,
    )
    return kc_o, vc_o


def kv_write_xla(k_cache, v_cache, layer_idx, locs, k_new, v_new, num_valid):
    """jnp scatter fallback (CPU backend / tests). Caches [L, S, r, ln]."""
    N = k_new.shape[0]
    k_cache = k_cache.at[layer_idx, locs].set(
        k_new.reshape(N, k_cache.shape[2], k_cache.shape[3]).astype(k_cache.dtype)
    )
    v_cache = v_cache.at[layer_idx, locs].set(
        v_new.reshape(N, v_cache.shape[2], v_cache.shape[3]).astype(v_cache.dtype)
    )
    return k_cache, v_cache


def kv_layout(num_kv_heads: int, head_dim: int) -> Tuple[int, int]:
    """Native storage row shape (r, ln) for one token's K (or V) in one
    layer: [Hkv*D] factored as [r, 128] when possible (Mosaic slicing is
    only unrestricted on leading dims)."""
    return _row_dims(num_kv_heads * head_dim)


# -------------------------------------------------------------- table updates
def _table_rows_kernel(nc_ref, req_ref, rows_ref, tbl_in, tbl_out, scratch, sem):
    """Overwrite the first C columns of each request's row (read-modify-write
    so the tail stays intact). Grid: (B,)."""
    b = pl.program_id(0)
    req = req_ref[b]
    # Pull the old row, splice in the new C columns, push back.
    pltpu.make_async_copy(tbl_out.at[req], scratch, sem).start()
    pltpu.make_async_copy(tbl_out.at[req], scratch, sem).wait()
    old = scratch[:]  # [W/LANE, LANE] int32
    new_part = rows_ref[b]  # [C/LANE, LANE]
    C_blocks = new_part.shape[0]
    if C_blocks == old.shape[0]:
        merged = new_part
    else:
        merged = jnp.concatenate([new_part, old[C_blocks:]], axis=0)
    scratch[:] = merged
    pltpu.make_async_copy(scratch, tbl_out.at[req], sem).start()
    pltpu.make_async_copy(scratch, tbl_out.at[req], sem).wait()


def table_write_rows_pallas(table, req_indices, rows):
    """table: [R+1, W] int32 (W % 1024 == 0, donated); rows: [B, C]
    (C % 128 == 0, C <= W). Pad req rows -> dump row R.

    W must be a whole number of int32 tiles (8 sublanes x 128 lanes): the
    whole-row HBM<->VMEM DMAs fault on partial-tile shapes like (9,128)
    (measured: W=1152/1280 crash the TPU worker, W=1024/2048 run)."""
    Rp1, W = table.shape
    B, C = rows.shape
    assert W % (8 * LANE) == 0, f"table width {W} must be a multiple of 1024"
    t3 = table.reshape(Rp1, W // LANE, LANE)
    hbm = pltpu.MemorySpace.HBM
    out = pl.pallas_call(
        _table_rows_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=hbm),
        ],
        out_specs=pl.BlockSpec(memory_space=hbm),
        out_shape=jax.ShapeDtypeStruct(t3.shape, t3.dtype),
        scratch_shapes=[
            pltpu.VMEM((W // LANE, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.array([B], jnp.int32),
        req_indices.astype(jnp.int32),
        rows.reshape(B, C // LANE, LANE),
        t3,
    )
    return out.reshape(Rp1, W)


def table_write_rows_xla(table, req_indices, rows):
    B, C = rows.shape
    return table.at[req_indices, :C].set(rows)


def table_merge_window_pallas(table, req_indices, seq0, slots, k_window: int):
    """Merge decode-window slot appends into table rows: columns
    [seq0[b], seq0[b]+K) of row req_indices[b] get slots[b, :].

    The merged row VALUES are computed with plain XLA (gathers + selects are
    fine on TPU; only scatter is not), then written back through the row-DMA
    kernel. Duplicate/dump rows (padded lanes) all write garbage to the dump
    row, which is harmless.
    """
    Rp1, W = table.shape
    B, K = slots.shape
    base = table[req_indices]  # [B, W]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    start = seq0[:, None]
    off = jnp.clip(cols - start, 0, K - 1)
    win = jnp.take_along_axis(slots, off, axis=1)  # [B, W]
    merged = jnp.where((cols >= start) & (cols < start + K), win, base)
    return table_write_rows_pallas(table, req_indices, merged)


def table_merge_window_xla(table, req_indices, seq0, slots, k_window: int):
    B, K = slots.shape
    pos = seq0[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return table.at[req_indices[:, None], pos].set(slots)


def get_kv_cache_ops(backend: str):
    """Returns (kv_write, table_write_rows, table_merge_window)."""
    if backend == "tpu":
        return kv_write_pallas, table_write_rows_pallas, table_merge_window_pallas
    return kv_write_xla, table_write_rows_xla, table_merge_window_xla
