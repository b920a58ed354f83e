"""Pallas paged decode attention over the MLA LATENT cache (absorbed MQA).

Reference analog: the MLA decode kernels (flashinfer_mla_backend.py,
sgl-kernel csrc/attention CUTLASS MLA decode, triton decode_attention.py:677
serving deepseek). After weight absorption (models/deepseek_v2.py
_attention_absorbed) decode is ONE latent-MQA contraction per request:

    scores[h, t] = q_cat[h, :R+rope] . krow[t, :R+rope]
    out[h, :R]   = softmax(scores) @ krow[:, :R]

with krow the cached [kv_lora | k_pe] latent rows — K and V are the SAME
rows, so unlike the MHA kernel (pallas_decode.py) only ONE page stream is
DMA'd, and there is no GQA expansion or output fold: every q head reads the
single latent row. The XLA alternative (`kc[li, kv_indices]` whole-page
gather + einsum) moves every latent byte three times per layer-step; this
kernel streams pages HBM -> VMEM once with double-buffered page-granular
DMAs (same structure as pallas_decode.py, which see for the layout
rationale).

Shapes: q [B, H, RL] already zero-padded to the cache row width RL = r*ln
(deepseek pads kv_lora+rope rows to a 256-multiple, kv_row_elems); output
[B, H, RL] — the caller slices [..., :kv_lora_rank] (R is a 128 multiple on
every deepseek geometry, but slicing outside the kernel keeps the kernel
lane-aligned for any R). fp8 caches: rows are upcast in-VMEM; the k_scale
is folded into q and the output by the caller (deepseek_v2.py fp8 path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mla_decode_kernel(
    # scalar prefetch
    pages_ref,  # [B, Cp] int32 page ids (SMEM)
    seq_ref,  # [B] int32 current kv length (SMEM)
    li_ref,  # [1] int32 layer index (SMEM)
    # tensor inputs
    q_ref,  # [1, H, RL] VMEM (scaled q, zero-padded to the row width)
    kc_ref,  # [L, S, r, ln] HBM (ANY) — latent rows
    # output
    o_ref,  # [1, H, RL] VMEM
    # scratch
    kbuf,  # [2, Pc*P, r, ln] VMEM
    acc_ref,  # [H, RL] f32
    m_ref,  # [H, 128] f32 (running max, lane-broadcast)
    l_ref,  # [H, 128] f32 (running denom)
    sems,  # [2] DMA semaphores
    *,
    page_size: int,
    pages_per_chunk: int,
):
    b = pl.program_id(0)
    li = li_ref[0]
    seq = seq_ref[b]
    Cp = pages_ref.shape[1]
    P = page_size
    Pc = pages_per_chunk
    rows_per_chunk = Pc * P
    n_chunks = (seq + rows_per_chunk - 1) // rows_per_chunk
    n_pages_used = (seq + P - 1) // P

    _, H, RL = q_ref.shape
    cdt = jnp.bfloat16 if kc_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def chunk_dma(c, slot):
        def make(p):
            page = pages_ref[b, jnp.minimum(c * Pc + p, Cp - 1)]
            return pltpu.make_async_copy(
                kc_ref.at[li, pl.ds(page * P, P)],
                kbuf.at[slot, pl.ds(p * P, P)],
                sems.at[slot],
            )

        return make

    def start_chunk(c, slot):
        make = chunk_dma(c, slot)

        def issue(p, _):
            @pl.when(c * Pc + p < n_pages_used)
            def _():
                make(p).start()
            return 0

        jax.lax.fori_loop(0, Pc, issue, 0)

    def wait_chunk(c, slot):
        make = chunk_dma(c, slot)

        def wse(p, _):
            @pl.when(c * Pc + p < n_pages_used)
            def _():
                make(p).wait()
            return 0

        jax.lax.fori_loop(0, Pc, wse, 0)

    q = q_ref[0].astype(cdt)  # [H, RL] (pad columns are zero)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    start_chunk(0, 0)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            start_chunk(c + 1, jax.lax.rem(c + 1, 2))

        wait_chunk(c, slot)
        rows = kbuf[slot].reshape(rows_per_chunk, RL)
        # Rows past seq hold stale VMEM; zero them so 0-weight * NaN can't
        # poison the value accumulation (q pad columns zero the score side).
        rpos = c * rows_per_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_chunk, RL), 0
        )
        rows = jnp.where(rpos < seq, rows, 0).astype(cdt)
        # scores[h, row] — contract the full padded row width: q's pad
        # columns are zero, so only the first R+rope features contribute.
        scores = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [H, rows]
        row_pos = c * rows_per_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (H, rows_per_chunk), 1
        )
        scores = jnp.where(row_pos < seq, scores, -1e30)

        m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)  # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        w = jnp.exp(scores - m_new)  # [H, rows]
        l_prev = jnp.max(l_ref[:], axis=1, keepdims=True)
        l_new = l_prev * alpha + jnp.sum(w, axis=1, keepdims=True)
        # V IS the latent row: one MXU call accumulates the full row width;
        # the caller slices the first R (value) features.
        pv = jax.lax.dot(
            w.astype(cdt), rows,
            preferred_element_type=jnp.float32, precision=prec,
        )  # [H, RL]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    denom = jnp.maximum(jnp.max(l_ref[:], axis=1, keepdims=True), 1e-30)
    o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "pages_per_chunk", "sm_scale"),
)
def mla_paged_decode_attention(
    q,  # [B, H, Dq] absorbed query [q_lat | q_rope], Dq <= r*ln
    kv_cache,  # [L, S, r, ln] latent rows [kv_lora | k_pe | pad]
    layer_idx,  # scalar int32
    pages,  # [B, Cp] int32 page ids (position-ordered)
    seq_lens,  # [B] int32
    *,
    page_size: int,
    sm_scale: float,
    pages_per_chunk: int = 8,
):
    """Returns [B, H, RL] f32-accumulated attention over the latent rows;
    slice [..., :kv_lora_rank] for the value part."""
    B, H, Dq = q.shape
    r, ln = kv_cache.shape[2], kv_cache.shape[3]
    RL = r * ln
    Cp = pages.shape[1]
    Pc = min(pages_per_chunk, Cp)
    qdt = jnp.bfloat16 if kv_cache.dtype == jnp.bfloat16 else jnp.float32
    qs = (q.astype(jnp.float32) * sm_scale).astype(qdt)
    if Dq < RL:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, RL - Dq)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, RL), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, H, RL), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Pc * page_size, r, ln), kv_cache.dtype),
            pltpu.VMEM((H, RL), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _mla_decode_kernel,
            page_size=page_size,
            pages_per_chunk=Pc,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, RL), jnp.float32),
        interpret=interpret,
    )(pages, seq_lens, jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qs, kv_cache)
    return out
