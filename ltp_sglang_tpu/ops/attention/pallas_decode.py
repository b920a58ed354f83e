"""Pallas paged decode attention over the native DMA-row KV layout.

Reference analog: the decode path of the attention backends
(flashinfer/triton decode kernels, e.g. sgl-kernel's
batch_decode_with_kv_cache). TPU design constraints drive the layout:

- KV rows live TOKEN-major in the cache [L, S, r, ln] (r*ln = Hkv*D), the
  layout the kv-write DMA kernel needs: one contiguous row per token. The
  XLA alternative (gather pages -> reshape -> einsum) moves every byte three
  times per layer-step (profiled: the scan-xs page copy alone was ~38% of a
  quantized decode step).
- The kernel streams pages straight from the HBM cache into VMEM with
  double-buffered page-granular DMAs (page_size tokens per descriptor), so
  bytes move once. kv indices are scalar-prefetched (SMEM) page ids.
- GQA and the [r, ln] row shape never require lane-misaligned slicing:
  scores use a zero-expanded q matrix ([r*ln, Hq], one MXU call per chunk)
  and the output folds kv-head segments with a fold matrix ([r*ln, D]),
  both built in-kernel from iota masks.
- Online softmax (flash) accumulation in fp32 across page chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(
    # scalar prefetch
    pages_ref,  # [B, Cp] int32 page ids (SMEM)
    seq_ref,  # [B] int32 current kv length (SMEM)
    li_ref,  # [1] int32 layer index (SMEM)
    # tensor inputs
    q_ref,  # [1, Hq, D] VMEM (this request's scaled q)
    kc_ref,  # [L, S, r, ln] HBM (ANY)
    vc_ref,  # [L, S, r, ln] HBM (ANY)
    # output
    o_ref,  # [1, Hq, D] VMEM
    # scratch
    kbuf,  # [2, Pc*P, r, ln] VMEM
    vbuf,
    acc_ref,  # [Hq, r*ln] f32
    m_ref,  # [Hq, 128] f32 (running max, lane-broadcast)
    l_ref,  # [Hq, 128] f32 (running denom)
    sems,  # [2, 2] DMA semaphores
    *,
    page_size: int,
    pages_per_chunk: int,
    num_kv_heads: int,
    logit_cap: float = 0.0,
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

    _, Hq, D = q_ref.shape
    r, ln = kc_ref.shape[2], kc_ref.shape[3]
    RL = r * ln  # = Hkv * D elements per token row
    G = Hq // num_kv_heads
    # Match the XLA attention path's precision: bf16 MXU inputs only when
    # the model/cache are bf16; f32 models keep f32 scores.
    cdt = jnp.bfloat16 if kc_ref.dtype == jnp.bfloat16 else jnp.float32
    # TPU f32 matmuls default to bf16 passes; f32 models want true f32.
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def start_chunk(c, slot):
        # Issue DMAs for all pages of chunk c into ring slot `slot`.
        def issue(p, _):
            # Clamp: the last chunk may index past the pages row when Cp is
            # not a multiple of Pc; the pl.when guard skips the copy, but the
            # SMEM read itself must stay in bounds.
            page = pages_ref[b, jnp.minimum(c * Pc + p, Cp - 1)]

            @pl.when(c * Pc + p < n_pages_used)
            def _():
                pltpu.make_async_copy(
                    kc_ref.at[li, pl.ds(page * P, P)],
                    kbuf.at[slot, pl.ds(p * P, P)],
                    sems.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    vc_ref.at[li, pl.ds(page * P, P)],
                    vbuf.at[slot, pl.ds(p * P, P)],
                    sems.at[slot, 1],
                ).start()
            return 0

        jax.lax.fori_loop(0, Pc, issue, 0)

    def wait_chunk(c, slot):
        # Waits recreate the exact start descriptors (same src/dst): required
        # for interpret mode, and semantically identical on hardware.
        def wse(p, _):
            page = pages_ref[b, jnp.minimum(c * Pc + p, Cp - 1)]

            @pl.when(c * Pc + p < n_pages_used)
            def _():
                pltpu.make_async_copy(
                    kc_ref.at[li, pl.ds(page * P, P)],
                    kbuf.at[slot, pl.ds(p * P, P)],
                    sems.at[slot, 0],
                ).wait()
                pltpu.make_async_copy(
                    vc_ref.at[li, pl.ds(page * P, P)],
                    vbuf.at[slot, pl.ds(p * P, P)],
                    sems.at[slot, 1],
                ).wait()
            return 0

        jax.lax.fori_loop(0, Pc, wse, 0)

    # Zero-expanded q: qexp[j, h] = q[h, j % D] iff j // D == h // G.
    q = q_ref[0].astype(jnp.float32)  # [Hq, D]
    qT = q.T  # [D, Hq]
    tiled = jnp.concatenate([qT] * num_kv_heads, axis=0)  # [RL, Hq]
    jj = jax.lax.broadcasted_iota(jnp.int32, (RL, Hq), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (RL, Hq), 1)
    qexp = jnp.where(jj // D == hh // G, tiled, 0.0).astype(cdt)
    # Output fold: fold[j, d] = 1 iff j % D == d.
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (RL, D), 0)
    dd2 = jax.lax.broadcasted_iota(jnp.int32, (RL, D), 1)
    fold = (jj2 % D == dd2).astype(jnp.float32)
    # Per-row kv-head ownership mask for the accumulator: own[h, j] = 1 iff
    # j // D == h // G (selects each q head's kv segment before folding).
    jj3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, RL), 1)
    hh3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, RL), 0)
    own = (jj3 // D == hh3 // G).astype(jnp.float32)

    # m/l live lane-broadcast ([Hq, 128], every lane equal) so no ref or
    # value ever needs a sub-lane slice.
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
        kflat = kbuf[slot].reshape(rows_per_chunk, RL)
        vflat = vbuf[slot].reshape(rows_per_chunk, RL)
        # Rows past seq hold stale/uninitialized VMEM; their weights are 0,
        # but 0 * NaN = NaN, so zero V explicitly.
        vrow = c * rows_per_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (rows_per_chunk, RL), 0
        )
        vflat = jnp.where(vrow < seq, vflat, 0)
        # scores[h, row]: contract qexp's RL dim with kflat's RL dim.
        scores = jax.lax.dot_general(
            qexp, kflat.astype(cdt),
            (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [Hq, rows]
        if logit_cap > 0.0:  # gemma2 attn_logit_softcapping, in-kernel
            scores = logit_cap * jnp.tanh(scores / logit_cap)
        row_pos = c * rows_per_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (Hq, rows_per_chunk), 1
        )
        scores = jnp.where(row_pos < seq, scores, -1e30)

        m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)  # [Hq, 1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [Hq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [Hq, 1]
        w = jnp.exp(scores - m_new)  # [Hq, rows]
        l_prev = jnp.max(l_ref[:], axis=1, keepdims=True)
        l_new = l_prev * alpha + jnp.sum(w, axis=1, keepdims=True)
        pv = jax.lax.dot(
            w.astype(cdt), vflat.astype(cdt),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [Hq, RL]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    denom = jnp.maximum(jnp.max(l_ref[:], axis=1, keepdims=True), 1e-30)
    out = jax.lax.dot(
        ((acc_ref[:] / denom) * own).astype(jnp.float32), fold,
        preferred_element_type=jnp.float32,
    )  # [Hq, D]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "pages_per_chunk", "num_kv_heads", "sm_scale",
                     "logit_cap"),
)
def paged_decode_attention(
    q,  # [B, Hq, D]
    k_cache,  # [L, S, r, ln]
    v_cache,  # [L, S, r, ln]
    layer_idx,  # scalar int32
    pages,  # [B, Cp] int32 page ids (position-ordered)
    seq_lens,  # [B] int32
    *,
    page_size: int,
    num_kv_heads: int,
    sm_scale: float,
    pages_per_chunk: int = 8,
    logit_cap: float = 0.0,
):
    B, Hq, D = q.shape
    r, ln = k_cache.shape[2], k_cache.shape[3]
    Cp = pages.shape[1]
    Pc = min(pages_per_chunk, Cp)
    qdt = jnp.bfloat16 if k_cache.dtype == jnp.bfloat16 else jnp.float32
    qs = (q.astype(jnp.float32) * sm_scale).astype(qdt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Pc * page_size, r, ln), k_cache.dtype),
            pltpu.VMEM((2, Pc * page_size, r, ln), v_cache.dtype),
            pltpu.VMEM((Hq, r * ln), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            page_size=page_size,
            pages_per_chunk=Pc,
            num_kv_heads=num_kv_heads,
            logit_cap=float(logit_cap),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
    )(pages, seq_lens, jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qs, k_cache, v_cache)
    return out
