"""Pallas decode attention over per-request SWA ring pools (+ logit cap).

Reference analog: the sliding-window decode paths of the attention backends
(triton decode kernels with sliding_window, gemma2's logit-softcap handled
in-kernel — layers/attention/triton_ops/decode_attention.py:677,
double_sparsity/gemma paths). Completes the Pallas decode family next to
pallas_decode.py (mainline paged MHA/GQA) and pallas_mla_decode.py (latent
MQA): gemma-family SWA layers previously gathered whole ring regions via
XLA (`ks[li, ring_idx]`, models/gemma2.py) — three byte-moves per
layer-step.

Ring layout (models/gemma2.py swa_branch / mem_cache SWAKVPool analog):
request b owns the CONTIGUOUS row range [req_row*ring, (req_row+1)*ring) of
the ring pool [Lsub, S, r, ln]; slot j holds position
p_j = seq-1 - ((seq-1-j) mod ring), valid iff p_j >= max(0, seq - window).
Contiguity makes the stream cheaper than the paged kernel: big fixed-stride
DMA slabs, no page-id prefetch.

The optional logit cap (gemma2: attn_logit_softcapping) applies
cap * tanh(s/cap) in-kernel before the online softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_decode_kernel(
    # scalar prefetch
    rows_ref,  # [B] int32 ring row (request region index)
    seq_ref,  # [B] int32 current kv length (incl. this token)
    li_ref,  # [1] int32 sub-layer index
    # tensor inputs
    q_ref,  # [1, Hq, D] VMEM (scaled q)
    kc_ref,  # [Lsub, S, r, ln] HBM
    vc_ref,  # [Lsub, S, r, ln] HBM
    # output
    o_ref,  # [1, Hq, D] VMEM
    # scratch
    kbuf,  # [2, Rc, r, ln] VMEM
    vbuf,
    acc_ref,  # [Hq, r*ln] f32
    m_ref,  # [Hq, 128] f32
    l_ref,  # [Hq, 128] f32
    sems,  # [2, 2]
    *,
    ring: int,
    window: int,
    rows_per_chunk: int,
    num_kv_heads: int,
    logit_cap: float,
):
    b = pl.program_id(0)
    li = li_ref[0]
    seq = seq_ref[b]
    base = rows_ref[b] * ring
    Rc = rows_per_chunk
    # Only slots < min(seq, ring) were ever written; stream just those.
    n_used = jnp.minimum(seq, ring)
    n_chunks = (n_used + Rc - 1) // Rc

    _, Hq, D = q_ref.shape
    r, ln = kc_ref.shape[2], kc_ref.shape[3]
    RL = r * ln
    G = Hq // num_kv_heads
    cdt = jnp.bfloat16 if kc_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def chunk_dma(c, slot, which, buf):
        return pltpu.make_async_copy(
            which.at[li, pl.ds(base + c * Rc, Rc)],
            buf.at[slot],
            sems.at[slot, 0 if which is kc_ref else 1],
        )

    def start_chunk(c, slot):
        chunk_dma(c, slot, kc_ref, kbuf).start()
        chunk_dma(c, slot, vc_ref, vbuf).start()

    def wait_chunk(c, slot):
        chunk_dma(c, slot, kc_ref, kbuf).wait()
        chunk_dma(c, slot, vc_ref, vbuf).wait()

    # Zero-expanded q / fold / ownership matrices (same scheme as
    # pallas_decode.py — lane-aligned GQA without sub-lane slicing).
    q = q_ref[0].astype(jnp.float32)
    qT = q.T
    tiled = jnp.concatenate([qT] * num_kv_heads, axis=0)  # [RL, Hq]
    jj = jax.lax.broadcasted_iota(jnp.int32, (RL, Hq), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (RL, Hq), 1)
    qexp = jnp.where(jj // D == hh // G, tiled, 0.0).astype(cdt)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (RL, D), 0)
    dd2 = jax.lax.broadcasted_iota(jnp.int32, (RL, D), 1)
    fold = (jj2 % D == dd2).astype(jnp.float32)
    jj3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, RL), 1)
    hh3 = jax.lax.broadcasted_iota(jnp.int32, (Hq, RL), 0)
    own = (jj3 // D == hh3 // G).astype(jnp.float32)

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
        kflat = kbuf[slot].reshape(Rc, RL)
        vflat = vbuf[slot].reshape(Rc, RL)
        # Ring slot -> position: p_j = seq-1 - ((seq-1-j) mod ring);
        # valid iff 0 <= p_j and p_j >= seq - window.
        j = c * Rc + jax.lax.broadcasted_iota(jnp.int32, (Rc, 1), 0)
        pj = (seq - 1) - jax.lax.rem(
            jax.lax.rem(seq - 1 - j, ring) + ring, ring
        )
        valid = (pj >= 0) & (pj >= seq - window)
        vflat = jnp.where(valid, vflat, 0)
        scores = jax.lax.dot_general(
            qexp, kflat.astype(cdt), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [Hq, Rc]
        if logit_cap > 0.0:
            scores = logit_cap * jnp.tanh(scores / logit_cap)
        scores = jnp.where(valid.reshape(1, Rc), scores, -1e30)

        m_prev = jnp.max(m_ref[:], axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        w = jnp.exp(scores - m_new)
        l_prev = jnp.max(l_ref[:], axis=1, keepdims=True)
        l_new = l_prev * alpha + jnp.sum(w, axis=1, keepdims=True)
        pv = jax.lax.dot(
            w.astype(cdt), vflat.astype(cdt),
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    denom = jnp.maximum(jnp.max(l_ref[:], axis=1, keepdims=True), 1e-30)
    out = jax.lax.dot(
        ((acc_ref[:] / denom) * own).astype(jnp.float32), fold,
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("ring", "window", "rows_per_chunk", "num_kv_heads",
                     "sm_scale", "logit_cap"),
)
def ring_decode_attention(
    q,  # [B, Hq, D]
    k_swa,  # [Lsub, S, r, ln] ring pool
    v_swa,
    layer_idx,  # scalar int32 (sub-layer)
    req_rows,  # [B] int32 ring region index
    seq_lens,  # [B] int32 (incl. the just-written token)
    *,
    ring: int,
    window: int,
    num_kv_heads: int,
    sm_scale: float,
    logit_cap: float = 0.0,
    rows_per_chunk: int = 128,
):
    B, Hq, D = q.shape
    r, ln = k_swa.shape[2], k_swa.shape[3]
    Rc = min(rows_per_chunk, ring)
    # Ring regions are streamed in fixed chunks; Rc must divide ring so a
    # chunk never crosses a region boundary.
    while ring % Rc:
        Rc -= 1
    qdt = jnp.bfloat16 if k_swa.dtype == jnp.bfloat16 else jnp.float32
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
            pltpu.VMEM((2, Rc, r, ln), k_swa.dtype),
            pltpu.VMEM((2, Rc, r, ln), v_swa.dtype),
            pltpu.VMEM((Hq, r * ln), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(
            _ring_decode_kernel,
            ring=ring,
            window=window,
            rows_per_chunk=Rc,
            num_kv_heads=num_kv_heads,
            logit_cap=float(logit_cap),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(req_rows, jnp.int32), jnp.asarray(seq_lens, jnp.int32),
      jnp.asarray(layer_idx, jnp.int32).reshape(1), qs, k_swa, v_swa)
