"""Pallas ragged extend (prefill) attention over the native paged KV layout.

Reference analog: `extend_attention_fwd` / `prefill_attention`
(layers/attention/triton_ops/extend_attention.py:306, prefill_attention.py:170)
— new tokens attend causally over (cached prefix ∪ themselves). TPU design
differences:

- ONE kv source instead of the reference's two-span loop: the extend step
  writes new KV into the paged cache *before* attention (the repo-wide
  uniform-access design, see ops/attention/reference.py), so the kernel only
  streams pages.
- Pages move HBM→VMEM once via double-buffered page-granular DMAs (same
  scheme as pallas_decode.py); the XLA fallback gathers + materializes the
  whole [B, C, H, D] view per layer.
- GQA without lane-misaligned slicing: KV rows are token-major [r, ln]
  (r*ln = Hkv*D), so kv head h lives in sub-row h//hps at lane offset
  (h%hps)*D, hps = ln//D. Queries are packed per sub-row into
  [hps*Eblk*G, ln] with each pair member's q values at its own lane offset
  (zeros elsewhere), so one MXU call scores a whole kv-head pair. At
  D == ln (128) this is zero-waste; at D = 64 it spends 2x score/pv flops —
  still 4x less than the decode kernel's zero-expanded-q trick, which is
  fine at E=1 but would cap prefill MFU at 1/Hkv.
- Online softmax (flash) accumulation in fp32 across kv chunks, with causal
  + length masking computed from scalar-prefetched seq_lens / prefix_lens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _extend_kernel(
    # scalar prefetch
    pages_ref,  # [B, Cp] int32 page ids (SMEM)
    seq_ref,  # [B] int32 total kv length incl. new tokens (SMEM)
    qpos_ref,  # [B] int32 absolute position of first query token (SMEM)
    li_ref,  # [1] int32 layer index (SMEM)
    # tensor inputs
    q_ref,  # [1, Eblk, Hq, D] VMEM (pre-scaled by sm_scale)
    kc_ref,  # [L, S, r, ln] HBM (ANY)
    vc_ref,  # [L, S, r, ln] HBM (ANY)
    # output
    o_ref,  # [1, Eblk, Hq, D] VMEM
    # scratch
    kbuf,  # [2, Pc*P, r, ln] VMEM
    vbuf,
    acc_ref,  # [r, hps*Eblk*G, ln] f32
    m_ref,  # [r, hps*Eblk*G, 128] f32 (running max, lane-broadcast)
    l_ref,  # [r, hps*Eblk*G, 128] f32 (running denom)
    sems,  # [2, 2] DMA semaphores
    *,
    page_size: int,
    pages_per_chunk: int,
    num_kv_heads: int,
):
    b = pl.program_id(0)
    eb = pl.program_id(1)
    li = li_ref[0]
    seq = seq_ref[b]
    qs = qpos_ref[b]
    Cp = pages_ref.shape[1]
    P = page_size
    Pc = pages_per_chunk
    rows_per_chunk = Pc * P

    _, Eblk, Hq, D = q_ref.shape
    r, ln = kc_ref.shape[2], kc_ref.shape[3]
    G = Hq // num_kv_heads
    hps = ln // D  # kv heads per storage sub-row (1 or 2)
    EG = Eblk * G

    # kv rows needed by this q block: pos <= last query's absolute position,
    # clamped to the request's length. Padded lanes (seq=0) skip every chunk.
    q_hi = qs + (eb + 1) * Eblk  # exclusive
    kv_needed = jnp.minimum(seq, q_hi)
    kv_needed = jnp.maximum(kv_needed, 0)
    n_chunks = (kv_needed + rows_per_chunk - 1) // rows_per_chunk
    n_pages_used = (kv_needed + P - 1) // P

    cdt = jnp.bfloat16 if kc_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = None if cdt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    def start_chunk(c, slot):
        def issue(p, _):
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

    # Per-sub-row packed queries, built once: q_pack[j][p*EG + e*G + g, lane]
    # = q[e, (j*hps+p)*G + g, lane - p*D] for lanes in [p*D, (p+1)*D), else 0.
    qpacks = []
    for j in range(r):
        members = []
        for p in range(hps):
            hk = j * hps + p
            seg = q_ref[0, :, hk * G:(hk + 1) * G, :].astype(jnp.float32)
            seg = seg.reshape(EG, D)  # row e*G+g (matches output unpack)
            if hps > 1:
                pads = []
                if p > 0:
                    pads.append(jnp.zeros((EG, p * D), jnp.float32))
                pads.append(seg)
                if p < hps - 1:
                    pads.append(jnp.zeros((EG, (hps - 1 - p) * D), jnp.float32))
                seg = jnp.concatenate(pads, axis=1)
            members.append(seg)
        qpacks.append(jnp.concatenate(members, axis=0).astype(cdt))  # [hps*EG, ln]

    # Query absolute position per packed row: e = (m % EG) // G.
    mrow = jax.lax.broadcasted_iota(jnp.int32, (hps * EG, rows_per_chunk), 0)
    q_abs = qs + eb * Eblk + (jax.lax.rem(mrow, EG) // G)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

        def body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                start_chunk(c + 1, jax.lax.rem(c + 1, 2))

            wait_chunk(c, slot)
            kv_pos = c * rows_per_chunk + jax.lax.broadcasted_iota(
                jnp.int32, (hps * EG, rows_per_chunk), 1
            )
            valid = (kv_pos <= q_abs) & (kv_pos < seq)
            # Rows past seq hold stale VMEM; 0 * NaN = NaN, so zero V.
            vrow = c * rows_per_chunk + jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_chunk, ln), 0
            )
            for j in range(r):
                k_j = kbuf[slot, :, j, :]  # [rows, ln]
                v_j = jnp.where(vrow < seq, vbuf[slot, :, j, :], 0)
                scores = jax.lax.dot_general(
                    qpacks[j], k_j.astype(cdt),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # [hps*EG, rows]
                scores = jnp.where(valid, scores, -1e30)

                m_prev = jnp.max(m_ref[j], axis=1, keepdims=True)
                m_cur = jnp.max(scores, axis=1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                w = jnp.exp(scores - m_new)
                l_prev = jnp.max(l_ref[j], axis=1, keepdims=True)
                l_new = l_prev * alpha + jnp.sum(w, axis=1, keepdims=True)
                pv = jax.lax.dot(
                    w.astype(cdt), v_j.astype(cdt),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # [hps*EG, ln]
                acc_ref[j] = acc_ref[j] * alpha + pv
                m_ref[j] = jnp.broadcast_to(m_new, m_ref[j].shape)
                l_ref[j] = jnp.broadcast_to(l_new, l_ref[j].shape)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    # Unpack: head hk = j*hps + p lives in acc[j] rows [p*EG, (p+1)*EG) at
    # lanes [p*D, (p+1)*D); fold_p selects that lane segment.
    jj = jax.lax.broadcasted_iota(jnp.int32, (ln, D), 0)
    dd = jax.lax.broadcasted_iota(jnp.int32, (ln, D), 1)
    for j in range(r):
        denom = jnp.maximum(jnp.max(l_ref[j], axis=1, keepdims=True), 1e-30)
        normed = acc_ref[j] / denom  # [hps*EG, ln]
        for p in range(hps):
            hk = j * hps + p
            fold = (jj == dd + p * D).astype(jnp.float32)
            seg = jax.lax.dot(
                normed[p * EG:(p + 1) * EG, :], fold,
                preferred_element_type=jnp.float32,
            )  # [EG, D]
            o_ref[0, :, hk * G:(hk + 1) * G, :] = seg.reshape(
                Eblk, G, D
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "pages_per_chunk", "num_kv_heads", "sm_scale", "q_block"
    ),
)
def paged_extend_attention(
    q,  # [B, E, Hq, D] new-token queries (E padded to the extend bucket)
    k_cache,  # [L, S, r, ln]
    v_cache,  # [L, S, r, ln]
    layer_idx,  # scalar int32
    pages,  # [B, Cp] int32 page ids (position-ordered, post-extend)
    seq_lens,  # [B] int32 total kv length incl. new tokens
    q_pos_start,  # [B] int32 absolute position of the first new token
    *,
    page_size: int,
    num_kv_heads: int,
    sm_scale: float,
    pages_per_chunk: int = 8,
    q_block: int = 64,
):
    """Ragged causal attention of E new tokens over the live paged cache.

    Requires ln % D == 0 with ln // D in {1, 2} (true for the token-major
    kv_layout whenever D ∈ {64, 128}); callers gate on `extend_kernel_ok`.
    """
    B, E, Hq, D = q.shape
    r, ln = k_cache.shape[2], k_cache.shape[3]
    Cp = pages.shape[1]
    Pc = min(pages_per_chunk, Cp)
    Eblk = min(q_block, E)
    assert E % Eblk == 0, (E, Eblk)
    G = Hq // num_kv_heads
    hps = ln // D
    qdt = jnp.bfloat16 if k_cache.dtype == jnp.bfloat16 else jnp.float32
    qsc = (q.astype(jnp.float32) * sm_scale).astype(qdt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, E // Eblk),
        in_specs=[
            pl.BlockSpec((1, Eblk, Hq, D), lambda b, eb, *_: (b, eb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, Eblk, Hq, D), lambda b, eb, *_: (b, eb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Pc * page_size, r, ln), k_cache.dtype),
            pltpu.VMEM((2, Pc * page_size, r, ln), v_cache.dtype),
            pltpu.VMEM((r, hps * Eblk * G, ln), jnp.float32),
            pltpu.VMEM((r, hps * Eblk * G, 128), jnp.float32),
            pltpu.VMEM((r, hps * Eblk * G, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _extend_kernel,
            page_size=page_size,
            pages_per_chunk=Pc,
            num_kv_heads=num_kv_heads,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E, Hq, D), q.dtype),
        interpret=interpret,
    )(pages, seq_lens, q_pos_start, jnp.asarray(layer_idx, jnp.int32).reshape(1),
      qsc, k_cache, v_cache)
    return out


def extend_kernel_ok(num_kv_heads: int, head_dim: int, ln: int) -> bool:
    """Layout gate: the packed-GQA scheme needs whole kv heads per lane
    segment and at most a head pair per storage sub-row."""
    return ln % head_dim == 0 and ln // head_dim in (1, 2)
