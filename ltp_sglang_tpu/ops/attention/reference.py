"""Reference paged attention in pure jnp (the `torch_native_backend` analog).

Semantics mirror the reference Triton kernels
(layers/attention/triton_ops/decode_attention.py:677 `decode_attention_fwd`,
extend_attention.py:306 `extend_attention_fwd`): new tokens attend over
(cached prefix ∪ themselves) through a per-request page table, causally.

Design difference (TPU-first): KV for the new tokens is written to the paged
cache *before* attention, so a single gather over `kv_indices` serves both the
prefix and the new tokens — one uniform memory access pattern that XLA can
tile, instead of the reference's two-source loop. Decode is the E=1 special
case of extend.

All shapes are padded/static: B (batch bucket), E (extend bucket), C (kv-len
bucket). Works on CPU for tests and on TPU as the fallback backend; the Pallas
kernels in pallas_decode.py / pallas_extend.py are the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ref_paged_attention(
    q: jnp.ndarray,  # [B, E, Hq, D]
    k: jnp.ndarray,  # [B, C, Hkv, D] gathered pages (caller: kc[li, kv_indices])
    v: jnp.ndarray,  # [B, C, Hkv, Dv]
    kv_indices: jnp.ndarray,  # [B, C] int32 (unused here; kept for contract)
    seq_lens: jnp.ndarray,  # [B] total kv len per request (post-extend)
    q_pos_start: jnp.ndarray,  # [B] absolute position of first query token (=prefix_len)
    sm_scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = 0,  # 0 = disabled
    tree_mask: jnp.ndarray = None,  # [B, E, E] bool: spec-tree visibility
    alibi_slopes: jnp.ndarray = None,  # [Hq] f32 (bloom/mpt); bias slope·k_pos
    chunk_size=None,  # llama4 chunked attention: same pos//chunk only; 0/None off
    sinks: jnp.ndarray = None,  # [Hq] gpt-oss attention sinks (extra softmax logit)
) -> jnp.ndarray:  # [B, E, Hq, Dv]
    # NOTE the caller gathers pages with a SINGLE fused indexing expression
    # `cache[layer, kv_indices]` — slicing the layer first (`cache[layer]`)
    # materializes the whole layer (32+ MB) and its reshape, which profiling
    # showed costing more than the attention itself.
    B, E, Hq, D = q.shape
    C = kv_indices.shape[1]
    Hkv = k.shape[2]
    Dv = v.shape[3]
    group = Hq // Hkv

    # Keep operands in the cache dtype and accumulate in f32 on the MXU —
    # materializing f32 copies of the gathered K/V costs more HBM traffic
    # than the attention itself at decode shapes.
    qr = q.reshape(B, E, Hkv, group, D)
    # scores: [B, Hkv, group, E, C]
    scores = (
        jnp.einsum("behgd,bchd->bhgec", qr, k, preferred_element_type=jnp.float32)
        * sm_scale
    )

    if logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    if alibi_slopes is not None:
        # ALiBi (bloom/mpt): bias = slope_h · key_position. Softmax rows are
        # shift-invariant, so slope·j ≡ -slope·(i - j) for causal rows.
        kpos = jnp.arange(C, dtype=jnp.float32)[None, None, None, None, :]
        slopes = alibi_slopes.reshape(1, Hkv, group, 1, 1).astype(jnp.float32)
        scores = scores + slopes * kpos

    # Causal + length mask: query i (absolute pos p_i = q_pos_start + i) sees
    # kv j iff j <= p_i and j < seq_len.
    q_pos = q_pos_start[:, None] + jnp.arange(E, dtype=jnp.int32)[None, :]  # [B, E]
    kv_pos = jnp.arange(C, dtype=jnp.int32)[None, :]  # [1, C]
    if tree_mask is not None:
        # Speculative tree verify (reference: build_eagle_tree.py tree masks):
        # the E new tokens occupy kv columns [q_pos_start, q_pos_start + E)
        # IN TREE ORDER (their true positions, used for RoPE, differ); query
        # i sees the whole committed prefix plus its own ancestors-or-self.
        col_off = kv_pos - q_pos_start[:, None]  # [B, C] tree column or <0
        in_tree = (col_off >= 0) & (col_off < E)
        anc = jnp.take_along_axis(
            tree_mask, jnp.clip(col_off, 0, E - 1)[:, None, :], axis=2
        )  # [B, E, C]
        mask = jnp.where(in_tree[:, None, :], anc, True) & (
            kv_pos[:, None, :] < seq_lens[:, None, None]
        )
    else:
        mask = (kv_pos[:, None, :] <= q_pos[:, :, None]) & (
            kv_pos[:, None, :] < seq_lens[:, None, None]
        )  # [B, E, C]
    apply_window = (
        not isinstance(sliding_window, int) or sliding_window > 0
    )  # traced per-layer windows (gemma2) always apply the term
    if apply_window:
        mask = mask & (kv_pos[:, None, :] > q_pos[:, :, None] - sliding_window)
    if chunk_size is not None and not (
        isinstance(chunk_size, int) and chunk_size == 0
    ):
        # llama4 chunked attention (layer_types "chunked_attention"): a query
        # sees only keys in its own position chunk. Traced per-layer chunk:
        # 0 disables via the where.
        c = jnp.maximum(chunk_size, 1)
        same = (kv_pos[:, None, :] // c) == (q_pos[:, :, None] // c)
        mask = mask & jnp.where(chunk_size > 0, same, True)
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    # Manual safe softmax: fully-masked (padded) rows get probability 0
    # everywhere without producing NaN.
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)
    if sinks is not None:
        # gpt-oss attention sinks: a per-head learnable logit joins the
        # softmax and its mass is dropped (modeling_gpt_oss.py
        # eager_attention_forward): denom += exp(sink - m).
        sk = sinks.reshape(1, Hkv, group, 1, 1).astype(jnp.float32)
        m = jnp.maximum(m, sk)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sk - m)
    else:
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / jnp.maximum(denom, 1e-30)).astype(q.dtype)
    out = jnp.einsum(
        "bhgec,bchd->behgd", probs, v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, E, Hq, Dv).astype(q.dtype)
