"""Double-sparsity decode attention (post-training sparse attention).

Counterpart of the reference's double_sparsity_backend
(layers/attention/double_sparsity_backend.py + triton_ops/double_sparsity
_attention.py): a label cache stores only the `r` "heavy" channels of each
cached K row; decode scores the query against the labels (r/D of the K-read
bytes), takes the top `heavy_token_num` tokens, and runs EXACT attention over
just those rows.

TPU-first divergences from the reference:
- Selection is per REQUEST (max over heads), not per head: the paged cache's
  DMA row layout stores all kv heads of a token contiguously, so per-head
  token sets would gather the same bytes up to Hkv times. A union set reads
  each selected row once; the per-head precision loss is compensated by a
  modestly larger heavy_token_num.
- `lax.top_k` has a static k, so the sparse program shape is fixed per kv
  bucket — no dynamic shapes, fully jittable.
- When heavy_token_num >= the true sequence length the result is exact
  (the union covers every valid token), which the parity tests exploit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_labels(k_rows: jnp.ndarray, channels: jnp.ndarray) -> jnp.ndarray:
    """k_rows [T, Hkv, D], channels [Hkv, r] -> labels [T, Hkv, r]."""
    return jnp.take_along_axis(k_rows, channels[None, :, :], axis=-1)


def ds_sparse_attention(
    q: jnp.ndarray,  # [B, 1, Hq, D] decode query (post kv-scale fold)
    k_cache: jnp.ndarray,  # [L, S, r_dma, ln] whole K pool (fused gather)
    v_cache: jnp.ndarray,
    li,  # traced layer index
    labels: jnp.ndarray,  # [B, C, Hkv, r] gathered label rows
    kv_indices: jnp.ndarray,  # [B, C] slot ids
    seq_lens: jnp.ndarray,  # [B]
    channels: jnp.ndarray,  # [Hkv, r] heavy-channel ids for this layer
    heavy_k: int,
    sm_scale: float,
) -> jnp.ndarray:  # [B, 1, Hq, D]
    B, E, Hq, D = q.shape
    C = kv_indices.shape[1]
    Hkv = labels.shape[2]
    group = Hq // Hkv
    heavy_k = min(heavy_k, C)

    qr = q.reshape(B, Hkv, group, D)
    q_lab = jnp.take_along_axis(
        qr, channels[None, :, None, :], axis=-1
    )  # [B, Hkv, g, r]
    if labels.dtype != q_lab.dtype:
        labels = labels.astype(q_lab.dtype)
    # Approximate scores over the label cache: [B, Hkv, g, C]
    approx = jnp.einsum(
        "bhgr,bchr->bhgc", q_lab, labels, preferred_element_type=jnp.float32
    )
    valid = jnp.arange(C, dtype=jnp.int32)[None, :] < seq_lens[:, None]  # [B, C]
    approx = jnp.where(valid[:, None, None, :], approx, -jnp.inf)
    # Union selection: a token is heavy if ANY head wants it.
    combined = jnp.max(approx, axis=(1, 2))  # [B, C]
    _, top_idx = jax.lax.top_k(combined, heavy_k)  # [B, k]

    sel_slots = jnp.take_along_axis(kv_indices, top_idx, axis=1)  # [B, k]
    sel_valid = jnp.take_along_axis(valid, top_idx, axis=1)  # [B, k]
    # Single fused indexing expression (see ops/attention/reference.py note:
    # slicing the layer first materializes the whole layer).
    k_sel = k_cache[li, sel_slots].reshape(B, heavy_k, Hkv, D)
    v_sel = v_cache[li, sel_slots].reshape(B, heavy_k, Hkv, D)
    if k_sel.dtype != q.dtype:
        k_sel = k_sel.astype(q.dtype)
        v_sel = v_sel.astype(q.dtype)

    scores = (
        jnp.einsum(
            "bhgd,bkhd->bhgk", qr, k_sel, preferred_element_type=jnp.float32
        )
        * sm_scale
    )
    scores = jnp.where(sel_valid[:, None, None, :], scores, -jnp.inf)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    e = jnp.exp(scores - m)
    probs = (e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)).astype(
        q.dtype
    )
    out = jnp.einsum(
        "bhgk,bkhd->bhgd", probs, v_sel, preferred_element_type=jnp.float32
    )
    return out.reshape(B, E, Hq, D).astype(q.dtype)


def auto_channels(k_proj_stacked, num_layers: int, num_kv_heads: int,
                  head_dim: int, r: int):
    """Calibration-free channel pick ("auto"): per layer and kv head, the
    K-projection output channels with the largest weight column norms — a
    static proxy for the activation-outlier channels the reference calibrates
    offline (ds_channel_config). k_proj_stacked: [L, Dm, Hkv*D] (or the
    quantized-absent case returns evenly spaced channels)."""
    import numpy as np

    if k_proj_stacked is None:
        base = np.linspace(0, head_dim - 1, r).astype(np.int32)
        return np.tile(base, (num_layers, num_kv_heads, 1))
    w = np.asarray(k_proj_stacked, np.float32)  # [L, Dm, Hkv*D]
    norms = np.linalg.norm(w, axis=1).reshape(num_layers, num_kv_heads, head_dim)
    idx = np.argsort(-norms, axis=-1)[..., :r]
    return np.sort(idx, axis=-1).astype(np.int32)
