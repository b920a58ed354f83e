"""Mixture-of-Experts FFN (TPU-native, dropless).

Counterpart of the reference MoE stack (layers/moe/: fused_moe_triton, EPMoE,
topk.py). The reference dispatches with CUDA align/reorder kernels or DeepEP
all-to-all; the TPU design is sort-based dropless grouped matmul:

  router -> top-k -> flatten (token, k) pairs -> argsort by expert ->
  `jax.lax.ragged_dot` against stacked expert weights (MXU-tiled grouped GEMM,
  no capacity factor, no token dropping) -> unsort -> weighted combine.

Expert parallelism maps naturally: shard the expert dimension of the stacked
weights over the "ep"/"tp" mesh axis and wrap with shard_map (all-to-all is
XLA's job). Single-controller single-chip path below is the base.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def moe_topk(
    router_logits: jnp.ndarray,  # [T, E]
    top_k: int,
    norm_topk_prob: bool,
    scoring: str = "softmax",  # softmax | sigmoid (deepseek v3)
    routed_scaling_factor: float = 1.0,
    e_score_bias: Optional[jnp.ndarray] = None,  # [E] noaux_tc bias (dsv3)
):
    """Returns (weights [T, k] f32, indices [T, k] i32). Mirrors
    layers/moe/topk.py semantics."""
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    select = scores if e_score_bias is None else scores + e_score_bias
    _, idx = jax.lax.top_k(select, top_k)
    w = jnp.take_along_axis(scores, idx, axis=-1)
    if norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    return (w * routed_scaling_factor).astype(jnp.float32), idx.astype(jnp.int32)


def moe_ffn(
    x: jnp.ndarray,  # [T, Dm]
    weights: jnp.ndarray,  # [T, k] combine weights
    indices: jnp.ndarray,  # [T, k] expert ids
    gate_w: jnp.ndarray,  # [Eloc, Dm, I]
    up_w: jnp.ndarray,  # [Eloc, Dm, I]
    down_w: jnp.ndarray,  # [Eloc, I, Dm]
) -> jnp.ndarray:
    """Dropless grouped-GEMM expert computation."""
    T, Dm = x.shape
    k = indices.shape[1]
    E = gate_w.shape[0]

    flat_exp = indices.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_exp)  # stable enough (ties keep relative order)
    token_idx = order // k  # source token of each sorted slot
    x_sorted = x[token_idx]  # [T*k, Dm]
    # bincount lowers to scatter-add (TPU compile tarpit); compare-reduce
    # instead: [E, T*k] bool -> row sums.
    group_sizes = (
        (flat_exp[None, :] == jnp.arange(E, dtype=flat_exp.dtype)[:, None])
        .sum(axis=1)
        .astype(jnp.int32)
    )

    dtype = x.dtype
    gate = jax.lax.ragged_dot(
        x_sorted, gate_w.astype(dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    up = jax.lax.ragged_dot(
        x_sorted, up_w.astype(dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    act = (jax.nn.silu(gate) * up).astype(dtype)
    out_sorted = jax.lax.ragged_dot(
        act, down_w.astype(dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )  # [T*k, Dm]

    # Unsort via the inverse permutation (gathers only — XLA TPU scatter is
    # a compile-time tarpit) and combine with routing weights.
    inv = jnp.argsort(order)  # flat (t, j) slot -> sorted position
    gathered = out_sorted[inv].reshape(T, k, Dm)
    out = jnp.sum(gathered * weights[:, :, None], axis=1)
    return out.astype(x.dtype)
