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
    valid: Optional[jnp.ndarray] = None,  # [T] bool: real (non-pad) tokens
    layer_tag: Optional[jnp.ndarray] = None,  # scalar MoE-layer id (EPLB)
):
    """Returns (weights [T, k] f32, indices [T, k] i32). Mirrors
    layers/moe/topk.py semantics. scoring="topk_softmax" selects top-k on
    the RAW logits and softmaxes only the selected (granitemoe)."""
    if scoring == "topk_softmax":
        top_logits, idx = jax.lax.top_k(router_logits.astype(jnp.float32), top_k)
        w = jax.nn.softmax(top_logits, axis=-1)
        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        recorder.record_in_program(
            idx, router_logits.shape[-1], valid=valid, layer_tag=layer_tag
        )
        return (w * routed_scaling_factor).astype(jnp.float32), idx.astype(jnp.int32)
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    select = scores if e_score_bias is None else scores + e_score_bias
    _, idx = jax.lax.top_k(select, top_k)
    w = jnp.take_along_axis(scores, idx, axis=-1)
    if norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    # EPLB capture (trace-time no-op unless recording is on).
    from ltp_sglang_tpu.eplb.expert_distribution import recorder

    recorder.record_in_program(
        idx, router_logits.shape[-1], valid=valid, layer_tag=layer_tag
    )
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


def moe_ffn_ep(
    x: jnp.ndarray,  # [T, Dm]
    weights: jnp.ndarray,  # [T, k]
    indices: jnp.ndarray,  # [T, k]
    gate_w: jnp.ndarray,  # [E, Dm, I] expert dim sharded over `axis`
    up_w: jnp.ndarray,
    down_w: jnp.ndarray,
    mesh,
    axis: str = "tp",
) -> jnp.ndarray:
    """Expert-parallel grouped FFN (reference EPMoE, layers/moe/ep_moe/
    layer.py:63, redesigned for ICI).

    Experts are sharded over the mesh axis; activations stay replicated and
    each chip computes ONLY the (token, k) pairs routed to its local
    experts, so compute splits ~T*k/ep per chip while the combine is a
    single psum over the axis (ICI allreduce) instead of the reference's
    DeepEP all-to-all pair. Non-owned pairs are dumped into the last local
    expert group with zeroed inputs (silu(0)*0 @ W == 0 exactly), which
    keeps `ragged_dot` group sizes covering every row without a scatter.
    """
    T, Dm = x.shape
    k = indices.shape[1]

    def inner(x_, w_, idx_, gw, uw, dw):
        Eloc = gw.shape[0]
        rank = jax.lax.axis_index(axis)
        e0 = rank * Eloc
        flat = idx_.reshape(-1) - e0  # local expert id (may be out of range)
        owned = (flat >= 0) & (flat < Eloc)
        skey = jnp.where(owned, flat, Eloc - 1)
        order = jnp.argsort(skey)  # stable: owned rows stay grouped in order
        token_idx = order // k
        owned_s = owned[order]
        x_sorted = jnp.where(owned_s[:, None], x_[token_idx], 0)
        group_sizes = (
            (skey[None, :] == jnp.arange(Eloc, dtype=skey.dtype)[:, None])
            .sum(axis=1)
            .astype(jnp.int32)
        )
        dtype = x_.dtype
        gate = jax.lax.ragged_dot(
            x_sorted, gw.astype(dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        up = jax.lax.ragged_dot(
            x_sorted, uw.astype(dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        act = (jax.nn.silu(gate) * up).astype(dtype)
        out_sorted = jax.lax.ragged_dot(
            act, dw.astype(dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        inv = jnp.argsort(order)
        gathered = out_sorted[inv].reshape(T, k, Dm)
        part = jnp.sum(gathered * w_[:, :, None], axis=1)
        return jax.lax.psum(part.astype(x_.dtype), axis)

    from jax.sharding import PartitionSpec as P

    rep = P()
    exp = P(axis)
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(rep, rep, rep, exp, exp, exp),
        out_specs=rep,
        check_vma=False,
    )(x, weights, indices, gate_w, up_w, down_w)


def moe_ffn_auto(
    x, weights, indices, gate_w, up_w, down_w, mesh_ctx=None, axis: str = "tp",
    expert_perm=None,
):
    """Pick EP (shard_map over the tp axis) on multi-device pure-TP meshes
    whose expert count divides; otherwise the single-program grouped GEMM.

    `expert_perm` is the EPLB logical -> physical slot map
    (eplb/eplb_manager.py); weights are stored in physical order. Either
    [E] int32 (pure permutation) or [E, 2] (redundant replication: each
    logical expert lists its physical replicas, single-replica experts
    repeat one slot) — tokens then spread over replicas by flat (token, k)
    parity, which halves a hot expert's per-slot load without branching."""
    if expert_perm is not None:
        if expert_perm.ndim == 2:
            t, k = indices.shape
            pick = (jnp.arange(t * k, dtype=jnp.int32) % 2).reshape(t, k)
            indices = expert_perm[indices, pick]
        else:
            indices = expert_perm[indices]
    if (
        mesh_ctx is not None
        and not mesh_ctx.is_single_device
        and mesh_ctx.dp_size == 1
        and mesh_ctx.tp_size > 1
        and gate_w.shape[0] % mesh_ctx.tp_size == 0
    ):
        return moe_ffn_ep(
            x, weights, indices, gate_w, up_w, down_w, mesh_ctx.mesh, axis
        )
    return moe_ffn(x, weights, indices, gate_w, up_w, down_w)
