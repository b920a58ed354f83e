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

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def moe_topk(
    router_logits: jnp.ndarray,  # [T, E]
    top_k: int,
    norm_topk_prob: bool,
    scoring: str = "softmax",  # softmax | sigmoid (deepseek v3)
    routed_scaling_factor: float = 1.0,
    e_score_bias: Optional[jnp.ndarray] = None,  # [E] noaux_tc bias (dsv3)
    valid: Optional[jnp.ndarray] = None,  # [T] bool: real (non-pad) tokens
    layer_tag: Optional[jnp.ndarray] = None,  # scalar MoE-layer id (EPLB)
    n_group: int = 1,  # group-limited routing (dsv3/glm4_moe)
    topk_group: int = 1,
):
    """Returns (weights [T, k] f32, indices [T, k] i32). Mirrors
    layers/moe/topk.py semantics. scoring="topk_softmax" selects top-k on
    the RAW logits and softmaxes only the selected (granitemoe).
    `n_group > 1` enables group-limited routing (reference topk.py
    grouped_topk/biased_grouped_topk, deepseek V3 + glm4_moe): experts
    partition into n_group groups, a group's score is the sum of its top-2
    member scores, only the topk_group best groups stay eligible."""
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
    if n_group > 1:
        T, E = select.shape
        g = E // n_group
        grouped = select.reshape(T, n_group, g)
        if e_score_bias is not None:
            # noaux_tc (dsv3/glm4_moe): group score = sum of top-2 members.
            group_scores = jax.lax.top_k(grouped, min(2, g))[0].sum(axis=-1)
        else:
            # group_limited_greedy (dsv2): group score = best member.
            group_scores = grouped.max(axis=-1)
        _, gidx = jax.lax.top_k(group_scores, topk_group)  # [T, topk_group]
        gmask = (
            jax.lax.broadcasted_iota(jnp.int32, (T, n_group, 1), 1)
            == gidx[:, None, :]
        ).any(axis=-1)  # [T, n_group]
        emask = jnp.repeat(gmask, g, axis=1)  # [T, E]
        # Ineligible experts score 0 (sigmoid/softmax scores are >= 0 and
        # the bias only shifts selection, matching masked_fill(0.0)).
        select = jnp.where(emask, select, 0.0)
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


def expert_count(w) -> int:
    """Leading E dim of an expert weight stack (array or quantized dict)."""
    if isinstance(w, dict):
        w = w["w8i"] if "w8i" in w else w["w8"]
    return w.shape[0]


def resolve_expert_weights(w, dtype):
    """Expert weight stacks are plain arrays [E, K, N] or QUANTIZED leaf
    dicts — fp8 {"w8", "weight_scale"|"weight_scale_blockB"} or int8
    {"w8i", "weight_scale"} — with every leaf sharing the leading E (or
    L, E) dims so lax.scan over layers and shard_map's expert-dim sharding
    treat them uniformly. HBM holds the 1-byte format; dequant happens here,
    immediately before the grouped GEMM, exactly as dense fp8/int8 linears
    defer to dequant_fp8/int8_matmul.

    Reference analog: fp8 blockwise grouped expert GEMM
    (layers/moe/fused_moe_triton/, layers/quantization/fp8.py:110) and the
    w8a8 MoE methods; BASELINE config 5 (DeepSeek-V2-Lite MoE FP8)."""
    if not isinstance(w, dict):
        return w.astype(dtype)
    if "w8i" in w:
        # int8 + per-expert-channel scales [E, 1, N] (symmetric).
        return w["w8i"].astype(dtype) * w["weight_scale"].astype(dtype)
    from ltp_sglang_tpu.layers.quantization.fp8 import fp8_scale_key

    q = w["w8"]
    skey, bs = fp8_scale_key(w)
    s = w[skey]
    if bs is None:
        return q.astype(dtype) * s.astype(dtype)
    # Block-wise (DeepSeek convention): s [E, K/bs, N/bs]; expert dims must
    # divide the block (ingestion guarantees exact grids by construction).
    E, K, N = q.shape
    kb, nb = s.shape[-2:]
    wq = q.astype(dtype).reshape(E, kb, K // kb, nb, N // nb)
    wq = wq * s[:, :, None, :, None].astype(dtype)
    return wq.reshape(E, K, N)


def moe_ffn(
    x: jnp.ndarray,  # [T, Dm]
    weights: jnp.ndarray,  # [T, k] combine weights
    indices: jnp.ndarray,  # [T, k] expert ids
    gate_w: jnp.ndarray,  # [Eloc, Dm, I] (array or quantized leaf dict)
    up_w: jnp.ndarray,  # [Eloc, Dm, I]
    down_w: jnp.ndarray,  # [Eloc, I, Dm]
    scale_input: bool = False,
    gate_bias=None,  # [Eloc, I] per-expert biases (gpt-oss)
    up_bias=None,
    down_bias=None,
    act_fn=None,  # (gate, up) -> activated, f32 in/out; default silu(g)*u
) -> jnp.ndarray:
    """Dropless grouped-GEMM expert computation. `scale_input` applies the
    routing weight to the expert INPUT instead of the output (llama4: the
    expert is nonlinear, so pre- and post-scaling differ)."""
    T, Dm = x.shape
    k = indices.shape[1]
    E = expert_count(gate_w)

    flat_exp = indices.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_exp)  # stable enough (ties keep relative order)
    token_idx = order // k  # source token of each sorted slot
    x_sorted = x[token_idx]  # [T*k, Dm]
    if scale_input:
        x_sorted = x_sorted * weights.reshape(-1)[order][:, None].astype(x.dtype)
        weights = jnp.ones_like(weights)
    # bincount lowers to scatter-add (TPU compile tarpit); compare-reduce
    # instead: [E, T*k] bool -> row sums.
    group_sizes = (
        (flat_exp[None, :] == jnp.arange(E, dtype=flat_exp.dtype)[:, None])
        .sum(axis=1)
        .astype(jnp.int32)
    )

    dtype = x.dtype
    exp_sorted = flat_exp[order]
    gate = jax.lax.ragged_dot(
        x_sorted, resolve_expert_weights(gate_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    up = jax.lax.ragged_dot(
        x_sorted, resolve_expert_weights(up_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    if gate_bias is not None:
        gate = gate + gate_bias[exp_sorted].astype(jnp.float32)
    if up_bias is not None:
        up = up + up_bias[exp_sorted].astype(jnp.float32)
    act = (
        (jax.nn.silu(gate) * up) if act_fn is None else act_fn(gate, up)
    ).astype(dtype)
    out_sorted = jax.lax.ragged_dot(
        act, resolve_expert_weights(down_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )  # [T*k, Dm]
    if down_bias is not None:
        out_sorted = (
            out_sorted.astype(jnp.float32) + down_bias[exp_sorted]
        ).astype(dtype)

    # Unsort via the inverse permutation (gathers only — XLA TPU scatter is
    # a compile-time tarpit) and combine with routing weights.
    inv = jnp.argsort(order)  # flat (t, j) slot -> sorted position
    gathered = out_sorted[inv].reshape(T, k, Dm)
    out = jnp.sum(gathered * weights[:, :, None], axis=1)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# True expert-parallel token dispatch (reference DeepEP,
# layers/moe/token_dispatcher/deepep.py:262-494): each chip owns a T/ep slice
# of the tokens, sends every (token, k) pair to the chip owning its expert
# over ICI, runs the local grouped GEMM on what arrives, and sends results
# back. Per-chip routing work and combine bandwidth shrink with ep_size —
# unlike the replicated-compute fallback (moe_ffn_ep below), whose combine is
# a full [T, Dm] psum.
#
# Transport is pluggable because XLA:CPU does not implement the
# ragged-all-to-all HLO: on TPU the data plane is jax.lax.ragged_all_to_all
# (exact sizes over ICI); on CPU meshes (tests, dryrun) a dense
# fixed-capacity lax.all_to_all emulates it with IDENTICAL plan/offset math
# and buffer layouts, so everything but the primitive call is covered by the
# virtual-mesh tests. Split-phase (dispatch / experts / combine) so
# two-batch overlap can interleave a2a with compute later (SURVEY B.4).


class _EpPlan(NamedTuple):
    """Per-chip a2a plan. S[d, j] = rows chip d sends chip j."""

    order: jnp.ndarray  # [P] local pair permutation (sorted by dest chip)
    send_sizes: jnp.ndarray  # [ep] rows this chip sends to each peer
    input_offsets: jnp.ndarray  # [ep] chunk starts in the sorted send buffer
    recv_sizes: jnp.ndarray  # [ep] rows received from each peer
    recv_offsets: jnp.ndarray  # [ep] arrival offsets (sender-major layout)
    fwd_out_offsets: jnp.ndarray  # [ep] where my chunk lands at each receiver
    rev_out_offsets: jnp.ndarray  # [ep] where returns land at each sender


def _exclusive_cumsum(v, axis=0):
    c = jnp.cumsum(v, axis=axis)
    z = jnp.zeros_like(jnp.take(c, jnp.array([0]), axis=axis))
    return jnp.concatenate([z, jax.lax.slice_in_dim(c, 0, v.shape[axis] - 1, axis=axis)], axis=axis)


def _ep_make_plan(dest, ep: int, axis: str, cap=None) -> _EpPlan:
    """dest: [P] destination chip of each local (token, k) pair.

    `cap` (rows) bounds each chip's RECEIVE buffer (DeepEP
    num_max_dispatch_tokens_per_rank analog, deepep.py:300): senders clamp
    each chunk so cumulative arrivals at any receiver never exceed cap —
    overflow pairs are simply not shipped (their combine contribution is
    zero, the reference's capacity token-drop semantics). The clamp is a
    pure function of the all-gathered size matrix S, so every chip computes
    identical effective sizes without extra communication."""
    send_sizes = (
        (dest[None, :] == jnp.arange(ep, dtype=dest.dtype)[:, None])
        .sum(axis=1)
        .astype(jnp.int32)
    )
    order = jnp.argsort(dest)  # stable: preserves pair order within a chunk
    # Offsets in MY local pair ordering stay full-size: dropped rows are the
    # tail of each per-destination chunk and keep their slots (fill rows).
    input_offsets = _exclusive_cumsum(send_sizes)
    S = jax.lax.all_gather(send_sizes, axis)  # [ep senders, ep dests]
    me = jax.lax.axis_index(axis)
    if cap is not None:
        room = jnp.clip(cap - _exclusive_cumsum(S, axis=0), 0, None)
        S_eff = jnp.minimum(S, room).astype(jnp.int32)
    else:
        S_eff = S
    recv_sizes = S_eff[:, me]
    recv_offsets = _exclusive_cumsum(recv_sizes)
    # Receiver j places my chunk after every earlier sender's chunk for j.
    fwd_out_offsets = _exclusive_cumsum(S_eff, axis=0)[me]
    # Sender d expects its returning rows at its own input_offsets[me]
    # (FULL cumsum: placement is in d's local pair space).
    rev_out_offsets = _exclusive_cumsum(S, axis=1)[:, me]
    return _EpPlan(order, S_eff[me], input_offsets, recv_sizes, recv_offsets,
                   fwd_out_offsets, rev_out_offsets)


def _use_ragged_a2a() -> bool:
    mode = os.environ.get("LTP_EP_TRANSPORT", "auto")
    if mode == "ragged":
        return True
    if mode == "dense":
        return False
    return jax.default_backend() == "tpu"


def _a2a_rows(rows, src_offsets, src_sizes, dst_offsets, dst_sizes, out_cap,
              chunk_cap, fill, axis, ep):
    """Send rows[src_offsets[j] : +src_sizes[j]] to peer j; peer-d chunks land
    at exclusive-cumsum(dst_sizes)[d] in a fresh [out_cap, ...] buffer whose
    untouched rows hold `fill`."""
    if _use_ragged_a2a():
        buf = jnp.full((out_cap,) + rows.shape[1:], fill, rows.dtype)
        return jax.lax.ragged_all_to_all(
            rows, buf, src_offsets, src_sizes, dst_offsets, dst_sizes,
            axis_name=axis,
        )
    # Dense emulation: [ep, chunk_cap, ...] chunk matrix through lax.all_to_all.
    n = rows.shape[0]
    i_idx = jnp.arange(chunk_cap, dtype=jnp.int32)
    gidx = jnp.clip(src_offsets[:, None] + i_idx[None, :], 0, n - 1)
    valid = i_idx[None, :] < src_sizes[:, None]
    shape = (ep, chunk_cap) + (1,) * (rows.ndim - 1)
    chunks = jnp.where(valid.reshape(shape), rows[gidx], fill)
    arrived = jax.lax.all_to_all(chunks, axis, split_axis=0, concat_axis=0)
    # Compact sender-major chunks into the arrival-order buffer.
    dst_off = _exclusive_cumsum(dst_sizes)
    c = jnp.arange(out_cap, dtype=jnp.int32)
    d = jnp.clip(
        jnp.searchsorted(dst_off, c, side="right").astype(jnp.int32) - 1, 0, ep - 1
    )
    i = jnp.clip(c - dst_off[d], 0, chunk_cap - 1)
    ok = c < dst_sizes.sum()
    return jnp.where(
        ok.reshape((out_cap,) + (1,) * (rows.ndim - 1)), arrived[d, i], fill
    )


def _ep_capacity(ep: int, P_: int):
    """Receive-buffer rows per chip. Default = ep * P_ (exact worst case:
    every global pair routed here) — linear in ep, a wall at large meshes
    (r4 VERDICT weak #7). LTP_EP_CAPACITY_FACTOR=f bounds it at ~f * P_
    rows (f >= 1, float ok; rounded up to a multiple of 8), the reference's
    DeepEP bounded-buffer mode: under skew beyond f x uniform, overflow
    pairs are dropped (zero combine contribution) instead of growing the
    activation buffer."""
    f = os.environ.get("LTP_EP_CAPACITY_FACTOR")
    full = ep * P_
    if not f:
        return full, None
    cap = int(np.ceil(float(f) * P_))
    cap = max(P_, min(full, ((cap + 7) // 8) * 8))
    return cap, (cap if cap < full else None)


def _ep_dispatch(x_, idx_, Eloc: int, axis: str, ep: int, pair_scale=None):
    """Phase 1 (DeepEP dispatch_a/b analog): route local pairs to expert
    owners. Returns (x_recv [C, Dm], local_ids_recv [C], plan); C covers
    the worst case (ep * P: every global pair routed here) unless
    LTP_EP_CAPACITY_FACTOR bounds it (_ep_capacity). Pad rows carry
    local id Eloc so they sort last and join no ragged_dot group."""
    P_ = idx_.size
    C, cap = _ep_capacity(ep, P_)
    flat = idx_.reshape(-1).astype(jnp.int32)
    dest = flat // Eloc
    plan = _ep_make_plan(dest, ep, axis, cap=cap)
    x_send = x_[plan.order // idx_.shape[1]]
    if pair_scale is not None:  # llama4 input-scaled routing
        x_send = x_send * pair_scale.reshape(-1)[plan.order][:, None].astype(
            x_send.dtype
        )
    ids_send = (flat - dest * Eloc)[plan.order]
    x_recv = _a2a_rows(
        x_send, plan.input_offsets, plan.send_sizes, plan.fwd_out_offsets,
        plan.recv_sizes, C, P_, jnp.zeros((), x_.dtype), axis, ep,
    )
    ids_recv = _a2a_rows(
        ids_send, plan.input_offsets, plan.send_sizes, plan.fwd_out_offsets,
        plan.recv_sizes, C, P_, jnp.int32(Eloc), axis, ep,
    )
    return x_recv, ids_recv, plan


def _ep_experts(x_recv, ids_recv, gate_w, up_w, down_w,
                gate_bias=None, up_bias=None, down_bias=None, act_fn=None):
    """Phase 2: sort arrivals by local expert, grouped GEMM, unsort back to
    arrival order. Rows past the real count are pad (id Eloc): they sort
    last, fall outside every group, and are never returned (bias gathers
    clip the pad id; those rows' garbage never leaves this chip)."""
    Eloc = expert_count(gate_w)
    lorder = jnp.argsort(ids_recv)
    xs = x_recv[lorder]
    ids_sorted = jnp.clip(ids_recv[lorder], 0, Eloc - 1)
    group_sizes = (
        (ids_recv[None, :] == jnp.arange(Eloc, dtype=ids_recv.dtype)[:, None])
        .sum(axis=1)
        .astype(jnp.int32)
    )
    dtype = x_recv.dtype
    gate = jax.lax.ragged_dot(
        xs, resolve_expert_weights(gate_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    up = jax.lax.ragged_dot(
        xs, resolve_expert_weights(up_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    if gate_bias is not None:
        gate = gate + gate_bias[ids_sorted].astype(jnp.float32)
    if up_bias is not None:
        up = up + up_bias[ids_sorted].astype(jnp.float32)
    act = (
        (jax.nn.silu(gate) * up) if act_fn is None else act_fn(gate, up)
    ).astype(dtype)
    out_sorted = jax.lax.ragged_dot(
        act, resolve_expert_weights(down_w, dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    if down_bias is not None:
        out_sorted = (
            out_sorted.astype(jnp.float32) + down_bias[ids_sorted]
        ).astype(dtype)
    return out_sorted[jnp.argsort(lorder)].astype(dtype)


def moe_ffn_ep_a2a(
    x: jnp.ndarray,  # [T, Dm] replicated
    weights: jnp.ndarray,  # [T, k]
    indices: jnp.ndarray,  # [T, k] physical expert ids
    gate_w: jnp.ndarray,  # [E, Dm, I] expert dim sharded over `axis`
    up_w: jnp.ndarray,
    down_w: jnp.ndarray,
    mesh,
    axis: str = "tp",
    return_stats: bool = False,
    tbo: bool = False,
    scale_input: bool = False,
    gate_bias=None,
    up_bias=None,
    down_bias=None,
    act_fn=None,
):
    """Expert-parallel MoE FFN with real token all-to-all (DeepEP analog,
    layers/moe/token_dispatcher/deepep.py:262-494 / ep_moe/layer.py:63).

    Each chip takes its T/ep token slice, ships each (token, k) pair to the
    expert's owner, computes locally, ships results back and combines. With
    `return_stats`, also returns per-chip received-pair counts [ep] so tests
    can assert the dispatch spreads ~T*k/ep work per chip.

    `tbo` = TWO-BATCH OVERLAP (reference two_batch_overlap.py:53 +
    operations_strategy.py): the per-chip token slice splits into two
    independent micro-batch pipelines (dispatch-a2a -> experts ->
    combine-a2a each), expressed back-to-back in one program with NO data
    dependency between them — XLA's latency-hiding scheduler is then free
    to run micro-batch 1's dispatch a2a while micro-batch 0's expert GEMMs
    execute (what the reference hand-schedules with its operations list).
    tests/test_eplb.py asserts the independence on the traced jaxpr."""
    T, Dm = x.shape
    k = indices.shape[1]
    ep = mesh.shape[axis]
    chunk = 2 * ep if tbo else ep
    pad = (-T) % chunk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))  # zero weight: no-op
        indices = jnp.pad(indices, ((0, pad), (0, 0)))

    def one_microbatch(x_, w_, idx_, gw, uw, dw, gb, ub, db):
        Eloc = expert_count(gw)
        if scale_input:
            # llama4 input-scaled routing: each dispatched pair row carries
            # w * x and the combine weight becomes 1 (pre-scaling a
            # nonlinear expert is not equivalent to post-scaling).
            x_recv, ids_recv, plan = _ep_dispatch(
                x_, idx_, Eloc, axis, ep, pair_scale=w_
            )
            w_ = jnp.ones_like(w_)
        else:
            x_recv, ids_recv, plan = _ep_dispatch(x_, idx_, Eloc, axis, ep)
        out_rows = _ep_experts(x_recv, ids_recv, gw, uw, dw,
                               gate_bias=gb, up_bias=ub, down_bias=db,
                               act_fn=act_fn)
        ret = _a2a_rows(
            out_rows, plan.recv_offsets, plan.recv_sizes, plan.rev_out_offsets,
            plan.send_sizes, idx_.size, idx_.size,
            jnp.zeros((), out_rows.dtype), axis, ep,
        )
        out_pairs = ret[jnp.argsort(plan.order)].reshape(x_.shape[0], k, Dm)
        yl = jnp.sum(out_pairs * w_[:, :, None], axis=1).astype(x_.dtype)
        n_recv = plan.recv_sizes.sum()[None]
        return yl, n_recv

    def inner(x_, w_, idx_, gw, uw, dw, gb, ub, db):
        if not tbo:
            return one_microbatch(x_, w_, idx_, gw, uw, dw, gb, ub, db)
        h = x_.shape[0] // 2
        y0, n0 = one_microbatch(x_[:h], w_[:h], idx_[:h], gw, uw, dw, gb, ub, db)
        y1, n1 = one_microbatch(x_[h:], w_[h:], idx_[h:], gw, uw, dw, gb, ub, db)
        return jnp.concatenate([y0, y1]), n0 + n1

    from jax.sharding import PartitionSpec as P

    sh = P(axis)
    exp = P(axis)
    zero1 = jnp.zeros((expert_count(gate_w), 1), jnp.float32)
    gb = gate_bias if gate_bias is not None else zero1
    ub = up_bias if up_bias is not None else zero1
    db = down_bias if down_bias is not None else zero1
    has_b = (gate_bias is not None, up_bias is not None, down_bias is not None)

    def inner2(x_, w_, idx_, gw, uw, dw, gb_, ub_, db_):
        return inner(
            x_, w_, idx_, gw, uw, dw,
            gb_ if has_b[0] else None,
            ub_ if has_b[1] else None,
            db_ if has_b[2] else None,
        )

    y, n_recv = jax.shard_map(
        inner2,
        mesh=mesh,
        in_specs=(sh, sh, sh, exp, exp, exp, exp, exp, exp),
        out_specs=(sh, P(axis)),
        check_vma=False,
    )(x, weights, indices, gate_w, up_w, down_w, gb, ub, db)
    y = y[:T]
    if return_stats:
        return y, n_recv
    return y


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
        Eloc = expert_count(gw)
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
            x_sorted, resolve_expert_weights(gw, dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        up = jax.lax.ragged_dot(
            x_sorted, resolve_expert_weights(uw, dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        act = (jax.nn.silu(gate) * up).astype(dtype)
        out_sorted = jax.lax.ragged_dot(
            act, resolve_expert_weights(dw, dtype), group_sizes,
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
    expert_perm=None, tbo: bool = False, scale_input: bool = False,
    gate_bias=None, up_bias=None, down_bias=None, act_fn=None,
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
            # [E, Rcols] replica table: experts with r replicas repeat them
            # cyclically over the columns, so a flat (token, k) modulo pick
            # spreads load near-uniformly across replicas.
            t, k = indices.shape
            rcols = expert_perm.shape[1]
            pick = (jnp.arange(t * k, dtype=jnp.int32) % rcols).reshape(t, k)
            indices = expert_perm[indices, pick]
        else:
            indices = expert_perm[indices]
    if (
        mesh_ctx is not None
        and not mesh_ctx.is_single_device
        and mesh_ctx.dp_size == 1
        and mesh_ctx.tp_size > 1
        and expert_count(gate_w) % mesh_ctx.tp_size == 0
    ):
        if os.environ.get("LTP_EP_REPLICATED") == "1":
            # Fallback: replicated-compute EP (no token a2a) for A/B runs.
            return moe_ffn_ep(
                x, weights, indices, gate_w, up_w, down_w, mesh_ctx.mesh, axis
            )
        return moe_ffn_ep_a2a(
            x, weights, indices, gate_w, up_w, down_w, mesh_ctx.mesh, axis,
            tbo=tbo, scale_input=scale_input,
            gate_bias=gate_bias, up_bias=up_bias, down_bias=down_bias,
            act_fn=act_fn,
        )
    return moe_ffn(x, weights, indices, gate_w, up_w, down_w,
                   scale_input=scale_input, gate_bias=gate_bias,
                   up_bias=up_bias, down_bias=down_bias, act_fn=act_fn)
