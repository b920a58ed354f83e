"""shard_map wrappers that keep the Pallas kernels alive on multi-device
meshes.

Round-1 design disabled every Pallas kernel as soon as the mesh had more
than one device (GSPMD cannot partition a pallas_call custom-call on its
own), which made multi-chip a performance regression by construction. The
fix is the standard TPU pattern: wrap each kernel in `jax.shard_map` with
the KV cache head-sharded over the "tp" axis, so every chip runs the same
kernel on its local head shard:

- KV caches [L, S, r, ln] are sharded on the row dim r (rows are the
  row-major factorization of Hkv*D into [r, 128], so a contiguous block of
  rows == a contiguous block of heads when (Hkv/tp)*D % 128 == 0).
- q/k/v/attention-output [B, H, D] are sharded on the head dim; attention
  is embarrassingly parallel over heads (no collectives inside).
- Page tables / slot indices / seq_lens are replicated (host-produced
  scalars); every chip issues the same DMA pattern against its shard.
- The req_to_token table is replicated; the table-update kernels run
  identically on every chip (check_vma off: outputs are replicated by
  construction).

Reference analog: the per-rank attention/kv kernels under NCCL TP
(sgl-kernel decode kernels launched per GPU rank); here the "ranks" are
shard_map bodies inside one jitted program and XLA runs them SPMD.

Only pure-TP meshes (dp_size == 1) take this path: with a "dp" axis the
batch would be dp-sharded while the KV pool is dp-replicated, and each
replica's writes would diverge. dp>1 multi-device keeps the XLA fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_KV_SPEC = P(None, None, "tp", None)  # [L, S, r, ln] sharded on rows(=heads)
_HEAD_SPEC = P(None, "tp", None)  # [N, H, D] sharded on heads
_REP = P()


def tp_pallas_eligible(num_q_heads: int, num_kv_heads: int, head_dim: int,
                       tp_size: int, kv_itemsize: int) -> bool:
    """Can the Pallas kernel set run head-sharded at this tp size?

    Requires whole q/kv head groups per shard and a DMA-legal local row:
    (Hkv/tp)*D must stay a multiple of 128 lanes x the dtype's sublane
    packing (f32: 1, bf16: 2, fp8/int8: 4).
    """
    if num_q_heads % tp_size or num_kv_heads % tp_size:
        return False
    pack = max(1, 4 // kv_itemsize)
    unit = 128 * pack
    return ((num_kv_heads // tp_size) * head_dim) % unit == 0


def make_sharded_kv_write(mesh_ctx, base_impl):
    """Head-sharded wrapper with the kv_write signature
    (k_cache, v_cache, layer_idx, locs, k_new, v_new, num_valid)."""
    mesh = mesh_ctx.mesh

    def kv_write(k_cache, v_cache, layer_idx, locs, k_new, v_new, num_valid):
        f = jax.shard_map(
            base_impl,
            mesh=mesh,
            in_specs=(_KV_SPEC, _KV_SPEC, _REP, _REP, _HEAD_SPEC, _HEAD_SPEC,
                      _REP),
            out_specs=(_KV_SPEC, _KV_SPEC),
            check_vma=False,
        )
        return f(k_cache, v_cache, jnp.asarray(layer_idx, jnp.int32),
                 jnp.asarray(locs, jnp.int32), k_new, v_new,
                 jnp.asarray(num_valid, jnp.int32))

    return kv_write


def make_sharded_paged_attention(mesh_ctx, base_impl=None):
    """Head-sharded paged decode attention with the paged_decode_attention
    signature. `num_kv_heads` passed by the model is GLOBAL; each shard's
    kernel instance runs with Hkv/tp local heads (same GQA group size)."""
    from ltp_sglang_tpu.ops.attention.pallas_decode import paged_decode_attention

    base = base_impl or paged_decode_attention
    mesh = mesh_ctx.mesh
    tp = mesh_ctx.tp_size

    def paged_attn(q, k_cache, v_cache, layer_idx, pages, seq_lens, *,
                   page_size: int, num_kv_heads: int, sm_scale: float):
        local_kv = num_kv_heads // tp

        def inner(q_, kc, vc, li, pg, sl):
            return base(q_, kc, vc, li, pg, sl, page_size=page_size,
                        num_kv_heads=local_kv, sm_scale=sm_scale)

        f = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(_HEAD_SPEC, _KV_SPEC, _KV_SPEC, _REP, _REP, _REP),
            out_specs=_HEAD_SPEC,
            check_vma=False,
        )
        return f(q, k_cache, v_cache, jnp.asarray(layer_idx, jnp.int32),
                 pages, seq_lens)

    return paged_attn


def make_sharded_extend_attention(mesh_ctx, page_size: int, base_impl=None):
    """Head-sharded ragged extend attention with the paged_extend_attention
    signature; q/out [B, E, Hq, D] shard on the head dim, page table and
    length vectors replicate. `num_kv_heads` passed by the model is GLOBAL."""
    from ltp_sglang_tpu.ops.attention.pallas_extend import paged_extend_attention

    base = base_impl or paged_extend_attention
    mesh = mesh_ctx.mesh
    tp = mesh_ctx.tp_size
    q_spec = P(None, None, "tp", None)  # [B, E, Hq, D] on heads

    def extend_attn(q, k_cache, v_cache, layer_idx, pages, seq_lens,
                    q_pos_start, *, num_kv_heads: int, sm_scale: float):
        local_kv = num_kv_heads // tp

        def inner(q_, kc, vc, li, pg, sl, qp):
            return base(q_, kc, vc, li, pg, sl, qp, page_size=page_size,
                        num_kv_heads=local_kv, sm_scale=sm_scale)

        f = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(q_spec, _KV_SPEC, _KV_SPEC, _REP, _REP, _REP, _REP),
            out_specs=q_spec,
            check_vma=False,
        )
        return f(q, k_cache, v_cache, jnp.asarray(layer_idx, jnp.int32),
                 pages, seq_lens, q_pos_start)

    return extend_attn


def make_sharded_table_op(mesh_ctx, base_impl, n_args: int):
    """Replicated-everything wrapper for the req_to_token table kernels
    (table_write_rows / table_merge_window): every chip applies the same
    row updates to its replicated copy."""
    mesh = mesh_ctx.mesh
    specs = tuple(_REP for _ in range(n_args))

    def table_op(*args):
        # Static trailing args (k_window) stay out of the mapped arglist.
        dyn, static = args[:n_args], args[n_args:]
        f = jax.shard_map(
            lambda *a: base_impl(*a, *static),
            mesh=mesh,
            in_specs=specs,
            out_specs=_REP,
            check_vma=False,
        )
        return f(*dyn)

    return table_op
