"""Pipeline parallelism (inference): layer stages over the "pp" mesh axis.

Counterpart of the reference's PP scheduler loop (managers/scheduler.py:
815-945 event_loop_pp + pp_group send/recv of hidden states between ranks).
TPU redesign: ONE jitted program runs the whole 1F pipeline inside a
`shard_map` over the "pp" axis — every layer-stacked param leaf and the KV
cache shard their LAYER dimension, each stage scans only its local block,
and microbatched hidden states rotate stage-to-stage with `lax.ppermute`
over neighbor ICI links. No host hops, no per-stage processes, no NCCL
p2p: the classic (P + M - 1)-step schedule is a fori_loop.

Stage r processes microbatch (t - r) at pipeline step t; inactive steps
run on garbage (writes land in KV slot 0) — the standard bubble, traded
for a single fused program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _layer_specs(layers: Dict[str, Any]):
    """P('pp', ...) on the leading (layer) dim of every stacked leaf."""
    return jax.tree.map(
        lambda a: P(*(("pp",) + (None,) * (a.ndim - 1))), layers
    )


def pp_forward(
    model,
    mesh_ctx,
    params: Dict[str, Any],
    steps,  # StepArrays with a leading microbatch dim [M, Bm, ...]
    k_cache,  # [L, S, r, ln] sharded P("pp", ...)
    v_cache,
    kv_indices,  # [M, Bm, C]
    num_microbatches: int,
):
    """Returns (logits [M*Bm, V] replicated, k_cache, v_cache)."""
    mesh = mesh_ctx.mesh
    pp = mesh_ctx.pp_size
    M = num_microbatches
    layers = params["layers"]
    other = {k: v for k, v in params.items() if k != "layers"}
    rep = jax.tree.map(lambda a: P(), (steps, kv_indices, other))

    def stage_fn(layers_local, kc, vc, steps_r, kv_idx_r, other_r):
        r = jax.lax.axis_index("pp")
        Bm, E = steps_r.input_ids.shape[1:3]
        Dm = model.config.hidden_size
        V = other_r["embed"]["weight"].shape[0]
        p_local = dict(other_r)
        p_local["layers"] = layers_local

        def t_body(t, carry):
            h_cur, kc, vc, logits_acc = carry
            mb = jnp.clip(t - r, 0, M - 1)
            active = (t - r >= 0) & (t - r < M)
            step_mb = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb, 0, keepdims=False)
                if a is not None else None,
                steps_r,
            )
            kv_mb = jax.lax.dynamic_index_in_dim(kv_idx_r, mb, 0, keepdims=False)
            # Inactive steps write to the garbage slot and mask to empty seqs.
            step_mb = step_mb._replace(
                cache_locs=jnp.where(active, step_mb.cache_locs, 0),
                seq_lens=jnp.where(active, step_mb.seq_lens, 0),
                kv_indices=kv_mb,
            )
            emb = other_r["embed"]["weight"][step_mb.input_ids]
            if model.embed_multiplier != 1.0:
                emb = emb * jnp.asarray(model.embed_multiplier, emb.dtype)
            h_in = jnp.where(jnp.equal(r, 0), emb.astype(h_cur.dtype), h_cur)
            h_out, kc, vc = model.forward(
                p_local, step_mb, kc, vc, input_embeds=h_in, pp_raw_hidden=True
            )
            # Final stage: norm + head for its active microbatch.
            hn = model.norm(h_out, other_r["norm"])
            logits_mb = model._lm_head(p_local, hn, step_mb, False)
            take = active & (r == pp - 1)
            logits_acc = jax.lax.dynamic_update_index_in_dim(
                logits_acc,
                jnp.where(take, logits_mb.astype(jnp.float32),
                          jax.lax.dynamic_index_in_dim(logits_acc, mb, 0, False)),
                mb, 0,
            )
            h_next = jax.lax.ppermute(
                h_out, "pp", [(i, (i + 1) % pp) for i in range(pp)]
            )
            return h_next, kc, vc, logits_acc

        h0 = jnp.zeros((Bm, E, Dm), other_r["embed"]["weight"].dtype)
        logits0 = jnp.zeros((M, Bm, V), jnp.float32)
        _, kc, vc, logits_acc = jax.lax.fori_loop(
            0, pp + M - 1, t_body, (h0, kc, vc, logits0)
        )
        # Only the last stage holds real logits; psum replicates them.
        logits = jax.lax.psum(
            jnp.where(jnp.equal(r, pp - 1), logits_acc, 0.0), "pp"
        )
        return logits, kc, vc

    # Manual ONLY over "pp": tensor parallelism inside each stage stays
    # GSPMD (the stacked layer leaves keep their "tp" shardings on the
    # trailing dims; XLA inserts the tp collectives inside the manual
    # region). This is how pp composes with tp without hand-written
    # per-stage collectives (reference scheduler.py:815-945 composes the
    # same way via NCCL groups).
    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        axis_names=frozenset({"pp"}),
        in_specs=(
            _layer_specs(layers),
            P("pp"), P("pp"),
            rep[0], rep[1], rep[2],
        ),
        out_specs=(P(), P("pp"), P("pp")),
        check_vma=False,
    )
    logits, k_cache, v_cache = fn(
        layers, k_cache, v_cache, steps, kv_indices, other
    )
    Mv, Bm, V = logits.shape
    return logits.reshape(Mv * Bm, V), k_cache, v_cache
