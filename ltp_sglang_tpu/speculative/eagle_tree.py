"""EAGLE top-k TREE speculative decoding.

Reference: speculative/build_eagle_tree.py (tree construction + masks),
eagle_worker.py:506-643 (draft_forward topk expansion),
sgl-kernel/csrc/speculative/speculative_sampling.cu (tree verify + accept).
TPU redesign: the whole round — beam-style top-k draft expansion, global
candidate selection, tree-masked target verify, greedy longest-path accept,
and draft-KV refresh — is ONE jitted program with static (B, T, K, V) shapes:

- Draft phase keeps a T-lane frontier per request. Lane ancestry is pure
  index bookkeeping (`lane_slots` maps in-round tree positions to draft-KV
  slots; reselection gathers the parent lane's map), so no KV rows are ever
  copied on reshuffle — the reference instead re-assigns topk-duplicated
  cache locations (eagle_worker.py assign_draft_cache_locs).
- All T + (K-1)*T^2 candidates stay in a scored pool; the top V-1 by
  cumulative log-prob become the verify tree (ancestor-closed because a
  child's score never exceeds its parent's; orphans from score ties are
  masked out rather than patched).
- Verify runs the target once over V tree tokens with an ancestor-or-self
  mask threaded through StepArrays.spec_mask (ops/attention/reference.py);
  RoPE uses true depths while kv columns hold tree order.
- Accept = greedy walk: follow the child whose token equals the target's
  argmax at the current node; K iterations, fully vectorized.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.speculative.eagle_worker import EagleWorker

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EagleTreeRoundBatch:
    batch_size: int
    input_ids: np.ndarray  # [B] x_{s-1}
    h_prev: np.ndarray  # [B, Dm]
    seq0: np.ndarray  # [B]
    target_slots: np.ndarray  # [B, V]
    draft_keep: np.ndarray  # [B, K+1]
    target_req: np.ndarray  # [B]
    draft_req: np.ndarray  # [B]
    kv_bucket: int


class EagleTreeWorker(EagleWorker):
    kind = "eagle_tree"

    def __init__(self, runner, server_args):
        super().__init__(runner, server_args)
        self.topk = max(2, server_args.speculative_eagle_topk)
        T, K = self.topk, self.k
        pool = T + max(K - 1, 0) * T * T
        self.num_verify = min(
            max(2, server_args.speculative_num_draft_tokens), pool + 1
        )
        # Persistent per-round scratch slots for in-round lane KV (steps
        # 1..K-1 write T rows each); reused every round, never in the table.
        n_lane = runner.max_running_requests * T * max(K - 1, 1)
        lanes = self.draft.allocator.alloc(n_lane)
        assert lanes is not None, "draft pool too small for tree lanes"
        self._lane_scratch = np.asarray(lanes, np.int32)

    def _lane_slots_for(self, B: int) -> np.ndarray:
        T, K = self.topk, self.k
        need = B * T * max(K - 1, 1)
        assert need <= len(self._lane_scratch), (need, len(self._lane_scratch))
        return self._lane_scratch[:need].reshape(B, T * max(K - 1, 1))

    # ------------------------------------------------------------- round fn
    def _build_tree_round_fn(self, B: int, C: int, sampled: bool = False):
        t_model = self.runner.model
        head = self.draft.model
        table_merge = self._table_merge
        T, K, V = self.topk, self.k, self.num_verify
        P0 = T + max(K - 1, 0) * T * T

        # depth of pool node: first T entries depth 1, block j entries j+1.
        depth_const = np.ones((P0,), np.int32)
        for j in range(1, K):
            depth_const[T + (j - 1) * T * T : T + j * T * T] = j + 1
        depth_const = jnp.asarray(depth_const)

        def round_fn(tp, dp, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl,
                     input_ids, h_prev, seq0, t_slots, d_keep, lane_scratch,
                     t_req, d_req, temperatures, top_ps, top_ks, min_ps,
                     step_idx):
            cols = jnp.arange(C, dtype=jnp.int32)[None, :]
            start = jnp.maximum(seq0 - 1, 0)  # [B]
            # Head-policy hooks (eagle_worker.py): EAGLE-1/2 share the
            # TARGET's embed/norm/lm_head; EAGLE3/NEXTN bring their own
            # embed table + lm_head (reduced vocab + d2t for EAGLE3).
            emb_table = self._pair_embed_table(tp, dp)
            d_base = d_tbl[d_req, :C]  # [B, C]

            # ---------------- draft step 0 (B lanes: the committed token).
            d_kv0 = jnp.where(cols == start[:, None], d_keep[:, :1], d_base)
            step0 = StepArrays(
                input_ids[:, None], start[:, None], d_keep[:, :1],
                seq0, start, jnp.ones((B,), jnp.int32), d_kv0,
            )
            g0, d_kc, d_vc = head.forward(
                dp, emb_table[input_ids][:, None, :],
                h_prev[:, None, :].astype(emb_table.dtype), step0, d_kc, d_vc,
            )
            sc0, tok0, gn0 = self._tree_topk(tp, dp, g0[:, 0], T)  # [B, T]

            pool_tok = jnp.zeros((B, P0), jnp.int32).at[:, :T].set(tok0)
            pool_score = jnp.full((B, P0), -1e30, jnp.float32).at[:, :T].set(sc0)
            pool_parent = jnp.full((B, P0), -1, jnp.int32)

            frontier_tok = tok0
            frontier_hid = jnp.broadcast_to(
                gn0[:, None, :], (B, T, gn0.shape[-1])
            ).astype(h_prev.dtype)
            lane_cum = sc0
            lane_pool_idx = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None, :], (B, T)
            )
            # In-round position t (absolute pos start+t) -> draft slot, per
            # lane. t=0 is the shared step-0 slot.
            lane_slots = jnp.zeros((B, T, K), jnp.int32).at[:, :, 0].set(
                jnp.broadcast_to(d_keep[:, :1], (B, T))
            )

            def expand(j, carry):
                (pool_tok, pool_score, pool_parent, frontier_tok,
                 frontier_hid, lane_cum, lane_pool_idx, lane_slots,
                 d_kc, d_vc) = carry
                slots_j = jax.lax.dynamic_index_in_dim(
                    lane_scratch.reshape(B, max(K - 1, 1), T), j - 1,
                    axis=1, keepdims=False,
                )  # [B, T]
                lane_slots = jax.lax.dynamic_update_index_in_dim(
                    lane_slots, slots_j, j, axis=2
                )
                # Per-lane kv map: shared prefix + own ancestors at columns
                # [start, start+j].
                off = jnp.clip(cols[None] - start[:, None, None], 0, K - 1)
                in_round = (cols[None] >= start[:, None, None]) & (
                    cols[None] <= start[:, None, None] + j
                )  # [B, 1, C] broadcast over lanes below
                lane_map = jnp.take_along_axis(
                    lane_slots, jnp.broadcast_to(off, (B, T, C)), axis=2
                )
                kv_idx = jnp.where(
                    jnp.broadcast_to(in_round, (B, T, C)), lane_map,
                    jnp.broadcast_to(d_base[:, None, :], (B, T, C)),
                ).reshape(B * T, C)
                pos = jnp.broadcast_to((start + j)[:, None], (B, T)).reshape(-1)
                step = StepArrays(
                    frontier_tok.reshape(-1, 1), pos[:, None],
                    slots_j.reshape(-1, 1),
                    jnp.broadcast_to((seq0 + j)[:, None], (B, T)).reshape(-1),
                    pos, jnp.ones((B * T,), jnp.int32), kv_idx,
                )
                g, d_kc, d_vc = head.forward(
                    dp, emb_table[frontier_tok.reshape(-1)][:, None, :],
                    frontier_hid.reshape(B * T, 1, -1).astype(emb_table.dtype),
                    step, d_kc, d_vc,
                )
                csc, ctok, gn = self._tree_topk(tp, dp, g[:, 0], T)  # [B*T, T]
                cand_cum = (lane_cum.reshape(-1, 1) + csc).reshape(B, T * T)
                ctok = ctok.reshape(B, T * T)
                cand_parent = jnp.repeat(lane_pool_idx, T, axis=1)  # [B, T*T]

                off0 = T + (j - 1) * T * T
                pool_tok = jax.lax.dynamic_update_slice(pool_tok, ctok, (0, off0))
                pool_score = jax.lax.dynamic_update_slice(
                    pool_score, cand_cum, (0, off0))
                pool_parent = jax.lax.dynamic_update_slice(
                    pool_parent, cand_parent, (0, off0))

                new_cum, sel = jax.lax.top_k(cand_cum, T)  # [B, T]
                parent_lane = sel // T
                frontier_tok = jnp.take_along_axis(ctok, sel, axis=1)
                gn_l = gn.reshape(B, T, -1)
                frontier_hid = jnp.take_along_axis(
                    gn_l, parent_lane[:, :, None], axis=1
                ).astype(h_prev.dtype)
                lane_pool_idx = off0 + sel
                lane_slots = jnp.take_along_axis(
                    lane_slots, parent_lane[:, :, None], axis=1
                )
                return (pool_tok, pool_score, pool_parent, frontier_tok,
                        frontier_hid, new_cum, lane_pool_idx, lane_slots,
                        d_kc, d_vc)

            if K > 1:
                (pool_tok, pool_score, pool_parent, frontier_tok, frontier_hid,
                 lane_cum, lane_pool_idx, lane_slots, d_kc, d_vc) = (
                    jax.lax.fori_loop(
                        1, K, expand,
                        (pool_tok, pool_score, pool_parent, frontier_tok,
                         frontier_hid, lane_cum, lane_pool_idx, lane_slots,
                         d_kc, d_vc),
                    )
                )

            # ---------------- verify-set selection (top V-1 by cum score).
            _, sel = jax.lax.top_k(pool_score, V - 1)
            sel = jnp.sort(sel, axis=1)  # [B, V-1] ascending pool indices
            tok_sel = jnp.take_along_axis(pool_tok, sel, axis=1)
            dep_sel = depth_const[sel]
            par_sel = jnp.take_along_axis(pool_parent, sel, axis=1)
            # Pool-parent -> verify coords; orphans (parent not selected,
            # possible only on score ties) are masked out of the walk.
            pos_in_sel = jax.vmap(jnp.searchsorted)(sel, jnp.maximum(par_sel, 0))
            pos_in_sel = jnp.minimum(pos_in_sel, V - 2)
            parent_found = (
                jnp.take_along_axis(sel, pos_in_sel, axis=1) == par_sel
            )
            is_root_child = par_sel < 0
            node_ok = is_root_child | parent_found
            parent_v = jnp.where(is_root_child, 0, pos_in_sel + 1)  # [B, V-1]
            parent_v = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), parent_v.astype(jnp.int32)], axis=1
            )  # [B, V]; root's parent = itself
            token_v = jnp.concatenate([input_ids[:, None], tok_sel], axis=1)
            depth_v = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), dep_sel], axis=1
            )
            ok_v = jnp.concatenate(
                [jnp.ones((B, 1), bool), node_ok], axis=1
            )

            # Ancestor-or-self mask [B, V, V] by K-step parent-pointer walk.
            anc = jnp.broadcast_to(jnp.eye(V, dtype=bool)[None], (B, V, V))
            ptr = jnp.broadcast_to(
                jnp.arange(V, dtype=jnp.int32)[None], (B, V)
            )
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (B, V, V), 2)
            for _ in range(K):
                ptr = jnp.take_along_axis(parent_v, ptr, axis=1)
                anc = anc | (col_iota == ptr[:, :, None])

            # ---------------- target verify over the tree.
            pos_v = start[:, None] + depth_v  # true positions (RoPE)
            t_base = t_tbl[t_req, :C]
            off_v = jnp.clip(cols - start[:, None], 0, V - 1)
            t_kv_idx = jnp.where(
                (cols >= start[:, None]) & (cols < start[:, None] + V),
                jnp.take_along_axis(t_slots, off_v, axis=1),
                t_base,
            )
            stepv = StepArrays(
                token_v, pos_v, t_slots,
                start + V, start, jnp.full((B,), V, jnp.int32), t_kv_idx,
                spec_mask=anc,
            )
            if self.wants_aux:
                # EAGLE3: the target also returns its concat aux hiddens
                # (models/llama.py return_aux) for the next draft pairs.
                hid_t, aux_t, t_kc, t_vc = t_model.forward(
                    tp, stepv, t_kc, t_vc, return_hidden=True, return_aux=True
                )  # [B, V, Dm], [B, V, 3*Dm]
            else:
                hid_t, t_kc, t_vc = t_model.forward(
                    tp, stepv, t_kc, t_vc, return_hidden=True
                )  # [B, V, Dm]
                aux_t = hid_t
            logits_v = t_model._lm_head(tp, hid_t, stepv, True)  # [B, V, Vocab]
            pair_hid = self._prep_hidden(dp, aux_t)  # [B, V, Dm] draft pairs

            if sampled:
                # Ordered sibling-exclusion accept (sampled tree verify —
                # reference tree_speculative_sampling_target_only semantics;
                # greedy rows reduce to the longest-path walk below).
                from ltp_sglang_tpu.speculative.spec_sampling import (
                    spec_accept_tree,
                )

                rkey = jax.random.fold_in(self.runner._rng_key, step_idx)
                preds_path, acc, path = spec_accept_tree(
                    logits_v, token_v, parent_v, ok_v, K,
                    temperatures, top_ps, top_ks, min_ps, rkey,
                )
            else:
                preds_v = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)

                # ---------------- greedy longest-path accept.
                cur = jnp.zeros((B,), jnp.int32)
                acc = jnp.zeros((B,), jnp.int32)
                alive = jnp.ones((B,), bool)
                path = jnp.zeros((B, K + 1), jnp.int32)
                vv = jnp.arange(V, dtype=jnp.int32)[None, :]
                for t in range(1, K + 1):
                    want = jnp.take_along_axis(preds_v, cur[:, None], axis=1)
                    is_child = (
                        (parent_v == cur[:, None]) & (token_v == want)
                        & ok_v & (vv > 0)
                    )
                    has = jnp.any(is_child, axis=1)
                    nxt = jnp.argmax(is_child, axis=1).astype(jnp.int32)
                    alive = alive & has
                    cur = jnp.where(alive, nxt, cur)
                    acc = acc + alive.astype(jnp.int32)
                    path = path.at[:, t].set(jnp.where(alive, nxt, 0))

                preds_path = jnp.take_along_axis(preds_v, path, axis=1)
            h_next = jnp.take_along_axis(
                pair_hid, jnp.take_along_axis(path, acc[:, None], axis=1)[
                    :, :, None], axis=1
            )[:, 0].astype(jnp.float32)

            # Commit the accepted chain into the target table.
            slots_path = jnp.take_along_axis(t_slots, path, axis=1)  # [B, K+1]
            t_tbl = table_merge(t_tbl, t_req, start, slots_path, K + 1)

            # ---------------- draft refresh along the accepted path.
            d_off = jnp.clip(cols - start[:, None], 0, K)
            d_kv_idx = jnp.where(
                (cols >= start[:, None]) & (cols < start[:, None] + K + 1),
                jnp.take_along_axis(d_keep, d_off, axis=1),
                d_base,
            )
            t_idx = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]
            validr = t_idx <= acc[:, None]
            ref_slots = jnp.where(validr, d_keep[:, 1:], 0)
            ref_pos = start[:, None] + t_idx
            # Token at position start+t is preds_path[:, t-1]; its pair
            # hidden is the PREVIOUS position's, i.e. hid_t at path[t-1].
            ref_tok = preds_path[:, :K]
            ref_hid = jnp.take_along_axis(
                pair_hid, path[:, :K, None], axis=1
            )
            step_r = StepArrays(
                ref_tok, ref_pos, ref_slots,
                seq0 + jnp.minimum(acc, K), start,
                jnp.maximum(acc, 1), d_kv_idx,
            )
            _, d_kc, d_vc = head.forward(
                dp, emb_table[ref_tok], ref_hid.astype(emb_table.dtype),
                step_r, d_kc, d_vc,
            )
            d_tbl = table_merge(d_tbl, d_req, start, d_keep, K + 1)

            return (preds_path, acc, path, h_next,
                    t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl)

        return jax.jit(round_fn, donate_argnums=(2, 3, 4, 5, 6, 7))

    # ------------------------------------------------------------- run round
    def run_round(self, rb: EagleTreeRoundBatch, sampling_info=None):
        B = rb.target_slots.shape[0]
        sampled = sampling_info is not None and not sampling_info.is_all_greedy
        key = ("eagle_tree_round", B, rb.kv_bucket, sampled)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build_tree_round_fn(B, rb.kv_bucket, sampled=sampled)
            self._fn_cache[key] = fn
            logger.info(
                "compiling eagle tree round fn B=%d T=%d K=%d V=%d C=%d sampled=%s",
                B, self.topk, self.k, self.num_verify, rb.kv_bucket, sampled,
            )
        r = self.runner
        d = self.draft
        if sampling_info is not None:
            si_arrays = (sampling_info.temperatures, sampling_info.top_ps,
                         sampling_info.top_ks, sampling_info.min_ps)
        else:
            ones = np.ones((B,), np.float32)
            si_arrays = (ones, ones, np.ones((B,), np.int32),
                         np.zeros((B,), np.float32))
        self._step_counter = getattr(self, "_step_counter", 0) + 1
        (preds_path, acc, path, h_next, r.k_cache, r.v_cache, r.req_table,
         d.k_cache, d.v_cache, d.req_table) = fn(
            r.params, d.params,
            r.k_cache, r.v_cache, r.req_table,
            d.k_cache, d.v_cache, d.req_table,
            rb.input_ids, rb.h_prev, rb.seq0, rb.target_slots, rb.draft_keep,
            self._lane_slots_for(B), rb.target_req, rb.draft_req,
            *si_arrays, np.int32(self._step_counter),
        )
        n = rb.batch_size
        preds_path = np.asarray(preds_path)[:n]
        acc = np.asarray(acc)[:n]
        path = np.asarray(path)[:n]
        h_next = np.asarray(h_next)[:n]
        self.num_rounds += 1
        self.num_accepted_tokens += int(acc.sum())
        self.num_committed_tokens += int(acc.sum() + n)
        return preds_path, acc, path, h_next


from ltp_sglang_tpu.speculative.eagle3 import Eagle3Worker  # noqa: E402
from ltp_sglang_tpu.speculative.nextn import NextNWorker  # noqa: E402


class Eagle3TreeWorker(EagleTreeWorker, Eagle3Worker):
    """EAGLE3 head under the top-k tree driver (the reference runs its
    tree for every draft type, eagle_worker.py:506): proposal via the
    head's own reduced-vocab lm_head + d2t (Eagle3Worker._tree_topk),
    verify captures the target's concat aux hiddens (wants_aux) for the
    fc-mapped next pairs."""

    kind = "eagle_tree"


class NextNTreeWorker(EagleTreeWorker, NextNWorker):
    """DeepSeek NEXTN (MTP) head under the top-k tree driver: full-vocab
    own lm_head (identity token map), pairs with the target's
    post-final-norm hidden, MLA latent draft KV rows
    (NextNWorker._head_kv_elems)."""

    kind = "eagle_tree"
