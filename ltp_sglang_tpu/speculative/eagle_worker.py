"""EAGLE chain speculative decoding (feature-level draft head).

Reference: speculative/eagle_worker.py:68 (EAGLEWorker). The draft is a
single FC-fused decoder layer (eagle_head.py) that autoregresses in feature
space: position i's KV entry is computed from (embed(x_i), h_{i-1}) where h
is the target's post-final-norm hidden state for committed tokens and the
head's own output hidden while chaining drafts. Verification is exact, so
every approximation here (radix-hit prompt positions missing from the draft
cache, draft-hidden pairs for not-yet-refreshed positions) only affects
acceptance rate, never output correctness.

One jitted program per round:
  1. chain K draft steps (j=0 processes position s-1 with the carried target
     hidden h_{s-2}; j>0 feed the head its own hidden);
  2. one K+1-token target verify that also returns hidden states;
  3. accept the longest agreeing prefix + bonus;
  4. refresh the draft KV for accepted positions with (committed-token
     embed, target hidden) pairs — masked to the garbage slot beyond the
     accepted length — restoring the draft-cache invariant for round r+1.

Prompt coverage: after each target prefill chunk the scheduler hands the
hidden states to `on_prefill`, which runs the head over positions 1..P-1
(position 0 has no predecessor hidden and stays at the zero garbage slot).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.mem_cache.allocator import TokenToKVPoolAllocator
from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool
from ltp_sglang_tpu.models.llama import StepArrays
from ltp_sglang_tpu.ops.kv_cache_ops import _row_dims, get_kv_cache_ops
from ltp_sglang_tpu.speculative.eagle_head import EagleDraftHead

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EagleRoundBatch:
    batch_size: int
    input_ids: np.ndarray  # [B] x_{s-1}
    h_prev: np.ndarray  # [B, Dm] target hidden of x_{s-2}
    seq0: np.ndarray  # [B] committed length s
    target_slots: np.ndarray  # [B, K+1]
    draft_slots: np.ndarray  # [B, K+1]
    target_req: np.ndarray  # [B]
    draft_req: np.ndarray  # [B]
    kv_bucket: int


class EagleState:
    """1-layer draft KV pool + page table for the eagle head."""

    def __init__(self, head_config: ModelConfig, server_args, num_tokens: int,
                 max_reqs: int, table_width: int, kv_dtype, use_pallas: bool,
                 head_cls=None):
        from ltp_sglang_tpu.model_loader.loader import load_model_weights
        from ltp_sglang_tpu.ops.kv_cache_ops import kv_write_pallas, kv_write_xla

        self.model = (head_cls or EagleDraftHead)(
            head_config,
            kv_write_impl=kv_write_pallas if use_pallas else kv_write_xla,
        )
        self.params = load_model_weights(
            self.model,
            head_config.model_path,
            load_format=server_args.load_format
            if server_args.load_format != "auto"
            else "auto",
            seed=server_args.random_seed + 1,
        )
        # Heads with asymmetric K/V rows (NEXTN's MLA latent) override
        # kv_row_elems, like target models do (model_runner.py:613).
        if hasattr(self.model, "kv_row_elems"):
            k_e, v_e = self.model.kv_row_elems()
        else:
            k_e = v_e = head_config.num_kv_heads * head_config.head_dim
        rk, lnk = _row_dims(k_e)
        rv, lnv = _row_dims(v_e)
        S = num_tokens + 1
        self.k_cache = jnp.zeros((1, S, rk, lnk), dtype=kv_dtype)
        self.v_cache = jnp.zeros((1, S, rv, lnv), dtype=kv_dtype)
        self.req_table = jnp.zeros((max_reqs + 1, table_width), dtype=jnp.int32)
        self.req_to_token = ReqToTokenPool(max_reqs, table_width)
        self.allocator = TokenToKVPoolAllocator(num_tokens)
        self.dump_row = max_reqs


class EagleWorker:
    kind = "eagle"
    needs_host_catchup = False
    head_cls = None  # eagle3/nextn subclasses override
    # Verify captures the target's concat aux hiddens for the next draft
    # pair (EAGLE3 sets True; EAGLE-1/2 and NEXTN pair with post-norm).
    wants_aux = False
    # Eagle-family workers cover prompt positions in the draft cache from
    # the target prefill's hiddens (scheduler want_hidden path).
    covers_prompt = True

    def _head_kv_elems(self, head_cfg: ModelConfig):
        """K/V row elems of the draft cache (pre-model-build use only;
        NEXTN overrides for the MLA latent row)."""
        e = head_cfg.num_kv_heads * head_cfg.head_dim
        return e, e

    def __init__(self, runner, server_args):
        self.runner = runner
        self.server_args = server_args
        self.k = max(1, server_args.speculative_num_steps)
        head_path = server_args.speculative_draft_model_path or server_args.model_path
        head_cfg = ModelConfig.from_model_path(
            head_path, dtype=server_args.dtype,
            context_length=runner.model_config.context_len,
        )
        use_pallas = jax.default_backend() == "tpu" and (
            runner.mesh_ctx is None or runner.mesh_ctx.is_single_device
        )
        if use_pallas:
            k_e, v_e = self._head_kv_elems(head_cfg)
            use_pallas = k_e % 128 == 0 and v_e % 128 == 0
        self.draft = EagleState(
            head_cfg, server_args,
            num_tokens=runner.max_total_num_tokens,
            max_reqs=runner.max_running_requests,
            table_width=runner.table_width,
            kv_dtype=runner.kv_dtype,
            use_pallas=use_pallas,
            head_cls=self.head_cls,
        )
        _, self._table_rows, self._table_merge = get_kv_cache_ops(
            "tpu" if use_pallas else "cpu"
        )
        self._fn_cache: Dict[Tuple, Any] = {}
        self.num_rounds = 0
        self.num_accepted_tokens = 0
        self.num_committed_tokens = 0

    # --------------------------------------------------------- prompt prefill
    def on_prefill(self, batch, fb, hidden):
        """Cover prompt positions in the draft cache using the target prefill's
        hidden states (device array [B, E, Dm]). Called per prefill chunk."""
        d = self.draft
        reqs = batch.reqs
        n = len(reqs)
        B, E = fb.input_ids.shape
        # Host slot assignment per request for its computed extend span.
        starts = np.zeros((B,), np.int32)
        counts = np.zeros((B,), np.int32)
        rows = np.full((B,), d.dump_row, np.int32)
        # Pair-space carry (Dm even when `hidden` is the eagle3 3*Dm aux).
        h_carry = np.zeros(
            (B, self.runner.model_config.hidden_size), np.float32
        )
        for i, r in enumerate(reqs):
            if r.spec_draft_req_idx is None:
                s = d.req_to_token.alloc(1)
                assert s is not None, "eagle draft request pool exhausted"
                r.spec_draft_req_idx = s[0]
                r.spec_draft_len = 0
            rows[i] = r.spec_draft_req_idx
            if r.spec_hidden is not None:
                h_carry[i] = r.spec_hidden
            # The target computed positions [prefix, prefix+extend) this chunk.
            # Draft pair for position p needs (emb(x_p), h_{p-1}): coverable
            # for p in [max(prefix,1), prefix+extend) — position 0 has no
            # predecessor; radix-hit prefixes (prefix>0 without a prior chunk)
            # stay uncovered, costing acceptance only.
            p0 = int(fb.prefix_lens[i])
            ext = int(fb.extend_lens[i])
            a = max(p0, 1)
            cov_end = p0 + ext
            cnt = max(cov_end - a, 0)
            slots = d.allocator.alloc(cnt) if cnt else []
            assert slots is not None, "eagle draft KV pool exhausted"
            if cnt:
                d.req_to_token.req_to_token[r.spec_draft_req_idx, a:cov_end] = slots
            starts[i], counts[i] = a, cnt
            r.spec_draft_len = cov_end
        # Device extend over the head: pairs (emb(ids[:, i]), hidden[:, i-1]).
        key = ("eagle_prefill", B, E, fb.kv_bucket)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build_prefill_fn(E, fb.kv_bucket)
            self._fn_cache[key] = fn
            logger.info("compiling eagle prefill fn B=%d E=%d C=%d", B, E, fb.kv_bucket)
        slot_mat = np.zeros((B, E), np.int32)
        for i in range(n):  # pad lanes keep the garbage slot 0
            row = d.req_to_token.req_to_token[rows[i]]
            if counts[i]:
                slot_mat[i, :counts[i]] = row[starts[i]:starts[i] + counts[i]]
        kv_idx = d.req_to_token.req_to_token[
            np.minimum(rows, d.req_to_token.size - 1), :fb.kv_bucket
        ].copy()
        h_last, d.k_cache, d.v_cache, d.req_table = fn(
            self.runner.params, d.params, d.k_cache, d.v_cache, d.req_table,
            fb.input_ids, hidden, h_carry, np.ascontiguousarray(kv_idx),
            slot_mat, rows, starts, counts, fb.prefix_lens, fb.extend_lens,
        )
        h_last = np.asarray(h_last)
        for i, r in enumerate(reqs):
            # Hidden of the LAST computed token this chunk (h_{p0+ext-1}),
            # carried as h_prev for the first spec round.
            r.spec_hidden = h_last[i]

    def _prep_hidden(self, dp, hid):
        """Map the target-side hidden handed to the draft into the head's
        pair space. Identity for EAGLE-1/2 (post-norm hidden); EAGLE3
        overrides with fc over the concat aux hiddens [.., 3D] -> [.., D]."""
        return hid

    def _pair_embed_table(self, tp, dp):
        """Embedding table for the draft's (embed, hidden) pairs: the
        TARGET's for EAGLE-1/2 heads (no own table), the draft's own for
        EAGLE3."""
        return tp["embed"]["weight"]

    def _tree_topk(self, tp, dp, g, T):
        """Tree-draft proposal from the head output `g` [N, Dm] (raw
        residual stream): returns (scores [N, T] log-probs, TARGET-vocab
        tokens [N, T], and the hidden the next draft step pairs with).
        EAGLE-1/2 heads predict the target's pre-norm hidden, so the
        proposal distribution is the TARGET's norm + lm_head and the next
        pair hidden is the NORMED prediction; EAGLE3/NEXTN override with
        their own lm_head (reduced vocab + d2t map for EAGLE3) and feed
        the raw residual stream forward (speculative/eagle3.py)."""
        from ltp_sglang_tpu.layers.norm import rms_norm

        t_model = self.runner.model
        gn = rms_norm(g, tp["norm"], t_model.rms_eps)
        lp = jax.nn.log_softmax(t_model._lm_head(tp, gn, None, True), axis=-1)
        sc, tok = jax.lax.top_k(lp, T)
        return sc, tok, gn

    def _build_prefill_fn(self, E, C):
        head = self.draft.model
        table_rows = self._table_rows

        def fn(tp, dp, kc, vc, tbl, ids, hid_t, h_carry, kv_idx_in, slots,
               rows, starts, counts, prefix_lens, extend_lens):
            hid_t = self._prep_hidden(dp, hid_t)
            emb = self._pair_embed_table(tp, dp)[ids]  # [B, E, Dm] pairs
            # Slot i holds position p = starts+i, chunk index q = p - prefix.
            # Pair(p) = (emb[q], h_{p-1}) with h_{p-1} = hid_t[q-1] for q>=1
            # and the carried previous-chunk hidden for q == 0.
            q = (starts - prefix_lens)[:, None] + jnp.arange(E, dtype=jnp.int32)[None, :]
            qc = jnp.clip(q, 0, E - 1)
            emb_p = jnp.take_along_axis(emb, qc[:, :, None], axis=1)
            hid_shift = jnp.concatenate(
                [h_carry[:, None, :].astype(hid_t.dtype), hid_t[:, :-1]], axis=1
            )
            hid_p = jnp.take_along_axis(hid_shift, qc[:, :, None], axis=1)
            positions = starts[:, None] + jnp.arange(E, dtype=jnp.int32)[None, :]
            tbl = table_rows(tbl, rows, kv_idx_in)
            step = StepArrays(
                input_ids=ids,  # unused (embeds passed directly)
                positions=positions,
                cache_locs=slots,
                seq_lens=starts + counts,
                prefix_lens=starts,
                extend_lens=jnp.maximum(counts, 1),
                kv_indices=kv_idx_in,
                lora_ids=None,
            )
            _, kc, vc = head.forward(
                dp, emb_p.astype(emb.dtype), hid_p.astype(emb.dtype), step, kc, vc
            )
            # Hidden of the last computed target position (chunk carry / the
            # first spec round's h_prev).
            last = jnp.maximum(extend_lens - 1, 0)
            h_last = jnp.take_along_axis(hid_t, last[:, None, None], axis=1)[:, 0]
            return h_last.astype(jnp.float32), kc, vc, tbl

        return jax.jit(fn, donate_argnums=(2, 3, 4))

    # ------------------------------------------------------------- spec round
    def _build_round_fn(self, B, K, C, sampled: bool = False):
        t_model = self.runner.model
        head = self.draft.model
        table_merge = self._table_merge

        def lm_logits(tp, h):
            # h: [..., Dm] post-final-norm hidden -> vocab logits.
            if t_model.tie_word_embeddings:
                return jnp.einsum(
                    "...d,vd->...v", h, tp["embed"]["weight"],
                    preferred_element_type=jnp.float32,
                )
            return jnp.einsum(
                "...d,dv->...v", h, tp["lm_head"]["kernel"],
                preferred_element_type=jnp.float32,
            )

        def round_fn(tp, dp, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl,
                     input_ids, h_prev, seq0, t_slots, d_slots, t_req, d_req,
                     temperatures, top_ps, top_ks, min_ps, step_idx):
            from ltp_sglang_tpu.layers.norm import rms_norm

            cols = jnp.arange(C, dtype=jnp.int32)[None, :]
            start = jnp.maximum(seq0 - 1, 0)[:, None]
            d_base = d_tbl[d_req, :C]
            off = jnp.clip(cols - start, 0, K)
            d_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K + 1),
                jnp.take_along_axis(d_slots, off, axis=1),
                d_base,
            )
            emb_table = tp["embed"]["weight"]

            def draft_body(j, carry):
                tok, hid, kc, vc, drafts = carry
                pos = jnp.maximum(seq0 - 1 + j, 0)
                slot_j = jax.lax.dynamic_slice_in_dim(d_slots, j, 1, axis=1)
                step = StepArrays(
                    tok[:, None], pos[:, None], slot_j,
                    seq0 + j, jnp.maximum(seq0 + j - 1, 0),
                    jnp.ones((B,), jnp.int32), d_kv_idx,
                )
                emb = emb_table[tok][:, None, :]  # [B, 1, Dm]
                g, kc, vc = head.forward(
                    dp, emb, hid[:, None, :].astype(emb.dtype), step, kc, vc
                )
                g = g[:, 0]  # [B, Dm]
                gn = rms_norm(g, tp["norm"], t_model.rms_eps)
                nxt = jnp.argmax(lm_logits(tp, gn), axis=-1).astype(jnp.int32)
                drafts = jax.lax.dynamic_update_slice(drafts, nxt[:, None], (0, j))
                return nxt, gn.astype(h_prev.dtype), kc, vc, drafts

            drafts0 = jnp.zeros((B, K), jnp.int32)
            _, _, d_kc, d_vc, drafts = jax.lax.fori_loop(
                0, K, draft_body, (input_ids, h_prev, d_kc, d_vc, drafts0)
            )

            # ---- target verify (also returns post-norm hiddens).
            ver_ids = jnp.concatenate([input_ids[:, None], drafts], axis=1)
            pos = jnp.maximum(
                seq0[:, None] - 1 + jnp.arange(K + 1, dtype=jnp.int32)[None, :], 0
            )
            t_base = t_tbl[t_req, :C]
            t_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K + 1),
                jnp.take_along_axis(t_slots, off, axis=1),
                t_base,
            )
            step = StepArrays(
                ver_ids, pos, t_slots,
                seq0 + K, jnp.maximum(seq0 - 1, 0),
                jnp.full((B,), K + 1, jnp.int32), t_kv_idx,
            )
            hid_t, t_kc, t_vc = t_model.forward(
                tp, step, t_kc, t_vc, return_hidden=True
            )  # [B, K+1, Dm]
            ver_logits = lm_logits(tp, hid_t)  # [B, K+1, V]
            t_tbl = table_merge(
                t_tbl, t_req, jnp.maximum(seq0 - 1, 0), t_slots, K + 1
            )

            if sampled:
                # Target-only rejection-sampling accept (preds[:, t<accepted]
                # are the drafts, so the draft-KV refresh below — which only
                # consumes ver_ids for t <= accepted — stays exact).
                from ltp_sglang_tpu.speculative.spec_sampling import (
                    spec_accept_chain,
                    spec_accept_chain_free,
                )

                rkey = jax.random.fold_in(self.runner._rng_key, step_idx)
                if sampled == "free":
                    preds, accepted = spec_accept_chain_free(
                        ver_logits, drafts, temperatures, top_ks, rkey
                    )
                else:
                    preds, accepted = spec_accept_chain(
                        ver_logits, drafts, temperatures, top_ps, top_ks,
                        min_ps, rkey,
                    )
            else:
                preds = jnp.argmax(ver_logits, axis=-1).astype(jnp.int32)
                match = preds[:, :K] == drafts
                accepted = jnp.sum(
                    jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
                )

            # ---- draft KV refresh for accepted positions (t = 1..K writes
            # position s+t-1 at slot t; masked to the garbage slot beyond).
            t_idx = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]  # [1, K]
            valid = t_idx <= accepted[:, None]
            ref_slots = jnp.where(valid, d_slots[:, 1:], 0)
            ref_pos = jnp.maximum(seq0[:, None] - 1 + t_idx, 0)
            ref_emb = emb_table[ver_ids[:, 1:]]  # emb of committed tokens
            ref_hid = hid_t[:, :K]  # hidden of the previous position
            step_r = StepArrays(
                ver_ids[:, 1:], ref_pos, ref_slots,
                seq0 + jnp.minimum(accepted, K), jnp.maximum(seq0 - 1, 0),
                jnp.maximum(accepted, 1), d_kv_idx,
            )
            _, d_kc, d_vc = head.forward(
                dp, ref_emb, ref_hid.astype(ref_emb.dtype), step_r, d_kc, d_vc
            )
            d_tbl = table_merge(
                d_tbl, d_req, jnp.maximum(seq0 - 1, 0), d_slots, K + 1
            )
            h_next = jnp.take_along_axis(
                hid_t, accepted[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            return preds, accepted, h_next, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl

        return jax.jit(round_fn, donate_argnums=(2, 3, 4, 5, 6, 7))

    def run_round(self, rb: EagleRoundBatch, sampling_info=None):
        B, K1 = rb.target_slots.shape
        K = K1 - 1
        sampled = (
            sampling_info.sampler_kind
            if sampling_info is not None and not sampling_info.is_all_greedy
            else False
        )
        key = ("eagle_round", B, K, rb.kv_bucket, sampled)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build_round_fn(B, K, rb.kv_bucket, sampled=sampled)
            self._fn_cache[key] = fn
            logger.info("compiling eagle round fn B=%d K=%d C=%d sampled=%s",
                        B, K, rb.kv_bucket, sampled)
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
        (preds, accepted, h_next, r.k_cache, r.v_cache, r.req_table,
         d.k_cache, d.v_cache, d.req_table) = fn(
            r.params, d.params,
            r.k_cache, r.v_cache, r.req_table,
            d.k_cache, d.v_cache, d.req_table,
            rb.input_ids, rb.h_prev, rb.seq0, rb.target_slots, rb.draft_slots,
            rb.target_req, rb.draft_req,
            *si_arrays, np.int32(self._step_counter),
        )
        preds = np.asarray(preds)[: rb.batch_size]
        accepted = np.asarray(accepted)[: rb.batch_size]
        h_next = np.asarray(h_next)[: rb.batch_size]
        self.num_rounds += 1
        self.num_accepted_tokens += int(accepted.sum())
        self.num_committed_tokens += int(accepted.sum() + rb.batch_size)
        return preds, accepted, h_next

    @property
    def avg_accept_length(self) -> float:
        return self.num_committed_tokens / max(self.num_rounds, 1)
