"""Speculative decoding: draft-model chain speculation with one-shot verify.

Counterpart of the reference's speculative/ package (EAGLEWorker,
eagle_worker.py:68; algorithm enum incl. STANDALONE, spec_info.py). This
implements the STANDALONE algorithm (an independent smaller causal LM drafts
K tokens autoregressively; the target verifies the whole chain in a single
K+1-token extend and commits the longest agreeing prefix plus one bonus
token). The chain is the topk=1 degenerate case of the EAGLE tree — the
verify pass needs no custom mask, so the whole round is ONE jitted device
program (draft fori-loop + target verify + accept), the TPU translation of
the reference's draft-CUDA-graph + verify + tree-accept kernel pipeline.

KV bookkeeping follows the reference's allocator backup/restore idea in
paged form: all K+1 target slots (and K draft slots) are pre-allocated; the
host frees the slots of rejected positions after each round
(SURVEY §3.4; eagle KV rollback).

Greedy-only for now (temperature spec sampling = follow-up); the scheduler
falls back to the normal decode path for non-greedy batches.
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
from ltp_sglang_tpu.models.registry import resolve_model_cls
from ltp_sglang_tpu.ops.kv_cache_ops import _row_dims, get_kv_cache_ops
from ltp_sglang_tpu.utils import round_up

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SpecRoundBatch:
    """Host description of one speculation round (padded to bucket B)."""

    batch_size: int
    input_ids: np.ndarray  # [B] last committed token x_{s-1}
    seq0: np.ndarray  # [B] committed seqlen (incl. pending input token)
    target_slots: np.ndarray  # [B, K+1] for positions s-1 .. s+K-1
    draft_slots: np.ndarray  # [B, K] for positions s-1 .. s+K-2
    target_req: np.ndarray  # [B]
    draft_req: np.ndarray  # [B]
    kv_bucket: int


class DraftState:
    """Second model + pools for the draft (a mini ModelRunner)."""

    def __init__(self, model_config: ModelConfig, server_args, num_tokens: int,
                 max_reqs: int, table_width: int, kv_dtype, use_pallas: bool):
        from ltp_sglang_tpu.model_loader.loader import load_model_weights
        from ltp_sglang_tpu.ops.kv_cache_ops import kv_write_pallas, kv_write_xla

        model_cls = resolve_model_cls(model_config.architectures)
        self.model = model_cls(
            model_config,
            kv_write_impl=kv_write_pallas if use_pallas else kv_write_xla,
        )
        self.params = load_model_weights(
            self.model,
            model_config.model_path,
            load_format=server_args.load_format if server_args.load_format != "auto" else "auto",
            seed=server_args.random_seed + 1,
        )
        L = model_config.num_layers
        Hkv, D = model_config.num_kv_heads, model_config.head_dim
        r, ln = _row_dims(Hkv * D)
        S = num_tokens + 1
        self.k_cache = jnp.zeros((L, S, r, ln), dtype=kv_dtype)
        self.v_cache = jnp.zeros((L, S, r, ln), dtype=kv_dtype)
        self.req_table = jnp.zeros((max_reqs + 1, table_width), dtype=jnp.int32)
        self.req_to_token = ReqToTokenPool(max_reqs, table_width)
        self.allocator = TokenToKVPoolAllocator(num_tokens)
        self.dump_row = max_reqs


class SpecWorker:
    def __init__(self, runner, server_args):
        self.runner = runner
        self.server_args = server_args
        self.k = max(1, server_args.speculative_num_steps)
        draft_path = server_args.speculative_draft_model_path or server_args.model_path
        draft_cfg = ModelConfig.from_model_path(
            draft_path, dtype=server_args.dtype,
            context_length=runner.model_config.context_len,
        )
        backend_pallas = jax.default_backend() == "tpu" and (
            runner.mesh_ctx is None or runner.mesh_ctx.is_single_device
        )
        self.draft = DraftState(
            draft_cfg,
            server_args,
            num_tokens=runner.max_total_num_tokens,
            max_reqs=runner.max_running_requests,
            table_width=runner.table_width,
            kv_dtype=runner.kv_dtype,
            use_pallas=backend_pallas,
        )
        _, self._table_rows, self._table_merge = get_kv_cache_ops(
            "tpu" if backend_pallas else "cpu"
        )
        self._fn_cache: Dict[Tuple, Any] = {}
        # Acceptance stats (scheduler logs accept length like the reference).
        self.num_rounds = 0
        self.num_accepted_tokens = 0
        self.num_committed_tokens = 0

    # ------------------------------------------------------------ draft extend
    def draft_prefill(self, req, token_ids):
        """Run the draft model over committed tokens it has not seen
        (host-driven; one call per newly admitted request)."""
        d = self.draft
        n = len(token_ids)
        slots = d.allocator.alloc(n)
        assert slots is not None, "draft KV pool exhausted"
        row = d.req_to_token.req_to_token
        start = req.spec_draft_len
        row[req.spec_draft_req_idx, start : start + n] = slots
        self._draft_extend(
            req.spec_draft_req_idx, token_ids, start, slots
        )
        req.spec_draft_len = start + n

    def _draft_extend(self, draft_req_idx, token_ids, start_pos, slots):
        d = self.draft
        n = len(token_ids)
        E = max(8, 1 << (n - 1).bit_length())
        C = round_up(start_pos + n, 256)
        C = min(C, d.req_table.shape[1])
        key = ("dext", E, C)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build_draft_extend(E, C)
            self._fn_cache[key] = fn
        ids = np.zeros((1, E), np.int32)
        ids[0, :n] = token_ids
        pos = np.zeros((1, E), np.int32)
        pos[0, :n] = np.arange(start_pos, start_pos + n)
        locs = np.zeros((1, E), np.int32)
        locs[0, :n] = slots
        kv_idx = np.zeros((1, C), np.int32)
        kv_idx[0, : start_pos + n] = d.req_to_token.req_to_token[
            draft_req_idx, : start_pos + n
        ]
        d.k_cache, d.v_cache, d.req_table = fn(
            self.draft.params,
            d.k_cache,
            d.v_cache,
            d.req_table,
            ids,
            pos,
            locs,
            np.asarray([draft_req_idx], np.int32),
            np.asarray([start_pos + n], np.int32),
            np.asarray([start_pos], np.int32),
            np.asarray([n], np.int32),
            kv_idx,
        )

    def _build_draft_extend(self, E, C):
        model = self.draft.model
        table_rows = self._table_rows

        def fn(params, kc, vc, table, ids, pos, locs, req, seq, pre, ext, kv_idx):
            table = table_rows(table, req, kv_idx)
            step = StepArrays(ids, pos, locs, seq, pre, ext, kv_idx)
            _, kc, vc = model.forward(params, step, kc, vc)
            return kc, vc, table

        return jax.jit(fn, donate_argnums=(1, 2, 3))

    # ------------------------------------------------------------- spec round
    def _build_round_fn(self, B, K, C, sampled: bool = False):
        t_model = self.runner.model
        d_model = self.draft.model
        table_merge = self._table_merge

        def round_fn(
            tp, dp,  # params
            t_kc, t_vc, t_tbl,
            d_kc, d_vc, d_tbl,
            input_ids,  # [B]
            seq0,  # [B]
            t_slots,  # [B, K+1]
            d_slots,  # [B, K]
            t_req, d_req,  # [B]
            temperatures, top_ps, top_ks, min_ps,  # [B] (sampled accept)
            step_idx,  # int32 scalar (rng fold)
        ):
            # ---- draft K chain steps (own table maintained in-loop).
            d_base = d_tbl[d_req, :C]
            cols = jnp.arange(C, dtype=jnp.int32)[None, :]
            start = jnp.maximum(seq0 - 1, 0)[:, None]
            off = jnp.clip(cols - start, 0, K - 1)
            d_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K),
                jnp.take_along_axis(d_slots, off, axis=1),
                d_base,
            )

            def draft_body(j, carry):
                tok, kc, vc, drafts = carry
                pos = jnp.maximum(seq0 - 1 + j, 0)
                slot_j = jax.lax.dynamic_slice_in_dim(d_slots, j, 1, axis=1)
                step = StepArrays(
                    tok[:, None], pos[:, None], slot_j,
                    seq0 + j, jnp.maximum(seq0 + j - 1, 0),
                    jnp.ones((B,), jnp.int32), d_kv_idx,
                )
                logits, kc, vc = d_model.forward(dp, step, kc, vc)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                drafts = jax.lax.dynamic_update_slice(drafts, nxt[:, None], (0, j))
                return nxt, kc, vc, drafts

            drafts0 = jnp.zeros((B, K), jnp.int32)
            _, d_kc, d_vc, drafts = jax.lax.fori_loop(
                0, K, draft_body, (input_ids, d_kc, d_vc, drafts0)
            )
            d_tbl = table_merge(d_tbl, d_req, jnp.maximum(seq0 - 1, 0), d_slots, K)

            # ---- target verify: one extend of [x_{s-1}, d1..dK].
            ver_ids = jnp.concatenate([input_ids[:, None], drafts], axis=1)  # [B, K+1]
            pos = jnp.maximum(seq0[:, None] - 1 + jnp.arange(K + 1, dtype=jnp.int32)[None, :], 0)
            t_base = t_tbl[t_req, :C]
            offt = jnp.clip(cols - start, 0, K)
            t_kv_idx = jnp.where(
                (cols >= start) & (cols < start + K + 1),
                jnp.take_along_axis(t_slots, offt, axis=1),
                t_base,
            )
            step = StepArrays(
                ver_ids, pos, t_slots,
                seq0 + K, jnp.maximum(seq0 - 1, 0),
                jnp.full((B,), K + 1, jnp.int32), t_kv_idx,
            )
            logits, t_kc, t_vc = t_model.forward(tp, step, t_kc, t_vc, all_logits=True)
            t_tbl = table_merge(t_tbl, t_req, jnp.maximum(seq0 - 1, 0), t_slots, K + 1)

            if sampled:
                # ---- target-only rejection-sampling accept (preserves the
                # per-request processed target distribution exactly;
                # speculative/spec_sampling.py). "free" = unrestricted
                # temperature sampling (full-vocab); "window" = top-k/p/min-p
                # within the top-64 candidate window.
                from ltp_sglang_tpu.speculative.spec_sampling import (
                    spec_accept_chain,
                    spec_accept_chain_free,
                )

                rkey = jax.random.fold_in(self.runner._rng_key, step_idx)
                if sampled == "free":
                    preds, accepted = spec_accept_chain_free(
                        logits, drafts, temperatures, top_ks, rkey
                    )
                else:
                    preds, accepted = spec_accept_chain(
                        logits, drafts, temperatures, top_ps, top_ks, min_ps,
                        rkey,
                    )
            else:
                # ---- greedy: accept longest agreeing prefix + bonus token.
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K+1]
                match = preds[:, :K] == drafts  # [B, K]
                accepted = jnp.sum(
                    jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
                )
            # committed tokens this round: preds[0..accepted] (accepted+1 of them)
            return preds, accepted, t_kc, t_vc, t_tbl, d_kc, d_vc, d_tbl

        return jax.jit(round_fn, donate_argnums=(2, 3, 4, 5, 6, 7))

    def run_round(self, rb: SpecRoundBatch, sampling_info=None):
        """Returns (preds [B, K+1] np, accepted [B] np). `sampling_info`
        (padded temperatures/top_ps/top_ks/min_ps arrays) enables the sampled
        accept path; None or all-greedy uses the argmax fast path."""
        B, K1 = rb.target_slots.shape
        K = K1 - 1
        sampled = (
            sampling_info.sampler_kind
            if sampling_info is not None and not sampling_info.is_all_greedy
            else False
        )
        key = ("round", B, K, rb.kv_bucket, sampled)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._build_round_fn(B, K, rb.kv_bucket, sampled=sampled)
            self._fn_cache[key] = fn
            logger.info("compiling spec round fn B=%d K=%d C=%d sampled=%s",
                        B, K, rb.kv_bucket, sampled)
        r = self.runner
        d = self.draft
        if sampling_info is not None:
            si_arrays = (sampling_info.temperatures, sampling_info.top_ps,
                         sampling_info.top_ks, sampling_info.min_ps)
        else:
            ones = np.ones((B,), np.float32)
            si_arrays = (ones, ones, np.ones((B,), np.int32), np.zeros((B,), np.float32))
        self._step_counter = getattr(self, "_step_counter", 0) + 1
        preds, accepted, r.k_cache, r.v_cache, r.req_table, d.k_cache, d.v_cache, d.req_table = fn(
            r.params, d.params,
            r.k_cache, r.v_cache, r.req_table,
            d.k_cache, d.v_cache, d.req_table,
            rb.input_ids, rb.seq0, rb.target_slots, rb.draft_slots,
            rb.target_req, rb.draft_req,
            *si_arrays, np.int32(self._step_counter),
        )
        preds = np.asarray(preds)[: rb.batch_size]
        accepted = np.asarray(accepted)[: rb.batch_size]
        self.num_rounds += 1
        self.num_accepted_tokens += int(accepted.sum())
        self.num_committed_tokens += int(accepted.sum() + rb.batch_size)
        return preds, accepted

    @property
    def avg_accept_length(self) -> float:
        return self.num_committed_tokens / max(self.num_rounds, 1)
