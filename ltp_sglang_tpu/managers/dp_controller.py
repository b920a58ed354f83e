"""DP-attention with per-group request ownership.

Reference: scheduler.py:1794-2003 (prepare_mlp_sync_batch / get_idle_batch),
layers/dp_attention.py:62-366, managers/data_parallel_controller.py:269-316.
In the reference each dp group is a separate scheduler process owning its own
requests and KV; per step the groups sync forward mode / token counts over
NCCL, run attention data-parallel, and gather tokens so the MLP runs
tensor-parallel over the dp x tp union.

TPU-native translation (single controller, one SPMD program per step):

- ONE device KV pool and req_to_token table whose slot/row spaces are split
  into dp contiguous GROUP REGIONS, sharded over the mesh "dp" axis — group
  g's KV lives only on its mesh column, so KV capacity scales with dp (the
  reference's reason for DP-attention on MLA models).
- dp_size in-process Schedulers, each owning its region via an
  OffsetAllocator (global slot ids g*S_loc..) and a req-pool view handing
  out global rows. All host scheduling code (radix cache, chunked prefill,
  retraction) runs unchanged per group.
- Each controller step collects every group's next batch, syncs the global
  forward mode (any prefill => all groups run the EXTEND-shape program;
  decode batches become 1-token extends, the reference's forward-mode sync),
  pads every group to a COMMON (B, E, C) bucket (idle groups contribute
  all-padding rows = the reference's idle batch), concatenates along the
  batch axis, and runs ONE forward. The MLP's dp x tp union sharding
  (model.dp_attention_mlp + param_specs) makes XLA insert the token
  gather/scatter the reference issues manually (_dp_gather:304).
- Results are sliced back per group and post-processed by each scheduler.

New requests are dispatched round_robin / shortest_queue / minimum_tokens
(data_parallel_controller.py:48-56).

Scope (documented restrictions, enforced in ModelRunner.dp_grouped): no
speculative decoding, no pipeline parallelism, no SWA-ring models, no
multimodal, decode windows K=1.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, List, Optional

import numpy as np

from ltp_sglang_tpu.config.model_config import ModelConfig
from ltp_sglang_tpu.config.server_args import ServerArgs
from ltp_sglang_tpu.managers.schedule_batch import Req, ScheduleBatch
from ltp_sglang_tpu.managers.scheduler import BatchResult, Scheduler
from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool
from ltp_sglang_tpu.model_executor.forward_batch import (
    ForwardBatch,
    ForwardMode,
    build_forward_batch,
)
from ltp_sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
from ltp_sglang_tpu.utils import bucketize

logger = logging.getLogger(__name__)


class OffsetAllocator:
    """Wraps a group-local KV allocator so it hands out GLOBAL slot ids in
    this group's region [base, base + S_loc). Base is page-aligned, so page
    math (global_slot // page_size) stays consistent."""

    def __init__(self, inner, base: int):
        self.inner = inner
        self.base = base
        self.page_size = inner.page_size

    def available_size(self) -> int:
        return self.inner.available_size()

    def alloc(self, need_size: int):
        out = self.inner.alloc(need_size)
        return None if out is None else out + self.base

    def alloc_extend(self, prefix_len, extend_len, last_slot):
        out = self.inner.alloc_extend(
            prefix_len, extend_len, int(last_slot) - self.base
        )
        return None if out is None else out + self.base

    def alloc_decode(self, seq_len, last_slot):
        out = self.inner.alloc_decode(seq_len, int(last_slot) - self.base)
        return None if out is None else out + self.base

    def free(self, indices):
        idx = np.asarray(indices)
        if idx.size:
            self.inner.free(idx - self.base)

    def backup_state(self):
        return self.inner.backup_state()

    def restore_state(self, state):
        self.inner.restore_state(state)

    def clear(self):
        self.inner.clear()

    def free_group_begin(self):
        if hasattr(self.inner, "free_group_begin"):
            self.inner.free_group_begin()

    def free_group_end(self):
        if hasattr(self.inner, "free_group_end"):
            self.inner.free_group_end()


class GroupReqPool(ReqToTokenPool):
    """Request-pool view handing out GLOBAL rows in [base, base + size);
    .req_to_token IS the runner's global host table, so the runner's extend
    gather and dirty-row flush see every group's rows without translation."""

    def __init__(self, global_array: np.ndarray, base: int, size: int,
                 max_context_len: int):
        self.size = size  # local capacity (scheduler admission checks)
        self.max_context_len = max_context_len
        self.req_to_token = global_array
        self.base = base
        self.free_slots = list(range(base, base + size))

    def clear(self):
        self.free_slots = list(range(self.base, self.base + self.size))


class GroupRunnerView:
    """The subset of ModelRunner a group Scheduler touches, scoped to one
    group's region. forward()/forward_window are never called on this view —
    the controller drives the combined forward."""

    def __init__(self, runner, g: int):
        self.runner = runner
        self.g = g
        self.model_config = runner.model_config
        self.lora_manager = getattr(runner, "lora_manager", None)
        self.swa_enabled = False
        self.ring_size = 0
        self.swa_snap_count = 0
        R_row = runner.group_rows  # rows per group incl. its dump row
        self.row_base = g * R_row
        self.req_to_token_pool = GroupReqPool(
            runner.req_to_token_pool.req_to_token,
            self.row_base,
            R_row - 1,
            runner.req_to_token_pool.max_context_len,
        )
        self.dump_req_row = self.row_base + R_row - 1
        self.slot_base = g * runner.group_slots
        self.token_to_kv_pool_allocator = OffsetAllocator(
            runner.make_group_allocator(), self.slot_base
        )
        self.max_total_num_tokens = runner.group_tokens

    # HiCache accesses the device pools through its runner handle; delegate
    # (slots are global, so host-tier copies work unchanged per group).
    @property
    def k_cache(self):
        return self.runner.k_cache

    @k_cache.setter
    def k_cache(self, v):
        self.runner.k_cache = v

    @property
    def v_cache(self):
        return self.runner.v_cache

    @v_cache.setter
    def v_cache(self, v):
        self.runner.v_cache = v

    def mark_row_dirty(self, req_idx: int):
        self.runner.mark_row_dirty(req_idx)  # rows are already global

    def _flush_dirty_rows(self):
        self.runner._flush_dirty_rows()

    def flush_cache(self):
        pass  # device arrays are shared; nothing per-group to clear


def _idle_forward_arrays(B: int, E: int, dump_row: int):
    return dict(
        input_ids=np.zeros((B, E), np.int32),
        positions=np.zeros((B, E), np.int32),
        cache_locs=np.zeros((B, E), np.int32),
        req_indices=np.full((B,), dump_row, np.int32),
        seq_lens=np.zeros((B,), np.int32),
        prefix_lens=np.zeros((B,), np.int32),
        extend_lens=np.zeros((B,), np.int32),
        lora_ids=np.zeros((B,), np.int32),
    )


def _neutral_sampling(B: int, vocab_size: int) -> SamplingBatchInfo:
    return SamplingBatchInfo(
        temperatures=np.ones((B,), np.float32),
        top_ps=np.ones((B,), np.float32),
        top_ks=np.ones((B,), np.int32),
        min_ps=np.zeros((B,), np.float32),
        is_all_greedy=True,
        need_min_p=False,
        vocab_size=vocab_size,
    )


def _concat_sampling(infos: List[SamplingBatchInfo]) -> SamplingBatchInfo:
    V = infos[0].vocab_size
    lens = [len(i.temperatures) for i in infos]

    def cat(field, fill=None):
        vals = [getattr(i, field) for i in infos]
        if all(v is None for v in vals):
            return None
        out = []
        for v, n in zip(vals, lens):
            if v is None:
                if field == "logit_bias":
                    v = np.zeros((n, V), np.float32)
                else:
                    v = np.full((n,), fill, np.float32)
            out.append(v)
        return np.concatenate(out)

    return SamplingBatchInfo(
        temperatures=np.concatenate([i.temperatures for i in infos]),
        top_ps=np.concatenate([i.top_ps for i in infos]),
        top_ks=np.concatenate([i.top_ks for i in infos]),
        min_ps=np.concatenate([i.min_ps for i in infos]),
        is_all_greedy=all(i.is_all_greedy for i in infos),
        need_min_p=any(i.need_min_p for i in infos),
        vocab_size=V,
        logit_bias=cat("logit_bias"),
        frequency_penalties=cat("frequency_penalties", 0.0),
        presence_penalties=cat("presence_penalties", 0.0),
        repetition_penalties=cat("repetition_penalties", 1.0),
        has_penalties=any(i.has_penalties for i in infos),
    )


class DataParallelController:
    """Duck-types the Scheduler surface the Engine/HTTP server drive
    (add_request / event_loop_step / abort / flush), fanning out to dp_size
    group Schedulers and running one combined device step."""

    def __init__(
        self,
        server_args: ServerArgs,
        model_config: ModelConfig,
        model_runner,
        on_output: Optional[Callable] = None,
    ):
        import dataclasses as _dc

        self.server_args = server_args
        self.model_config = model_config
        self.runner = model_runner
        self.dp = model_runner.mesh_ctx.dp_size
        self.lb_method = server_args.load_balance_method
        self._rr_next = 0
        group_args = _dc.replace(server_args, decode_window_size=1)
        self.schedulers: List[Scheduler] = []
        for g in range(self.dp):
            view = GroupRunnerView(model_runner, g)
            s = Scheduler(
                group_args, model_config, view, on_output=on_output
            )
            self.schedulers.append(s)
        self.pre_step_hooks: List[Callable] = []
        self.last_progress_time = time.time()
        self.metrics = None
        logger.info(
            "DP-attention controller: %d groups x %d KV tokens, dispatch=%s",
            self.dp, model_runner.group_tokens, self.lb_method,
        )

    # ------------------------------------------------- scheduler duck-typing
    @property
    def on_output(self):
        return self.schedulers[0].on_output

    @on_output.setter
    def on_output(self, fn):
        for s in self.schedulers:
            s.on_output = fn

    @property
    def detokenizer(self):
        return self.schedulers[0].detokenizer

    @detokenizer.setter
    def detokenizer(self, d):
        for s in self.schedulers:
            s.detokenizer = d

    @property
    def grammar_backend(self):
        return self.schedulers[0].grammar_backend

    @grammar_backend.setter
    def grammar_backend(self, b):
        for s in self.schedulers:
            s.grammar_backend = b

    @property
    def eos_token_ids(self):
        return self.schedulers[0].eos_token_ids

    @property
    def tree_cache(self):
        return self.schedulers[0].tree_cache

    @property
    def waiting_queue(self):
        return [r for s in self.schedulers for r in s.waiting_queue]

    @property
    def running_batch(self):
        return self.schedulers[0].running_batch

    @property
    def num_generated_tokens(self):
        return sum(s.num_generated_tokens for s in self.schedulers)

    def _eos_from_config(self):
        return self.schedulers[0]._eos_from_config()

    # ---------------------------------------------------------- dispatching
    def _pick_group(self) -> int:
        """round_robin / shortest_queue / minimum_tokens
        (data_parallel_controller.py:269-316)."""
        if self.lb_method == "round_robin":
            g = self._rr_next
            self._rr_next = (self._rr_next + 1) % self.dp
            return g
        if self.lb_method == "minimum_tokens":
            loads = [
                sum(r.seqlen() for r in s.waiting_queue)
                + sum(
                    r.seqlen()
                    for r in (
                        s.running_batch.reqs if s.running_batch else []
                    )
                )
                for s in self.schedulers
            ]
            return int(np.argmin(loads))
        # shortest_queue (default)
        loads = [
            len(s.waiting_queue)
            + (s.running_batch.batch_size() if s.running_batch else 0)
            for s in self.schedulers
        ]
        return int(np.argmin(loads))

    def add_request(self, req: Req):
        g = req.data_parallel_rank
        if g is None or not (0 <= g < self.dp):
            g = self._pick_group()
        self.schedulers[g].add_request(req)

    def abort_request(self, rid: str):
        for s in self.schedulers:
            s.abort_request(rid)

    def abort_all_requests(self, message: str = "aborted"):
        for s in self.schedulers:
            s.abort_all_requests(message)

    def has_unfinished_requests(self) -> bool:
        return any(s.has_unfinished_requests() for s in self.schedulers)

    def flush_cache(self) -> bool:
        if any(s.has_unfinished_requests() for s in self.schedulers):
            return False
        for s in self.schedulers:
            s.tree_cache.reset()
            s.runner.req_to_token_pool.clear()
            s.runner.token_to_kv_pool_allocator.clear()
        self.runner._dirty_rows.clear()
        return True

    # --------------------------------------------------- decode windows (K>1)
    def _try_window_step(self) -> bool:
        """All-decode K-step device windows across the dp groups (lifts the
        r03 "dp-attention forces K=1" restriction). Eligible only when NO
        group has prefill/grammar work pending, every group's running batch
        can window at a common K > 1, and no request needs per-step host
        work (penalties / logprobs keep the K=1 path for now). Each group
        allocates its window slots inside its own KV region; one combined
        window program serves all groups (global forward-mode sync holds:
        everybody decodes)."""
        from ltp_sglang_tpu.model_executor.model_runner import DecodeWindowBatch

        cap = self.server_args.decode_window_size
        if cap <= 1:
            return False
        model = self.runner.model
        if (getattr(model, "forward_window_token", None) is None
                and getattr(model, "forward_window_token_paged", None) is None):
            return False
        active = []
        for s in self.schedulers:
            if (s.waiting_queue or s.chunked_req is not None
                    or s.grammar_queue or s._inflight is not None):
                return False
            rb = s.running_batch
            if rb is not None and not rb.is_empty():
                active.append((s, rb))
        if not active:
            return False
        K = cap
        for s, rb in active:
            if any(
                r.sampling_params.frequency_penalty != 0.0
                or r.sampling_params.presence_penalty != 0.0
                or r.sampling_params.repetition_penalty != 1.0
                or r.return_logprob or r.token_ids_logprob
                for r in rb.reqs
            ):
                return False
            K = min(K, s._choose_window(rb, cap=cap))
            if K <= 1 or not rb.check_decode_mem(K):
                return False

        wbs = []
        for s, rb in active:
            rb.prepare_for_decode_window(K)
            wbs.append(rb.get_window_batch(s.server_args, s.runner.dump_req_row))
        B = max(wb.input_ids.shape[0] for wb in wbs)
        C = max(wb.kv_bucket for wb in wbs)
        V = self.model_config.vocab_size

        def pad_to(a, fill=0):
            if a.shape[0] == B:
                return a
            out = np.full((B,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        def cat(field, fill=0):
            return np.concatenate([pad_to(getattr(wb, field), fill) for wb in wbs])

        sis = [wb.sampling_info.padded(B) for wb in wbs]
        masks = [wb.vocab_mask for wb in wbs]
        vocab_mask = None
        if any(m is not None for m in masks):
            vocab_mask = np.concatenate([
                pad_to(m, False) if m is not None else np.zeros((B, V), bool)
                for m in masks
            ])
        combined = DecodeWindowBatch(
            batch_size=sum(wb.batch_size for wb in wbs),
            input_ids=cat("input_ids"),
            seq0=cat("seq0"),
            slots=cat("slots"),
            # Pad rows of group g must use g's dump row (its own KV region).
            req_indices=np.concatenate([
                pad_to(wb.req_indices, s.runner.dump_req_row)
                for (s, _), wb in zip(active, wbs)
            ]),
            kv_bucket=C,
            sampling_info=_concat_sampling(sis),
            lora_ids=cat("lora_ids"),
            vocab_mask=vocab_mask,
            want_logprobs=False,
            rope_delta=cat("rope_delta"),
        )
        tokens, aux = self.runner.forward_window(combined)
        tokens = np.asarray(tokens)
        for g, (s, rb) in enumerate(active):
            n = len(rb.reqs)
            s._process_decode_window_tokens(
                rb.reqs, rb.window_slots, K, tokens[g * B : g * B + n]
            )
            rb.filter_batch()
            if rb.is_empty():
                s.running_batch = None
        self.last_progress_time = time.time()
        return True

    # ------------------------------------------------------------ main loop
    def event_loop_step(self) -> bool:
        self.last_progress_time = time.time()
        for hook in list(self.pre_step_hooks):  # hooks may self-remove
            hook()
        for s in self.schedulers:
            s._move_ready_grammar_requests()
        if self._try_window_step():
            return True
        batches = [s.get_next_batch_to_run() for s in self.schedulers]
        if all(b is None for b in batches):
            for s in self.schedulers:
                if s.grammar_queue:
                    import concurrent.futures

                    fut = s.grammar_queue[0].grammar_future
                    if fut is not None:
                        concurrent.futures.wait([fut], timeout=0.02)
                    return True
            return False

        # Global forward-mode sync (scheduler.py:1794+): any extend => every
        # group runs the EXTEND-shape program (decodes become 1-token
        # extends); all-decode steps keep the decode program.
        any_extend = any(
            b is not None and b.forward_mode != ForwardMode.DECODE
            for b in batches
        )
        mode = ForwardMode.EXTEND if any_extend else ForwardMode.DECODE

        # Common (B, E, C) buckets across groups.
        sa = self.server_args
        n_max, ext_max, ctx_max = 1, 1, 1
        for b in batches:
            if b is None:
                continue
            n_max = max(n_max, len(b.reqs))
            ext_max = max(ext_max, max(len(x) for x in b.input_ids_list))
            ctx_max = max(ctx_max, max(b.seq_lens))
        B = bucketize(n_max, sa.decode_bs_buckets)
        E = 1 if mode == ForwardMode.DECODE else bucketize(
            ext_max, sa.prefill_token_buckets
        )
        C = bucketize(ctx_max, sa.context_buckets)

        fbs: List[ForwardBatch] = []
        for g, b in enumerate(batches):
            dump = self.schedulers[g].runner.dump_req_row
            if b is None:
                arrs = _idle_forward_arrays(B, E, dump)
                fbs.append(
                    ForwardBatch(
                        mode=mode, batch_size=0, kv_bucket=C,
                        sampling_info=_neutral_sampling(
                            B, self.model_config.vocab_size
                        ),
                        **arrs,
                    )
                )
                continue
            fb = build_forward_batch(
                mode,
                input_ids_list=b.input_ids_list,
                prefix_lens=b.prefix_lens,
                seq_lens=b.seq_lens,
                cache_locs_list=b.cache_locs_list,
                req_indices=[r.req_pool_idx for r in b.reqs],
                sampling_info=b.sampling_info,
                bs_buckets=[B],
                extend_buckets=[E],
                context_buckets=[C],
                dump_req_row=dump,
                lora_ids_list=[getattr(r, "lora_id", 0) for r in b.reqs],
            )
            if fb.sampling_info is not None and fb.sampling_info.has_penalties:
                fb.sampling_info.build_penalty_tensors(b.reqs, B)
            fb.vocab_mask = (
                fb.sampling_info.build_vocab_mask(b.reqs, B)
                if fb.sampling_info is not None
                else None
            )
            fbs.append(fb)

        combined = self._concat_fbs(fbs, mode, C)
        want_lp = any(
            b is not None and any(r.return_logprob for r in b.reqs)
            for b in batches
        )
        want_ids_lp = any(
            b is not None and any(r.token_ids_logprob for r in b.reqs)
            for b in batches
        )
        tokens, lp, logits = self.runner.forward(
            combined, return_logits=want_ids_lp, want_logprobs=want_lp
        )
        tokens = np.asarray(tokens)
        lp = (
            tuple(np.asarray(x) for x in lp) if lp is not None else None
        )
        logits = np.asarray(logits) if want_ids_lp else None

        for g, b in enumerate(batches):
            if b is None:
                continue
            sl = slice(g * B, (g + 1) * B)
            res = BatchResult(
                b, tokens[sl], b.forward_mode,
                logprobs=(
                    (lp[0][sl], lp[1][sl], lp[2][sl]) if lp is not None else None
                ),
            )
            res.logits = logits[sl] if logits is not None else None
            self.schedulers[g].process_batch_result(res)
        self.last_progress_time = time.time()
        return True

    def _concat_fbs(self, fbs: List[ForwardBatch], mode, C) -> ForwardBatch:
        cat = lambda f: np.concatenate([getattr(fb, f) for fb in fbs])
        combined = ForwardBatch(
            mode=mode,
            batch_size=sum(fb.batch_size for fb in fbs),
            input_ids=cat("input_ids"),
            positions=cat("positions"),
            cache_locs=cat("cache_locs"),
            req_indices=cat("req_indices"),
            seq_lens=cat("seq_lens"),
            prefix_lens=cat("prefix_lens"),
            extend_lens=cat("extend_lens"),
            kv_bucket=C,
            sampling_info=_concat_sampling(
                [fb.sampling_info for fb in fbs]
            ),
            lora_ids=cat("lora_ids"),
        )
        masks = [getattr(fb, "vocab_mask", None) for fb in fbs]
        if any(m is not None for m in masks):
            B = fbs[0].input_ids.shape[0]
            V = self.model_config.vocab_size
            combined.vocab_mask = np.concatenate(
                [
                    m if m is not None else np.zeros((B, V), bool)
                    for m in masks
                ]
            )
        si = combined.sampling_info
        counts = [
            getattr(fb.sampling_info, "output_counts", None) for fb in fbs
        ]
        if si.has_penalties and any(c is not None for c in counts):
            B = fbs[0].input_ids.shape[0]
            V = self.model_config.vocab_size
            si.output_counts = np.concatenate(
                [
                    c if c is not None else np.zeros((B, V), np.float32)
                    for c in counts
                ]
            )
            si.seen_mask = np.concatenate(
                [
                    fb.sampling_info.seen_mask
                    if getattr(fb.sampling_info, "seen_mask", None) is not None
                    else np.zeros((B, V), bool)
                    for fb in fbs
                ]
            )
        return combined
