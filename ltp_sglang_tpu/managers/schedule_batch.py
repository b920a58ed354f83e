"""Request state machine and batch assembly.

Counterpart of managers/schedule_batch.py (Req:416, ScheduleBatch:808,
finish reasons :124-176, prepare_for_extend:1123, prepare_for_decode:1520,
retract_decode:1379, filter_batch:1592, merge_batch:1649). Host-side logic is
nearly architecture-neutral, so the semantics port directly; the device-batch
assembly produces the padded bucket arrays of forward_batch.py instead of GPU
tensors.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, List, Optional, Union

import numpy as np

from ltp_sglang_tpu.mem_cache.radix_cache import TreeNode
from ltp_sglang_tpu.model_executor.forward_batch import (
    ForwardBatch,
    ForwardMode,
    build_forward_batch,
)
from ltp_sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
from ltp_sglang_tpu.sampling.sampling_params import SamplingParams

logger = logging.getLogger(__name__)

# Retraction / admission dynamics (reference global_config.py:24-39).
RETRACT_DECODE_STEPS = 20
BASE_MIN_NEW_TOKEN_RATIO = 0.7
MIN_NEW_TOKEN_RATIO_FACTOR = 0.14
NEW_TOKEN_RATIO_DECAY_STEPS = 600
CLIP_MAX_NEW_TOKENS_ESTIMATION = 4096


# ------------------------------------------------------------- finish reasons
class BaseFinishReason:
    def __init__(self, is_error: bool = False):
        self.is_error = is_error

    def to_json(self):
        raise NotImplementedError


class FINISH_MATCHED_TOKEN(BaseFinishReason):
    def __init__(self, matched: Union[int, List[int]]):
        super().__init__()
        self.matched = matched

    def to_json(self):
        return {"type": "stop", "matched": self.matched}


class FINISH_MATCHED_STR(BaseFinishReason):
    def __init__(self, matched: str):
        super().__init__()
        self.matched = matched

    def to_json(self):
        return {"type": "stop", "matched": self.matched}


class FINISH_LENGTH(BaseFinishReason):
    def __init__(self, length: int):
        super().__init__()
        self.length = length

    def to_json(self):
        return {"type": "length", "length": self.length}


class FINISH_ABORT(BaseFinishReason):
    def __init__(self, message: str = "aborted"):
        super().__init__(is_error=True)
        self.message = message

    def to_json(self):
        return {"type": "abort", "message": self.message}


# ----------------------------------------------------------------------- Req
class Req:
    def __init__(
        self,
        rid: str,
        origin_input_ids: List[int],
        sampling_params: SamplingParams,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        stream: bool = False,
        eos_token_ids: Optional[set] = None,
        arrival_time: Optional[float] = None,
    ):
        self.rid = rid
        self.origin_input_ids = list(origin_input_ids)
        self.sampling_params = sampling_params
        self.return_logprob = return_logprob
        self.top_logprobs_num = top_logprobs_num
        self.stream = stream
        self.eos_token_ids = eos_token_ids or set()
        self.arrival_time = arrival_time or time.time()

        self.output_ids: List[int] = []
        self.fill_ids: List[int] = []  # input + output (recomputed per round)
        self.prefix_indices: np.ndarray = np.empty((0,), dtype=np.int32)
        self.last_node: Optional[TreeNode] = None
        self.extend_input_len = 0
        self.req_pool_idx: Optional[int] = None
        self.finished_reason: Optional[BaseFinishReason] = None
        self.grammar: Optional[Any] = None
        self.grammar_key: Optional[tuple] = None
        # Async grammar compile (scheduler.grammar_queue).
        self.grammar_future: Optional[Any] = None
        self.grammar_deadline: float = 0.0

        # Chunked prefill bookkeeping: number of fill_ids already computed.
        self.is_chunked = 0
        # Whether this request currently holds a radix lock on last_node.
        self.lock_ref_held = False

        # Speculative decoding (draft-model) state: the draft cache's request
        # row and how many positions of this request it has processed.
        self.spec_draft_req_idx = None
        self.spec_draft_len = 0
        # EAGLE: target hidden state of the second-to-last committed token
        # (np [Dm] f32), carried between rounds.
        self.spec_hidden = None

        # DP-attention group pinning (GenerateReqInput.data_parallel_rank);
        # None = controller picks by load_balance_method.
        self.data_parallel_rank: Optional[int] = None

        # LoRA adapter (0 = none); resolved from lora_path at admission.
        self.lora_path = None
        self.lora_id = 0

        # Multimodal items (multimodal/processor.py MultimodalItem): the
        # prompt's placeholder spans plus pixel features / projected embeds.
        self.mm_items = None
        # M-RoPE (qwen2-vl family): [3, prompt_len] rope position ids +
        # the delta applied to generated-token positions
        # (multimodal/mrope.py; reference get_rope_index).
        self.mrope_pos = None
        self.mrope_delta = 0

        # Embedding mode (EmbeddingReqInput analog): no decode; the extend
        # forward pools hidden states into self.embedding and finishes.
        self.is_embedding = False
        self.embedding: Optional[List[float]] = None
        # Per-step logprobs at caller-specified token ids (score API).
        self.token_ids_logprob: Optional[List[int]] = None
        self.output_token_ids_logprobs: List[list] = []
        # Custom logit processor (sampling/custom_logit_processor.py): rows
        # with one sample on the host path; _str keys batched grouping.
        self.custom_logit_processor = None
        self.custom_logit_processor_str: Optional[str] = None

        # Logprobs
        self.output_token_logprobs: List[tuple] = []  # (logprob, token_id)
        self.output_top_logprobs: List[tuple] = []  # ([vals], [ids]) per step
        # Prompt logprobs (reference input_token_logprobs, logits_processor
        # extend path): positions >= logprob_start_len score the NEXT prompt
        # token. -1 disables (the common serving path pays nothing).
        self.logprob_start_len = -1
        self.input_token_logprobs: List[tuple] = []  # (logprob, token_id)
        # Progress cursor: next prompt index still needing a score. Lets
        # chunked prefill re-match previously computed chunks (the radix cap
        # below must advance with it) and makes re-extended positions after
        # a retract no-ops instead of duplicate entries (reference per-chunk
        # extend_logprob_start_len bookkeeping).
        self.input_logprob_len = 0

        # Incremental detokenization state (DecodeStatus analog).
        self.read_offset = 0
        self.surr_offset = 0
        self.decoded_text = ""

        # Streaming output cursor.
        self.stream_sent_len = 0

        # Timing (TimeStats analog).
        self.queued_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None

    def finished(self) -> bool:
        return self.finished_reason is not None

    def seqlen(self) -> int:
        return len(self.origin_input_ids) + len(self.output_ids)

    def init_next_round_input(self, tree_cache=None):
        """Recompute fill_ids/prefix for this admission round
        (schedule_batch.py:637-669)."""
        self.fill_ids = self.origin_input_ids + self.output_ids
        if tree_cache is not None and not getattr(tree_cache, "disable", False):
            from ltp_sglang_tpu.mem_cache.radix_cache import radix_key

            # Cap matching at len-1 so at least one token is computed.
            match_len = len(self.fill_ids) - 1
            if (
                self.return_logprob
                and self.logprob_start_len >= 0
                and self.input_logprob_len < len(self.origin_input_ids)
            ):
                # Prompt-logprob requests must COMPUTE the still-unscored
                # span even if it is radix-cached (reference truncates the
                # reused prefix the same way). Token t's score comes from
                # position t-1, so the cap is one before the first prompt
                # index not yet recorded — and it ADVANCES with the cursor,
                # so each chunked-prefill round re-matches the chunks
                # already computed instead of recomputing chunk 1 forever.
                match_len = min(
                    match_len,
                    max(0, max(self.logprob_start_len,
                               self.input_logprob_len) - 1),
                )
            key = radix_key(self.fill_ids[:match_len], self.lora_id)
            if hasattr(tree_cache, "attach_snap"):  # SWA-aware cache
                match = tree_cache.match_prefix(key, req=self)
                tree_cache.attach_snap(self, match.swa_snap_node)
            else:
                match = tree_cache.match_prefix(key)
            if self.lock_ref_held and match.last_node is not self.last_node:
                # The re-match moved to a different node (e.g. a donor with
                # the same prefix finished mid-flight, deepening the match).
                # Hand the lock off: release the old node and let
                # prepare_for_extend re-lock the new one — otherwise the new
                # path is evictable while this request reads it, and finish
                # would dec_lock a node that was never inc_locked.
                tree_cache.dec_lock_ref(self.last_node)
                self.lock_ref_held = False
            self.prefix_indices = match.device_indices
            self.last_node = match.last_node
        # With the radix cache disabled, prefix_indices set by
        # ChunkCache.cache_unfinished_req carries across chunks.
        self.extend_input_len = len(self.fill_ids) - len(self.prefix_indices)

    def reset_for_retract(self):
        self.prefix_indices = np.empty((0,), dtype=np.int32)
        self.last_node = None
        self.extend_input_len = 0
        self.req_pool_idx = None
        self.is_chunked = 0
        self.lock_ref_held = False

    def check_finished(self):
        if self.finished():
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finished_reason = FINISH_LENGTH(len(self.output_ids))
            return
        # min_new_tokens: suppress EOS/stop matches until reached
        # (ref sampling/penaltylib/min_new_tokens.py semantics).
        if len(self.output_ids) < sp.min_new_tokens:
            return
        if self.output_ids:
            last = self.output_ids[-1]
            if not sp.ignore_eos:
                if last in self.eos_token_ids:
                    self.finished_reason = FINISH_MATCHED_TOKEN(last)
                    return
            if last in sp.stop_token_ids:
                self.finished_reason = FINISH_MATCHED_TOKEN(last)
                return
        # Stop strings are checked by the detokenizer side (trim_matched_stop);
        # the scheduler-side check uses decoded_text when available.
        if sp.stop_strs and self.decoded_text:
            for s in sp.stop_strs:
                if s and s in self.decoded_text:
                    self.finished_reason = FINISH_MATCHED_STR(s)
                    return

    def __repr__(self):
        return f"Req(rid={self.rid}, in={len(self.origin_input_ids)}, out={len(self.output_ids)})"


# -------------------------------------------------------------- ScheduleBatch
@dataclasses.dataclass
class ScheduleBatch:
    reqs: List[Req]
    req_to_token_pool: Any
    token_to_kv_pool_allocator: Any
    tree_cache: Any
    forward_mode: Optional[ForwardMode] = None
    sampling_info: Optional[SamplingBatchInfo] = None
    vocab_size: int = 0

    # Per-step assembly outputs (host numpy).
    input_ids_list: Optional[List[np.ndarray]] = None
    cache_locs_list: Optional[List[np.ndarray]] = None
    prefix_lens: Optional[List[int]] = None
    seq_lens: Optional[List[int]] = None
    decode_seq_lens: Optional[np.ndarray] = None

    @classmethod
    def init_new(cls, reqs, req_to_token_pool, token_to_kv_pool_allocator, tree_cache,
                 vocab_size: int):
        return cls(
            reqs=list(reqs),
            req_to_token_pool=req_to_token_pool,
            token_to_kv_pool_allocator=token_to_kv_pool_allocator,
            tree_cache=tree_cache,
            vocab_size=vocab_size,
        )

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    def batch_size(self) -> int:
        return len(self.reqs)

    # ------------------------------------------------------------- allocation
    def _alloc_req_slots(self):
        for req in self.reqs:
            if req.req_pool_idx is None:
                slots = self.req_to_token_pool.alloc(1)
                assert slots is not None, "out of request slots"
                req.req_pool_idx = slots[0]

    def alloc_token_slots(self, num: int) -> Optional[np.ndarray]:
        out = self.token_to_kv_pool_allocator.alloc(num)
        if out is None:
            # Evict from the radix tree and retry (schedule_batch.py:964).
            self.tree_cache.evict(num)
            out = self.token_to_kv_pool_allocator.alloc(num)
        return out

    # ---------------------------------------------------------------- extend
    def prepare_for_extend(self):
        self.forward_mode = ForwardMode.EXTEND
        self._alloc_req_slots()
        pool = self.req_to_token_pool

        # Lock every matched prefix FIRST: allocation below may evict from the
        # tree, and an unlocked-but-matched prefix would be corrupted.
        for req in self.reqs:
            if req.last_node is not None and not req.lock_ref_held:
                self.tree_cache.inc_lock_ref(req.last_node)
                req.lock_ref_held = True

        input_ids_list, cache_locs_list, prefix_lens, seq_lens = [], [], [], []
        alloc = self.token_to_kv_pool_allocator
        page_size = alloc.page_size

        for req in self.reqs:
            prefix_len = len(req.prefix_indices)
            extend_len = req.extend_input_len
            seq_len = prefix_len + extend_len
            new_tokens = req.fill_ids[prefix_len:seq_len]
            assert len(new_tokens) == extend_len and extend_len > 0

            # Write prefix slots into this request's row.
            if prefix_len > 0:
                if getattr(alloc, "ring", 0):
                    # All-SWA: matched prefix slots are positional for THIS
                    # row (a radix match returns the donor's slots; the ring
                    # CONTENT arrives via the snapshot copy below).
                    pool.req_to_token[req.req_pool_idx, :prefix_len] = (
                        alloc.slots_for(req.req_pool_idx, 0, prefix_len)
                    )
                else:
                    pool.req_to_token[req.req_pool_idx, :prefix_len] = (
                        req.prefix_indices
                    )
            # Cross-request SWA reuse: copy the matched ring snapshot into
            # this request's ring before its first extend program runs.
            if getattr(req, "swa_snap_node", None) is not None:
                self.tree_cache.load_snapshot(req)

            if getattr(alloc, "ring", 0):
                # All-SWA ring mode: slot is a pure function of (req, pos).
                slots = alloc.slots_for(req.req_pool_idx, prefix_len, extend_len)
            elif page_size == 1:
                slots = self.alloc_token_slots(extend_len)
            else:
                last_slot = (
                    int(pool.req_to_token[req.req_pool_idx, prefix_len - 1])
                    if prefix_len > 0
                    else 0
                )
                slots = alloc.alloc_extend(prefix_len, extend_len, last_slot)
                if slots is None:
                    self.tree_cache.evict(extend_len + page_size)
                    slots = alloc.alloc_extend(prefix_len, extend_len, last_slot)
            assert slots is not None, "KV pool exhausted during prefill admission"
            pool.req_to_token[req.req_pool_idx, prefix_len:seq_len] = slots

            input_ids_list.append(np.asarray(new_tokens, dtype=np.int32))
            cache_locs_list.append(np.asarray(slots, dtype=np.int32))
            prefix_lens.append(prefix_len)
            seq_lens.append(seq_len)

        self.input_ids_list = input_ids_list
        self.cache_locs_list = cache_locs_list
        self.prefix_lens = prefix_lens
        self.seq_lens = seq_lens
        self.sampling_info = SamplingBatchInfo.from_reqs(self.reqs, self.vocab_size)

    # ---------------------------------------------------------------- decode
    def prepare_for_decode(self):
        self.forward_mode = ForwardMode.DECODE
        pool = self.req_to_token_pool
        alloc = self.token_to_kv_pool_allocator
        page_size = alloc.page_size

        input_ids_list, cache_locs_list, prefix_lens, seq_lens = [], [], [], []
        n = len(self.reqs)
        ring = getattr(alloc, "ring", 0)
        if page_size == 1 and not ring:
            slots = self.alloc_token_slots(n)
            assert slots is not None, "KV pool exhausted in decode (retract first)"
        for i, req in enumerate(self.reqs):
            seq_len = req.seqlen()  # includes the new token's position
            if ring:
                slot = alloc.slots_for(req.req_pool_idx, seq_len - 1, 1)[0]
            elif page_size == 1:
                slot = slots[i]
            else:
                last_slot = int(pool.req_to_token[req.req_pool_idx, seq_len - 2])
                s = alloc.alloc_decode(seq_len, last_slot)
                assert s is not None, "KV pool exhausted in decode"
                slot = s[0]
            pool.req_to_token[req.req_pool_idx, seq_len - 1] = slot
            input_ids_list.append(np.asarray([req.output_ids[-1]], dtype=np.int32))
            cache_locs_list.append(np.asarray([slot], dtype=np.int32))
            prefix_lens.append(seq_len - 1)
            seq_lens.append(seq_len)

        self.input_ids_list = input_ids_list
        self.cache_locs_list = cache_locs_list
        self.prefix_lens = prefix_lens
        self.seq_lens = seq_lens
        if self.sampling_info is None:
            self.sampling_info = SamplingBatchInfo.from_reqs(self.reqs, self.vocab_size)

    def prepare_for_decode_window(self, K: int):
        """Allocate K decode slots per request for a multi-step device window
        and record them in the host table (ModelRunner.forward_window)."""
        self.forward_mode = ForwardMode.DECODE
        pool = self.req_to_token_pool
        alloc = self.token_to_kv_pool_allocator
        n = len(self.reqs)

        if getattr(alloc, "ring", 0):
            slots = np.stack(
                [
                    alloc.slots_for(req.req_pool_idx, req.seqlen() - 1, K)
                    for req in self.reqs
                ]
            )
        elif alloc.page_size == 1:
            flat = self.alloc_token_slots(n * K)
            assert flat is not None, "KV pool exhausted for decode window"
            slots = np.asarray(flat, dtype=np.int32).reshape(n, K)
        else:
            slots = np.empty((n, K), dtype=np.int32)
            for i, req in enumerate(self.reqs):
                s0 = req.seqlen()
                last_slot = int(pool.req_to_token[req.req_pool_idx, s0 - 2]) if s0 >= 2 else 0
                s = alloc.alloc_extend(s0 - 1, K, last_slot)
                assert s is not None, "KV pool exhausted for decode window"
                slots[i] = s

        seq0 = np.array([r.seqlen() for r in self.reqs], dtype=np.int32)
        for i, req in enumerate(self.reqs):
            pool.req_to_token[req.req_pool_idx, seq0[i] - 1 : seq0[i] - 1 + K] = slots[i]

        self.window_K = K
        self.window_slots = slots
        self.window_seq0 = seq0
        self.window_input_ids = np.array(
            [r.output_ids[-1] for r in self.reqs], dtype=np.int32
        )
        if self.sampling_info is None:
            self.sampling_info = SamplingBatchInfo.from_reqs(self.reqs, self.vocab_size)

    def get_window_batch(self, server_args, dump_req_row: int):
        from ltp_sglang_tpu.model_executor.model_runner import DecodeWindowBatch
        from ltp_sglang_tpu.utils import bucketize

        n = len(self.reqs)
        K = self.window_K
        B = bucketize(n, server_args.decode_bs_buckets)
        max_c = min(int(self.window_seq0.max()) + K, server_args.context_buckets[-1])
        C = bucketize(max_c, server_args.context_buckets)

        input_ids = np.zeros((B,), np.int32)
        seq0 = np.zeros((B,), np.int32)
        slots = np.zeros((B, K), np.int32)
        req_idx = np.full((B,), dump_req_row, np.int32)
        input_ids[:n] = self.window_input_ids
        seq0[:n] = self.window_seq0
        slots[:n] = self.window_slots
        req_idx[:n] = [r.req_pool_idx for r in self.reqs]
        lora_ids = np.zeros((B,), np.int32)
        lora_ids[:n] = [getattr(r, "lora_id", 0) for r in self.reqs]
        # M-RoPE decode offset (zero on non-mrope models / text-only reqs):
        # window rope positions evaluate at pos + delta (DecodeWindowBatch).
        rope_delta = np.zeros((B,), np.int32)
        rope_delta[:n] = [
            int(getattr(r, "mrope_delta", 0) or 0) for r in self.reqs
        ]
        si = self.sampling_info.padded(B)
        if si.has_penalties:
            si.build_penalty_tensors(self.reqs, B)
        mask = getattr(self, "window_vocab_mask", None)  # [n, V] or None
        if mask is not None and mask.shape[0] < B:
            mask = np.pad(mask, ((0, B - mask.shape[0]), (0, 0)))
        return DecodeWindowBatch(
            batch_size=n,
            input_ids=input_ids,
            seq0=seq0,
            slots=slots,
            req_indices=req_idx,
            kv_bucket=C,
            sampling_info=si,
            lora_ids=lora_ids,
            vocab_mask=mask,
            want_logprobs=any(r.return_logprob for r in self.reqs),
            rope_delta=rope_delta,
        )

    def check_decode_mem(self, buf_multiplier: int = 1) -> bool:
        # K tokens appended at an arbitrary in-page offset touch at most
        # ceil((K + P - 1) / P) pages per request. (The old bound of
        # K * P slots per request overestimated by up to P x and triggered
        # spurious retractions exactly when windows + paging were both on.)
        P = self.token_to_kv_pool_allocator.page_size
        pages = (buf_multiplier + 2 * (P - 1)) // P
        need = len(self.reqs) * pages * P
        if self.token_to_kv_pool_allocator.available_size() >= need:
            return True
        self.tree_cache.evict(need)
        return self.token_to_kv_pool_allocator.available_size() >= need

    # -------------------------------------------------------------- retraction
    def retract_decode(self, server_args) -> tuple:
        """Retract newest-progress-first until decode is safe
        (schedule_batch.py:1379-1501). Returns (retracted_reqs,
        new_token_ratio)."""
        sorted_indices = sorted(
            range(len(self.reqs)),
            key=lambda i: (
                len(self.reqs[i].output_ids),
                -len(self.reqs[i].origin_input_ids),
            ),
            reverse=True,
        )
        retracted: List[Req] = []
        pool = self.req_to_token_pool
        alloc = self.token_to_kv_pool_allocator
        first_iter = True

        def decode_is_safe():
            return alloc.available_size() >= (
                len(self.reqs) * RETRACT_DECODE_STEPS * alloc.page_size
            )

        while (first_iter or not decode_is_safe()) and len(self.reqs) > 1:
            first_iter = False
            idx = sorted_indices.pop(0)
            req = self.reqs[idx]
            retracted.append(req)

            if self.tree_cache is None or self.tree_cache.disable:
                kv = pool.req_to_token[req.req_pool_idx, : req.seqlen() - 1]
                alloc.free(kv)
                pool.free(req.req_pool_idx)
            else:
                # Free only the non-prefix-cached part; unlock the prefix.
                prefix_len = len(req.prefix_indices)
                kv = pool.req_to_token[req.req_pool_idx, prefix_len : req.seqlen() - 1]
                alloc.free(kv)
                pool.free(req.req_pool_idx)
                if req.last_node is not None:
                    self.tree_cache.dec_lock_ref(req.last_node)
                self.tree_cache.evict(len(kv))

            if hasattr(self.tree_cache, "release_snap_pin"):
                self.tree_cache.release_snap_pin(req)
            req.reset_for_retract()
            self.reqs.pop(idx)
            sorted_indices = sorted(
                range(len(self.reqs)),
                key=lambda i: (
                    len(self.reqs[i].output_ids),
                    -len(self.reqs[i].origin_input_ids),
                ),
                reverse=True,
            )

        self.sampling_info = SamplingBatchInfo.from_reqs(self.reqs, self.vocab_size)

        total_decoded = sum(len(r.output_ids) for r in self.reqs)
        total_max = sum(r.sampling_params.max_new_tokens for r in self.reqs)
        new_ratio = min(
            1.0,
            (total_decoded + RETRACT_DECODE_STEPS * len(self.reqs)) / max(total_max, 1),
        )
        return retracted, new_ratio

    # --------------------------------------------------------- filter / merge
    def filter_batch(self, keep_indices: Optional[List[int]] = None):
        if keep_indices is None:
            keep_indices = [i for i, r in enumerate(self.reqs) if not r.finished()]
        if len(keep_indices) == len(self.reqs):
            return
        if self.sampling_info is not None:
            self.sampling_info.filter_batch(np.asarray(keep_indices, dtype=np.int64))
        self.reqs = [self.reqs[i] for i in keep_indices]

    def merge_batch(self, other: "ScheduleBatch"):
        if self.sampling_info is not None and other.sampling_info is not None:
            self.sampling_info.merge_batch(other.sampling_info)
        elif other.sampling_info is not None:
            self.sampling_info = other.sampling_info
        self.reqs.extend(other.reqs)

    # --------------------------------------------------------- forward batch
    def get_forward_batch(self, server_args, dump_req_row: int) -> ForwardBatch:
        return build_forward_batch(
            self.forward_mode,
            input_ids_list=self.input_ids_list,
            prefix_lens=self.prefix_lens,
            seq_lens=self.seq_lens,
            cache_locs_list=self.cache_locs_list,
            req_indices=[r.req_pool_idx for r in self.reqs],
            sampling_info=self.sampling_info,
            bs_buckets=server_args.decode_bs_buckets,
            extend_buckets=server_args.prefill_token_buckets,
            context_buckets=server_args.context_buckets,
            dump_req_row=dump_req_row,
            lora_ids_list=[getattr(r, "lora_id", 0) for r in self.reqs],
        )
