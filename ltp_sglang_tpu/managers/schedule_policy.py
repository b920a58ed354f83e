"""Scheduling policy and admission control.

Port of managers/schedule_policy.py: priority policies (:62-75 — cache-aware
LPM / DFS-weight, cache-agnostic FCFS / LOF / random) and the PrefillAdder
four-budget admission logic (:271-569, detailed in SURVEY A.1). Pure host
logic, ported faithfully.
"""

from __future__ import annotations

import logging
import random
from collections import defaultdict
from enum import Enum, auto
from typing import List, Optional

from ltp_sglang_tpu.managers.schedule_batch import (
    CLIP_MAX_NEW_TOKENS_ESTIMATION,
    Req,
)

logger = logging.getLogger(__name__)

IN_BATCH_PREFIX_CACHING_CHECK_THRESHOLD = 32


class CacheAwarePolicy(Enum):
    LPM = "lpm"
    DFS_WEIGHT = "dfs-weight"


class CacheAgnosticPolicy(Enum):
    FCFS = "fcfs"
    LOF = "lof"
    RANDOM = "random"


class AddReqResult(Enum):
    CONTINUE = auto()
    NO_TOKEN = auto()
    OTHER = auto()


class SchedulePolicy:
    def __init__(self, policy: str, tree_cache, enable_priority: bool = False):
        self.tree_cache = tree_cache
        try:
            self.policy = CacheAwarePolicy(policy)
        except ValueError:
            self.policy = CacheAgnosticPolicy(policy)
        if tree_cache is None or getattr(tree_cache, "disable", False):
            if isinstance(self.policy, CacheAwarePolicy):
                self.policy = CacheAgnosticPolicy.FCFS

    def calc_priority(self, waiting_queue: List[Req]):
        if isinstance(self.policy, CacheAgnosticPolicy):
            if self.policy == CacheAgnosticPolicy.LOF:
                waiting_queue.sort(key=lambda r: -r.sampling_params.max_new_tokens)
            elif self.policy == CacheAgnosticPolicy.RANDOM:
                random.shuffle(waiting_queue)
            return

        # Cache-aware: compute prefix matches now (in-flight aware).
        for req in waiting_queue:
            req.init_next_round_input(self.tree_cache)

        if self.policy == CacheAwarePolicy.LPM:
            waiting_queue.sort(key=lambda r: -len(r.prefix_indices))
        elif self.policy == CacheAwarePolicy.DFS_WEIGHT:
            self._sort_by_dfs_weight(waiting_queue)

    def _sort_by_dfs_weight(self, waiting_queue: List[Req]):
        last_node_to_reqs = defaultdict(list)
        for req in waiting_queue:
            last_node_to_reqs[req.last_node].append(req)
        node_to_weight = defaultdict(int)
        for node in last_node_to_reqs:
            node_to_weight[node] = len(last_node_to_reqs[node])
        # Propagate weights to ancestors, then DFS-order the queue.
        for node in list(node_to_weight.keys()):
            n = node
            while n is not None and getattr(n, "parent", None) is not None:
                node_to_weight[n.parent] += node_to_weight[node]
                n = n.parent
        q = []

        def dfs(cur):
            if cur in last_node_to_reqs:
                q.extend(last_node_to_reqs[cur])
            children = sorted(
                cur.children.values(), key=lambda c: -node_to_weight[c]
            ) if hasattr(cur, "children") else []
            for c in children:
                dfs(c)

        root = self.tree_cache.root_node
        dfs(root)
        # Requests whose last_node fell outside the tree walk (e.g. root=None)
        remaining = [r for r in waiting_queue if r not in set(q)]
        waiting_queue[:] = q + remaining


class PrefillAdder:
    """Token-budget admission for one prefill batch (schedule_policy.py:271).

    Budgets (SURVEY A.1): rem_total_tokens (probabilistic future decode
    reserve), cur_rem_tokens (this batch's immediate allocation),
    rem_input_tokens (max_prefill_tokens), rem_chunk_tokens
    (chunked_prefill_size).
    """

    def __init__(
        self,
        page_size: int,
        tree_cache,
        token_to_kv_pool_allocator,
        running_batch,
        new_token_ratio: float,
        max_prefill_tokens: int,
        chunked_prefill_size: Optional[int],
        mixed_with_decode_tokens: int = 0,
    ):
        self.page_size = page_size
        self.tree_cache = tree_cache
        self.allocator = token_to_kv_pool_allocator
        self.new_token_ratio = new_token_ratio

        available = token_to_kv_pool_allocator.available_size()
        evictable = tree_cache.evictable_size() if tree_cache is not None else 0
        self.rem_total_token_offset = mixed_with_decode_tokens
        self.cur_rem_token_offset = mixed_with_decode_tokens
        self._available_and_evictable = available + evictable

        self.rem_input_tokens = max_prefill_tokens - mixed_with_decode_tokens
        if chunked_prefill_size is not None and chunked_prefill_size > 0:
            self.rem_chunk_tokens = chunked_prefill_size - mixed_with_decode_tokens
        else:
            self.rem_chunk_tokens = None

        self.can_run_list: List[Req] = []
        self.new_chunked_req: Optional[Req] = None
        self.log_hit_tokens = 0
        self.log_input_tokens = 0

        if running_batch is not None:
            # Reserve probabilistic decode headroom for running requests.
            self.rem_total_token_offset += sum(
                [
                    min(
                        r.sampling_params.max_new_tokens - len(r.output_ids),
                        CLIP_MAX_NEW_TOKENS_ESTIMATION,
                    )
                    * self.new_token_ratio
                    for r in running_batch.reqs
                ]
            )

    @property
    def rem_total_tokens(self):
        return self._available_and_evictable - self.rem_total_token_offset

    @property
    def cur_rem_tokens(self):
        return self._available_and_evictable - self.cur_rem_token_offset

    def budget_state(self) -> AddReqResult:
        if self.rem_total_tokens <= 0 or self.cur_rem_tokens <= 0:
            return AddReqResult.NO_TOKEN
        if self.rem_input_tokens <= 0 or (
            self.rem_chunk_tokens is not None and self.rem_chunk_tokens <= 0
        ):
            return AddReqResult.OTHER
        return AddReqResult.CONTINUE

    def _update_prefill_budget(self, prefix_len: int, extend_input_len: int,
                               max_new_tokens: int):
        self.rem_total_token_offset += extend_input_len + max_new_tokens
        self.cur_rem_token_offset += extend_input_len
        self.rem_input_tokens -= extend_input_len
        if self.rem_chunk_tokens is not None:
            self.rem_chunk_tokens -= extend_input_len
        self.log_hit_tokens += prefix_len
        self.log_input_tokens += extend_input_len

    def add_chunked_req(self, req: Req) -> bool:
        """Continue an in-flight chunked request; returns whether it is
        *still* chunked after this round (schedule_policy.py:382-398)."""
        truncated = req.extend_input_len > self.rem_chunk_tokens
        req.extend_input_len = min(req.extend_input_len, self.rem_chunk_tokens)
        req.fill_ids = req.fill_ids[: len(req.prefix_indices) + req.extend_input_len]
        self.can_run_list.append(req)
        self._update_prefill_budget(
            len(req.prefix_indices),
            req.extend_input_len,
            min(req.sampling_params.max_new_tokens, CLIP_MAX_NEW_TOKENS_ESTIMATION)
            if not truncated
            else 0,
        )
        return truncated

    def add_one_req(self, req: Req) -> AddReqResult:
        total_tokens = req.extend_input_len + min(
            req.sampling_params.max_new_tokens, CLIP_MAX_NEW_TOKENS_ESTIMATION
        )
        input_tokens = (
            -(-req.extend_input_len // self.page_size) * self.page_size
        )
        prefix_len = len(req.prefix_indices)

        if total_tokens >= self.rem_total_tokens:
            return AddReqResult.NO_TOKEN
        if input_tokens > self.rem_input_tokens and len(self.can_run_list) != 0:
            return AddReqResult.OTHER

        if self.rem_chunk_tokens is None or input_tokens <= self.rem_chunk_tokens:
            # Non-chunked admission. (The radix lock is taken in
            # prepare_for_extend, before any allocation can trigger eviction.)
            self.can_run_list.append(req)
            self._update_prefill_budget(
                prefix_len,
                req.extend_input_len,
                min(req.sampling_params.max_new_tokens, CLIP_MAX_NEW_TOKENS_ESTIMATION),
            )
        else:
            # Chunked prefill: truncate to the page-aligned chunk budget.
            trunc = self.rem_chunk_tokens - self.page_size + 1
            trunc = (trunc // self.page_size) * self.page_size if self.page_size > 1 else trunc
            if trunc <= 0:
                return AddReqResult.OTHER
            req.extend_input_len = trunc
            req.fill_ids = req.fill_ids[: prefix_len + trunc]
            self.can_run_list.append(req)
            self.new_chunked_req = req
            self._update_prefill_budget(prefix_len, trunc, 0)

        return self.budget_state()
