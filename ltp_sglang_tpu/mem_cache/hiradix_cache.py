"""Hierarchical radix cache: device KV + host-RAM second tier.

Counterpart of HiRadixCache/HiCacheController (mem_cache/hiradix_cache.py:26,
managers/cache_controller.py:215), reduced to the write-back policy: pages
evicted from the device tree are stashed in a host LRU store keyed by their
token prefix; a later prefix match that misses on device loads the pages back
(alloc + device write + tree reinsert) before prefill admission. The
reference's layer-wise H2D overlap (LayerDoneCounter) and storage tier are
follow-ups behind the same interface.
"""

from __future__ import annotations

import collections
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.mem_cache.radix_cache import MatchResult, RadixCache

logger = logging.getLogger(__name__)


class HostKVStore:
    """Token-prefix keyed host store (LRU by insertion refresh)."""

    def __init__(self, max_tokens: int):
        self.max_tokens = max_tokens
        self.cur_tokens = 0
        # key: tuple(tokens) -> (k_rows [L, n, r, ln] np, v_rows)
        self.store: "collections.OrderedDict[Tuple, Tuple]" = collections.OrderedDict()

    def put(self, tokens: Tuple[int, ...], k_rows: np.ndarray, v_rows: np.ndarray):
        n = len(tokens)
        if n > self.max_tokens:
            return
        while self.cur_tokens + n > self.max_tokens and self.store:
            _, (ko, _) = self.store.popitem(last=False)
            self.cur_tokens -= ko.shape[1]
        self.store[tokens] = (k_rows, v_rows)
        self.cur_tokens += n

    def best_common_prefix(self, tokens: List[int]):
        """(key, common_len) of the stored entry sharing the longest common
        prefix with `tokens` (linear scan; the C++ tier replaces this for
        scale)."""
        best, best_n = None, 0
        t = tuple(tokens)
        for key in self.store:
            n = 0
            for a, b in zip(key, t):
                if a != b:
                    break
                n += 1
            if n > best_n:
                best, best_n = key, n
        if best is not None:
            self.store.move_to_end(best)
        return best, best_n


class HiRadixCache(RadixCache):
    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator, runner,
                 page_size: int = 1, host_tokens: int = 1 << 20):
        super().__init__(req_to_token_pool, token_to_kv_pool_allocator, page_size)
        self.runner = runner
        self.host_store = HostKVStore(host_tokens)
        self.num_host_hits = 0
        self.num_writebacks = 0

    # Write-back on eviction: stash evicted leaf pages to host.
    def evict(self, num_tokens: int):
        import heapq
        import time as _time

        leaves = self._collect_leaves()
        heapq.heapify(leaves)
        freed = 0
        while freed < num_tokens and leaves:
            node = heapq.heappop(leaves)
            if node is self.root_node or node.lock_ref > 0:
                continue
            # Reconstruct the full token key for this node's span.
            key_parts = []
            cur = node
            while cur is not None and cur is not self.root_node:
                key_parts.append(cur.key)
                cur = cur.parent
            full_key = tuple(t for part in reversed(key_parts) for t in part)
            slots = np.asarray(node.value)
            try:
                k_rows = np.asarray(self.runner.k_cache[:, slots])
                v_rows = np.asarray(self.runner.v_cache[:, slots])
                # Store the whole path's tokens with only this node's rows?
                # The loadback needs the full prefix rows; store node-local
                # rows keyed by the full path (ancestors stay on device or
                # have their own entries).
                self.host_store.put(full_key, k_rows, v_rows)
                self.num_writebacks += 1
            except Exception as e:  # pragma: no cover
                logger.warning("hicache writeback failed: %s", e)
            self.token_to_kv_pool_allocator.free(node.value)
            freed += len(node.value)
            self._delete_leaf(node)
            parent = node.parent
            if parent is not self.root_node and not parent.children and parent.lock_ref == 0:
                heapq.heappush(leaves, parent)

    def match_prefix(self, key: List[int]) -> MatchResult:
        match = super().match_prefix(key)
        dev_len = len(match.device_indices)
        if dev_len >= len(key):
            return match
        # Device miss beyond dev_len: probe the host tier. Entries hold
        # node-local spans (the tail of their path); only entries that start
        # exactly where the device prefix ends are loadable, so pick the
        # best-matching one among those.
        host_key, common = None, dev_len
        for cand in self.host_store.store:
            span_c = self.host_store.store[cand][0].shape[1]
            if len(cand) - span_c != dev_len:
                continue
            n = 0
            for a, b in zip(cand, key):
                if a != b:
                    break
                n += 1
            if n > common:
                host_key, common = cand, n
        if host_key is None:
            return match
        self.host_store.store.move_to_end(host_key)
        k_rows, v_rows = self.host_store.store[host_key]
        take = common - dev_len
        slots = self.token_to_kv_pool_allocator.alloc(take)
        if slots is None:
            # Make device room (evicted pages themselves write back to host).
            self.evict(take)
            slots = self.token_to_kv_pool_allocator.alloc(take)
        if slots is None:
            return match
        slots = np.asarray(slots, dtype=np.int32)
        r = self.runner
        r.k_cache, r.v_cache = _hicache_write(
            r.k_cache, r.v_cache, jnp.asarray(slots),
            jnp.asarray(k_rows[:, :take]), jnp.asarray(v_rows[:, :take]),
        )
        value = (
            np.concatenate([np.asarray(match.device_indices), slots])
            if dev_len
            else slots
        )
        dup = self.insert(list(key[:common]), value)
        if dup > dev_len:
            self.token_to_kv_pool_allocator.free(slots[: dup - dev_len])
        self.num_host_hits += 1
        return super().match_prefix(key)


import functools


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _hicache_write(kc, vc, slots, k_rows, v_rows):
    kc = kc.at[:, slots].set(k_rows.astype(kc.dtype))
    vc = vc.at[:, slots].set(v_rows.astype(vc.dtype))
    return kc, vc
