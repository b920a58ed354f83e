"""RadixCache: token-prefix tree over KV slot indices.

Faithful port of the reference's host-side algorithm
(mem_cache/radix_cache.py:43-349 — TreeNode, match_prefix with node split,
insert dedup, cache_finished_req / cache_unfinished_req re-linking, LRU evict
with lock_ref protection). This logic is pure CPU bookkeeping and is identical
on TPU; values are numpy int32 arrays of KV slot ids. A C++ version (parity
with mem_cache/cpp_radix_tree/tree_v2.cpp) can replace it for scheduler CPU
headroom later.

KV ownership invariant (SURVEY A.3): every KV slot is owned by exactly one of
{request, tree, allocator free list}.
"""

from __future__ import annotations

import heapq
import time
from collections import defaultdict, deque
from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import numpy as np


class TreeNode:
    counter = 0

    def __init__(self):
        self.children = {}  # first token (or page tuple key) -> TreeNode
        self.parent: Optional[TreeNode] = None
        self.key: List[int] = []
        self.value: Optional[np.ndarray] = None  # kv slot ids, len == len(key)
        self.lock_ref = 0
        self.last_access_time = time.monotonic()
        self.id = TreeNode.counter
        TreeNode.counter += 1
        # SWA snapshot bookkeeping (mem_cache/swa_radix_cache.py): id of a
        # ring-arena region holding this node's last-window KV, the sequence
        # length the snapshot was taken at, and a pin held between a prefix
        # match and the snapshot load into the new request's ring.
        self.swa_snap: Optional[int] = None
        self.swa_snap_len: int = 0
        self.swa_pin: int = 0

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


def _key_match(key0: List[int], key1: List[int]) -> int:
    i = 0
    for a, b in zip(key0, key1):
        if a != b:
            break
        i += 1
    return i


@dataclass
class MatchResult:
    device_indices: np.ndarray  # matched kv slots
    last_node: TreeNode
    # SWA prefix reuse: node whose ring snapshot must be copied into the new
    # request's ring region before its first extend (None = no copy needed).
    swa_snap_node: Optional[TreeNode] = None


def radix_key(tokens, lora_id: int = 0):
    """KV content depends on the adapter, so the cache key must too
    (LoRA-aware prefix caching): encode the adapter id into every token.
    Vocabularies are < 2^24; adapter ids < 2^7 keep this in int32."""
    if not lora_id:
        return tokens
    shift = lora_id << 24
    return [t + shift for t in tokens]


class RadixCache:
    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator, page_size: int = 1,
                 disable: bool = False):
        self.req_to_token_pool = req_to_token_pool
        self.token_to_kv_pool_allocator = token_to_kv_pool_allocator
        self.page_size = page_size
        self.disable = disable
        # KV-event publishing (reference disaggregation/kv_events.py): when
        # a subscriber attaches (http /kv_events), store/remove/clear events
        # accumulate in a bounded deque for cache-aware external routers.
        self.kv_events: Optional[deque] = None
        self.reset()

    def enable_kv_events(self, maxlen: int = 4096):
        self.kv_events = deque(maxlen=maxlen)

    def _emit(self, action: str, node: "TreeNode"):
        if self.kv_events is None:
            return
        self.kv_events.append({
            "ts": time.time(),
            "action": action,  # block_stored | block_removed
            "node_id": node.id,
            "parent_id": node.parent.id if node.parent is not None else None,
            "token_ids": list(node.key),
        })

    def reset(self):
        self.root_node = TreeNode()
        self.root_node.key = []
        self.root_node.value = np.empty((0,), dtype=np.int32)
        self.root_node.lock_ref = 1
        self.evictable_size_ = 0
        self.protected_size_ = 0
        if getattr(self, "kv_events", None) is not None:
            self.kv_events.append({"ts": time.time(), "action": "all_blocks_cleared"})

    # ------------------------------------------------------------- matching
    def _child_key(self, key: List[int]):
        if self.page_size == 1:
            return key[0]
        return tuple(key[: self.page_size])

    def match_prefix(self, key: List[int]) -> MatchResult:
        if self.disable or not key:
            return MatchResult(np.empty((0,), dtype=np.int32), self.root_node)
        if self.page_size != 1:
            key = key[: (len(key) // self.page_size) * self.page_size]
        if not key:
            return MatchResult(np.empty((0,), dtype=np.int32), self.root_node)

        node = self.root_node
        values: List[np.ndarray] = []
        while key:
            ck = self._child_key(key)
            child = node.children.get(ck)
            if child is None:
                break
            child.last_access_time = time.monotonic()
            prefix_len = _key_match(child.key, key)
            if self.page_size != 1:
                prefix_len = (prefix_len // self.page_size) * self.page_size
            if prefix_len < len(child.key):
                if prefix_len > 0:
                    child = self._split_node(child, prefix_len)
                    values.append(child.value)
                    node = child
                break
            values.append(child.value)
            node = child
            key = key[prefix_len:]
        if values:
            indices = np.concatenate(values)
        else:
            indices = np.empty((0,), dtype=np.int32)
        return MatchResult(indices, node)

    def _split_node(self, child: TreeNode, split_len: int) -> TreeNode:
        """Split `child` so the first split_len tokens become a new parent."""
        new_node = TreeNode()
        new_node.key = child.key[:split_len]
        new_node.value = child.value[:split_len]
        new_node.parent = child.parent
        new_node.lock_ref = child.lock_ref
        new_node.children = {self._child_key(child.key[split_len:]): child}
        new_node.parent.children[self._child_key(new_node.key)] = new_node

        child.key = child.key[split_len:]
        child.value = child.value[split_len:]
        child.parent = new_node
        return new_node

    # ------------------------------------------------------------- insertion
    def insert(self, key: List[int], value: np.ndarray) -> int:
        """Insert key→value; returns length of the prefix that already existed
        (whose kv slots in `value` are duplicates the caller must free)."""
        if self.disable:
            return 0
        if self.page_size != 1:
            aligned = (len(key) // self.page_size) * self.page_size
            key, value = key[:aligned], value[:aligned]
        return self._insert_helper(self.root_node, list(key), value)

    def _insert_helper(self, node: TreeNode, key: List[int], value: np.ndarray) -> int:
        node.last_access_time = time.monotonic()
        if not key:
            return 0
        total_prefix = 0
        while key:
            ck = self._child_key(key)
            child = node.children.get(ck)
            if child is None:
                new_node = TreeNode()
                new_node.parent = node
                new_node.key = list(key)
                new_node.value = value
                node.children[ck] = new_node
                self.evictable_size_ += len(value)
                self._emit("block_stored", new_node)
                return total_prefix
            child.last_access_time = time.monotonic()
            prefix_len = _key_match(child.key, key)
            if self.page_size != 1:
                prefix_len = (prefix_len // self.page_size) * self.page_size
                if prefix_len == 0:
                    # Shared child key page diverges mid-page; cannot share.
                    return total_prefix
            if prefix_len == len(child.key):
                if child.value is None:
                    # Hierarchical tiers leave valueless skeleton nodes
                    # (host/storage-backed or revoked): ADOPT the freshly
                    # computed rows instead of counting them as duplicates
                    # the caller would free (hiradix_cache.py).
                    child.value = value[:prefix_len]
                    self.evictable_size_ += prefix_len
                else:
                    total_prefix += prefix_len
                node = child
                key = key[prefix_len:]
                value = value[prefix_len:]
                if not key:
                    return total_prefix
            else:
                # Split and attach remainder.
                new_parent = self._split_node(child, prefix_len)
                if new_parent.value is None:
                    new_parent.value = value[:prefix_len]
                    self.evictable_size_ += prefix_len
                else:
                    total_prefix += prefix_len
                if len(key) > prefix_len:
                    rem_key = key[prefix_len:]
                    rem_val = value[prefix_len:]
                    new_node = TreeNode()
                    new_node.parent = new_parent
                    new_node.key = list(rem_key)
                    new_node.value = rem_val
                    new_parent.children[self._child_key(rem_key)] = new_node
                    self.evictable_size_ += len(rem_val)
                    self._emit("block_stored", new_node)
                return total_prefix
        return total_prefix

    # ----------------------------------------------------- request lifecycle
    def cache_finished_req(self, req):
        """Insert the finished request's tokens; free duplicated overlap and
        the request slot (radix_cache.py:208-243)."""
        if self.disable:
            kv = self.req_to_token_pool.req_to_token[
                req.req_pool_idx, : len(req.origin_input_ids) + len(req.output_ids) - 1
            ]
            self.token_to_kv_pool_allocator.free(kv)
            self.req_to_token_pool.free(req.req_pool_idx)
            return

        token_ids = radix_key(
            (req.origin_input_ids + req.output_ids)[:-1], getattr(req, "lora_id", 0)
        )
        all_len = len(token_ids)
        if self.page_size != 1:
            all_len = (all_len // self.page_size) * self.page_size
        kv_indices = self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len].copy()

        new_prefix_len = self.insert(token_ids[:all_len], kv_indices)
        # Slots [len(prefix_indices), new_prefix_len) duplicate existing tree
        # entries — free them (dedup).
        old_prefix_len = len(req.prefix_indices)
        if new_prefix_len > old_prefix_len:
            self.token_to_kv_pool_allocator.free(
                kv_indices[old_prefix_len:new_prefix_len]
            )
        # Free the non-aligned tail beyond all_len.
        full_len = len(req.origin_input_ids) + len(req.output_ids) - 1
        if full_len > all_len:
            tail = self.req_to_token_pool.req_to_token[
                req.req_pool_idx, all_len:full_len
            ]
            self.token_to_kv_pool_allocator.free(tail)

        self.req_to_token_pool.free(req.req_pool_idx)
        self.dec_lock_ref(req.last_node)
        req.lock_ref_held = False

    def cache_unfinished_req(self, req):
        """At a chunk boundary: publish computed KV into the tree and re-link
        the request to the canonical tree slots (radix_cache.py:245-288)."""
        if self.disable:
            return
        token_ids = radix_key(req.fill_ids, getattr(req, "lora_id", 0))
        all_len = len(token_ids)
        if self.page_size != 1:
            all_len = (all_len // self.page_size) * self.page_size
        kv_indices = self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len].copy()

        new_prefix_len = self.insert(token_ids[:all_len], kv_indices)
        old_prefix_len = len(req.prefix_indices)
        if new_prefix_len > old_prefix_len:
            self.token_to_kv_pool_allocator.free(
                kv_indices[old_prefix_len:new_prefix_len]
            )

        # Re-match to get canonical indices and the new last node.
        match = self.match_prefix(token_ids[:all_len])
        assert len(match.device_indices) == all_len, (
            len(match.device_indices), all_len,
        )
        # Rewrite req_to_token rows to canonical tree slots so concurrent
        # requests share pages immediately.
        self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len] = (
            match.device_indices
        )
        self.dec_lock_ref(req.last_node)
        self.inc_lock_ref(match.last_node)
        req.prefix_indices = match.device_indices
        req.last_node = match.last_node
        req.lock_ref_held = True

    # --------------------------------------------------------------- eviction
    def evict(self, num_tokens: int):
        if self.disable:
            return
        leaves = self._collect_leaves()
        heapq.heapify(leaves)
        freed = 0
        while freed < num_tokens and leaves:
            node = heapq.heappop(leaves)
            if node is self.root_node:
                break
            if node.lock_ref > 0:
                continue
            self.token_to_kv_pool_allocator.free(node.value)
            freed += len(node.value)
            self._delete_leaf(node)
            parent = node.parent
            if parent is not self.root_node and not parent.children and parent.lock_ref == 0:
                heapq.heappush(leaves, parent)

    def _delete_leaf(self, node: TreeNode):
        ck = self._child_key(node.key)
        if node.parent and node.parent.children.get(ck) is node:
            del node.parent.children[ck]
        self.evictable_size_ -= len(node.value)
        self._emit("block_removed", node)

    def _collect_leaves(self) -> List[TreeNode]:
        out = []
        stack = [self.root_node]
        while stack:
            node = stack.pop()
            if not node.children and node is not self.root_node:
                if node.lock_ref == 0:
                    out.append(node)
            else:
                stack.extend(node.children.values())
        return out

    # ------------------------------------------------------------------ locks
    def inc_lock_ref(self, node: TreeNode):
        while node is not None and node is not self.root_node:
            if node.lock_ref == 0:
                self.evictable_size_ -= len(node.value)
                self.protected_size_ += len(node.value)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode):
        while node is not None and node is not self.root_node:
            if node.lock_ref == 1:
                self.evictable_size_ += len(node.value)
                self.protected_size_ -= len(node.value)
            node.lock_ref -= 1
            node = node.parent

    def evictable_size(self) -> int:
        return self.evictable_size_

    def protected_size(self) -> int:
        return self.protected_size_

    def total_size(self) -> int:
        total = 0
        stack = [self.root_node]
        while stack:
            node = stack.pop()
            total += len(node.value) if node.value is not None else 0
            stack.extend(node.children.values())
        return total

    def pretty_print(self):
        def helper(node, indent):
            for child in node.children.values():
                print(" " * indent, len(child.key), child.key[:8], f"lock={child.lock_ref}")
                helper(child, indent + 2)
        helper(self.root_node, 0)
        print(f"evictable={self.evictable_size_} protected={self.protected_size_}")
