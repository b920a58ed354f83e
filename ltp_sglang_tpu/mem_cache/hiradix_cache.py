"""Hierarchical radix cache: device KV + host-RAM second tier.

Counterpart of HiRadixCache/HiCacheController (mem_cache/hiradix_cache.py:26,
managers/cache_controller.py:215). ONE tree, two tiers per node (the
reference's design): evicting a node moves its KV rows into a host-RAM
arena (node.host_value) instead of deleting it, and a later prefix match
walks the SAME tree, loading host-backed spans back onto the device as it
goes — admission probing is O(match length), not a scan over stored
entries, and shared prefixes are stored once (both were called out on the
previous round's linear-scan design).

The reference's layer-wise H2D overlap (LayerDoneCounter) and the storage
(disk) tier are follow-ups behind the same node contract.
"""

from __future__ import annotations

import functools
import heapq
import logging
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ltp_sglang_tpu.mem_cache.allocator import TokenToKVPoolAllocator
from ltp_sglang_tpu.mem_cache.radix_cache import (
    MatchResult,
    RadixCache,
    TreeNode,
    _key_match,
)

logger = logging.getLogger(__name__)


class HostKVArena:
    """Host KV rows addressed by slot id (mirrors the device layout).

    With `storage_dir` set, the arena is FILE-BACKED (np.memmap): the OS
    page cache keeps the hot span in RAM and colder rows spill to disk —
    the reference's third (storage) tier (managers/cache_controller.py
    HiCacheStorage), collapsed into the same slot address space."""

    def __init__(self, runner, host_tokens: int, storage_dir=None):
        kd = np.asarray(jnp.zeros((), runner.k_cache.dtype)).dtype
        vd = np.asarray(jnp.zeros((), runner.v_cache.dtype)).dtype
        Lk, _, rk, lnk = runner.k_cache.shape
        Lv, _, rv, lnv = runner.v_cache.shape
        k_shape = (Lk, host_tokens + 1, rk, lnk)
        v_shape = (Lv, host_tokens + 1, rv, lnv)
        if storage_dir:
            import os

            os.makedirs(storage_dir, exist_ok=True)
            self.k = np.memmap(os.path.join(storage_dir, "kv_k.bin"),
                               dtype=kd, mode="w+", shape=k_shape)
            self.v = np.memmap(os.path.join(storage_dir, "kv_v.bin"),
                               dtype=vd, mode="w+", shape=v_shape)
        else:
            self.k = np.zeros(k_shape, kd)
            self.v = np.zeros(v_shape, vd)
        self.alloc = TokenToKVPoolAllocator(host_tokens)


class HiRadixCache(RadixCache):
    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator, runner,
                 page_size: int = 1, host_tokens: int = 1 << 20,
                 storage_dir=None):
        super().__init__(req_to_token_pool, token_to_kv_pool_allocator, page_size)
        self.runner = runner
        self.arena = HostKVArena(runner, host_tokens, storage_dir=storage_dir)
        self.num_host_hits = 0
        self.num_writebacks = 0

    # -------------------------------------------------------------- helpers
    def _split_node(self, child: TreeNode, split_len: int) -> TreeNode:
        """Host-aware split: host_value slices alongside value (either may
        be None on a given node)."""
        new_node = TreeNode()
        new_node.key = child.key[:split_len]
        new_node.parent = child.parent
        new_node.lock_ref = child.lock_ref
        new_node.children = {self._child_key(child.key[split_len:]): child}
        new_node.parent.children[self._child_key(new_node.key)] = new_node
        if child.value is not None:
            new_node.value = child.value[:split_len]
            child.value = child.value[split_len:]
        else:
            new_node.value = None
        hv = getattr(child, "host_value", None)
        if hv is not None:
            new_node.host_value = hv[:split_len]
            child.host_value = hv[split_len:]
        child.key = child.key[split_len:]
        child.parent = new_node
        return new_node

    def _load_back(self, node: TreeNode) -> bool:
        """Restore a host-backed node's device rows (keeps the host copy)."""
        n = len(node.key)
        slots = self.token_to_kv_pool_allocator.alloc(n)
        if slots is None:
            self.evict(n)
            slots = self.token_to_kv_pool_allocator.alloc(n)
        if slots is None:
            return False
        slots = np.asarray(slots, np.int32)
        hv = np.asarray(node.host_value)
        r = self.runner
        r.k_cache, r.v_cache = _hicache_write(
            r.k_cache, r.v_cache, jnp.asarray(slots),
            jnp.asarray(self.arena.k[:, hv]), jnp.asarray(self.arena.v[:, hv]),
        )
        node.value = slots
        self.evictable_size_ += n
        self.num_host_hits += 1
        return True

    # ---------------------------------------------------------------- match
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
                    if child.value is None and not self._load_back(child):
                        break
                    values.append(child.value)
                    node = child
                break
            if child.value is None and not self._load_back(child):
                break
            values.append(child.value)
            node = child
            key = key[prefix_len:]
        indices = (
            np.concatenate(values) if values else np.empty((0,), dtype=np.int32)
        )
        return MatchResult(indices, node)

    # ---------------------------------------------------------------- evict
    def _device_leaves(self) -> List[TreeNode]:
        """Nodes holding device rows with no device-backed descendants."""
        out = []

        def walk(node) -> bool:  # returns: subtree has device rows
            has_below = False
            for c in node.children.values():
                has_below |= walk(c)
            mine = node is not self.root_node and node.value is not None
            if mine and not has_below and node.lock_ref == 0:
                out.append(node)
            return has_below or mine

        walk(self.root_node)
        return out

    def evict(self, num_tokens: int):
        if self.disable:
            return
        leaves = self._device_leaves()
        heapq.heapify(leaves)
        freed = 0
        while freed < num_tokens and leaves:
            node = heapq.heappop(leaves)
            if node.value is None or node.lock_ref > 0:
                continue
            n = len(node.value)
            if getattr(node, "host_value", None) is None:
                hs = self.arena.alloc.alloc(n)
                if hs is None:
                    self._evict_host(n)
                    hs = self.arena.alloc.alloc(n)
                if hs is not None:
                    hs = np.asarray(hs, np.int32)
                    slots = np.asarray(node.value)
                    self.arena.k[:, hs] = np.asarray(self.runner.k_cache[:, slots])
                    self.arena.v[:, hs] = np.asarray(self.runner.v_cache[:, slots])
                    node.host_value = hs
                    self.num_writebacks += 1
            self.token_to_kv_pool_allocator.free(node.value)
            freed += n
            self.evictable_size_ -= n
            node.value = None
            if getattr(node, "host_value", None) is None:
                # No host copy could be made: the node is gone entirely.
                self._delete_host_leaf(node)
            parent = node.parent
            if (
                parent is not self.root_node
                and parent.value is not None
                and parent.lock_ref == 0
                and not any(c.value is not None for c in parent.children.values())
            ):
                heapq.heappush(leaves, parent)

    def _delete_host_leaf(self, node: TreeNode):
        if node.children:
            return  # mid-path node: keep the skeleton
        ck = self._child_key(node.key)
        if node.parent and node.parent.children.get(ck) is node:
            del node.parent.children[ck]

    def _evict_host(self, num_tokens: int):
        """Free host arena rows: drop host copies of nodes that still have
        device rows first (redundant), then host-only leaves (dead)."""
        nodes = []
        stack = [self.root_node]
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n is not self.root_node and getattr(n, "host_value", None) is not None:
                nodes.append(n)
        nodes.sort(key=lambda n: (n.value is None, n.last_access_time))
        freed = 0
        for n in nodes:
            if freed >= num_tokens:
                break
            if n.value is None and n.children:
                continue  # host-only mid-path: dropping would orphan children
            self.arena.alloc.free(n.host_value)
            freed += len(n.host_value)
            n.host_value = None
            if n.value is None:
                self._delete_host_leaf(n)

    def reset(self):
        super().reset()
        if hasattr(self, "arena"):
            self.arena.alloc.clear()


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _hicache_write(kc, vc, slots, k_rows, v_rows):
    kc = kc.at[:, slots].set(k_rows.astype(kc.dtype))
    vc = vc.at[:, slots].set(v_rows.astype(vc.dtype))
    return kc, vc
