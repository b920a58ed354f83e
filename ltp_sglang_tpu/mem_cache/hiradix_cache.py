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
    """Write policies (reference hiradix_cache.py:120-204): `write_back`
    mirrors device rows to host only at eviction time (round-2 behavior);
    `write_through` copies every finished request's nodes to host
    immediately; `write_through_selective` does so once a node has been hit
    `write_threshold` times. Host load-back runs on a BACKGROUND worker
    (reference HiCacheController threads + LayerDoneCounter,
    managers/cache_controller.py:32-62): match_prefix allocates device slots
    and returns at once while the worker does the slow host-arena gather
    (memmap reads) and the H2D — both overlap any in-flight decode — and the
    scheduler fences with drain_pending_loads() before the next forward that
    could read those slots."""

    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator, runner,
                 page_size: int = 1, host_tokens: int = 1 << 20,
                 storage_dir=None, write_policy: str = "write_through_selective",
                 write_threshold: int = 2, layer_chunks: int = 4,
                 storage_url=None):
        super().__init__(req_to_token_pool, token_to_kv_pool_allocator, page_size)
        self.runner = runner
        self.layer_chunks = max(1, int(layer_chunks))
        self.arena = HostKVArena(runner, host_tokens, storage_dir=storage_dir)
        self.num_host_hits = 0
        self.num_writebacks = 0
        # Remote hash-keyed third tier (mem_cache/hicache_storage.py):
        # host-arena eviction demotes spans there instead of dropping them;
        # match_prefix promotes them back host -> device on a hit.
        self.storage = None
        if storage_url:
            from ltp_sglang_tpu.mem_cache.hicache_storage import HiCacheStorage

            self.storage = HiCacheStorage(storage_url)
        assert write_policy in (
            "write_back", "write_through", "write_through_selective"
        ), write_policy
        self.write_policy = write_policy
        self.write_threshold = write_threshold
        import concurrent.futures

        self._loader = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="hicache-load"
        )
        self._pending_loads: List = []  # futures resolving to (slots, k, v)

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
        sk = getattr(child, "storage_key", None)
        if sk is not None and self.storage is not None:
            from ltp_sglang_tpu.mem_cache.hicache_storage import node_path_hash

            if hv is None and child.value is None:
                # Storage-only span: re-key the blob as two spans so each
                # side stays independently addressable.
                got = self.storage.get(sk)
                self.storage.delete(sk)
                child.storage_key = None
                if got is not None:
                    k_rows, v_rows = got
                    self.storage.put(
                        node_path_hash(new_node),
                        k_rows[:, :split_len], v_rows[:, :split_len],
                    )
                    new_node.storage_key = node_path_hash(new_node)
                    self.storage.put(
                        node_path_hash(child),
                        k_rows[:, split_len:], v_rows[:, split_len:],
                    )
                    child.storage_key = node_path_hash(child)
            else:
                # Host/device copy exists: the remote blob is stale for the
                # new span shapes — revoke it (re-demotion re-creates it).
                self.storage.delete(sk)
                child.storage_key = None
        return new_node

    def _promote(self, node: TreeNode) -> bool:
        """Bring a valueless node's rows back onto the device, pulling from
        the remote storage tier into the host arena first when its host copy
        was demoted (reference storage prefetch + load_back path)."""
        if getattr(node, "host_value", None) is None:
            if not self._fetch_from_storage(node):
                return False
        return self._load_back(node)

    def _fetch_from_storage(self, node: TreeNode) -> bool:
        """Remote -> host arena: fetch the node's span by content-hash key
        and stage it in host slots; a miss (revoked / foreign store) drops
        the skeleton so the walk cleanly mismatches."""
        sk = getattr(node, "storage_key", None)
        if self.storage is None or sk is None:
            return False
        got = self.storage.get(sk)
        if got is None:
            node.storage_key = None
            self._delete_host_leaf(node)
            return False
        k_rows, v_rows = got
        n = len(node.key)
        hs = self.arena.alloc.alloc(n)
        if hs is None:
            self._evict_host(n)
            hs = self.arena.alloc.alloc(n)
        if hs is None:
            return False
        hs = np.asarray(hs, np.int32)
        self.arena.k[:, hs] = k_rows
        self.arena.v[:, hs] = v_rows
        node.host_value = hs
        return True

    def _load_back(self, node: TreeNode) -> bool:
        """Restore a host-backed node's device rows (keeps the host copy).
        The slow parts — host-arena gather (possibly memmap page-ins) and
        the H2D transfer — run on the loader thread and overlap in-flight
        device work; the device slots are claimed and returned NOW. The
        scheduler fences via drain_pending_loads() before the next forward."""
        n = len(node.key)
        slots = self.token_to_kv_pool_allocator.alloc(n)
        if slots is None:
            self.evict(n)
            slots = self.token_to_kv_pool_allocator.alloc(n)
        if slots is None:
            return False
        slots = np.asarray(slots, np.int32)
        hv = np.asarray(node.host_value)

        # LAYER-CHUNKED pipeline (the TPU translation of the reference's
        # LayerDoneCounter, managers/cache_controller.py:32-62): the load is
        # split into layer ranges; each chunk's host gather + H2D starts as
        # soon as the previous finishes, and the fence below SCATTERS chunks
        # as they arrive — so chunk k's device scatter overlaps chunk k+1's
        # host gather/H2D, and at fence time only the tail chunk's work
        # remains, instead of the whole transfer.
        L = self.runner.k_cache.shape[0]
        n_chunks = min(int(self.layer_chunks), L) or 1
        bounds = np.linspace(0, L, n_chunks + 1, dtype=np.int64)
        slots_dev = jnp.asarray(slots)

        def gather_chunk(lo, hi):
            # jnp.asarray starts the device_put; the transfer overlaps both
            # in-flight device work and later chunks' memmap page-ins.
            return (
                jnp.asarray(self.arena.k[lo:hi, hv]),
                jnp.asarray(self.arena.v[lo:hi, hv]),
            )

        chunks = []
        for ci in range(n_chunks):
            lo, hi = int(bounds[ci]), int(bounds[ci + 1])
            if hi > lo:
                chunks.append((lo, self._loader.submit(gather_chunk, lo, hi)))
        self._pending_loads.append((slots_dev, chunks))
        node.value = slots
        self.evictable_size_ += n
        self.num_host_hits += 1
        return True

    def drain_pending_loads(self):
        """Fence: dispatch every pending host->device load's scatter before
        a forward can read the claimed slots (LayerDoneCounter consumer
        analog, scheduler.py:1703-1706). Chunks scatter as their transfers
        complete (per-layer-range overlap; see _load_back)."""
        if not self._pending_loads:
            return
        pending, self._pending_loads = self._pending_loads, []
        r = self.runner
        for slots_dev, chunks in pending:
            for lo, fut in chunks:
                k_rows, v_rows = fut.result()
                r.k_cache, r.v_cache = _hicache_write_layers(
                    r.k_cache, r.v_cache, jnp.int32(lo), slots_dev,
                    k_rows, v_rows,
                )

    # ------------------------------------------------------- write policies
    def _write_through_node(self, node: TreeNode) -> bool:
        if getattr(node, "host_value", None) is not None or node.value is None:
            return True
        n = len(node.value)
        hs = self.arena.alloc.alloc(n)
        if hs is None:
            self._evict_host(n)
            hs = self.arena.alloc.alloc(n)
        if hs is None:
            return False
        hs = np.asarray(hs, np.int32)
        slots = np.asarray(node.value)
        self.arena.k[:, hs] = np.asarray(self.runner.k_cache[:, slots])
        self.arena.v[:, hs] = np.asarray(self.runner.v_cache[:, slots])
        node.host_value = hs
        self.num_writebacks += 1
        return True

    def _maybe_write_through(self, last_node: TreeNode):
        if self.write_policy == "write_back":
            return
        node = last_node
        while node is not None and node is not self.root_node:
            hits = getattr(node, "hit_count", 0) + 1
            node.hit_count = hits
            if (
                self.write_policy == "write_through"
                or hits >= self.write_threshold
            ):
                if not self._write_through_node(node):
                    break
            node = node.parent

    def _deepest_node(self, key) -> TreeNode:
        node = self.root_node
        key = list(key)
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                break
            pl = _key_match(child.key, key)
            if pl < len(child.key):
                break  # partial: the full-node path ends at `node`
            node = child
            key = key[pl:]
        return node

    def cache_finished_req(self, req):
        from ltp_sglang_tpu.mem_cache.radix_cache import radix_key

        super().cache_finished_req(req)
        if self.disable or self.write_policy == "write_back":
            return
        key = radix_key(
            (req.origin_input_ids + req.output_ids)[:-1],
            getattr(req, "lora_id", 0),
        )
        self._maybe_write_through(self._deepest_node(key))

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
                    if child.value is None and not self._promote(child):
                        break
                    values.append(child.value)
                    node = child
                break
            if child.value is None and not self._promote(child):
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
        # Pending loads target slots that eviction's D2H copies could read;
        # fence first (same reason the scheduler fences before forwards).
        self.drain_pending_loads()
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
            if (
                getattr(node, "host_value", None) is None
                and getattr(node, "storage_key", None) is None
            ):
                # No host or remote copy could be made: the node is gone.
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
        device rows first (redundant), then host-only leaves. With the
        remote storage tier configured, host-only spans are DEMOTED there
        (hash-keyed) instead of dying — the tree skeleton stays and a later
        match promotes them back through the arena."""
        from ltp_sglang_tpu.mem_cache.hicache_storage import node_path_hash

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
            if n.value is None and n.children and self.storage is None:
                continue  # host-only mid-path: dropping would orphan children
            if n.value is None and self.storage is not None:
                if getattr(n, "storage_key", None) is None:
                    hs = np.asarray(n.host_value)
                    key = node_path_hash(n)
                    self.storage.put(key, self.arena.k[:, hs], self.arena.v[:, hs])
                    n.storage_key = key
            self.arena.alloc.free(n.host_value)
            freed += len(n.host_value)
            n.host_value = None
            if n.value is None and getattr(n, "storage_key", None) is None:
                self._delete_host_leaf(n)

    def reset(self):
        if hasattr(self, "_pending_loads"):
            self.drain_pending_loads()
        super().reset()
        if hasattr(self, "arena"):
            self.arena.alloc.clear()


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _hicache_write(kc, vc, slots, k_rows, v_rows):
    kc = kc.at[:, slots].set(k_rows.astype(kc.dtype))
    vc = vc.at[:, slots].set(v_rows.astype(vc.dtype))
    return kc, vc


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _hicache_write_layers(kc, vc, layer_lo, slots, k_rows, v_rows):
    """Scatter one layer-range chunk [Lc, n, r, ln] into the pools at layer
    offset layer_lo (per-layer-overlap load-back; see _load_back)."""
    Lc = k_rows.shape[0]
    li = layer_lo + jnp.arange(Lc, dtype=jnp.int32)
    kc = kc.at[li[:, None], slots[None, :]].set(k_rows.astype(kc.dtype))
    vc = vc.at[li[:, None], slots[None, :]].set(v_rows.astype(vc.dtype))
    return kc, vc
