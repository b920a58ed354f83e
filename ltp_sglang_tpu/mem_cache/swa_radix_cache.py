"""SWARadixCache: cross-request prefix reuse for sliding-window models.

Reference counterpart: mem_cache/swa_radix_cache.py (1025 LoC) + SWAKVPool —
there, windowed layers get per-token slots in a second pool and prefix nodes
"tombstone" their SWA KV once it falls out of every in-window suffix; a match
is valid only if the last `window` tokens of the matched prefix still hold
SWA KV.

TPU-native redesign on top of the ring pools (model_runner SWA pool /
RingKVAllocator): windowed layers store KV in fixed per-request RING regions
addressed by position (slot = region_base + pos % ring), so there are no
per-token SWA slots for a tree to own. Instead, when a request finishes, its
ring region — which holds exactly the last `ring >= window + ext_cap`
positions, i.e. the reference's "un-tombstoned" suffix — is copied verbatim
into a SNAPSHOT region of the same arena (one contiguous device-to-device
copy, O(window) bytes). The radix tree (full-attention layers use the normal
slot values; all-SWA trees store positional values that are recomputed per
row) attaches the snapshot to the node where the donor ended.

A later request matching a prefix of length L can reuse it iff some snapshot
taken at donor length D covers positions [L - window, L):

    D <= L:                usable = D   (always covered: ring holds the
                                         donor's final `ring` positions)
    L < D <= L + ring - W: usable = L   (the donor's extra positions beyond
                                         L land at ring slots the new request
                                         overwrites before reading them)

so the match is truncated to the best `usable` over the snapshot on the
matched path's ancestors (D <= L) and descendants (D > L, same prefix).
Loading a snapshot is the same verbatim region copy into the new request's
ring: slot-within-ring = pos % ring is row-independent, so copied positions
land exactly where the attention mask expects them, and stale donor
positions >= usable are overwritten by the new request's own extend writes
before any query reads them (a chunk's KV writes land before its reads).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

from ltp_sglang_tpu.mem_cache.radix_cache import (
    MatchResult,
    RadixCache,
    TreeNode,
    radix_key,
)

logger = logging.getLogger(__name__)


class SWARadixCache(RadixCache):
    def __init__(
        self,
        req_to_token_pool,
        token_to_kv_pool_allocator,
        runner,
        page_size: int = 1,
    ):
        assert page_size == 1, "SWA ring regions are position-addressed"
        super().__init__(req_to_token_pool, token_to_kv_pool_allocator, page_size)
        self.runner = runner
        self.window = int(runner.swa_window)
        self.ring = int(runner.swa_ring)
        self.n_snap = int(runner.swa_snap_count)
        # Positional mode: ALL layers slide (RingKVAllocator) — tree values
        # are donor ring slots, meaningless across rows; the scheduler
        # rewrites matched prefixes positionally for the new row.
        self.positional = bool(getattr(runner, "ring_size", 0))
        self._free_snaps = list(range(self.n_snap))
        self._snap_nodes = {}  # snap_id -> TreeNode
        self._raw_match = False  # internal callers want untruncated matches

    # ---------------------------------------------------------------- match
    def match_prefix(self, key, req=None) -> MatchResult:
        base = super().match_prefix(key)
        if self._raw_match:
            return base
        L = len(base.device_indices)
        # A chunked request re-matching mid-flight still owns its row: its own
        # ring already holds positions [C - ring, C), so its computed prefix
        # needs no snapshot (and must never shrink below C). In positional
        # (all-SWA) mode nothing is ever inserted into the tree for an
        # in-flight request, so the base match may be SHORTER than the owned
        # prefix — never clamp own_len to L (doing so wiped prefix_indices
        # every round and re-ran the same first chunk forever).
        # Ownership = the request still holds a row (is_chunked is NOT a
        # usable signal here: the scheduler decrements it to 0 when each
        # chunk's result is processed, before the next round's re-match).
        own_len = 0
        if req is not None and getattr(req, "req_pool_idx", None) is not None:
            own_len = len(req.prefix_indices)
        best_len, snap_node = own_len, None
        if L > 0:
            d_len, d_node = self._best_snapshot(base.last_node, L)
            if d_len > best_len:
                best_len, snap_node = d_len, d_node
        if best_len <= 0:
            return MatchResult(np.empty((0,), dtype=np.int32), self.root_node)
        if own_len > 0 and L < own_len:
            # The request's own computed prefix is the best available but
            # absent from the tree (positional mode, or the donor span was
            # evicted). _best_snapshot can't beat own_len when L < own_len
            # (usable <= L), so return the request's own req_to_token slots
            # and keep its current last_node — lock accounting undisturbed.
            kv = self.req_to_token_pool.req_to_token[req.req_pool_idx, :own_len]
            node = req.last_node if req.last_node is not None else self.root_node
            return MatchResult(np.asarray(kv, dtype=np.int32).copy(), node)
        node = self._node_at_depth(base.last_node, L, best_len)
        # NOTE: the snapshot is only pinned when the caller claims it via
        # attach_snap(req, match.swa_snap_node) — match alone holds nothing.
        return MatchResult(
            base.device_indices[:best_len], node, swa_snap_node=snap_node
        )

    def _best_snapshot(self, node: TreeNode, L: int) -> Tuple[int, Optional[TreeNode]]:
        """Best (usable_len, snapshot_node) for a full-layer match of L
        ending at `node`. Ancestors (D <= L) give usable=D; descendants with
        D - L <= ring - window give usable=L (deeper snapshots can't cover
        [L-window, L))."""
        slack = self.ring - self.window
        # Descendants first: they give the full L.
        stack = [(node, L)]
        while stack:
            n, depth = stack.pop()
            if depth - L > slack:
                continue
            if n.swa_snap is not None and depth >= L:
                return L, n
            for child in n.children.values():
                stack.append((child, depth + len(child.key)))
        # Ancestors: deepest snapshot wins.
        n, depth = node, L
        while n is not None and n is not self.root_node:
            if n.swa_snap is not None and depth <= L:
                return depth, n
            depth -= len(n.key)
            n = n.parent
        return 0, None

    def _node_at_depth(self, node: TreeNode, depth: int, target: int) -> TreeNode:
        """Walk up from `node` (at `depth`) to the node whose end is exactly
        `target`, splitting if target falls mid-node."""
        while node is not self.root_node and depth - len(node.key) >= target:
            depth -= len(node.key)
            node = node.parent
        if depth == target or node is self.root_node:
            return node
        # target falls inside node.key: split so lock_ref covers exactly the
        # matched span.
        split_len = len(node.key) - (depth - target)
        return self._split_node(node, split_len)

    # ------------------------------------------------------------- pins/load
    def attach_snap(self, req, snap_node: Optional[TreeNode]):
        """Claim a matched snapshot for `req` (releasing any pin a previous
        admission round left). The pin keeps the snapshot alive until
        load_snapshot copies it into the request's ring."""
        self.release_snap_pin(req)
        if snap_node is not None:
            snap_node.swa_pin += 1
        req.swa_snap_node = snap_node

    def release_snap_pin(self, req):
        n = getattr(req, "swa_snap_node", None)
        if n is not None:
            n.swa_pin = max(0, n.swa_pin - 1)
            req.swa_snap_node = None

    def load_snapshot(self, req):
        """Copy the matched snapshot's ring region into the request's own
        ring region. Called once, at first-extend batch formation (after the
        request row is assigned, before the extend program runs)."""
        node = getattr(req, "swa_snap_node", None)
        if node is None:
            return
        snap = node.swa_snap
        node.swa_pin = max(0, node.swa_pin - 1)
        req.swa_snap_node = None
        if snap is None:  # pinned snapshots are never evicted; defensive
            logger.error("SWA snapshot vanished before load (rid=%s)", req.rid)
            return
        self.runner.swa_snapshot_load(snap, req.req_pool_idx)

    # -------------------------------------------------------------- snapshots
    def _alloc_snap(self) -> Optional[int]:
        if self._free_snaps:
            return self._free_snaps.pop()
        # LRU-evict an unpinned snapshot (node keeps its full-layer value).
        victim = None
        for snap, node in self._snap_nodes.items():
            if node.swa_pin > 0:
                continue
            if victim is None or node.last_access_time < victim[1].last_access_time:
                victim = (snap, node)
        if victim is None:
            return None
        snap, node = victim
        node.swa_snap = None
        node.swa_snap_len = 0
        del self._snap_nodes[snap]
        return snap

    def _free_snap_of(self, node: TreeNode):
        if node.swa_snap is not None:
            self._free_snaps.append(node.swa_snap)
            self._snap_nodes.pop(node.swa_snap, None)
            node.swa_snap = None
            node.swa_snap_len = 0

    def _locate(self, key) -> Tuple[Optional[TreeNode], int]:
        """Raw walk (no splits): deepest node on `key`'s path + its depth."""
        node, depth = self.root_node, 0
        key = list(key)
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                break
            k = 0
            for a, b in zip(child.key, key):
                if a != b:
                    break
                k += 1
            if k < len(child.key):
                break
            node, depth = child, depth + k
            key = key[k:]
        return node, depth

    # ----------------------------------------------------- request lifecycle
    def cache_finished_req(self, req):
        self.release_snap_pin(req)
        row = req.req_pool_idx
        tokens = radix_key(
            (req.origin_input_ids + req.output_ids)[:-1],
            getattr(req, "lora_id", 0),
        )
        D = len(tokens)
        # Snapshot BEFORE the base class releases the request row: the copy
        # is enqueued on-device while the ring still belongs to this request
        # (device program order serializes it against any later writer).
        snap = None
        if D > 0 and self.n_snap > 0:
            snap = self._alloc_snap()
            if snap is not None:
                self.runner.swa_snapshot_save(row, snap)
        super().cache_finished_req(req)
        if snap is None:
            return
        node, depth = self._locate(tokens)
        if depth != D or node is self.root_node or node.swa_snap is not None:
            # Insert aligned away (shouldn't happen at page 1) or an
            # identical-content snapshot already exists — recycle ours.
            self._free_snaps.append(snap)
            return
        node.swa_snap = snap
        node.swa_snap_len = D
        self._snap_nodes[snap] = node

    def cache_unfinished_req(self, req):
        if self.positional:
            # All-SWA: tree values are row-relative; keep the request on its
            # OWN slots — relinking to another row's slots would read the
            # wrong ring.
            kv = self.req_to_token_pool.req_to_token[
                req.req_pool_idx, : len(req.fill_ids)
            ]
            req.prefix_indices = kv.copy()
            return
        # Hybrid: base relink logic, with the RAW match — the snapshot
        # truncation must not shrink a prefix whose KV this request already
        # computed (its own ring is valid by construction).
        self._raw_match = True
        try:
            super().cache_unfinished_req(req)
        finally:
            self._raw_match = False

    # --------------------------------------------------------------- eviction
    def _delete_leaf(self, node: TreeNode):
        self._free_snap_of(node)
        super()._delete_leaf(node)

    def evict(self, num_tokens: int):
        if self.disable:
            return
        import heapq

        leaves = [n for n in self._collect_leaves() if n.swa_pin == 0]
        heapq.heapify(leaves)
        freed = 0
        while freed < num_tokens and leaves:
            node = heapq.heappop(leaves)
            if node is self.root_node or node.lock_ref > 0 or node.swa_pin > 0:
                continue
            self.token_to_kv_pool_allocator.free(node.value)
            freed += len(node.value)
            self._delete_leaf(node)
            parent = node.parent
            if (
                parent is not self.root_node
                and not parent.children
                and parent.lock_ref == 0
            ):
                heapq.heappush(leaves, parent)

    def reset(self):
        super().reset()
        # Base __init__ resets before our fields exist.
        self._free_snaps = list(range(getattr(self, "n_snap", 0)))
        self._snap_nodes = {}
