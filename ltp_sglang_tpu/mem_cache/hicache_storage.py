"""Remote (third-tier) KV storage behind the HiCache host arena.

Counterpart of mem_cache/hicache_storage.py (HiCacheStorage get/set/exists
contract) and the pluggable backends under mem_cache/storage/
({mooncake_store, hf3fs, nixl}). TPU redesign: the backend is the existing
connector layer (connector/: memory:// for tests and colocated RLHF,
file:// for NFS/GCS-fuse pods, redis:// and s3:// where those clients
exist), and entries are CONTENT-HASH keyed — each tree node's span is keyed
by a rolling sha256 over (parent_hash, node tokens), so any engine sharing
the store (PD fleets, restarts, replicas) addresses the same entries
without coordinating slot ids (the reference keys pages the same way,
hicache_storage.py get_hash_str).

Payload layout: one npz-free packed array per node span — K rows
[L, n, rk, lnk] and V rows [L, n, rv, lnv] concatenated flat with a small
int header, so a backend only needs opaque ndarray get/set.
"""

from __future__ import annotations

import hashlib
import logging
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def node_path_hash(node) -> str:
    """Rolling content hash for a radix-tree node: sha256 over the node's
    own token span seeded with the parent chain's hash. Token entries may be
    ints or (paged) tuples; repr() of the int list is stable across
    processes."""
    parts: List = []
    cur = node
    while cur is not None and cur.parent is not None:
        parts.append(cur.key)
        cur = cur.parent
    h = hashlib.sha256()
    for key in reversed(parts):
        h.update(repr(list(key)).encode())
    return h.hexdigest()


class HiCacheStorage:
    """Hash-keyed remote store for host-arena KV spans."""

    def __init__(self, url: str):
        from ltp_sglang_tpu.connector import create_remote_connector

        self.conn = create_remote_connector(url)
        if not hasattr(self.conn, "get") or not hasattr(self.conn, "set"):
            raise ValueError(
                f"hicache storage URL {url!r} must resolve to a KV connector "
                "(memory://, redis://, ...)"
            )
        self.num_puts = 0
        self.num_hits = 0
        self.num_misses = 0

    def put(self, key: str, k_rows: np.ndarray, v_rows: np.ndarray):
        """Store a node span; k_rows [L, n, rk, lnk], v_rows [L, n, rv, lnv]
        (any dtype — bitcast to uint8 for transport)."""
        kb = np.ascontiguousarray(k_rows).view(np.uint8).reshape(-1)
        vb = np.ascontiguousarray(v_rows).view(np.uint8).reshape(-1)
        meta = np.frombuffer(
            repr((
                k_rows.shape, str(k_rows.dtype), v_rows.shape,
                str(v_rows.dtype),
            )).encode(),
            dtype=np.uint8,
        )
        hdr = np.asarray([len(meta), len(kb), len(vb)], np.int64).view(np.uint8)
        self.conn.set(key, np.concatenate([hdr, meta, kb, vb]))
        self.num_puts += 1

    def get(self, key: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        blob = self.conn.get(key)
        if blob is None:
            self.num_misses += 1
            return None
        blob = np.asarray(blob, np.uint8)
        n_meta, n_k, n_v = blob[:24].view(np.int64)
        off = 24
        k_shape, k_dt, v_shape, v_dt = eval(  # noqa: S307 — our own repr
            bytes(blob[off : off + n_meta]).decode()
        )
        off += int(n_meta)
        k = blob[off : off + n_k].view(np.dtype(k_dt)).reshape(k_shape)
        off += int(n_k)
        v = blob[off : off + n_v].view(np.dtype(v_dt)).reshape(v_shape)
        self.num_hits += 1
        return k, v

    def delete(self, key: str):
        d = getattr(self.conn, "delete", None)
        if d is not None:
            d(key)
        elif hasattr(self.conn, "kv"):  # MemoryConnector
            self.conn.kv.pop(key, None)
