"""ctypes wrapper for the C++ radix tree (csrc/radix_tree.cpp).

Counterpart of the reference's mem_cache/radix_cache_cpp.py:1-229 (pybind11
wrapper over cpp_radix_tree/tree_v2). Compiles the shared library on first
use (g++ is in the image; pybind11 is not, hence the C ABI + ctypes).
Implements the exact RadixCache interface so the scheduler can swap it in via
--schedule-policy / enable flag.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(os.path.dirname(__file__), "..", "csrc", "radix_tree.cpp")
    src = os.path.abspath(src)
    cache_dir = os.path.expanduser("~/.cache/ltp_sglang_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libradix_tree.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path]
        logger.info("building C++ radix tree: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.rtree_create.restype = ctypes.c_void_p
    lib.rtree_create.argtypes = [ctypes.c_int]
    lib.rtree_destroy.argtypes = [ctypes.c_void_p]
    lib.rtree_reset.argtypes = [ctypes.c_void_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rtree_match.restype = ctypes.c_int64
    lib.rtree_match.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rtree_insert.restype = ctypes.c_int64
    lib.rtree_insert.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64, i32p]
    lib.rtree_lock.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.rtree_evict.restype = ctypes.c_int64
    lib.rtree_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64, i32p, ctypes.c_int64]
    lib.rtree_evictable_size.restype = ctypes.c_int64
    lib.rtree_evictable_size.argtypes = [ctypes.c_void_p]
    lib.rtree_protected_size.restype = ctypes.c_int64
    lib.rtree_protected_size.argtypes = [ctypes.c_void_p]
    lib.rtree_total_size.restype = ctypes.c_int64
    lib.rtree_total_size.argtypes = [ctypes.c_void_p]
    lib.rtree_root.restype = ctypes.c_int64
    lib.rtree_root.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class _NodeHandle:
    """Opaque C++ node id with identity semantics for the scheduler."""

    __slots__ = ("id",)

    def __init__(self, node_id: int):
        self.id = node_id

    def __eq__(self, other):
        return isinstance(other, _NodeHandle) and self.id == other.id

    def __hash__(self):
        return hash(self.id)


class MatchResultCpp:
    __slots__ = ("device_indices", "last_node")

    def __init__(self, indices, node):
        self.device_indices = indices
        self.last_node = node


class CppRadixCache:
    """Drop-in RadixCache replacement backed by the C++ tree."""

    def __init__(self, req_to_token_pool, token_to_kv_pool_allocator,
                 page_size: int = 1, disable: bool = False):
        self.lib = _build_and_load()
        self.req_to_token_pool = req_to_token_pool
        self.token_to_kv_pool_allocator = token_to_kv_pool_allocator
        self.page_size = page_size
        self.disable = disable
        self.tree = self.lib.rtree_create(page_size)
        self.root_node = _NodeHandle(self.lib.rtree_root(self.tree))

    def __del__(self):
        try:
            self.lib.rtree_destroy(self.tree)
        except Exception:
            pass

    def reset(self):
        self.lib.rtree_reset(self.tree)

    # ----------------------------------------------------------------- core
    def match_prefix(self, key: List[int]) -> MatchResultCpp:
        if self.disable or not key:
            return MatchResultCpp(np.empty((0,), np.int32), self.root_node)
        arr = np.asarray(key, dtype=np.int32)
        out = np.empty((len(arr),), dtype=np.int32)
        node = ctypes.c_int64(0)
        n = self.lib.rtree_match(self.tree, arr, len(arr), out, ctypes.byref(node))
        return MatchResultCpp(out[:n].copy(), _NodeHandle(node.value))

    def insert(self, key: List[int], value: np.ndarray) -> int:
        if self.disable:
            return 0
        arr = np.asarray(key, dtype=np.int32)
        vals = np.ascontiguousarray(value, dtype=np.int32)
        return int(self.lib.rtree_insert(self.tree, arr, len(arr), vals))

    def evict(self, num_tokens: int):
        if self.disable:
            return
        cap = max(int(self.lib.rtree_evictable_size(self.tree)), 1)
        out = np.empty((cap,), dtype=np.int32)
        n = self.lib.rtree_evict(self.tree, num_tokens, out, cap)
        if n:
            self.token_to_kv_pool_allocator.free(out[:n])

    def inc_lock_ref(self, node):
        if node is not None and isinstance(node, _NodeHandle):
            self.lib.rtree_lock(self.tree, node.id, 1)

    def dec_lock_ref(self, node):
        if node is not None and isinstance(node, _NodeHandle):
            self.lib.rtree_lock(self.tree, node.id, -1)

    def evictable_size(self) -> int:
        return int(self.lib.rtree_evictable_size(self.tree))

    def protected_size(self) -> int:
        return int(self.lib.rtree_protected_size(self.tree))

    def total_size(self) -> int:
        return int(self.lib.rtree_total_size(self.tree))

    # -------------------------------------------------- request lifecycle
    # Same host logic as the Python RadixCache (radix_cache.py), sharing the
    # KV ownership protocol (SURVEY A.3).
    def cache_finished_req(self, req):
        if self.disable:
            kv = self.req_to_token_pool.req_to_token[
                req.req_pool_idx, : len(req.origin_input_ids) + len(req.output_ids) - 1
            ]
            self.token_to_kv_pool_allocator.free(kv)
            self.req_to_token_pool.free(req.req_pool_idx)
            return
        from ltp_sglang_tpu.mem_cache.radix_cache import radix_key

        token_ids = radix_key(
            (req.origin_input_ids + req.output_ids)[:-1], getattr(req, "lora_id", 0)
        )
        all_len = len(token_ids)
        if self.page_size != 1:
            all_len = (all_len // self.page_size) * self.page_size
        kv_indices = self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len].copy()
        new_prefix_len = self.insert(token_ids[:all_len], kv_indices)
        old_prefix_len = len(req.prefix_indices)
        if new_prefix_len > old_prefix_len:
            self.token_to_kv_pool_allocator.free(kv_indices[old_prefix_len:new_prefix_len])
        full_len = len(req.origin_input_ids) + len(req.output_ids) - 1
        if full_len > all_len:
            self.token_to_kv_pool_allocator.free(
                self.req_to_token_pool.req_to_token[req.req_pool_idx, all_len:full_len]
            )
        self.req_to_token_pool.free(req.req_pool_idx)
        self.dec_lock_ref(req.last_node)
        req.lock_ref_held = False

    def cache_unfinished_req(self, req):
        if self.disable:
            return
        from ltp_sglang_tpu.mem_cache.radix_cache import radix_key

        token_ids = radix_key(req.fill_ids, getattr(req, "lora_id", 0))
        all_len = len(token_ids)
        if self.page_size != 1:
            all_len = (all_len // self.page_size) * self.page_size
        kv_indices = self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len].copy()
        new_prefix_len = self.insert(token_ids[:all_len], kv_indices)
        old_prefix_len = len(req.prefix_indices)
        if new_prefix_len > old_prefix_len:
            self.token_to_kv_pool_allocator.free(kv_indices[old_prefix_len:new_prefix_len])
        match = self.match_prefix(token_ids[:all_len])
        assert len(match.device_indices) == all_len
        self.req_to_token_pool.req_to_token[req.req_pool_idx, :all_len] = (
            match.device_indices
        )
        self.dec_lock_ref(req.last_node)
        self.inc_lock_ref(match.last_node)
        req.prefix_indices = match.device_indices
        req.last_node = match.last_node
        req.lock_ref_held = True
