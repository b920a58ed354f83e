"""ctypes wrapper for the C++ router core (csrc/router_core.cpp).

Native-parity counterpart of the reference's Rust sgl-router internals
(src/tree.rs concurrent radix tree + policies/cache_aware.rs +
routers/pd_router.rs select_worker_pair). Compiled on first use with g++;
router/policies.py falls back to the pure-Python policy when the toolchain
is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_LIB = None
_LIB_LOCK = threading.Lock()


def _build_and_load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "csrc", "router_core.cpp")
        )
        cache_dir = os.path.expanduser("~/.cache/ltp_sglang_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, "librouter_core.so")
        if (
            not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)
        ):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path]
            logger.info("building C++ router core: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rc_new.restype = ctypes.c_void_p
        lib.rc_new.argtypes = [ctypes.c_int64]
        lib.rc_free.argtypes = [ctypes.c_void_p]
        lib.rc_add_worker.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rc_remove_worker.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rc_set_health.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.rc_load_add.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
        lib.rc_get_load.restype = ctypes.c_int64
        lib.rc_get_load.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.rc_insert.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.c_int]
        lib.rc_best_match.restype = ctypes.c_int64
        lib.rc_best_match.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ]
        lib.rc_select.restype = ctypes.c_int
        lib.rc_select.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rc_select_pair.restype = ctypes.c_int
        lib.rc_select_pair.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rc_node_count.restype = ctypes.c_int64
        lib.rc_node_count.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def _buf(key: bytes):
    return (ctypes.c_uint8 * len(key)).from_buffer_copy(key) if key else (
        ctypes.c_uint8 * 1)()


class RouterCore:
    """One shared prompt-radix-tree + load table across all workers."""

    def __init__(self, max_nodes: int = 1 << 16):
        self._lib = _build_and_load()
        self._h = self._lib.rc_new(max_nodes)
        self._lock = threading.Lock()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.rc_free(self._h)
                self._h = None
        except Exception:
            pass

    def add_worker(self, wid: int):
        with self._lock:
            self._lib.rc_add_worker(self._h, wid)

    def remove_worker(self, wid: int):
        with self._lock:
            self._lib.rc_remove_worker(self._h, wid)

    def set_health(self, wid: int, ok: bool):
        with self._lock:
            self._lib.rc_set_health(self._h, wid, 1 if ok else 0)

    def load_add(self, wid: int, delta: int):
        with self._lock:
            self._lib.rc_load_add(self._h, wid, delta)

    def get_load(self, wid: int) -> int:
        with self._lock:
            return self._lib.rc_get_load(self._h, wid)

    def insert(self, key: bytes, wid: int):
        key = key[:1024]
        with self._lock:
            self._lib.rc_insert(self._h, _buf(key), len(key), wid)

    def best_match(self, key: bytes):
        key = key[:1024]
        w = ctypes.c_int(-1)
        with self._lock:
            n = self._lib.rc_best_match(self._h, _buf(key), len(key),
                                        ctypes.byref(w))
        return int(n), int(w.value)

    def select(self, key: bytes, min_match: int = 16,
               balance_abs_threshold: int = 32) -> int:
        key = key[:1024]
        with self._lock:
            return self._lib.rc_select(
                self._h, _buf(key), len(key), min_match, balance_abs_threshold
            )

    def select_pair(self, key: bytes, prefill_ids, decode_ids,
                    min_match: int = 16, balance_abs_threshold: int = 32):
        key = key[:1024]
        pa = (ctypes.c_int * max(len(prefill_ids), 1))(*prefill_ids)
        da = (ctypes.c_int * max(len(decode_ids), 1))(*decode_ids)
        op, od = ctypes.c_int(-1), ctypes.c_int(-1)
        with self._lock:
            rc = self._lib.rc_select_pair(
                self._h, _buf(key), len(key),
                pa, len(prefill_ids), da, len(decode_ids),
                min_match, balance_abs_threshold,
                ctypes.byref(op), ctypes.byref(od),
            )
        if rc != 0:
            return None
        return int(op.value), int(od.value)

    def node_count(self) -> int:
        with self._lock:
            return int(self._lib.rc_node_count(self._h))
