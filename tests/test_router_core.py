"""C++ router core (csrc/router_core.cpp): the native-parity counterpart of
sgl-router's Rust tree + cache-aware + PD pairing."""

import pytest


def _core():
    from ltp_sglang_tpu.router.router_core import RouterCore

    return RouterCore(max_nodes=256)


def test_cache_aware_affinity_and_balance():
    c = _core()
    for w in (0, 1, 2):
        c.add_worker(w)
    key = b"the quick brown fox jumps over the lazy dog"
    c.insert(key, 1)
    # long prefix -> sticks to worker 1
    assert c.select(key, min_match=8, balance_abs_threshold=32) == 1
    n, w = c.best_match(key[:20])
    assert w == 1 and n == 20
    # short/no match -> least loaded
    c.load_add(0, 5)
    c.load_add(1, 3)
    got = c.select(b"zzzz-unrelated", min_match=8, balance_abs_threshold=32)
    assert got == 2
    # affinity yields when the cached worker is overloaded
    c.load_add(1, 100)
    assert c.select(key, min_match=8, balance_abs_threshold=32) == 2


def test_health_and_removal():
    c = _core()
    for w in (0, 1):
        c.add_worker(w)
    key = b"shared prefix shared prefix"
    c.insert(key, 0)
    c.set_health(0, False)
    assert c.select(key) == 1  # unhealthy cached worker skipped
    c.set_health(0, True)
    assert c.select(key) == 0
    c.remove_worker(0)
    n, w = c.best_match(key)
    assert w != 0  # scrubbed from the tree


def test_lru_bound():
    c = _core()
    c.add_worker(0)
    for i in range(3000):
        c.insert(f"prompt-{i:05d}-{'x' * 32}".encode(), 0)
    assert c.node_count() <= 256


def test_pd_pairing():
    c = _core()
    p_ids, d_ids = [0, 1], [2, 3]
    for w in p_ids + d_ids:
        c.add_worker(w)
    key = b"a very long shared system prompt for the pd test"
    c.insert(key, 1)
    c.load_add(2, 9)
    sel = c.select_pair(key, p_ids, d_ids, min_match=8)
    assert sel == (1, 3)  # prefill by affinity, decode least-loaded
    # no affinity -> least-loaded prefill
    c.load_add(1, 9)
    sel = c.select_pair(b"unrelated", p_ids, d_ids, min_match=8)
    assert sel[0] == 0


def test_split_nodes_share_prefix():
    c = _core()
    c.add_worker(0)
    c.add_worker(1)
    c.insert(b"abcdef-111111", 0)
    c.insert(b"abcdef-222222", 1)
    n, w = c.best_match(b"abcdef-111999")
    assert n == len(b"abcdef-111")
    assert w == 0
