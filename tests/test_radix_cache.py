"""Unit tests for the radix cache + allocator KV ownership protocol
(SURVEY A.3 invariant: each slot owned by exactly one of request/tree/free)."""

import numpy as np
import pytest

from ltp_sglang_tpu.mem_cache.allocator import (
    PagedTokenToKVPoolAllocator,
    TokenToKVPoolAllocator,
)
from ltp_sglang_tpu.mem_cache.radix_cache import RadixCache
from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool


def make_cache(size=128, page_size=1):
    pool = ReqToTokenPool(8, 64)
    if page_size == 1:
        alloc = TokenToKVPoolAllocator(size)
    else:
        alloc = PagedTokenToKVPoolAllocator(size, page_size)
    return RadixCache(pool, alloc, page_size=page_size), pool, alloc


def test_match_insert_basic():
    cache, _, alloc = make_cache()
    v1 = alloc.alloc(5)
    dup = cache.insert([1, 2, 3, 4, 5], v1)
    assert dup == 0
    m = cache.match_prefix([1, 2, 3, 4, 5, 6])
    assert len(m.device_indices) == 5
    np.testing.assert_array_equal(m.device_indices, v1)
    m2 = cache.match_prefix([1, 2, 9])
    assert len(m2.device_indices) == 2


def test_insert_dedup_returns_overlap():
    cache, _, alloc = make_cache()
    v1 = alloc.alloc(4)
    cache.insert([1, 2, 3, 4], v1)
    v2 = alloc.alloc(6)
    dup = cache.insert([1, 2, 3, 4, 5, 6], v2)
    assert dup == 4  # first 4 tokens already present
    # Canonical indices for shared part are v1's.
    m = cache.match_prefix([1, 2, 3, 4, 5, 6, 7])
    np.testing.assert_array_equal(m.device_indices[:4], v1)
    np.testing.assert_array_equal(m.device_indices[4:6], v2[4:6])


def test_node_split():
    cache, _, alloc = make_cache()
    v1 = alloc.alloc(6)
    cache.insert([1, 2, 3, 4, 5, 6], v1)
    v2 = alloc.alloc(5)
    dup = cache.insert([1, 2, 3, 9, 9], v2)
    assert dup == 3
    m = cache.match_prefix([1, 2, 3, 9, 9])
    assert len(m.device_indices) == 5
    np.testing.assert_array_equal(m.device_indices[:3], v1[:3])


def test_evict_respects_locks():
    cache, _, alloc = make_cache(size=32)
    v1 = alloc.alloc(10)
    cache.insert(list(range(100, 110)), v1)
    m = cache.match_prefix(list(range(100, 110)))
    cache.inc_lock_ref(m.last_node)
    assert cache.protected_size() == 10
    assert cache.evictable_size() == 0
    before = alloc.available_size()
    cache.evict(10)
    assert alloc.available_size() == before  # locked: nothing evicted
    cache.dec_lock_ref(m.last_node)
    assert cache.evictable_size() == 10
    cache.evict(10)
    assert alloc.available_size() == before + 10


def test_evict_leaves_first():
    cache, _, alloc = make_cache(size=64)
    va = alloc.alloc(4)
    cache.insert([1, 2, 3, 4], va)
    vb = alloc.alloc(8)
    cache.insert([1, 2, 3, 4, 5, 6, 7, 8], vb)  # child of the first
    # Evicting 4 should remove the leaf [5,6,7,8] first, keeping [1,2,3,4].
    cache.evict(4)
    m = cache.match_prefix([1, 2, 3, 4, 5, 6, 7, 8])
    assert len(m.device_indices) == 4


def test_total_and_evictable_accounting():
    cache, _, alloc = make_cache()
    v1 = alloc.alloc(5)
    cache.insert([1, 2, 3, 4, 5], v1)
    v2 = alloc.alloc(7)
    cache.insert([1, 2, 3, 4, 5, 6, 7], v2)
    # 5 original + 2 new (5 dups freed by caller, not the tree)
    assert cache.total_size() == 7
    assert cache.evictable_size() == 7


def test_paged_key_alignment():
    cache, _, alloc = make_cache(size=64, page_size=4)
    v = alloc.alloc(8)
    cache.insert([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], v[:8])  # truncated to 8
    m = cache.match_prefix([1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert len(m.device_indices) == 8
    m2 = cache.match_prefix([1, 2, 3, 4, 5])  # page-aligned to 4
    assert len(m2.device_indices) == 4


def test_allocator_backup_restore():
    alloc = TokenToKVPoolAllocator(16)
    state = alloc.backup_state()
    a = alloc.alloc(10)
    assert alloc.available_size() == 6
    alloc.restore_state(state)
    assert alloc.available_size() == 16


def test_paged_allocator_extend():
    alloc = PagedTokenToKVPoolAllocator(64, 4)
    s1 = alloc.alloc_extend(0, 6, 0)
    assert len(s1) == 6
    # Continue partial page: prefix now 6, last slot s1[-1]
    s2 = alloc.alloc_extend(6, 4, int(s1[-1]))
    assert len(s2) == 4
    # First two slots continue the same page as s1's tail.
    assert s2[0] // 4 == s1[-1] // 4
    assert alloc.available_size() % 4 == 0
