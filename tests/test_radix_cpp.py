"""C++ radix tree: unit parity with the Python tree + engine E2E."""

import numpy as np
import pytest

from ltp_sglang_tpu.mem_cache.allocator import TokenToKVPoolAllocator
from ltp_sglang_tpu.mem_cache.radix_cache_cpp import CppRadixCache
from ltp_sglang_tpu.mem_cache.req_to_token import ReqToTokenPool


def make_cache(size=128):
    pool = ReqToTokenPool(8, 64)
    alloc = TokenToKVPoolAllocator(size)
    return CppRadixCache(pool, alloc, page_size=1), alloc


def test_cpp_match_insert():
    cache, alloc = make_cache()
    v1 = alloc.alloc(5)
    assert cache.insert([1, 2, 3, 4, 5], v1) == 0
    m = cache.match_prefix([1, 2, 3, 4, 5, 6])
    np.testing.assert_array_equal(m.device_indices, v1)
    v2 = alloc.alloc(7)
    dup = cache.insert([1, 2, 3, 4, 5, 6, 7], v2)
    assert dup == 5
    m2 = cache.match_prefix([1, 2, 3, 4, 5, 6, 7])
    np.testing.assert_array_equal(m2.device_indices[:5], v1)
    np.testing.assert_array_equal(m2.device_indices[5:], v2[5:])


def test_cpp_split_and_evict():
    cache, alloc = make_cache()
    v1 = alloc.alloc(6)
    cache.insert([1, 2, 3, 4, 5, 6], v1)
    v2 = alloc.alloc(5)
    assert cache.insert([1, 2, 3, 9, 9], v2) == 3
    assert cache.total_size() == 6 + 2
    m = cache.match_prefix([1, 2, 3, 9, 9])
    assert len(m.device_indices) == 5

    # Lock one path; evict must only touch the other.
    cache.inc_lock_ref(m.last_node)
    assert cache.protected_size() == 5
    before = alloc.available_size()
    cache.evict(100)
    freed = alloc.available_size() - before
    assert freed == 3  # only [4,5,6] leaf evictable
    cache.dec_lock_ref(m.last_node)
    cache.evict(100)
    assert cache.total_size() == 0


def test_cpp_engine_e2e():
    import tempfile

    from tiny_configs import write_tiny_model_dir
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="cpp_radix_llama_")
    write_tiny_model_dir(d, with_weights=False)

    outs = {}
    for backend in ("python", "cpp"):
        eng = Engine(
            ServerArgs(
                model_path=d, load_format="dummy", dtype="float32",
                max_total_tokens=512, max_running_requests=8,
                radix_cache_backend=backend,
            )
        )
        prompts = [[1, 5, 7, 9] * 3, [2, 3, 4, 5, 6], [1, 5, 7, 9, 11, 13]]
        sp = {"max_new_tokens": 24, "temperature": 0.0}
        res = eng.generate(input_ids=prompts, sampling_params=sp)
        # Reuse pass (prefix hits) + memory pressure (retraction path).
        res2 = eng.generate(input_ids=prompts[0], sampling_params=sp)
        outs[backend] = ([r["output_ids"] for r in res], res2["output_ids"])
    assert outs["python"] == outs["cpp"]
