"""Hierarchical (host-tier) KV cache: evicted pages come back from host RAM."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


def test_host_tier_loadback():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hicache_llama_")
    write_tiny_model_dir(d)

    eng = Engine(
        ServerArgs(
            model_path=d, dtype="float32",
            max_total_tokens=96,  # tiny device pool to force eviction
            max_running_requests=4,
            enable_hierarchical_cache=True,
        )
    )
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    prompt_a = list(range(3, 3 + 60))
    prompt_b = list(range(200, 200 + 60))

    ref_a = eng.generate(input_ids=prompt_a, sampling_params=sp)
    # B displaces A's pages from the tiny device pool (write-back to host).
    eng.generate(input_ids=prompt_b, sampling_params=sp)
    cache = eng.scheduler.tree_cache
    assert cache.num_writebacks > 0, "eviction never wrote back to host"

    # A again: host tier must serve the prefix and output must be identical.
    again = eng.generate(input_ids=prompt_a, sampling_params=sp)
    assert again["output_ids"] == ref_a["output_ids"]
    assert cache.num_host_hits > 0, "host tier never hit"


def test_host_tier_many_prefixes_and_host_eviction():
    """Many distinct prompts sharing a long prefix: the host tier stores the
    shared span ONCE (tree-structured, not per-entry blobs), admission stays
    O(match) (structural; we check correctness under churn), and exhausting
    the small host arena exercises host-side eviction without corruption."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hicache2_llama_")
    write_tiny_model_dir(d)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=96, max_running_requests=4,
        enable_hierarchical_cache=True,
        hicache_host_tokens=256,  # small arena -> host eviction under churn
    ))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    shared = list(range(3, 3 + 40))
    prompts = [shared + [500 + i, 501 + i, 502 + i, 503 + i] for i in range(6)]
    refs = [eng.generate(input_ids=p, sampling_params=sp)["output_ids"]
            for p in prompts]
    cache = eng.scheduler.tree_cache
    assert cache.num_writebacks > 0
    # Replay in reverse order: every output must be reproduced exactly
    # through whatever mix of device hits, host loadbacks, and recompute.
    for p, ref in zip(reversed(prompts), reversed(refs)):
        out = eng.generate(input_ids=p, sampling_params=sp)
        assert out["output_ids"] == ref
    # The host arena never over-allocates.
    used = cache.arena.alloc.size - cache.arena.alloc.available_size()
    assert 0 <= used <= 256


def test_storage_tier_memmap(tmp_path):
    """hicache_storage_dir file-backs the host arena (the disk tier):
    loadbacks after churn still reproduce exact outputs, and the backing
    files exist with the arena's size."""
    import os

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hicache3_llama_")
    write_tiny_model_dir(d)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=96, max_running_requests=4,
        enable_hierarchical_cache=True, hicache_host_tokens=512,
        hicache_storage_dir=str(tmp_path),
    ))
    cache = eng.scheduler.tree_cache
    assert isinstance(cache.arena.k, np.memmap)
    assert os.path.getsize(tmp_path / "kv_k.bin") == cache.arena.k.nbytes
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    pa, pb = list(range(3, 63)), list(range(200, 260))
    ref = eng.generate(input_ids=pa, sampling_params=sp)
    eng.generate(input_ids=pb, sampling_params=sp)  # displaces A
    assert cache.num_writebacks > 0
    again = eng.generate(input_ids=pa, sampling_params=sp)
    assert again["output_ids"] == ref["output_ids"]
    assert cache.num_host_hits > 0


def test_write_through_policies():
    """write_through mirrors finished requests to host immediately;
    write_through_selective waits for the hit threshold; write_back never
    writes outside eviction (reference hiradix_cache.py:120-204)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    def mk(policy, threshold=2):
        d = tempfile.mkdtemp(prefix=f"hic_{policy}_")
        write_tiny_model_dir(d)
        return Engine(ServerArgs(
            model_path=d, dtype="float32",
            max_total_tokens=512, max_running_requests=4,
            enable_hierarchical_cache=True,
            hicache_write_policy=policy,
            hicache_write_threshold=threshold,
        ))

    sp = {"max_new_tokens": 4, "temperature": 0.0}
    prompt = list(range(3, 43))

    eng = mk("write_through")
    eng.generate(input_ids=prompt, sampling_params=sp)
    assert eng.scheduler.tree_cache.num_writebacks > 0

    eng = mk("write_back")
    eng.generate(input_ids=prompt, sampling_params=sp)
    eng.generate(input_ids=prompt, sampling_params=sp)
    assert eng.scheduler.tree_cache.num_writebacks == 0  # no eviction yet

    eng = mk("write_through_selective", threshold=3)
    cache = eng.scheduler.tree_cache
    eng.generate(input_ids=prompt, sampling_params=sp)
    assert cache.num_writebacks == 0  # first finish: hit_count 1 < 3
    eng.generate(input_ids=prompt, sampling_params=sp)
    eng.generate(input_ids=prompt, sampling_params=sp)
    assert cache.num_writebacks > 0  # threshold reached


def test_async_loadback_parity_under_churn():
    """Load-back host gathers run on the background worker; outputs must
    stay bit-exact across repeated evict/reload cycles (the drain fence in
    scheduler.run_batch is what makes this safe)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hic_async_")
    write_tiny_model_dir(d)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=96, max_running_requests=4,
        enable_hierarchical_cache=True,
        hicache_write_policy="write_through",
    ))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    pa, pb = list(range(3, 63)), list(range(300, 360))
    ref_a = eng.generate(input_ids=pa, sampling_params=sp)["output_ids"]
    ref_b = eng.generate(input_ids=pb, sampling_params=sp)["output_ids"]
    for _ in range(3):  # alternate so each reload evicts the other
        assert eng.generate(input_ids=pa, sampling_params=sp)["output_ids"] == ref_a
        assert eng.generate(input_ids=pb, sampling_params=sp)["output_ids"] == ref_b
    cache = eng.scheduler.tree_cache
    assert cache.num_host_hits >= 2
    # A match after the last forward may leave a pending load; the fence
    # must clear it.
    cache.drain_pending_loads()
    assert not cache._pending_loads


@pytest.mark.parametrize("chunks", [1, 3, 32])
def test_layer_chunked_loadback_parity(chunks):
    """The per-layer-range load-back pipeline (hicache_layer_chunks; the
    reference LayerDoneCounter analog) must be bit-identical for any chunk
    count, including chunks > num_layers (clamped)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hicache_chunks_")
    write_tiny_model_dir(d)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=96, max_running_requests=4,
        enable_hierarchical_cache=True, hicache_layer_chunks=chunks,
    ))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    prompt_a = list(range(3, 3 + 60))
    prompt_b = list(range(200, 200 + 60))
    ref_a = eng.generate(input_ids=prompt_a, sampling_params=sp)
    eng.generate(input_ids=prompt_b, sampling_params=sp)
    again = eng.generate(input_ids=prompt_a, sampling_params=sp)
    assert again["output_ids"] == ref_a["output_ids"]
    assert eng.scheduler.tree_cache.num_host_hits > 0


def test_remote_storage_tier_roundtrip():
    """Remote third tier (mem_cache/hicache_storage.py; reference
    mem_cache/hicache_storage.py + storage/mooncake_store): device eviction
    demotes to host, host eviction demotes to the hash-keyed remote store,
    and a later identical prompt promotes storage -> host -> device with
    prefix reuse intact (bit-identical outputs)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="hicache3_llama_")
    write_tiny_model_dir(d)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=256, max_running_requests=4,
        enable_hierarchical_cache=True,
        hicache_host_tokens=512,
        hicache_storage_url="memory://hicache-test",
    ))
    cache = eng.scheduler.tree_cache
    assert cache.storage is not None
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    prompt_a = list(range(3, 3 + 60))
    ref_a = eng.generate(input_ids=prompt_a, sampling_params=sp)

    # Demote A: device -> host, then host -> remote.
    cache.evict(10_000)
    cache._evict_host(10_000)
    assert cache.storage.num_puts >= 1, "host eviction never demoted to storage"
    host_rows_in_use = cache.arena.alloc.available_size()

    again = eng.generate(input_ids=prompt_a, sampling_params=sp)
    assert again["output_ids"] == ref_a["output_ids"]
    assert cache.storage.num_hits >= 1, "storage tier never hit"
    assert cache.num_host_hits >= 1, "promoted span never loaded back"

    # Partial prefix: a prompt sharing half of A splits the storage-only
    # span; both sides stay addressable and outputs stay correct.
    cache.evict(10_000)
    cache._evict_host(10_000)
    half = prompt_a[:30] + [900, 901, 902, 903]
    eng.generate(input_ids=half, sampling_params=sp)
    again2 = eng.generate(input_ids=prompt_a, sampling_params=sp)
    assert again2["output_ids"] == ref_a["output_ids"]

    # Revocation: deleting the store's entries turns later matches into
    # clean misses (recompute), never corruption.
    cache.evict(10_000)
    cache._evict_host(10_000)
    for k in list(getattr(cache.storage.conn, "kv", {})):
        cache.storage.delete(k)
    again3 = eng.generate(input_ids=prompt_a, sampling_params=sp)
    assert again3["output_ids"] == ref_a["output_ids"]
    del host_rows_in_use
