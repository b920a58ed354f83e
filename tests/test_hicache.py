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
