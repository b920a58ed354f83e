"""All-SWA ring mode (mistral-class): per-request ring KV regions replace the
full-length pool (reference SWAKVPool, mem_cache/memory_pool.py:420, for the
every-layer-slides case). Checks the pool actually shrinks and greedy parity
holds across a ring WRAPAROUND (decode far past the window)."""

import tempfile

import numpy as np

from tiny_configs import TINY_MISTRAL_CFG, write_tiny_model_dir


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32", max_total_tokens=4096,
        max_running_requests=4, chunked_prefill_size=64,
        prefill_token_buckets=[16, 32, 64],
        **kw,
    ))


def test_ring_pool_sizing_and_wraparound_parity():
    import torch
    from transformers import AutoModelForCausalLM

    cfg = dict(TINY_MISTRAL_CFG)
    cfg["sliding_window"] = 16
    d = tempfile.mkdtemp(prefix="tiny_mistral_ring_")
    write_tiny_model_dir(d, cfg=cfg)

    eng = _engine(d)
    runner = eng.model_runner
    # ring = window + largest prefill bucket = 16 + 64 = 80
    assert runner.ring_size == 80, runner.ring_size
    from ltp_sglang_tpu.mem_cache.allocator import RingKVAllocator

    assert isinstance(runner.token_to_kv_pool_allocator, RingKVAllocator)
    # pool is (R+1)*ring slots, far below max_total_tokens * anything
    assert runner.max_total_num_tokens == (4 + 1) * 80
    # Snapshot arena is clamped to the request count so a memory-tight
    # config can at most double the pool.
    assert runner.swa_snap_count <= 4
    assert runner.k_cache.shape[1] <= (4 + 1 + runner.swa_snap_count) * 80 + 1

    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    prompt = [1, 5, 7, 9, 100, 200, 31, 42] * 4  # 32 tokens
    n_new = 160  # decode far past ring=80: positions wrap multiple times
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
        )[0].tolist()[len(prompt):]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": n_new, "temperature": 0.0},
    )
    assert out["output_ids"] == ref


def test_ring_mode_concurrent_requests():
    """Several live requests must not clobber each other's rings."""
    d = tempfile.mkdtemp(prefix="tiny_mistral_ring2_")
    cfg = dict(TINY_MISTRAL_CFG)
    cfg["sliding_window"] = 16
    write_tiny_model_dir(d, cfg=cfg)
    eng = _engine(d)

    prompts = [[1, 5, 7, 9], [9, 7, 5, 1], [42, 42, 42, 42], [100, 200, 31, 1]]
    solo = [
        eng.generate(input_ids=p,
                     sampling_params={"max_new_tokens": 100, "temperature": 0.0})
        ["output_ids"]
        for p in prompts
    ]
    batch = eng.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 100, "temperature": 0.0},
    )
    for got, want in zip(batch, solo):
        assert got["output_ids"] == want


def test_ring_mode_chunked_prefill_parity():
    """Prompt longer than chunked_prefill_size on an all-SWA model.

    Regression: positional-mode re-matches returned L=0 and clamped the
    owned prefix to it, so the first chunk recomputed forever (livelock).
    """
    import torch
    from transformers import AutoModelForCausalLM

    d = tempfile.mkdtemp(prefix="tiny_mistral_ring3_")
    cfg = dict(TINY_MISTRAL_CFG)
    cfg["sliding_window"] = 16
    write_tiny_model_dir(d, cfg=cfg)
    eng = _engine(d)
    assert eng.model_runner.ring_size > 0

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 250, size=150)]  # >2 chunks of 64
    hf = AutoModelForCausalLM.from_pretrained(d, dtype=torch.float32).eval()
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=24,
            do_sample=False,
        )[0].tolist()[len(prompt):]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 24, "temperature": 0.0},
    )
    assert out["output_ids"] == ref
