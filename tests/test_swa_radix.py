"""SWARadixCache: cross-request prefix reuse for sliding-window models via
ring snapshots (reference mem_cache/swa_radix_cache.py semantics on the TPU
ring pools). Parity is checked against a no-cache engine; reuse is checked by
counting snapshot loads and matched prefix lengths."""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_MISTRAL_CFG, write_tiny_model_dir

TINY_GEMMA2_CFG = {
    "architectures": ["Gemma2ForCausalLM"],
    "model_type": "gemma2",
    "hidden_size": 128,
    "intermediate_size": 256,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 32,
    "vocab_size": 512,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": True,
    "eos_token_id": 2,
    "attn_logit_softcapping": 50.0,
    "final_logit_softcapping": 30.0,
    "query_pre_attn_scalar": 32,
    "sliding_window": 16,
    "hidden_activation": "gelu_pytorch_tanh",
    "torch_dtype": "float32",
}

SP = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    base = dict(
        model_path=d, dtype="float32", max_total_tokens=4096,
        max_running_requests=4, chunked_prefill_size=64,
        prefill_token_buckets=[16, 32, 64],
    )
    base.update(kw)
    return Engine(ServerArgs(**base))


def _count_loads(eng):
    """Wrap runner.swa_snapshot_load with a counter; returns the list that
    accumulates (snap_idx, row) calls."""
    calls = []
    orig = eng.model_runner.swa_snapshot_load

    def spy(snap_idx, req_row):
        calls.append((snap_idx, req_row))
        return orig(snap_idx, req_row)

    eng.model_runner.swa_snapshot_load = spy
    return calls


@pytest.fixture(scope="module")
def mistral_dir():
    cfg = dict(TINY_MISTRAL_CFG)
    cfg["sliding_window"] = 16
    d = tempfile.mkdtemp(prefix="tiny_mistral_swarad_")
    write_tiny_model_dir(d, cfg=cfg)
    return d


@pytest.fixture(scope="module")
def gemma2_dir():
    d = tempfile.mkdtemp(prefix="tiny_gemma2_swarad_")
    write_tiny_model_dir(d, cfg=TINY_GEMMA2_CFG)
    return d


def test_all_swa_cross_request_reuse_parity(mistral_dir):
    from ltp_sglang_tpu.mem_cache.swa_radix_cache import SWARadixCache

    eng = _engine(mistral_dir)
    assert isinstance(eng.scheduler.tree_cache, SWARadixCache)
    assert eng.scheduler.tree_cache.positional

    ref_eng = _engine(mistral_dir, swa_snapshot_slots=0)  # ChunkCache
    prompt = [1, 5, 7, 9, 100, 200, 31, 42] * 5  # 40 tokens > window=16

    first = eng.generate(input_ids=prompt, sampling_params=dict(SP))
    ref = ref_eng.generate(input_ids=prompt, sampling_params=dict(SP))
    assert first["output_ids"] == ref["output_ids"]

    # Identical prompt again: must load a snapshot and match the no-cache run.
    calls = _count_loads(eng)
    second = eng.generate(input_ids=prompt, sampling_params=dict(SP))
    assert second["output_ids"] == ref["output_ids"]
    assert len(calls) == 1, "expected exactly one ring snapshot load"

    # Diverging continuation: shares the prompt prefix, diverges at the end
    # (within ext_cap of the donor end, so the full prefix is reusable).
    prompt2 = prompt + [400, 17, 3]
    ref2 = ref_eng.generate(input_ids=prompt2, sampling_params=dict(SP))
    out2 = eng.generate(input_ids=prompt2, sampling_params=dict(SP))
    assert out2["output_ids"] == ref2["output_ids"]
    assert len(calls) == 2


def test_all_swa_snapshot_eviction_correctness(mistral_dir):
    """More distinct finished prompts than snapshot regions: LRU eviction
    must recycle regions without corrupting later reuse."""
    eng = _engine(mistral_dir, swa_snapshot_slots=2)
    ref_eng = _engine(mistral_dir, swa_snapshot_slots=0)

    prompts = [[i + 1, 5, 7, 9, 100, 200, 31, 42] * 4 for i in range(4)]
    refs = [
        ref_eng.generate(input_ids=p, sampling_params=dict(SP))["output_ids"]
        for p in prompts
    ]
    for p, r in zip(prompts, refs):
        assert eng.generate(input_ids=p, sampling_params=dict(SP))[
            "output_ids"] == r
    # Re-run all: some hit snapshots, some re-prefill after eviction — all
    # must stay correct.
    for p, r in zip(prompts, refs):
        assert eng.generate(input_ids=p, sampling_params=dict(SP))[
            "output_ids"] == r
    cache = eng.scheduler.tree_cache
    assert len(cache._snap_nodes) <= 2


def test_hybrid_swa_cross_request_reuse_parity(gemma2_dir):
    """Interleaved full/SWA layers (gemma2): full layers reuse tree slots,
    SWA layers get the ring snapshot copy."""
    from ltp_sglang_tpu.mem_cache.swa_radix_cache import SWARadixCache

    eng = _engine(gemma2_dir)
    assert eng.model_runner.swa_enabled
    assert isinstance(eng.scheduler.tree_cache, SWARadixCache)
    assert not eng.scheduler.tree_cache.positional

    ref_eng = _engine(gemma2_dir, swa_snapshot_slots=0)
    prompt = [1, 5, 7, 9, 100, 200, 31, 42, 77, 88] * 4  # 40 > window=16

    ref = ref_eng.generate(input_ids=prompt, sampling_params=dict(SP))
    assert eng.generate(input_ids=prompt, sampling_params=dict(SP))[
        "output_ids"] == ref["output_ids"]

    calls = _count_loads(eng)
    again = eng.generate(input_ids=prompt, sampling_params=dict(SP))
    assert again["output_ids"] == ref["output_ids"]
    assert len(calls) == 1

    prompt2 = prompt + [400, 17]
    ref2 = ref_eng.generate(input_ids=prompt2, sampling_params=dict(SP))
    out2 = eng.generate(input_ids=prompt2, sampling_params=dict(SP))
    assert out2["output_ids"] == ref2["output_ids"]


def test_hybrid_chunked_prefill_with_reuse(gemma2_dir):
    """Chunked prefill (chunk=16) across a reused prefix: chunk re-matches
    must never shrink the request's own computed prefix."""
    eng = _engine(gemma2_dir, chunked_prefill_size=16)
    ref_eng = _engine(gemma2_dir, swa_snapshot_slots=0)
    prompt = list(range(3, 60))  # several chunks
    ref = ref_eng.generate(input_ids=prompt, sampling_params=dict(SP))
    assert eng.generate(input_ids=prompt, sampling_params=dict(SP))[
        "output_ids"] == ref["output_ids"]
    assert eng.generate(input_ids=prompt, sampling_params=dict(SP))[
        "output_ids"] == ref["output_ids"]


def test_ancestor_snapshot_truncated_reuse(mistral_dir):
    """A new request extending FAR past a stored snapshot (beyond ext_cap)
    can still reuse the snapshot's full depth D (usable = D)."""
    eng = _engine(mistral_dir)
    ref_eng = _engine(mistral_dir, swa_snapshot_slots=0)
    base = [2, 8, 450, 3, 17, 77, 9, 1] * 4  # 32 tokens
    out = eng.generate(input_ids=base, sampling_params=dict(SP))
    donor_ids = base + out["output_ids"]

    # Continue the exact donor sequence plus a long tail: match depth runs
    # past the donor; the donor-end snapshot gives usable = D (ancestor).
    long_tail = donor_ids + list(range(5, 90))
    ref = ref_eng.generate(input_ids=long_tail, sampling_params=dict(SP))
    calls = _count_loads(eng)
    got = eng.generate(input_ids=long_tail, sampling_params=dict(SP))
    assert got["output_ids"] == ref["output_ids"]
    assert len(calls) == 1
