"""Engine-level behavioral tests with dummy weights (fast, no HF model)."""

import json
import os
import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


@pytest.fixture(scope="module")
def dummy_dir():
    d = tempfile.mkdtemp(prefix="dummy_llama_")
    write_tiny_model_dir(d, with_weights=False)
    return d


def make_engine(dummy_dir, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    defaults = dict(
        model_path=dummy_dir,
        load_format="dummy",
        dtype="float32",
        max_total_tokens=2048,
        max_running_requests=16,
    )
    defaults.update(kw)
    return Engine(ServerArgs(**defaults))


@pytest.fixture(scope="module")
def engine(dummy_dir):
    return make_engine(dummy_dir)


def test_single_and_batch(engine):
    out = engine.generate(
        input_ids=[1, 2, 3], sampling_params={"max_new_tokens": 4, "temperature": 0.0}
    )
    assert len(out["output_ids"]) == 4
    outs = engine.generate(
        input_ids=[[1, 2, 3], [4, 5, 6, 7, 8]],
        sampling_params={"max_new_tokens": 5, "temperature": 0.0},
    )
    assert len(outs) == 2
    assert all(len(o["output_ids"]) == 5 for o in outs)


def test_determinism_across_batch_sizes(engine):
    """A request's greedy output must not depend on its batchmates."""
    solo = engine.generate(
        input_ids=[1, 2, 3, 4], sampling_params={"max_new_tokens": 8, "temperature": 0.0}
    )
    batch = engine.generate(
        input_ids=[[1, 2, 3, 4], [9, 9, 9], [5, 4, 3, 2, 1, 0]],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0},
    )
    assert batch[0]["output_ids"] == solo["output_ids"]


def test_sampling_params_accepted(engine):
    out = engine.generate(
        input_ids=[1, 2, 3],
        sampling_params={
            "max_new_tokens": 4,
            "temperature": 0.7,
            "top_p": 0.9,
            "top_k": 10,
            "min_p": 0.05,
        },
    )
    assert len(out["output_ids"]) == 4
    assert all(0 <= t < TINY_LLAMA_CFG["vocab_size"] for t in out["output_ids"])


def test_mixed_greedy_and_sampled(engine):
    outs = engine.generate(
        input_ids=[[1, 2, 3, 4], [1, 2, 3, 4]],
        sampling_params=[
            {"max_new_tokens": 6, "temperature": 0.0},
            {"max_new_tokens": 6, "temperature": 1.0, "top_k": 50},
        ],
    )
    solo = engine.generate(
        input_ids=[1, 2, 3, 4], sampling_params={"max_new_tokens": 6, "temperature": 0.0}
    )
    assert outs[0]["output_ids"] == solo["output_ids"]


def test_chunked_prefill_consistency(dummy_dir):
    eng_ref = make_engine(dummy_dir)
    long_prompt = list(np.random.default_rng(0).integers(3, 500, size=150))
    ref = eng_ref.generate(
        input_ids=long_prompt, sampling_params={"max_new_tokens": 8, "temperature": 0.0}
    )
    eng_chunk = make_engine(dummy_dir, chunked_prefill_size=48)
    out = eng_chunk.generate(
        input_ids=long_prompt, sampling_params={"max_new_tokens": 8, "temperature": 0.0}
    )
    assert out["output_ids"] == ref["output_ids"]


def test_retraction_under_memory_pressure(dummy_dir):
    # Pool too small for all requests' full generations at once: forces
    # retract + requeue; everything must still complete.
    eng = make_engine(dummy_dir, max_total_tokens=512, max_running_requests=8)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(3, 500, size=20 + i)) for i in range(8)]
    outs = eng.generate(
        input_ids=prompts, sampling_params={"max_new_tokens": 48, "temperature": 0.0}
    )
    assert all(len(o["output_ids"]) == 48 for o in outs)
    # And determinism vs solo run despite retraction.
    solo = eng.generate(
        input_ids=prompts[0], sampling_params={"max_new_tokens": 48, "temperature": 0.0}
    )
    assert solo["output_ids"] == outs[0]["output_ids"]


def test_radix_disabled_consistency(dummy_dir):
    eng_ref = make_engine(dummy_dir)
    eng_nocache = make_engine(dummy_dir, disable_radix_cache=True)
    prompt = [1, 2, 3, 4, 5, 6, 7, 8]
    a = eng_ref.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 10, "temperature": 0.0}
    )
    b = eng_nocache.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 10, "temperature": 0.0}
    )
    assert a["output_ids"] == b["output_ids"]


def test_abort_and_flush(engine):
    assert engine.flush_cache() is True
    info = engine.get_server_info()
    assert info["max_total_num_tokens"] == 2048


def test_repetition_penalty_reduces_repeats(engine):
    # Greedy on a random tiny model tends to loop; a strong repetition
    # penalty must change the output (and the engine must accept the params).
    base = engine.generate(
        input_ids=[7, 8, 9], sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    pen = engine.generate(
        input_ids=[7, 8, 9],
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 0.0,
            "repetition_penalty": 1.9,
            "frequency_penalty": 1.5,
        },
    )
    assert len(pen["output_ids"]) == 16
    assert pen["output_ids"] != base["output_ids"]
    # penalized run must have fewer repeated tokens
    import collections
    base_max = max(collections.Counter(base["output_ids"]).values())
    pen_max = max(collections.Counter(pen["output_ids"]).values())
    assert pen_max <= base_max


def test_return_logprob(engine):
    out = engine.generate(
        input_ids=[1, 2, 3],
        sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        return_logprob=True,
        top_logprobs_num=3,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 5
    for lp, tok, _ in lps:
        assert lp <= 0.0
    assert [t for _, t, _ in lps] == out["output_ids"]
    tops = out["meta_info"]["output_top_logprobs"]
    assert len(tops) == 5 and len(tops[0][0]) == 3
    # greedy: chosen token must be the argmax => equals top-1
    for (lp, tok, _), (tvals, tids) in zip(lps, tops):
        assert tok == tids[0]
        assert abs(lp - tvals[0]) < 1e-5


def test_window_pipeline_parity(dummy_dir):
    """Pipelined (device-chained) decode windows must produce exactly the
    greedy outputs of the unpipelined scheduler, including mid-window stops
    and varying max_new_tokens per request."""
    prompts = [[1, 2, 3], [4, 5, 6, 7], [8, 9], [10, 11, 12, 13, 14]]
    sp = [
        {"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True}
        for n in (23, 9, 17, 32)
    ]
    eng_a = make_engine(dummy_dir, decode_window_size=4)
    out_a = eng_a.generate(input_ids=prompts, sampling_params=sp)
    eng_b = make_engine(
        dummy_dir, decode_window_size=4, disable_window_pipeline=True
    )
    out_b = eng_b.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(out_a, out_b):
        assert a["output_ids"] == b["output_ids"]


def test_window_pipeline_no_kv_leak(dummy_dir):
    """After pipelined runs complete, every KV slot must be back in the
    allocator (beyond what the radix tree retains)."""
    eng = make_engine(dummy_dir, decode_window_size=4, disable_radix_cache=True)
    alloc = eng.scheduler.token_to_kv_pool_allocator
    total = alloc.available_size()
    for _ in range(3):
        eng.generate(
            input_ids=[[1, 2, 3], [4, 5, 6]],
            sampling_params={"max_new_tokens": 11, "temperature": 0.0,
                             "ignore_eos": True},
        )
    assert alloc.available_size() == total


def test_window_pipeline_paged_no_leak(dummy_dir):
    """Same with the paged allocator (page_size > 1): partial-page frees
    across windows must eventually release every page."""
    eng = make_engine(
        dummy_dir, decode_window_size=4, page_size=4, disable_radix_cache=True
    )
    alloc = eng.scheduler.token_to_kv_pool_allocator
    total = alloc.available_size()
    for _ in range(3):
        eng.generate(
            input_ids=[[1, 2, 3], [4, 5, 6, 7, 8]],
            sampling_params={"max_new_tokens": 13, "temperature": 0.0,
                             "ignore_eos": True},
        )
    assert alloc.available_size() == total


def test_custom_logit_processor(dummy_dir):
    """End-to-end custom logit processor (reference
    sampling/custom_logit_processor.py): a dill-serialized processor class
    rides the request, runs on the pre-sampling logits, and its effect is
    visible in the emitted tokens; requests setting the field without the
    server flag are rejected loudly."""
    from ltp_sglang_tpu.sampling.custom_logit_processor import (
        CustomLogitProcessor,
    )

    class ForceTokenProcessor(CustomLogitProcessor):
        def __call__(self, logits, custom_param_list):
            out = np.full_like(logits, -1e9)
            for j, p in enumerate(custom_param_list):
                out[j, int(p["token_id"])] = 0.0
            return out

    serialized = ForceTokenProcessor().to_str()

    # Flag off: loud rejection (no third dead surface).
    eng_off = make_engine(dummy_dir)
    with pytest.raises(ValueError, match="enable-custom-logit-processor"):
        eng_off.generate(
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 2},
            custom_logit_processor=serialized,
        )

    eng = make_engine(dummy_dir, enable_custom_logit_processor=True)
    out = eng.generate(
        input_ids=[1, 2, 3],
        sampling_params={
            "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
            "custom_params": {"token_id": 7},
        },
        custom_logit_processor=serialized,
        return_logprob=True,
    )
    assert out["output_ids"] == [7] * 6
    # Chosen-token logprobs describe the processed distribution.
    for lp, tok, _ in out["meta_info"]["output_token_logprobs"]:
        assert tok == 7 and lp > -1e-3
    # Mixed batch: processor rows + plain rows coexist; plain rows match a
    # processor-free run bit-exactly.
    plain = eng.generate(
        input_ids=[5, 6, 7, 8],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
    )
    mixed = eng.generate(
        input_ids=[[1, 2, 3], [5, 6, 7, 8]],
        sampling_params=[
            {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
             "custom_params": {"token_id": 9}},
            {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
        ],
        custom_logit_processor=[serialized, None],
    )
    assert mixed[0]["output_ids"] == [9] * 6
    assert mixed[1]["output_ids"] == plain["output_ids"]
