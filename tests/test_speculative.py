"""Speculative decoding (STANDALONE draft): correctness = spec on/off greedy
equivalence; efficiency sanity = full acceptance when draft == target."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="spec_llama_")
    write_tiny_model_dir(d)  # real random weights (HF-generated)
    return d


def make_engine(model_dir, spec: bool, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    args = dict(
        model_path=model_dir,
        dtype="float32",
        max_total_tokens=4096,
        max_running_requests=8,
    )
    if spec:
        args.update(
            speculative_algorithm="STANDALONE",
            speculative_draft_model_path=model_dir,  # draft == target
            speculative_num_steps=4,
        )
    args.update(kw)
    return Engine(ServerArgs(**args))


def test_spec_greedy_equivalence(model_dir):
    base = make_engine(model_dir, spec=False)
    spec = make_engine(model_dir, spec=True)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    # Draft == target => (nearly) every draft token accepted.
    sw = spec.scheduler.spec_worker
    assert sw.num_rounds > 0
    assert sw.avg_accept_length > 3.0, sw.avg_accept_length


def test_spec_with_eos_and_reuse(model_dir):
    spec = make_engine(model_dir, spec=True)
    prompt = [1, 9, 8, 7]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    a = spec.generate(input_ids=prompt, sampling_params=sp)
    b = spec.generate(input_ids=prompt, sampling_params=sp)  # radix prefix reuse
    assert a["output_ids"] == b["output_ids"]
    base = make_engine(model_dir, spec=False)
    r = base.generate(input_ids=prompt, sampling_params=sp)
    assert a["output_ids"] == r["output_ids"]


def test_spec_fallback_for_sampling(model_dir):
    # Non-greedy requests must fall back to the normal decode path.
    spec = make_engine(model_dir, spec=True)
    out = spec.generate(
        input_ids=[1, 2, 3],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 40},
    )
    assert len(out["output_ids"]) == 8
