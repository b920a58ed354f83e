"""Greedy-generation and logits parity vs HuggingFace transformers.

The analog of the reference's HFRunner-vs-SRTRunner comparison
(python/sglang/test/runners.py, check_close_model_outputs:821), using a tiny
random-weight llama so no network is needed.
"""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir


@pytest.fixture(scope="module")
def tiny_model_dir():
    d = tempfile.mkdtemp(prefix="tiny_llama_")
    write_tiny_model_dir(d)
    return d


@pytest.fixture(scope="module")
def engine(tiny_model_dir):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(
        ServerArgs(
            model_path=tiny_model_dir,
            dtype="float32",
            max_total_tokens=4096,
            max_running_requests=16,
        )
    )


@pytest.fixture(scope="module")
def hf_model(tiny_model_dir):
    import torch
    from transformers import AutoModelForCausalLM

    return AutoModelForCausalLM.from_pretrained(
        tiny_model_dir, dtype=torch.float32
    ).eval()


def hf_greedy(hf_model, prompt, n):
    import torch

    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False
        )
    return out[0].tolist()[len(prompt):]


def test_greedy_single(engine, hf_model):
    prompt = [1, 5, 7, 9, 100, 200]
    ref = hf_greedy(hf_model, prompt, 24)
    out = engine.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 24, "temperature": 0.0}
    )
    assert out["output_ids"] == ref


def test_greedy_batch(engine, hf_model):
    prompts = [
        [1, 5, 7, 9],
        [2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
        [1, 444, 333, 222, 111],
    ]
    refs = [hf_greedy(hf_model, p, 12) for p in prompts]
    outs = engine.generate(
        input_ids=prompts, sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    for o, r in zip(outs, refs):
        assert o["output_ids"] == r


def test_greedy_with_prefix_reuse(engine, hf_model):
    # Second run shares a radix prefix with the first; outputs must not change.
    prompt = [1, 9, 8, 7, 6, 5, 4, 3]
    ref = hf_greedy(hf_model, prompt, 16)
    out1 = engine.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    out2 = engine.generate(
        input_ids=prompt, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    assert out1["output_ids"] == ref
    assert out2["output_ids"] == ref
    # Longer prompt sharing the prefix.
    prompt2 = prompt + [77, 88]
    ref2 = hf_greedy(hf_model, prompt2, 16)
    out3 = engine.generate(
        input_ids=prompt2, sampling_params={"max_new_tokens": 16, "temperature": 0.0}
    )
    assert out3["output_ids"] == ref2


def test_eos_stops(engine, hf_model):
    # Force EOS as a stop token artificially by setting stop_token_ids to the
    # first generated token => length 1.
    prompt = [1, 5, 7, 9, 100, 200]
    ref = hf_greedy(hf_model, prompt, 1)
    out = engine.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 32,
            "temperature": 0.0,
            "stop_token_ids": [ref[0]],
        },
    )
    assert out["output_ids"] == ref[:1]
    assert out["meta_info"]["finish_reason"]["type"] == "stop"
