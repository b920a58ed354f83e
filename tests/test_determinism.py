"""Determinism / replay harness + NaN detection (SURVEY §4 recommendation;
reference enable_nan_detection)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir

PROMPTS = [[1, 5, 7, 9, 100, 200], [2, 8, 450, 3, 17, 77]]


def _engine(d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8, **kw,
    ))


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="det_llama_")
    write_tiny_model_dir(d)
    return d


def test_sampling_replay_same_seed(model_dir):
    """Same seed + same request stream => bit-identical SAMPLED outputs,
    across a fresh engine (restart replay)."""
    sp = {"max_new_tokens": 16, "temperature": 0.8, "top_p": 0.9,
          "ignore_eos": True}

    def run():
        eng = _engine(model_dir, random_seed=1234)
        outs = eng.generate(input_ids=PROMPTS, sampling_params=sp)
        return [o["output_ids"] for o in outs]

    a, b = run(), run()
    assert a == b, (a, b)


def test_batch_order_invariance(model_dir):
    """A request's greedy output must not depend on its batch neighbors."""
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    eng = _engine(model_dir)
    solo = eng.generate(input_ids=PROMPTS[0], sampling_params=sp)["output_ids"]
    eng2 = _engine(model_dir)
    batched = eng2.generate(
        input_ids=[PROMPTS[1], PROMPTS[0], [9, 9, 9]],
        sampling_params=sp,
    )
    assert batched[1]["output_ids"] == solo


def test_nan_detection_aborts(model_dir):
    import jax.numpy as jnp

    eng = _engine(model_dir, enable_nan_detection=True)
    sp = {"max_new_tokens": 4, "temperature": 0.0}
    # Healthy run passes with the guard on.
    out = eng.generate(input_ids=PROMPTS[0], sampling_params=sp)
    assert len(out["output_ids"]) == 4

    # Corrupt a weight: the next batch must abort loudly, and the engine
    # must stay serviceable after the panic reset.
    params = eng.model_runner.params
    good = params["norm"]
    params["norm"] = params["norm"].at[0].set(jnp.nan)
    with pytest.raises(FloatingPointError, match="NaN"):
        eng.generate(input_ids=PROMPTS[1], sampling_params=sp)
    # The serving loop's panic path (EngineLoopThread does this on any step
    # exception) restores serviceability.
    eng.scheduler.abort_all_requests("nan detected")
    params["norm"] = good
    out = eng.generate(input_ids=[7, 7, 7], sampling_params=sp)
    assert len(out["output_ids"]) == 4
