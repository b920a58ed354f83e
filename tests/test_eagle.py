"""EAGLE speculative decoding: spec on/off greedy equivalence (verification
is exact, so outputs must match regardless of the head's acceptance rate)."""

import tempfile

import pytest

from tiny_configs import write_tiny_eagle_dir, write_tiny_model_dir


@pytest.fixture(scope="module")
def dirs():
    d = tempfile.mkdtemp(prefix="eagle_target_")
    write_tiny_model_dir(d)
    e = tempfile.mkdtemp(prefix="eagle_head_")
    write_tiny_eagle_dir(e)
    return d, e


def make_engine(dirs, spec: bool):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, e = dirs
    args = dict(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
    )
    if spec:
        args.update(
            speculative_algorithm="EAGLE",
            speculative_draft_model_path=e,
            speculative_num_steps=3,
        )
    return Engine(ServerArgs(**args))


def test_eagle_greedy_equivalence(dirs):
    base = make_engine(dirs, spec=False)
    spec = make_engine(dirs, spec=True)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    ref = base.generate(input_ids=prompts, sampling_params=sp)
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle"
    assert sw.num_rounds > 0
    # A random head should still commit >= 1 token per round (the bonus).
    assert sw.avg_accept_length >= 1.0


def test_eagle_radix_reuse_and_second_turn(dirs):
    spec = make_engine(dirs, spec=True)
    prompt = [1, 9, 8, 7, 6, 5]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    a = spec.generate(input_ids=prompt, sampling_params=sp)
    b = spec.generate(input_ids=prompt, sampling_params=sp)  # radix reuse path
    assert a["output_ids"] == b["output_ids"]
