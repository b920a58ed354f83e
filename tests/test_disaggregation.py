"""PD disaggregation: prefill engine -> KV transfer -> decode engine must
reproduce the single-engine output exactly (the analog of
test_disaggregation.py with the fake backend)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="pd_llama_")
    write_tiny_model_dir(d)
    return d


def make_engine(model_dir):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(
        ServerArgs(
            model_path=model_dir, dtype="float32",
            max_total_tokens=2048, max_running_requests=8,
        )
    )


def test_pd_matches_single_engine(model_dir):
    from ltp_sglang_tpu.disaggregation.pd_engine import DecodeWorker, PrefillWorker

    single = make_engine(model_dir)
    prompt = [1, 5, 7, 9, 100, 200, 31]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    ref = single.generate(input_ids=prompt, sampling_params=sp)

    p_engine = make_engine(model_dir)
    d_engine = make_engine(model_dir)
    pw = PrefillWorker(p_engine)
    dw = DecodeWorker(d_engine)

    room = 42
    receiver = dw.register(room)
    first = pw.prefill(room, prompt, sp)
    out = dw.decode(receiver, prompt, sp)

    assert first == ref["output_ids"][0]
    assert out["output_ids"] == ref["output_ids"]
    # The decode engine must have found the prompt as a cached prefix
    # (i.e. the transfer actually carried usable KV).
    m = d_engine.scheduler.tree_cache.match_prefix(prompt)
    assert len(m.device_indices) == len(prompt)


def test_pd_transfer_poll_states(model_dir):
    from ltp_sglang_tpu.disaggregation.conn import (
        FakeKVReceiver,
        FakeKVSender,
        KVPoll,
    )

    s = FakeKVSender(77)
    assert s.poll() == KVPoll.Bootstrapping
    r = FakeKVReceiver(77)
    assert s.poll() == KVPoll.WaitingForInput
    assert r.poll() == KVPoll.WaitingForInput
    s.send({"x": 1})
    assert s.poll() == KVPoll.Success
    assert r.poll() == KVPoll.Success
    assert r.recv() == {"x": 1}
