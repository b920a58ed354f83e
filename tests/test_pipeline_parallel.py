"""Pipeline parallelism on the virtual 8-device CPU mesh: stage-sharded
layers + microbatched ppermute pipeline must reproduce single-device greedy
outputs exactly (covers what the reference covers with test_pp_single_node)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG, write_tiny_model_dir

PROMPTS = [[1, 5, 7, 9, 100, 200], [2, 8, 450, 3, 17, 77, 240, 9, 11],
           [4, 4, 8, 2], [10, 20, 30, 40, 50]]
SP = {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True}


@pytest.fixture(scope="module")
def model_dir():
    cfg = dict(TINY_LLAMA_CFG, num_hidden_layers=4)  # divisible by pp=2 and 4
    d = tempfile.mkdtemp(prefix="pp_llama_")
    write_tiny_model_dir(d, cfg=cfg)
    return d


def _generate(model_dir, pp):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=model_dir, dtype="float32", pp_size=pp,
        max_total_tokens=2048, max_running_requests=8,
    ))
    outs = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    return [o["output_ids"] for o in outs]


@pytest.fixture(scope="module")
def single_out(model_dir):
    return _generate(model_dir, 1)


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_generate_parity(model_dir, single_out, pp):
    out = _generate(model_dir, pp)
    assert out == single_out, (pp, out, single_out)


def test_pp_radix_and_second_turn(model_dir, single_out):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=model_dir, dtype="float32", pp_size=4,
        max_total_tokens=2048, max_running_requests=8,
    ))
    a = eng.generate(input_ids=PROMPTS[0], sampling_params=dict(SP))
    b = eng.generate(input_ids=PROMPTS[0], sampling_params=dict(SP))
    assert a["output_ids"] == b["output_ids"] == single_out[0]


@pytest.mark.parametrize("pp,tp", [(2, 2), (2, 4), (4, 2)])
def test_pp_x_tp_parity(model_dir, single_out, pp, tp):
    """PP composed with TP (reference scheduler.py:815-945): manual shard_map
    over "pp" only; the stacked layer leaves keep their "tp" shardings and
    GSPMD inserts the in-stage collectives."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=model_dir, dtype="float32", pp_size=pp, tp_size=tp,
        max_total_tokens=2048, max_running_requests=8,
    ))
    outs = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in outs] == single_out


def test_pp_decode_windows():
    """PP with K>1 decode windows (_build_window_fn_pp): outputs must match
    the forced-K=1 PP engine exactly — the former pp => K=1 guard is gone."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    cfg = dict(TINY_LLAMA_CFG, num_hidden_layers=4)
    d = tempfile.mkdtemp(prefix="ppwin_llama_")
    write_tiny_model_dir(d, cfg=cfg)
    k1 = Engine(ServerArgs(
        model_path=d, dtype="float32", pp_size=2,
        max_total_tokens=2048, max_running_requests=8,
        decode_window_size=1,
    ))
    ref = [o["output_ids"] for o in
           k1.generate(input_ids=PROMPTS, sampling_params=dict(SP))]
    k1.close()
    k8 = Engine(ServerArgs(
        model_path=d, dtype="float32", pp_size=2,
        max_total_tokens=2048, max_running_requests=8,
        decode_window_size=8,
    ))
    out = [o["output_ids"] for o in
           k8.generate(input_ids=PROMPTS, sampling_params=dict(SP))]
    assert out == ref, (out, ref)
    k8.close()


def test_pp_x_tp_int4_quant_parity():
    """PP x TP with AWQ-INT4 quantized weights (former pp+quant guard): the
    stacked packed leaves shard their layer dim over 'pp' like dense leaves;
    greedy outputs must match the single-device quantized engine."""
    from test_quant_e2e import _fabricate_quant_checkpoint

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    quant_dir, _ = _fabricate_quant_checkpoint("awq")
    single = Engine(ServerArgs(
        model_path=quant_dir, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    prompts = [[1, 44, 55, 66, 77, 88], [3, 9, 27, 81]]
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    ref = [o["output_ids"] for o in
           single.generate(input_ids=prompts, sampling_params=sp)]
    single.close()
    pp = Engine(ServerArgs(
        model_path=quant_dir, dtype="float32", pp_size=2, tp_size=2,
        max_total_tokens=2048, max_running_requests=8,
    ))
    assert pp.model_runner.model.quant is not None
    out = [o["output_ids"] for o in
           pp.generate(input_ids=prompts, sampling_params=sp)]
    assert out == ref, (out, ref)
    pp.close()
