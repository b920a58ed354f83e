"""DP-attention with per-group request ownership (managers/dp_controller.py).

Reference semantics: scheduler.py:1794-2003 (per-group batches + global
forward-mode sync + idle batches), data_parallel_controller.py:269-316
(dispatch policies). The key test: group 0 can DECODE while group 1 PREFILLS
a different batch shape in the same program, and every output matches the
single-device engine bit-for-bit (greedy, fp32).
"""

import tempfile

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir, write_tiny_tokenizer


def _mkengine(dp, tp, d, **kw):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    args = ServerArgs(
        model_path=d,
        load_format="dummy",
        dtype="float32",
        max_total_tokens=2048,
        max_running_requests=8,
        dp_size=dp,
        tp_size=tp,
        enable_dp_attention=dp > 1,
        **kw,
    )
    return Engine(args)


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="dp_attn_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    return d


@pytest.fixture(scope="module")
def ref_outputs(model_dir):
    """Single-device greedy outputs for a set of different-length prompts."""
    eng = _mkengine(1, 1, model_dir)
    prompts = [
        list(range(1, 9)),
        list(range(3, 25)),
        [7, 8, 9],
        list(range(40, 80)),
        [5, 4, 3, 2],
        list(range(11, 30, 2)),
    ]
    outs = eng.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    return prompts, [o["output_ids"] for o in outs]


def test_dp_grouped_engine_matches_single_device(model_dir, ref_outputs):
    prompts, refs = ref_outputs
    eng = _mkengine(2, 2, model_dir)
    from ltp_sglang_tpu.managers.dp_controller import DataParallelController

    assert isinstance(eng.scheduler, DataParallelController)
    outs = eng.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    for p, o, r in zip(prompts, outs, refs):
        assert o["output_ids"] == r, (p, o["output_ids"], r)


def test_dp_group0_decodes_while_group1_prefills(model_dir, ref_outputs):
    """The VERDICT 'done' criterion: submit a request pinned to group 0,
    advance it into decode, then admit a prefill pinned to group 1 — the
    next controller step runs decode(g0) + extend(g1) in ONE forward, and
    both outputs match the single-device reference."""
    prompts, refs = ref_outputs
    # K=1 pins the per-step semantics this test asserts (one decode token
    # per controller step); K>1 windows have their own test below.
    eng = _mkengine(2, 1, model_dir, decode_window_size=1)
    sched = eng.scheduler

    from ltp_sglang_tpu.managers.io_struct import GenerateReqInput

    def make_pinned_req(ids, rank):
        gri = GenerateReqInput(
            input_ids=ids,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0},
            data_parallel_rank=rank,
        )
        gri.normalize_batch_and_arguments()
        return eng._make_req(gri)

    req_a = make_pinned_req(prompts[0], 0)
    sched.add_request(req_a)
    # Prefill A, then a few decode steps (group 1 idle the whole time).
    for _ in range(4):
        assert sched.event_loop_step()
    assert len(req_a.output_ids) >= 2
    assert sched.schedulers[0].running_batch is not None
    assert sched.schedulers[1].running_batch is None

    req_b = make_pinned_req(prompts[1], 1)
    sched.add_request(req_b)
    # This step runs group-0 DECODE and group-1 EXTEND in one program.
    n_before = len(req_a.output_ids)
    assert sched.event_loop_step()
    assert len(req_b.output_ids) >= 1  # prefill sampled B's first token
    assert len(req_a.output_ids) == n_before + 1  # decode advanced A

    while not (req_a.finished() and req_b.finished()):
        assert sched.event_loop_step()
    assert req_a.output_ids == refs[0], (req_a.output_ids, refs[0])
    assert req_b.output_ids == refs[1], (req_b.output_ids, refs[1])


def test_dp_dispatch_policies(model_dir):
    from ltp_sglang_tpu.managers.schedule_batch import Req
    from ltp_sglang_tpu.sampling.sampling_params import SamplingParams

    eng = _mkengine(2, 1, model_dir, load_balance_method="round_robin")
    sched = eng.scheduler

    def mkreq(i):
        return Req(
            rid=f"r{i}",
            origin_input_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_new_tokens=1),
        )

    for i in range(4):
        sched.add_request(mkreq(i))
    assert len(sched.schedulers[0].waiting_queue) == 2
    assert len(sched.schedulers[1].waiting_queue) == 2
    sched.abort_all_requests()

    sched.lb_method = "shortest_queue"
    sched.add_request(mkreq(10))
    sched.add_request(mkreq(11))
    assert len(sched.schedulers[0].waiting_queue) == 1
    assert len(sched.schedulers[1].waiting_queue) == 1
    sched.abort_all_requests()


def test_dp_grouped_kv_regions_disjoint(model_dir):
    """Each group's allocator hands out slots only in its own region."""
    eng = _mkengine(2, 1, model_dir)
    runner = eng.model_runner
    assert runner.dp_grouped
    v0 = eng.scheduler.schedulers[0].token_to_kv_pool_allocator
    v1 = eng.scheduler.schedulers[1].token_to_kv_pool_allocator
    s0 = v0.alloc(16)
    s1 = v1.alloc(16)
    assert s0.max() < runner.group_slots
    assert s1.min() >= runner.group_slots
    v0.free(s0)
    v1.free(s1)


def test_dp_grouped_sampled_and_stop(model_dir):
    """Sampled requests and EOS/stop handling work through the grouped path."""
    eng = _mkengine(2, 1, model_dir)
    outs = eng.generate(
        input_ids=[[1, 2, 3, 4], [9, 8, 7]],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 20},
    )
    for o in outs:
        assert 1 <= len(o["output_ids"]) <= 8


def test_dp_grouped_decode_windows_k8(model_dir, ref_outputs):
    """Decode windows K>1 under dp-attention (lifts the r03 K=1
    restriction): dp=2 x tp=2 with decode_window_size=8 must be bit-exact
    vs single-device, and the controller's window path must actually run."""
    prompts, ref = ref_outputs
    eng = _mkengine(2, 2, model_dir, decode_window_size=8)
    ctl = eng.scheduler
    ran_windows = {"n": 0}
    orig = ctl._try_window_step

    def spy():
        ok = orig()
        ran_windows["n"] += int(ok)
        return ok

    ctl._try_window_step = spy
    outs = eng.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert [o["output_ids"] for o in outs] == ref
    assert ran_windows["n"] > 0, "dp window path never engaged"
    # Second turn (radix reuse) + a sampled batch also served under windows.
    outs2 = eng.generate(
        input_ids=prompts[:2],
        sampling_params={"max_new_tokens": 12, "temperature": 0.0},
    )
    assert [o["output_ids"] for o in outs2] == ref[:2]
    s = eng.generate(
        input_ids=prompts[0],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 20},
    )
    assert len(s["output_ids"]) == 8
