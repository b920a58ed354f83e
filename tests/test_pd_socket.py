"""PD disaggregation over real sockets.

Covers what the reference covers with test/srt/test_disaggregation*.py on
real RDMA clusters, reduced to localhost TCP:
- prefill engine -> decode engine handoff parity vs a single engine
- transfer overlapping a running decode on the decode engine
- failure injection (dead bootstrap port, mid-transfer socket death):
  the one request aborts, the engine keeps serving
- a true 2-process run (spawned prefill engine process, real sockets)
"""

import multiprocessing
import os
import socket
import tempfile
import threading
import time

import pytest

from tiny_configs import write_tiny_model_dir

MAX_NEW = 12
PROMPT = [3, 17, 29, 101, 55, 8, 210, 7]  # page_size=4 -> aligned prefix 8
SP = {"max_new_tokens": MAX_NEW, "temperature": 0.0, "ignore_eos": True}


def _make_engine(model_dir, mode="null", page_size=4):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=model_dir, dtype="float32", page_size=page_size,
        max_total_tokens=2048, max_running_requests=8,
        disaggregation_mode=mode, pd_transfer_timeout=20.0,
    ))


@pytest.fixture(scope="module")
def model_dir():
    d = tempfile.mkdtemp(prefix="pd_llama_")
    write_tiny_model_dir(d, seed=3)
    return d


@pytest.fixture(scope="module")
def baseline(model_dir):
    eng = _make_engine(model_dir)
    out = eng.generate(input_ids=PROMPT, sampling_params=dict(SP))
    return out["output_ids"]


def test_pd_socket_parity(model_dir, baseline):
    prefill = _make_engine(model_dir, mode="prefill")
    decode = _make_engine(model_dir, mode="decode")
    room = 1001
    port = prefill.pd_prefill.port

    # Decode registers first (its receiver connects to the bootstrap server),
    # prefill computes + dispatches; run them concurrently like the LB does.
    result = {}

    def decode_side():
        result["out"] = decode.generate_pd_decode(
            room, "127.0.0.1", port,
            input_ids=PROMPT, sampling_params=dict(SP),
        )

    t = threading.Thread(target=decode_side)
    t.start()
    pre_out = prefill.generate_pd_prefill(
        room, input_ids=PROMPT, sampling_params=dict(SP)
    )
    t.join(timeout=60)
    assert not t.is_alive(), "decode side did not finish"
    out = result["out"]
    assert pre_out["output_ids"][0] == baseline[0]
    assert out["output_ids"] == baseline, (out["output_ids"], baseline)
    assert prefill.pd_prefill.states[room] == "done"
    prefill.shutdown()
    decode.shutdown()


def test_pd_transfer_overlaps_decode(model_dir, baseline):
    """A long-running decode on the decode engine keeps the loop busy while
    the PD transfer arrives; both requests must finish correctly."""
    prefill = _make_engine(model_dir, mode="prefill")
    decode = _make_engine(model_dir, mode="decode")
    room = 2002
    port = prefill.pd_prefill.port

    long_result, pd_result = {}, {}

    def long_decode():
        long_result["out"] = decode.generate(
            input_ids=[9, 9, 4, 2],
            sampling_params={"max_new_tokens": 64, "temperature": 0.0,
                             "ignore_eos": True},
        )

    def pd_side():
        pd_result["out"] = decode.generate_pd_decode(
            room, "127.0.0.1", port,
            input_ids=PROMPT, sampling_params=dict(SP),
        )

    t1 = threading.Thread(target=long_decode)
    t2 = threading.Thread(target=pd_side)
    t1.start()
    time.sleep(0.05)  # let the long decode occupy the loop
    t2.start()
    prefill.generate_pd_prefill(room, input_ids=PROMPT, sampling_params=dict(SP))
    t1.join(timeout=120)
    t2.join(timeout=120)
    assert not t1.is_alive() and not t2.is_alive()
    assert len(long_result["out"]["output_ids"]) == 64
    assert pd_result["out"]["output_ids"] == baseline
    prefill.shutdown()
    decode.shutdown()


def test_pd_decode_failure_aborts_request_not_engine(model_dir, baseline):
    decode = _make_engine(model_dir, mode="decode")

    # Unreachable bootstrap server: the request aborts with an error.
    out = decode.generate_pd_decode(
        3003, "127.0.0.1", 1,  # port 1: connection refused
        input_ids=PROMPT, sampling_params=dict(SP), timeout=30.0,
    )
    assert out["meta_info"]["finish_reason"]["type"] == "abort"

    # Mid-transfer socket death: a fake prefill sends meta + one chunk then
    # dies. The decode request aborts; the engine then serves normally.
    from ltp_sglang_tpu.disaggregation.net import recv_frame, send_frame

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def evil_prefill():
        conn, _ = srv.accept()
        recv_frame(conn)  # register
        send_frame(conn, {
            "type": "meta", "room": 4004,
            "tokens": PROMPT, "first_token": 5,
            "num_layers": 2, "k_shape": [8, 2, 16], "v_shape": [8, 2, 16],
            "k_dtype": "float32", "v_dtype": "float32",
        })
        import numpy as np

        send_frame(conn, {"type": "chunk", "which": "k", "layer": 0},
                   np.zeros((8, 2, 16), "float32").tobytes())
        conn.close()  # die mid-transfer
        srv.close()

    t = threading.Thread(target=evil_prefill)
    t.start()
    out = decode.generate_pd_decode(
        4004, "127.0.0.1", port,
        input_ids=PROMPT, sampling_params=dict(SP), timeout=30.0,
    )
    t.join(timeout=10)
    assert out["meta_info"]["finish_reason"]["type"] == "abort"

    # KV accounting survived both failures: a normal request still works and
    # the pool is not leaked below what it needs.
    ok = decode.generate(input_ids=PROMPT, sampling_params=dict(SP))
    assert ok["output_ids"] == baseline
    decode.shutdown()


def _prefill_proc(model_dir, room, port_q, prompt, sp):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=model_dir, dtype="float32", page_size=4,
        max_total_tokens=2048, max_running_requests=8,
        disaggregation_mode="prefill",
    ))
    port_q.put(eng.pd_prefill.port)
    eng.generate_pd_prefill(room, input_ids=prompt, sampling_params=sp)
    # Wait for the async transfer to drain before exiting.
    deadline = time.time() + 30
    while eng.pd_prefill.states.get(room) not in ("done",) and time.time() < deadline:
        time.sleep(0.05)
    eng.shutdown()


def test_pd_two_processes(model_dir, baseline):
    """Separate prefill engine PROCESS + in-process decode engine, real
    sockets between them (the 2-host shape of BASELINE config 5)."""
    ctx = multiprocessing.get_context("spawn")
    port_q = ctx.Queue()
    room = 5005
    proc = ctx.Process(
        target=_prefill_proc, args=(model_dir, room, port_q, PROMPT, dict(SP))
    )
    proc.start()
    try:
        port = port_q.get(timeout=120)
        decode = _make_engine(model_dir, mode="decode")
        out = decode.generate_pd_decode(
            room, "127.0.0.1", port,
            input_ids=PROMPT, sampling_params=dict(SP), timeout=120.0,
        )
        assert out["output_ids"] == baseline
        decode.shutdown()
    finally:
        proc.join(timeout=120)
        if proc.is_alive():
            proc.kill()
    assert proc.exitcode == 0


def test_pd_different_tp_parity(model_dir, baseline):
    """P and D fleets with DIFFERENT TP geometries (reference
    test_disaggregation_different_tp.py): the single-controller design moves
    LOGICAL KV rows, so tp only changes internal shardings — outputs must
    match the single-engine baseline both ways."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    def mk(mode, tp):
        return Engine(ServerArgs(
            model_path=model_dir, dtype="float32", page_size=4, tp_size=tp,
            max_total_tokens=2048, max_running_requests=8,
            disaggregation_mode=mode, pd_transfer_timeout=20.0,
        ))

    for tp_p, tp_d in ((2, 4), (4, 2)):
        prefill = mk("prefill", tp_p)
        decode = mk("decode", tp_d)
        room = 4000 + tp_p
        port = prefill.pd_prefill.port
        result = {}

        def decode_side():
            result["out"] = decode.generate_pd_decode(
                room, "127.0.0.1", port,
                input_ids=PROMPT, sampling_params=dict(SP),
            )

        t = threading.Thread(target=decode_side)
        t.start()
        prefill.generate_pd_prefill(room, input_ids=PROMPT,
                                    sampling_params=dict(SP))
        t.join(timeout=60)
        assert not t.is_alive()
        assert result["out"]["output_ids"] == baseline, (
            tp_p, tp_d, result["out"]["output_ids"], baseline)
        assert prefill.pd_prefill.states[room] == "done"
        prefill.shutdown()
        decode.shutdown()


def test_pd_different_tp_mla_row_adaptation():
    """DeepSeek latent rows carry tp-dependent zero padding; the decode side
    must pad/truncate transferred rows to ITS width (decode._adapt_rows)."""
    from test_models_parity import TINY_DEEPSEEK_V2_CFG

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="pd_dsv2_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)

    def mk(mode, tp):
        return Engine(ServerArgs(
            model_path=d, dtype="float32", page_size=4, tp_size=tp,
            max_total_tokens=2048, max_running_requests=8,
            disaggregation_mode=mode, pd_transfer_timeout=20.0,
        ))

    base = Engine(ServerArgs(
        model_path=d, dtype="float32", page_size=4,
        max_total_tokens=2048, max_running_requests=8,
    ))
    ref = base.generate(input_ids=PROMPT, sampling_params=dict(SP))["output_ids"]
    base.close()

    prefill = mk("prefill", 4)  # latent row padded to 128*tp
    decode = mk("decode", 1)
    assert (prefill.model_runner.k_cache.shape[2:]
            != decode.model_runner.k_cache.shape[2:])
    room = 4100
    port = prefill.pd_prefill.port
    result = {}

    def decode_side():
        result["out"] = decode.generate_pd_decode(
            room, "127.0.0.1", port,
            input_ids=PROMPT, sampling_params=dict(SP),
        )

    t = threading.Thread(target=decode_side)
    t.start()
    prefill.generate_pd_prefill(room, input_ids=PROMPT, sampling_params=dict(SP))
    t.join(timeout=60)
    assert not t.is_alive()
    assert result["out"]["output_ids"] == ref, (result["out"]["output_ids"], ref)
    prefill.shutdown()
    decode.shutdown()
