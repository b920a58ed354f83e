"""PD disaggregation through the HTTP stack: prefill server + decode server +
PD load balancer (router/pd_lb.py; reference: disaggregation/mini_lb.py).
In-process aiohttp test servers with REAL TCP sockets for the KV plane."""

import asyncio
import json
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tiny_configs import write_tiny_model_dir

MAX_NEW = 10
PROMPT = [3, 17, 29, 101, 55, 8, 210, 7]
SP = {"max_new_tokens": MAX_NEW, "temperature": 0.0, "ignore_eos": True}


@pytest.fixture(scope="module")
def pd_stack():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer
    from ltp_sglang_tpu.router.pd_lb import PDLoadBalancer

    d = tempfile.mkdtemp(prefix="pd_http_llama_")
    write_tiny_model_dir(d, seed=3)

    def mk(mode):
        eng = Engine(ServerArgs(
            model_path=d, dtype="float32", page_size=4,
            max_total_tokens=2048, max_running_requests=8,
            disaggregation_mode=mode,
        ))
        srv = HttpServer(eng)
        srv.loop_thread.start()
        return srv

    baseline_engine = Engine(ServerArgs(
        model_path=d, dtype="float32", page_size=4,
        max_total_tokens=2048, max_running_requests=8,
    ))
    baseline = baseline_engine.generate(
        input_ids=PROMPT, sampling_params=dict(SP)
    )["output_ids"]

    prefill_srv = mk("prefill")
    decode_srv = mk("decode")

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def start():
        p = TestServer(prefill_srv.app)
        dsrv = TestServer(decode_srv.app)
        await p.start_server()
        await dsrv.start_server()
        lb = PDLoadBalancer(
            [f"http://127.0.0.1:{p.port}"], [f"http://127.0.0.1:{dsrv.port}"]
        )
        c = TestClient(TestServer(lb.app))
        await c.start_server()
        return p, dsrv, c

    p, dsrv, c = loop.run_until_complete(start())
    yield c, loop, baseline
    loop.run_until_complete(c.close())
    loop.run_until_complete(p.close())
    loop.run_until_complete(dsrv.close())
    prefill_srv.loop_thread.stop()
    decode_srv.loop_thread.stop()


def test_pd_lb_generate(pd_stack):
    c, loop, baseline = pd_stack

    async def go():
        r = await c.post("/generate", json={
            "input_ids": PROMPT, "sampling_params": dict(SP),
        })
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["output_ids"] == baseline, (body["output_ids"], baseline)
        assert body["meta_info"]["completion_tokens"] == MAX_NEW

    loop.run_until_complete(go())


def test_pd_lb_generate_stream(pd_stack):
    c, loop, baseline = pd_stack

    async def go():
        r = await c.post("/generate", json={
            "input_ids": PROMPT, "sampling_params": dict(SP), "stream": True,
        })
        assert r.status == 200
        raw = (await r.read()).decode()
        lines = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
        assert lines[-1] == "[DONE]"
        final = json.loads(lines[-2])
        assert final["output_ids"] == baseline

    loop.run_until_complete(go())


def test_pd_lb_health(pd_stack):
    c, loop, _ = pd_stack

    async def go():
        r = await c.get("/health")
        assert r.status == 200
        assert (await r.json())["healthy"]

    loop.run_until_complete(go())
