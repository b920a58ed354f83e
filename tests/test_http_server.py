"""HTTP server integration tests (aiohttp in-process test client) — the
analog of the reference's popen_launch_server pattern (test_utils.py:462),
without a subprocess since the engine is single-controller."""

import asyncio
import json
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tiny_configs import write_tiny_model_dir


@pytest.fixture(scope="module")
def server_bits():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = tempfile.mkdtemp(prefix="http_llama_")
    write_tiny_model_dir(d, with_weights=False)
    engine = Engine(
        ServerArgs(
            model_path=d,
            load_format="dummy",
            dtype="float32",
            max_total_tokens=2048,
            max_running_requests=8,
        )
    )
    server = HttpServer(engine)
    server.loop_thread.start()
    yield server
    server.loop_thread.stop()


def run(coro):
    return asyncio.get_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def client(server_bits):
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def make():
        c = TestClient(TestServer(server_bits.app))
        await c.start_server()
        return c

    client = loop.run_until_complete(make())
    yield client, loop
    loop.run_until_complete(client.close())


def test_health(client):
    c, loop = client

    async def go():
        resp = await c.get("/health")
        assert resp.status == 200
        assert await resp.text() == "OK"

    loop.run_until_complete(go())


def test_generate(client):
    c, loop = client

    async def go():
        resp = await c.post(
            "/generate",
            json={
                "input_ids": [1, 5, 9],
                "sampling_params": {"max_new_tokens": 4, "temperature": 0.0},
            },
        )
        assert resp.status == 200
        body = await resp.json()
        assert len(body["output_ids"]) == 4
        assert body["meta_info"]["completion_tokens"] == 4
        assert body["meta_info"]["finish_reason"]["type"] == "length"

    loop.run_until_complete(go())


def test_generate_stream(client):
    c, loop = client

    async def go():
        resp = await c.post(
            "/generate",
            json={
                "input_ids": [2, 4, 6],
                "sampling_params": {"max_new_tokens": 3, "temperature": 0.0},
                "stream": True,
            },
        )
        assert resp.status == 200
        chunks = []
        async for line in resp.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
        assert chunks, "no stream chunks"
        assert len(chunks[-1]["output_ids"]) == 3

    loop.run_until_complete(go())


def test_bad_request(client):
    c, loop = client

    async def go():
        resp = await c.post("/generate", json={"sampling_params": {}})
        assert resp.status == 400
        resp = await c.post("/generate", data=b"not json")
        assert resp.status == 400

    loop.run_until_complete(go())


def test_server_info_and_load(client):
    c, loop = client

    async def go():
        resp = await c.get("/get_server_info")
        info = await resp.json()
        assert info["max_total_num_tokens"] == 2048
        resp = await c.get("/get_load")
        load = await resp.json()
        assert "num_reqs_running" in load

    loop.run_until_complete(go())


def test_openai_models_and_completions(client):
    c, loop = client

    async def go():
        resp = await c.get("/v1/models")
        models = await resp.json()
        assert models["data"][0]["object"] == "model"

        resp = await c.post(
            "/v1/completions",
            json={"prompt": [1, 2, 3], "max_tokens": 4, "temperature": 0.0},
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["object"] == "text_completion"
        assert body["usage"]["completion_tokens"] == 4

    loop.run_until_complete(go())


def test_flush_cache(client):
    c, loop = client

    async def go():
        resp = await c.post("/flush_cache", json={})
        body = await resp.json()
        assert body["success"] is True

    loop.run_until_complete(go())


def test_metrics_endpoint():
    # Separate engine with metrics enabled.
    import tempfile
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = tempfile.mkdtemp(prefix="metrics_llama_")
    write_tiny_model_dir(d, with_weights=False)
    engine = Engine(ServerArgs(model_path=d, load_format="dummy", dtype="float32",
                               max_total_tokens=1024, max_running_requests=4,
                               enable_metrics=True))
    server = HttpServer(engine)
    server.loop_thread.start()
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        resp = await c.post("/generate", json={
            "input_ids": [1, 2, 3],
            "sampling_params": {"max_new_tokens": 3, "temperature": 0.0}})
        assert resp.status == 200
        resp = await c.get("/metrics")
        text = await resp.text()
        assert "ltp_sglang_tpu_generation_tokens_total" in text
        assert "ltp_sglang_tpu_e2e_request_latency_seconds" in text
        await c.close()

    loop.run_until_complete(go())
    server.loop_thread.stop()


def test_weight_and_memory_apis(client):
    c, loop = client

    async def go():
        resp = await c.post("/get_weights_by_name", json={"name": "norm"})
        body = await resp.json()
        assert body["shape"] == [128]
        resp = await c.post("/get_weights_by_name", json={"name": "nope/bad"})
        assert resp.status == 400
        resp = await c.post("/release_memory_occupation", json={})
        assert (await resp.json())["success"] is True
        resp = await c.post("/resume_memory_occupation", json={})
        assert (await resp.json())["success"] is True
        # still generates after release/resume
        resp = await c.post("/generate", json={
            "input_ids": [5, 6], "sampling_params": {"max_new_tokens": 2, "temperature": 0.0}})
        assert resp.status == 200

    loop.run_until_complete(go())


def test_encode_and_openai_embeddings(client):
    c, loop = client

    async def go():
        resp = await c.post("/encode", json={"input_ids": [1, 2, 3, 4]})
        assert resp.status == 200
        body = await resp.json()
        assert len(body["embedding"]) > 0
        assert body["meta_info"]["prompt_tokens"] == 4

        resp = await c.post("/v1/embeddings", json={"input": [[1, 2, 3], [4, 5]]})
        assert resp.status == 200
        body = await resp.json()
        assert body["object"] == "list"
        assert len(body["data"]) == 2
        assert body["data"][1]["index"] == 1
        assert body["usage"]["prompt_tokens"] == 5

    loop.run_until_complete(go())


def test_openai_score_and_rerank(client):
    c, loop = client

    async def go():
        # No tokenizer in this dir; score needs text -> expect a clean 4xx/5xx
        # JSON error rather than a hang.
        resp = await c.post("/v1/score", json={"query": "a", "items": ["b"]})
        assert resp.status == 400  # label_token_ids required

        resp = await c.post("/v1/rerank", json={"query": "", "documents": []})
        assert resp.status == 400

    loop.run_until_complete(go())


def test_kv_events(client):
    c, loop = client

    async def go():
        r = await c.get("/kv_events")  # subscribe
        assert (await r.json()).get("subscribed")
        r = await c.post("/generate", json={
            "input_ids": [5, 6, 7, 8], "sampling_params": {"max_new_tokens": 4},
        })
        assert r.status == 200
        r = await c.get("/kv_events")
        events = (await r.json())["events"]
        assert any(e["action"] == "block_stored" for e in events)
        assert all("token_ids" in e for e in events if e["action"] != "all_blocks_cleared")
        # Drained: a second read is empty (modulo new activity).
        r = await c.get("/kv_events")
        assert (await r.json())["events"] == []

    loop.run_until_complete(go())


def test_openai_completions_stream(client):
    c, loop = client

    async def go():
        r = await c.post("/v1/completions", json={
            "prompt": [5, 6, 7, 8], "max_tokens": 6, "stream": True,
        })
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = (await r.read()).decode()
        lines = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
        assert lines[-1] == "[DONE]"
        chunks = [json.loads(l) for l in lines[:-1]]
        assert all(ch["object"] == "text_completion" for ch in chunks)
        finishes = [ch["choices"][0]["finish_reason"] for ch in chunks]
        assert finishes[-1] in ("stop", "length")

    loop.run_until_complete(go())


def test_api_key_auth():
    import tempfile as _tf

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = _tf.mkdtemp(prefix="auth_llama_")
    write_tiny_model_dir(d, with_weights=False)
    engine = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=1024, max_running_requests=4, api_key="sk-test-42",
    ))
    server = HttpServer(engine)
    server.loop_thread.start()
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        c = TestClient(TestServer(server.app))
        await c.start_server()
        r = await c.get("/health")  # probes stay open
        assert r.status == 200
        r = await c.post("/generate", json={"input_ids": [1, 2],
                                            "sampling_params": {"max_new_tokens": 1}})
        assert r.status == 401
        r = await c.post("/generate",
                         json={"input_ids": [1, 2],
                               "sampling_params": {"max_new_tokens": 2}},
                         headers={"Authorization": "Bearer sk-test-42"})
        assert r.status == 200
        await c.close()

    loop.run_until_complete(go())
    server.loop_thread.stop()


def test_bench_serving_sweep_and_goodput():
    """bench_serving parity surface: rate sweep + goodput + dataset sampling
    (reference bench_serving.py:703-737) against a live TCP server. Uses a
    fresh engine: the module fixture's app is bound to TestServer's loop."""
    import argparse
    import asyncio

    from aiohttp import web

    import ltp_sglang_tpu.bench_serving as bs
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = tempfile.mkdtemp(prefix="http_bs_")
    write_tiny_model_dir(d, with_weights=False)
    engine = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    server = HttpServer(engine)
    server.loop_thread.start()

    async def go():
        runner = web.AppRunner(server.app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = runner.addresses[0][1]
        args = argparse.Namespace(
            host="127.0.0.1", port=port, num_prompts=4, input_len=8,
            output_len=4, request_rate=float("inf"),
            request_rate_sweep="20,inf", dataset="synthetic-sharegpt",
            random_range_ratio=0.5, goodput="ttft:60000,tpot:60000",
            warmup=False,
        )
        # Keep prompts tiny regardless of the sharegpt sampler.
        reqs = [(6, 3), (9, 4), (4, 2), (12, 4)]
        rng = __import__("numpy").random.default_rng(0)
        async with __import__("aiohttp").ClientSession() as session:
            reports = []
            for rate in (20.0, float("inf")):
                rep = await bs.run_one_rate(
                    session, f"http://127.0.0.1:{port}", args, rate, rng, reqs
                )
                reports.append(rep)
        await runner.cleanup()
        return reports

    try:
        reports = asyncio.new_event_loop().run_until_complete(go())
    finally:
        server.loop_thread.stop()
    for rep in reports:
        assert rep["completed"] == 4
        assert rep["total_output_tokens"] == sum(o for _, o in [(6, 3), (9, 4), (4, 2), (12, 4)])
        assert "p99" in rep["ttft_s"] and "median" in rep["e2e_s"]
        assert rep["goodput_req_s"] >= 0
        # With 60 s SLOs on a tiny model every request is "good".
        assert rep["good_completed"] == 4
    assert reports[0]["request_rate"] == 20.0


def test_bench_serving_dataset_sampling():
    import argparse

    import numpy as np

    from ltp_sglang_tpu.bench_serving import sample_requests

    rng = np.random.default_rng(0)
    a = argparse.Namespace(num_prompts=50, input_len=100, output_len=40,
                           dataset="random", random_range_ratio=0.5)
    reqs = sample_requests(a, rng)
    assert all(50 <= i <= 100 and 20 <= o <= 40 for i, o in reqs)
    a.dataset = "synthetic-sharegpt"
    reqs = sample_requests(a, rng)
    ins = np.array([i for i, _ in reqs])
    assert ins.min() >= 4 and ins.max() <= 4096
    assert 80 < np.median(ins) < 700  # lognormal centred near ~220


def test_weight_sync_endpoints(client):
    """/init_weights_update_group + /update_weights_from_distributed
    (trainer-group RLHF sync; reference model_runner.py:776-867)."""
    import threading

    import numpy as np

    from ltp_sglang_tpu.weight_sync.distributed import TrainerWeightServer

    c, loop = client
    srv = TrainerWeightServer()
    wt = threading.Thread(target=srv.wait_for_members, args=(1,), daemon=True)
    wt.start()

    async def go():
        resp = await c.post("/init_weights_update_group", json={
            "master_address": "127.0.0.1", "master_port": srv.port,
        })
        assert resp.status == 200 and (await resp.json())["success"]

        r2 = await c.post("/get_weights_by_name", json={"name": "embed/weight"})
        shape = (await r2.json())["shape"]
        new_emb = np.full(shape, 0.125, np.float32)
        bt = threading.Thread(
            target=srv.broadcast,
            args=([("model.embed_tokens.weight", new_emb)],), daemon=True,
        )
        bt.start()
        resp = await c.post("/update_weights_from_distributed", json={
            "names": ["model.embed_tokens.weight"],
            "dtypes": ["float32"], "shapes": [shape],
        })
        body = await resp.json()
        assert resp.status == 200 and body["success"], body
        bt.join(timeout=10)
        r3 = await c.post("/get_weights_by_name", json={"name": "embed/weight"})
        vals = (await r3.json())["truncated_value"]
        assert all(abs(v - 0.125) < 1e-6 for v in vals), vals

    loop.run_until_complete(go())
    wt.join(timeout=5)
    srv.close()
