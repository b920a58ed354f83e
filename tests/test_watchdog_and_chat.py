"""Watchdog (hung-step detection + crash dump) and streaming chat
completions (SSE deltas, reference: entrypoints/openai/serving_chat.py)."""

import asyncio
import json
import os
import tempfile
import time

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tiny_configs import write_tiny_model_dir, write_tiny_tokenizer


@pytest.fixture(scope="module")
def chat_server():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine
    from ltp_sglang_tpu.entrypoints.http_server import HttpServer

    d = tempfile.mkdtemp(prefix="chat_llama_")
    write_tiny_model_dir(d, with_weights=False)
    write_tiny_tokenizer(d)
    engine = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    server = HttpServer(engine)
    server.loop_thread.start()
    yield server
    server.loop_thread.stop()
    engine.shutdown()


@pytest.fixture(scope="module")
def client(chat_server):
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def make():
        c = TestClient(TestServer(chat_server.app))
        await c.start_server()
        return c

    c = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())


def test_chat_completion_nonstream(client):
    c, loop = client

    async def go():
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi there"}],
            "max_tokens": 8, "temperature": 0.0,
        })
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert body["usage"]["completion_tokens"] > 0
        return body

    loop.run_until_complete(go())


def test_chat_completion_stream(client):
    c, loop = client

    async def go():
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 8, "temperature": 0.0, "stream": True,
            "stream_options": {"include_usage": True},
        })
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = (await r.read()).decode()
        lines = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
        assert lines[-1] == "[DONE]"
        chunks = [json.loads(l) for l in lines[:-1]]
        assert chunks[0]["object"] == "chat.completion.chunk"
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        finishes = [
            ch["choices"][0]["finish_reason"]
            for ch in chunks if ch["choices"]
        ]
        assert finishes[-1] in ("stop", "length")
        # Usage chunk (choices == []) present when requested.
        assert any(not ch["choices"] and "usage" in ch for ch in chunks)
        content = "".join(
            ch["choices"][0]["delta"].get("content", "")
            for ch in chunks if ch["choices"]
        )
        assert isinstance(content, str)

    loop.run_until_complete(go())


def test_watchdog_fires_and_dumps(tmp_path):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="wd_llama_")
    write_tiny_model_dir(d, with_weights=False)
    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=1024, max_running_requests=4,
        watchdog_timeout=0.3, watchdog_action="log",
        crash_dump_folder=str(tmp_path),
    ))
    # Simulate a hung device step: scheduler looks busy, the heartbeat
    # never advances, and the serving loop lock is held (a real hang blocks
    # inside generate()/EngineLoopThread, which step under _loop_lock —
    # without a held lock the watchdog treats it as an abandoned engine).
    eng.scheduler.has_unfinished_requests = lambda: True
    eng.scheduler.last_progress_time = time.time() - 100
    deadline = time.time() + 5
    with eng._loop_lock:
        while not eng.watchdog_fired and time.time() < deadline:
            time.sleep(0.05)
    assert eng.watchdog_fired
    dumps = [f for f in os.listdir(tmp_path) if f.startswith("ltp_crash_dump")]
    assert dumps
    with open(tmp_path / dumps[0]) as f:
        dump = json.load(f)
    assert dump["reason"] == "watchdog_timeout"
    eng.shutdown()


def test_watchdog_quiet_when_idle():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="wd2_llama_")
    write_tiny_model_dir(d, with_weights=False)
    eng = Engine(ServerArgs(
        model_path=d, load_format="dummy", dtype="float32",
        max_total_tokens=1024, max_running_requests=4,
        watchdog_timeout=0.3, watchdog_action="log",
    ))
    out = eng.generate(
        input_ids=[1, 2, 3],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0},
    )
    assert len(out["output_ids"]) == 4
    time.sleep(0.8)  # idle well past the timeout
    assert not eng.watchdog_fired
    eng.shutdown()
