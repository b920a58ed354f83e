"""Frontend DSL IR/tracer/compiler + choices methods + input logprobs +
third-party backends (reference lang/{ir,tracer,compiler,choices}.py and
lang/backend/{openai,anthropic}.py)."""

import json
import tempfile
import threading

import numpy as np
import pytest

from tiny_configs import write_tiny_model_dir, write_tiny_tokenizer


@pytest.fixture(scope="module")
def engine():
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="lang_llama_")
    write_tiny_model_dir(d, with_weights=True)
    write_tiny_tokenizer(d)
    eng = Engine(
        ServerArgs(
            model_path=d, dtype="float32",
            max_total_tokens=2048, max_running_requests=8,
        )
    )
    yield eng


# ------------------------------------------------------------ input logprobs
def test_input_token_logprobs(engine):
    ids = [3, 9, 4, 7, 11, 2, 8]
    out = engine.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True, logprob_start_len=0,
    )
    ilps = out["meta_info"]["input_token_logprobs"]
    assert len(ilps) == len(ids)
    assert ilps[0][0] is None and ilps[0][1] == ids[0]
    assert all(e[1] == t for e, t in zip(ilps, ids))
    assert all(e[0] < 0 for e in ilps[1:])

    # start>0 returns the tail only, same values as the full scoring
    out2 = engine.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True, logprob_start_len=4,
    )
    tail = out2["meta_info"]["input_token_logprobs"]
    assert [e[1] for e in tail] == ids[4:]
    for a, b in zip(tail, ilps[4:]):
        assert abs(a[0] - b[0]) < 2e-3

    # radix-cached identical prompt still yields the full scored span
    out3 = engine.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True, logprob_start_len=0,
    )
    assert len(out3["meta_info"]["input_token_logprobs"]) == len(ids)


def test_input_logprobs_chunked_prefill():
    """Prompt logprobs across a chunked prefill: the radix cap must advance
    with the recorded-position cursor (a frozen cap recomputes chunk 1
    forever — scheduler livelock — and appends duplicate entries)."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = tempfile.mkdtemp(prefix="lang_chunk_")
    write_tiny_model_dir(d, with_weights=True)
    eng = Engine(ServerArgs(
        model_path=d, dtype="float32", chunked_prefill_size=16,
        max_total_tokens=2048, max_running_requests=8,
    ))
    rng = np.random.default_rng(3)
    ids = rng.integers(2, 250, size=50).tolist()  # > 3 chunks of 16
    out = eng.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        return_logprob=True, logprob_start_len=0,
    )
    ilps = out["meta_info"]["input_token_logprobs"]
    assert len(ilps) == len(ids)  # no duplicates across chunk rounds
    assert ilps[0][0] is None
    assert [e[1] for e in ilps] == ids
    # Chunk-boundary positions score the first token of the NEXT chunk:
    # values must match an unchunked engine scoring the same prompt.
    eng2 = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=2048, max_running_requests=8,
    ))
    ref = eng2.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        return_logprob=True, logprob_start_len=0,
    )["meta_info"]["input_token_logprobs"]
    for a, b in zip(ilps[1:], ref[1:]):
        assert abs(a[0] - b[0]) < 5e-3, (a, b)

    # start>0 with chunking: only the tail is returned, once.
    out2 = eng.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True, logprob_start_len=40,
    )
    tail = out2["meta_info"]["input_token_logprobs"]
    assert [e[1] for e in tail] == ids[40:]


def test_input_logprobs_validation(engine):
    with pytest.raises(ValueError):
        engine.generate(
            input_ids=[1, 2],
            sampling_params={"max_new_tokens": 1},
            return_logprob=True, logprob_start_len=5,
        )


# ------------------------------------------------------------- tracer / IR
def test_tracer_records_ir():
    from ltp_sglang_tpu.lang import function, gen, select, user
    from ltp_sglang_tpu.lang.ir import (
        ArgRef, ConstantText, GenOp, RoleBegin, SelectOp, VarRef,
    )

    @function
    def prog(s, topic):
        s += user(f"topic: {topic}\n")
        s += "answer: "
        s += gen("answer", max_tokens=6, temperature=0.0)
        s += f"\nrestate {s['answer']} choice: "
        s += select("pick", choices=["yes", "no"])

    traced = prog.trace(topic=None)
    kinds = [type(n) for n in traced.nodes]
    assert RoleBegin in kinds and ArgRef in kinds and GenOp in kinds
    assert VarRef in kinds and SelectOp in kinds
    assert traced.arg_names == ["topic"]
    # constants merged; pretty() renders
    assert "gen" in traced.pretty()
    # ArgRef lands between the surrounding constant text pieces
    i_arg = kinds.index(ArgRef)
    assert isinstance(traced.nodes[i_arg - 1], ConstantText)
    assert traced.nodes[i_arg - 1].text.endswith("topic: ")


def test_tracer_stops_on_control_flow():
    from ltp_sglang_tpu.lang import function, gen
    from ltp_sglang_tpu.lang.ir import StopTracing

    @function
    def prog(s, q):
        s += q
        s += gen("a", max_tokens=4)
        if s["a"] == "yes":  # data-dependent branch
            s += "!"

    with pytest.raises(StopTracing):
        prog.trace(q=None)


def test_compiled_program_matches_eager(engine):
    from ltp_sglang_tpu.lang import function, gen, user

    @function
    def prog(s, topic):
        s += user(f"topic: {topic}\n")
        s += "answer: "
        s += gen("answer", max_tokens=5, temperature=0.0)

    compiled = prog.compile(topic=None)
    assert compiled.shared_prefix == ""  # role header precedes constants? no: user() opens with text
    st_c = compiled.run(backend=engine, topic="parity")
    st_e = prog.run(backend=engine, topic="parity")
    assert st_c.text == st_e.text
    assert st_c.vars["answer"] == st_e.vars["answer"]

    # graph: gen depends on nothing upstream; topo sort is text order
    order = compiled.topological_sort()
    assert order and "GenOp" in compiled.print_graph()

    # batch via the compiled path
    states = prog.run_batch(
        [{"topic": f"t{i}"} for i in range(4)], backend=engine
    )
    assert len(states) == 4 and all("answer" in s.vars for s in states)


def test_compiler_shared_prefix(engine):
    from ltp_sglang_tpu.lang import function, gen

    @function
    def prog(s, q):
        s += "SYSTEM: you are a test.\n"
        s += f"Q: {q}\nA: "
        s += gen("a", max_tokens=4, temperature=0.0)

    compiled = prog.compile(q=None)
    # adjacent constants merge: the prefix runs up to the first ArgRef
    assert compiled.shared_prefix == "SYSTEM: you are a test.\nQ: "
    states = compiled.run_batch(
        [{"q": "x"}, {"q": "y"}], backend=engine
    )
    assert states[0].text.startswith("SYSTEM: ")
    assert states[0].vars["a"] is not None


# ------------------------------------------------------------ choices methods
def test_choices_methods(engine):
    from ltp_sglang_tpu.lang.choices import select_by_logprobs

    prompt = "the secret word is"
    choices = [" alpha", " beta bumble", " gamma"]
    for method in (
        "token_length_normalized",
        "greedy_token_selection",
        "unconditional_likelihood_normalized",
    ):
        res = select_by_logprobs(engine, prompt, choices, method)
        assert res["choice"] in choices
        assert len(res["scores"]) == 3
        finite = [s for s in res["scores"] if s != float("-inf")]
        assert all(np.isfinite(s) for s in finite)

    with pytest.raises(ValueError):
        select_by_logprobs(engine, prompt, choices, "nope")


def test_select_choices_method_e2e(engine):
    from ltp_sglang_tpu.lang import function, gen, select

    @function
    def prog(s):
        s += "pick one fruit: "
        s += select("fruit", choices=["apple", "banana"],
                    choices_method="token_length_normalized")

    st = prog.run(backend=engine)
    assert st.vars["fruit"] in ("apple", "banana")
    assert st.text.endswith(st.vars["fruit"])


# --------------------------------------------------- third-party backends
class _FakeOpenAIHandler:
    """Minimal OpenAI-compatible server for zero-egress backend tests."""

    def routes(self):
        from aiohttp import web

        async def chat(request):
            body = await request.json()
            msg = body["messages"][0]["content"]
            return web.json_response({
                "choices": [{"message": {"content": f"echo:{msg[:8]}"}}],
                "usage": {"total_tokens": 3},
            })

        async def completions(request):
            body = await request.json()
            if body.get("echo"):
                prompt = body["prompt"]
                # Deterministic fake logprobs: longer tail -> lower score for
                # tokens later in the string; mark " good" tokens higher.
                toks = prompt.split(" ")
                offs, cur = [], 0
                for t in toks:
                    offs.append(cur)
                    cur += len(t) + 1
                lps = [None] + [
                    -0.5 if "good" in t else -5.0 for t in toks[1:]
                ]
                return web.json_response({
                    "choices": [{
                        "text": "",
                        "logprobs": {"token_logprobs": lps, "text_offset": offs},
                    }]
                })
            return web.json_response(
                {"choices": [{"text": " completed"}]}
            )

        return [("POST", "/v1/chat/completions", chat),
                ("POST", "/v1/completions", completions)]


def _serve(handler):
    import asyncio

    from aiohttp import web

    app = web.Application()
    for method, path, fn in handler.routes():
        app.router.add_route(method, path, fn)
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        return site._server.sockets[0].getsockname()[1]

    port = loop.run_until_complete(start())
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    return f"http://127.0.0.1:{port}", loop


def test_openai_backend_chat_and_completion():
    from ltp_sglang_tpu.lang import OpenAI, function, gen

    base, loop = _serve(_FakeOpenAIHandler())

    chat = OpenAI("gpt-4o-mini", base_url=base + "/v1", api_key="k")
    assert chat.is_chat_model
    out = chat.generate(prompt="hello world", sampling_params={"max_new_tokens": 8})
    assert out["text"].startswith("echo:")

    comp = OpenAI("davinci-002", base_url=base + "/v1", api_key="k",
                  is_chat_model=False)
    out = comp.generate(prompt="x", sampling_params={"max_new_tokens": 4})
    assert out["text"] == " completed"
    # echo-logprob select: the " good" choice wins by construction
    got = comp.select("prefix words here ", ["bad tail", "good tail"])
    assert got == "good tail"

    # full program against the chat backend
    @function
    def prog(s, q):
        s += f"Q: {q}\n"
        s += gen("a", max_tokens=8, temperature=0.0)

    st = prog.run(backend=chat, q="hi")
    assert "a" in st.vars and st.vars["a"].startswith("echo:")
    loop.call_soon_threadsafe(loop.stop)


def test_anthropic_backend():
    from aiohttp import web

    from ltp_sglang_tpu.lang import Anthropic

    class H:
        def routes(self):
            async def messages(request):
                body = await request.json()
                txt = body["messages"][0]["content"]
                reply = "banana" if "banana" in txt else f"claude:{txt[:6]}"
                return web.json_response({
                    "content": [{"type": "text", "text": reply}],
                    "usage": {"input_tokens": 2, "output_tokens": 2},
                })

            return [("POST", "/v1/messages", messages)]

    base, loop = _serve(H())
    be = Anthropic("claude-3-haiku", base_url=base, api_key="k")
    out = be.generate(prompt="ping", sampling_params={"max_new_tokens": 8})
    assert out["text"].startswith("claude:")
    assert be.select("fruits:", ["apple", "banana"]) == "banana"
    loop.call_soon_threadsafe(loop.stop)


class _FakeVertexHandler:
    """Minimal Vertex generateContent server for zero-egress backend tests."""

    def routes(self):
        from aiohttp import web

        async def gen_content(request):
            body = await request.json()
            msg = body["contents"][0]["parts"][0]["text"]
            reply = "beta" if "alpha | beta" in msg else f"vx:{msg[:6]}"
            return web.json_response({
                "candidates": [{
                    "content": {"role": "model",
                                "parts": [{"text": reply}]},
                }],
                "usageMetadata": {"totalTokenCount": 5},
            })

        return [("POST",
                 "/v1/projects/p/locations/l/publishers/google/models/gem:generateContent",
                 gen_content)]


def test_vertexai_backend():
    from ltp_sglang_tpu.lang import VertexAI

    base, loop = _serve(_FakeVertexHandler())
    vx = VertexAI("gem", project="p", location="l", access_token="t")
    # Point the URL builder at the fake server.
    vx._url = lambda: (
        base + "/v1/projects/p/locations/l/publishers/google/models/"
        "gem:generateContent"
    )
    out = vx.generate(prompt="hello there",
                      sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                                       "stop": ["\n"]})
    assert out["text"].startswith("vx:")
    assert out["meta_info"]["totalTokenCount"] == 5
    assert vx.select("pick one ", ["alpha", "beta"]) == "beta"


def test_litellm_backend_proxy_path():
    """Without the litellm package, the backend rides the OpenAI-compatible
    proxy surface (LiteLLM's own deployment mode)."""
    from ltp_sglang_tpu.lang import LiteLLM

    base, loop = _serve(_FakeOpenAIHandler())
    ll = LiteLLM("any-model", base_url=base + "/v1", api_key="k")
    out = ll.generate(prompt="hola mundo",
                      sampling_params={"max_new_tokens": 8})
    assert out["text"].startswith("echo:")
