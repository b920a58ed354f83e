"""HTTP server: native + OpenAI-compatible endpoints.

Counterpart of entrypoints/http_server.py:233-874. Built on aiohttp (this
image has no fastapi/uvicorn; aiohttp is lighter anyway for a serving daemon).
Endpoint parity with the reference route table:

  native: /health, /health_generate, /get_server_info, /get_model_info,
          /generate (+streaming), /flush_cache, /abort_request,
          /get_load, /update_weights_from_disk
  OpenAI: /v1/models, /v1/completions, /v1/chat/completions

The engine runs its scheduler loop on a background thread; request/response
crossing happens through thread-safe queues (the single-controller translation
of the reference's ZMQ tokenizer<->scheduler split).
"""

from __future__ import annotations

import asyncio
import json
import logging
import math
import queue
import threading
import time
import uuid

import numpy as np
from typing import Any, Dict, Optional

from aiohttp import web

from ltp_sglang_tpu.config.server_args import ServerArgs
from ltp_sglang_tpu.entrypoints.engine import Engine
from ltp_sglang_tpu.managers.io_struct import GenerateReqInput
from ltp_sglang_tpu.managers.schedule_batch import Req
from ltp_sglang_tpu.sampling.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class EngineLoopThread:
    """Pumps the scheduler continuously; requests enter via a queue."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.inbox: queue.Queue = queue.Queue()
        self._shutdown = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        # rid -> (asyncio.Queue, owning event loop)
        self.outboxes: Dict[str, Any] = {}
        self.engine.scheduler.on_output = self._on_output
        self.last_step_time = time.time()

    def start(self):
        self.thread.start()

    def stop(self):
        self._shutdown.set()

    def submit(self, req: Req) -> "asyncio.Queue":
        """Called from an async handler: outputs hop engine-thread ->
        event loop via call_soon_threadsafe into an asyncio.Queue. (The old
        blocking-queue + run_in_executor relay parked one executor thread
        per in-flight stream: at 64 concurrent requests the default pool of
        ~32 starved, inflating measured TTFT/ITL ~10x.)"""
        out: asyncio.Queue = asyncio.Queue()
        self.outboxes[req.rid] = (out, asyncio.get_running_loop())
        self.inbox.put(req)
        return out

    def abort(self, rid: str):
        self.inbox.put(("abort", rid))

    def _on_output(self, req: Req):
        entry = self.outboxes.get(req.rid)
        if entry is None:
            return
        out, aio_loop = entry
        payload = {
            "rid": req.rid,
            "output_ids": list(req.output_ids),
            "decoded_text": req.decoded_text,
            "finished": req.finished(),
            "finish_reason": req.finished_reason.to_json() if req.finished_reason else None,
            "prompt_tokens": len(req.origin_input_ids),
        }
        if req.is_embedding:
            payload["embedding"] = req.embedding
        if req.token_ids_logprob:
            payload["token_ids_logprobs"] = list(req.output_token_ids_logprobs)
        if req.return_logprob:
            payload["meta_info"] = {
                "output_token_logprobs": [
                    [lp, tok, None] for lp, tok in req.output_token_logprobs
                ],
                "output_top_logprobs": list(req.output_top_logprobs),
                **(
                    {
                        "input_token_logprobs": [
                            [lp, tok, None]
                            for lp, tok in req.input_token_logprobs
                        ]
                    }
                    if req.logprob_start_len >= 0
                    else {}
                ),
            }
        try:
            aio_loop.call_soon_threadsafe(out.put_nowait, payload)
        except RuntimeError:
            pass  # client loop already closed
        if req.finished():
            self.outboxes.pop(req.rid, None)

    def _run(self):
        sched = self.engine.scheduler
        # Serialize with direct Engine API calls (engine.generate/encode pump
        # the same scheduler under this lock); concurrent pumps would race on
        # donated device buffers.
        loop_lock = self.engine._loop_lock
        while not self._shutdown.is_set():
            with loop_lock:
                # Drain the inbox.
                try:
                    while True:
                        item = self.inbox.get_nowait()
                        if isinstance(item, tuple) and item[0] == "abort":
                            sched.abort_request(item[1])
                        else:
                            sched.add_request(item)
                except queue.Empty:
                    pass
                try:
                    worked = sched.event_loop_step()
                except Exception:
                    # A failed batch (compile error, bad shapes) must not kill
                    # the serving loop: abort every in-flight request with an
                    # error payload and keep serving (reference scheduler
                    # catches per-batch errors the same way).
                    logger.exception("scheduler step failed; aborting in-flight requests")
                    sched.abort_all_requests("internal error: batch failed")
                    worked = False
            self.last_step_time = time.time()
            if not worked:
                # Idle: block briefly on the inbox instead of spinning.
                try:
                    item = self.inbox.get(timeout=0.005)
                    if isinstance(item, tuple) and item[0] == "abort":
                        sched.abort_request(item[1])
                    else:
                        sched.add_request(item)
                except queue.Empty:
                    pass


class HttpServer:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.loop_thread = EngineLoopThread(engine)
        middlewares = []
        if engine.server_args.api_key:
            middlewares.append(self._auth_middleware(engine.server_args.api_key))
        self.app = web.Application(
            client_max_size=64 * 1024 * 1024, middlewares=middlewares
        )
        self._add_routes()
        self.start_time = time.time()

    @staticmethod
    def _auth_middleware(api_key: str):
        """Bearer-token gate (reference --api-key): /health stays open for
        probes; everything else requires the key."""
        @web.middleware
        async def auth(request, handler):
            if request.path != "/health":
                tok = request.headers.get("Authorization", "")
                if tok != f"Bearer {api_key}":
                    return web.json_response(
                        {"error": "invalid or missing API key"}, status=401
                    )
            return await handler(request)

        return auth

    def _add_routes(self):
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_get("/get_load", self.get_load)
        r.add_post("/generate", self.generate)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/update_weights_from_disk", self.update_weights_from_disk)
        r.add_post("/init_weights_update_group", self.init_weights_update_group)
        r.add_post("/update_weights_from_distributed",
                   self.update_weights_from_distributed)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/get_weights_by_name", self.get_weights_by_name)
        r.add_post("/release_memory_occupation", self.release_memory)
        r.add_post("/resume_memory_occupation", self.resume_memory)
        r.add_post("/load_lora_adapter", self.load_lora_adapter)
        r.add_post("/unload_lora_adapter", self.unload_lora_adapter)
        r.add_get("/kv_events", self.kv_events)
        r.add_post("/start_expert_distribution_record", self.eplb_start)
        r.add_post("/stop_expert_distribution_record", self.eplb_stop)
        r.add_get("/dump_expert_distribution_record", self.eplb_dump)
        r.add_post("/rebalance_experts", self.eplb_rebalance)
        r.add_get("/metrics", self.metrics)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/encode", self.encode)
        r.add_get("/v1/models", self.openai_models)
        r.add_post("/v1/completions", self.openai_completions)
        r.add_post("/v1/chat/completions", self.openai_chat)
        r.add_post("/v1/embeddings", self.openai_embeddings)
        r.add_post("/v1/score", self.openai_score)
        r.add_post("/v1/rerank", self.openai_rerank)

    # ----------------------------------------------------------- native API
    async def health(self, request):
        return web.Response(text="OK")

    async def health_generate(self, request):
        out = await self._generate_one(
            {"input_ids": [1, 2, 3], "sampling_params": {"max_new_tokens": 1}}
        )
        return web.Response(text="OK" if out else "FAIL")

    async def get_server_info(self, request):
        info = self.engine.get_server_info()
        sched = self.engine.scheduler
        info.update(
            uptime=time.time() - self.start_time,
            num_generated_tokens=sched.num_generated_tokens,
            num_retracted_reqs=sched.num_retracted_reqs,
            waiting_queue_len=len(sched.waiting_queue),
            disaggregation_mode=self.engine.server_args.disaggregation_mode,
        )
        if self.engine.pd_prefill is not None:
            info["pd_bootstrap_port"] = self.engine.pd_prefill.port
        return web.json_response(info)

    async def get_model_info(self, request):
        return web.json_response(
            {
                "model_path": self.engine.server_args.model_path,
                "tokenizer_path": self.engine.server_args.tokenizer_path,
                "is_generation": True,
            }
        )

    async def get_load(self, request):
        sched = self.engine.scheduler
        running = 0 if sched.running_batch is None else sched.running_batch.batch_size()
        return web.json_response(
            {
                "num_reqs_running": running,
                "num_reqs_waiting": len(sched.waiting_queue),
                "num_tokens_used": self.engine.model_runner.max_total_num_tokens
                - sched.token_to_kv_pool_allocator.available_size(),
                "max_total_num_tokens": self.engine.model_runner.max_total_num_tokens,
            }
        )

    def _make_req(self, body: Dict[str, Any]) -> Req:
        gri = GenerateReqInput(
            text=body.get("text"),
            input_ids=body.get("input_ids"),
            sampling_params=body.get("sampling_params"),
            rid=body.get("rid"),
            return_logprob=bool(body.get("return_logprob", False)),
            logprob_start_len=int(body.get("logprob_start_len", -1)),
            top_logprobs_num=int(body.get("top_logprobs_num", 0)),
            stream=body.get("stream", False),
            lora_path=body.get("lora_path"),
            token_ids_logprob=body.get("token_ids_logprob"),
            image_data=body.get("image_data"),
            custom_logit_processor=body.get("custom_logit_processor"),
        )
        gri.normalize_batch_and_arguments()
        if not gri.is_single:
            raise ValueError("batch requests: submit one request per call (or use the Engine API)")
        return self.engine._make_req(gri)

    async def _encode_one(self, body: Dict[str, Any], timeout: float = 600.0):
        req = self._make_req(
            {**body, "sampling_params": {"max_new_tokens": 0}, "stream": False}
        )
        req.is_embedding = True
        out_q = self.loop_thread.submit(req)
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                last = await asyncio.wait_for(
                    out_q.get(), timeout=deadline - time.time()
                )
                if last["finished"]:
                    return last
            except asyncio.TimeoutError:
                break
        return None

    async def _generate_one(self, body: Dict[str, Any], timeout: float = 600.0):
        req = self._make_req(body)
        out_q = self.loop_thread.submit(req)
        deadline = time.time() + timeout
        last = None
        while time.time() < deadline:
            try:
                last = await asyncio.wait_for(
                    out_q.get(), timeout=deadline - time.time()
                )
                if last["finished"]:
                    return last
            except asyncio.TimeoutError:
                break
        return last

    async def generate(self, request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        if body.get("bootstrap_room") is not None:
            mode = self.engine.server_args.disaggregation_mode
            if mode == "prefill":
                return await self._pd_prefill_generate(body)
            if mode == "decode":
                return await self._pd_decode_generate(request, body)
            return web.json_response(
                {"error": "bootstrap_room sent to a non-disaggregated server"},
                status=400,
            )
        stream = body.get("stream", False)
        try:
            if not stream:
                out = await self._generate_one(body)
                if out is None:
                    return web.json_response({"error": "timeout"}, status=504)
                return web.json_response(self._format_native(out))
            # Streaming: SSE of incremental outputs.
            req = self._make_req(body)
            out_q = self.loop_thread.submit(req)
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
            )
            await resp.prepare(request)
            try:
                while True:
                    out = await out_q.get()
                    payload = self._format_native(out)
                    await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
                    if out["finished"]:
                        break
            except (ConnectionResetError, asyncio.CancelledError):
                # Client went away mid-stream: stop generating for it
                # (otherwise the request keeps burning decode slots).
                self.loop_thread.abort(req.rid)
                self.loop_thread.outboxes.pop(req.rid, None)
                raise
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)

    # ------------------------------------------------------ PD disaggregation
    async def _pd_prefill_generate(self, body):
        """Prefill-role /generate (reference: prefill.py event loop): compute
        prompt + first token, async-ship KV to the decode server registered
        under bootstrap_room, respond with the first token."""
        room = int(body["bootstrap_room"])
        sp = dict(body.get("sampling_params") or {})
        sp["max_new_tokens"] = 1
        req = self._make_req({**body, "sampling_params": sp, "stream": False})
        out_q = self.loop_thread.submit(req)
        loop = asyncio.get_event_loop()
        while True:
            out = await out_q.get()
            if out["finished"]:
                break
        if out["output_ids"]:
            # dispatch() gathers KV under the loop lock: keep it off the
            # event loop thread.
            await loop.run_in_executor(
                None, self.engine.pd_prefill.dispatch,
                room, list(req.origin_input_ids), out["output_ids"][0],
            )
        return web.json_response(self._format_native(out))

    async def _pd_decode_generate(self, request, body):
        """Decode-role /generate: preallocate + receive the prefill KV, then
        stream/return the continuation (first token included)."""
        req = self._make_req(body)
        out_q: asyncio.Queue = asyncio.Queue()
        self.loop_thread.outboxes[req.rid] = (out_q, asyncio.get_running_loop())
        self.engine.pd_decode.submit(
            req,
            int(body["bootstrap_room"]),
            body.get("bootstrap_host", "127.0.0.1"),
            int(body["bootstrap_port"]),
        )
        if not body.get("stream", False):
            while True:
                out = await out_q.get()
                if out["finished"]:
                    return web.json_response(self._format_native(out))
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        while True:
            out = await out_q.get()
            await resp.write(
                f"data: {json.dumps(self._format_native(out))}\n\n".encode()
            )
            if out["finished"]:
                break
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _format_native(self, out: Dict[str, Any]) -> Dict[str, Any]:
        from ltp_sglang_tpu.managers.detokenizer import trim_matched_stop

        return {
            "text": out["decoded_text"],
            "output_ids": out["output_ids"],
            "meta_info": {
                "id": out["rid"],
                "prompt_tokens": out["prompt_tokens"],
                "completion_tokens": len(out["output_ids"]),
                "finish_reason": out["finish_reason"],
                **(out.get("meta_info") or {}),  # logprob fields
            },
        }

    async def flush_cache(self, request):
        ok = self.engine.flush_cache()
        return web.json_response({"success": ok})

    async def kv_events(self, request):
        """Drain KV cache block events (reference kv_events.py publisher):
        the first call subscribes; later calls return and clear the queue."""
        cache = self.engine.scheduler.tree_cache
        if not hasattr(cache, "enable_kv_events"):
            return web.json_response({"events": [], "supported": False})
        if cache.kv_events is None:
            cache.enable_kv_events()
            return web.json_response({"events": [], "subscribed": True})
        events = list(cache.kv_events)
        cache.kv_events.clear()
        return web.json_response({"events": events})

    # --------------------------------------------------------------- EPLB
    async def eplb_start(self, request):
        return web.json_response(
            {"success": self.engine.start_expert_distribution_record()}
        )

    async def eplb_stop(self, request):
        self.engine.stop_expert_distribution_record()
        return web.json_response({"success": True})

    async def eplb_dump(self, request):
        counts = self.engine.dump_expert_distribution_record()
        return web.json_response(
            {"counts": None if counts is None else counts.tolist()}
        )

    async def eplb_rebalance(self, request):
        try:
            body = await request.json()
        except Exception:
            body = {}
        stats = self.engine.rebalance_experts(
            ep_size=body.get("ep_size"),
            n_redundant=int(body.get("n_redundant", 0) or 0),
        )
        return web.json_response({"success": stats is not None, "stats": stats})

    async def abort_request(self, request):
        body = await request.json()
        self.loop_thread.abort(body.get("rid", ""))
        return web.json_response({"success": True})

    async def update_weights_from_disk(self, request):
        body = await request.json()
        model_path = body.get("model_path")
        try:
            from ltp_sglang_tpu.model_loader.loader import load_model_weights

            params = load_model_weights(
                self.engine.model_runner.model, model_path, "auto"
            )
            self.engine.model_runner.update_weights_from_params(params)
            return web.json_response({"success": True, "message": "weights updated"})
        except Exception as e:
            return web.json_response({"success": False, "message": str(e)}, status=400)

    async def init_weights_update_group(self, request):
        body = await request.json()
        try:
            ok = self.engine.init_weights_update_group(
                master_address=body["master_address"],
                master_port=int(body["master_port"]),
                rank_offset=int(body.get("rank_offset", 1)),
                world_size=int(body.get("world_size", 2)),
                group_name=body.get("group_name", "weight_update_group"),
                backend=body.get("backend", "tcp"),
            )
            return web.json_response({"success": ok})
        except Exception as e:
            return web.json_response(
                {"success": False, "message": str(e)}, status=400
            )

    async def update_weights_from_distributed(self, request):
        body = await request.json()
        # Receive + commit run off the event loop: the recv blocks on the
        # trainer's broadcast and the commit waits for a step boundary.
        import asyncio

        ok, msg = await asyncio.get_running_loop().run_in_executor(
            None,
            lambda: self.engine.update_weights_from_distributed(
                names=body["names"],
                dtypes=body.get("dtypes"),
                shapes=body.get("shapes"),
                group_name=body.get("group_name", "weight_update_group"),
            ),
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    async def get_weights_by_name(self, request):
        body = await request.json()
        try:
            w = self.engine.get_weights_by_name(body["name"])
            return web.json_response(
                {"shape": list(w.shape), "dtype": str(w.dtype),
                 "truncated_value": np.asarray(w).ravel()[:8].tolist()}
            )
        except (KeyError, TypeError):
            return web.json_response({"error": "unknown parameter"}, status=400)

    async def release_memory(self, request):
        return web.json_response({"success": self.engine.release_memory_occupation()})

    async def resume_memory(self, request):
        return web.json_response({"success": self.engine.resume_memory_occupation()})

    async def load_lora_adapter(self, request):
        body = await request.json()
        try:
            aid = self.engine.load_lora_adapter(body["lora_path"], body.get("lora_name"))
            return web.json_response({"success": True, "adapter_id": aid})
        except Exception as e:
            return web.json_response({"success": False, "error": str(e)}, status=400)

    async def unload_lora_adapter(self, request):
        body = await request.json()
        self.engine.unload_lora_adapter(body.get("lora_name", ""))
        return web.json_response({"success": True})

    async def open_session(self, request):
        try:
            body = await request.json()
        except Exception:
            body = {}
        try:
            sid = self.engine.open_session(body.get("session_id"))
            return web.json_response({"session_id": sid})
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)

    async def close_session(self, request):
        body = await request.json()
        self.engine.close_session(body.get("session_id", ""))
        return web.json_response({"success": True})

    async def metrics(self, request):
        collector = self.engine.scheduler.metrics
        if collector is None:
            return web.Response(
                text="metrics disabled; start with --enable-metrics", status=404
            )
        collector.update_state(self.engine.scheduler)
        return web.Response(
            body=collector.render(), content_type="text/plain", charset="utf-8"
        )

    async def start_profile(self, request):
        """jax.profiler trace (the reference's torch-profiler /start_profile,
        scheduler_profiler_mixin.py). Output readable with XProf/TensorBoard."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        out_dir = body.get("output_dir", "/tmp/ltp_sglang_tpu_trace")
        import jax

        jax.profiler.start_trace(out_dir)
        self._profile_dir = out_dir
        return web.json_response({"success": True, "output_dir": out_dir})

    async def stop_profile(self, request):
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception as e:
            return web.json_response({"success": False, "message": str(e)}, status=400)
        return web.json_response(
            {"success": True, "output_dir": getattr(self, "_profile_dir", None)}
        )

    async def encode(self, request):
        """Native embedding endpoint (/encode; EmbeddingReqInput analog)."""
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        out = await self._encode_one(body)
        if out is None:
            return web.json_response({"error": "timeout"}, status=504)
        return web.json_response(
            {
                "embedding": out["embedding"],
                "meta_info": {
                    "id": out["rid"],
                    "prompt_tokens": out["prompt_tokens"],
                },
            }
        )

    async def openai_embeddings(self, request):
        """/v1/embeddings (serving_embedding.py analog)."""
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        inp = body.get("input")
        if isinstance(inp, str):
            items = [{"text": inp}]
        elif isinstance(inp, list) and inp and isinstance(inp[0], int):
            items = [{"input_ids": inp}]
        elif isinstance(inp, list):
            items = [
                {"input_ids": x} if (x and isinstance(x[0], int)) else {"text": x}
                for x in inp
            ]
        else:
            return web.json_response({"error": "unsupported input"}, status=400)
        outs = []
        total_tokens = 0
        for it in items:
            out = await self._encode_one(it)
            if out is None:
                return web.json_response({"error": "timeout"}, status=504)
            outs.append(out)
            total_tokens += out["prompt_tokens"]
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {"object": "embedding", "embedding": o["embedding"], "index": i}
                    for i, o in enumerate(outs)
                ],
                "model": self.engine.server_args.served_model_name,
                "usage": {
                    "prompt_tokens": total_tokens,
                    "total_tokens": total_tokens,
                },
            }
        )

    async def openai_score(self, request):
        """/v1/score (serving_score.py analog): next-token probability of each
        label token after query+item."""
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        label_ids = body.get("label_token_ids")
        if not label_ids:
            return web.json_response({"error": "label_token_ids required"}, status=400)
        query = body.get("query") or body.get("text_1") or ""
        items = body.get("items") or body.get("text_2") or []
        if isinstance(items, str):
            items = [items]
        item_first = bool(body.get("item_first", False))
        apply_softmax = bool(body.get("apply_softmax", False))
        scores = []
        for it in items:
            text = (it + query) if item_first else (query + it)
            out = await self._generate_one(
                {
                    "text": text,
                    "sampling_params": {"max_new_tokens": 1, "temperature": 0.0},
                    "token_ids_logprob": label_ids,
                }
            )
            if out is None:
                return web.json_response({"error": "timeout"}, status=504)
            lps = out["token_ids_logprobs"][0]
            if apply_softmax:
                e = [math.exp(x - max(lps)) for x in lps]
                s = sum(e)
                scores.append([x / s for x in e])
            else:
                scores.append([math.exp(x) for x in lps])
        return web.json_response(
            {
                "scores": scores,
                "model": self.engine.server_args.served_model_name,
                "usage": None,
                "object": "scoring",
            }
        )

    async def openai_rerank(self, request):
        """/v1/rerank (serving_rerank.py analog): embedding cosine similarity."""
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        query = body.get("query")
        docs = body.get("documents") or []
        if not query or not docs:
            return web.json_response({"error": "query and documents required"}, status=400)
        outs = []
        for text in [query] + list(docs):
            out = await self._encode_one({"text": text})
            if out is None:
                return web.json_response({"error": "timeout"}, status=504)
            outs.append(out["embedding"])

        def norm(v):
            s = math.sqrt(sum(x * x for x in v)) + 1e-9
            return [x / s for x in v]

        q = norm(outs[0])
        results = [
            {
                "index": i,
                "document": docs[i],
                "score": sum(a * b for a, b in zip(q, norm(outs[i + 1]))),
            }
            for i in range(len(docs))
        ]
        results.sort(key=lambda x: -x["score"])
        return web.json_response(results)

    # ----------------------------------------------------------- OpenAI API
    async def openai_models(self, request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.engine.server_args.served_model_name,
                        "object": "model",
                        "created": int(self.start_time),
                        "owned_by": "ltp_sglang_tpu",
                    }
                ],
            }
        )

    async def openai_completions(self, request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON"}, status=400)
        prompt = body.get("prompt")
        sp = _openai_to_sampling_params(body)
        native = {"sampling_params": sp}
        if isinstance(prompt, str):
            native["text"] = prompt
        elif isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            native["input_ids"] = prompt
        else:
            return web.json_response({"error": "unsupported prompt type"}, status=400)
        if body.get("stream"):
            # SSE text_completion chunks (reference serving_completions SSE).
            cid = f"cmpl-{uuid.uuid4().hex}"
            created = int(time.time())
            model_name = self.engine.server_args.served_model_name
            req = self._make_req({**native, "stream": True})
            out_q = self.loop_thread.submit(req)
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream",
                         "Cache-Control": "no-cache"}
            )
            await resp.prepare(request)
            sent = 0
            while True:
                out = await out_q.get()
                text = out["decoded_text"]
                delta, sent = text[sent:], len(text)
                chunk = {
                    "id": cid, "object": "text_completion", "created": created,
                    "model": model_name,
                    "choices": [{
                        "index": 0, "text": delta, "logprobs": None,
                        "finish_reason": _openai_finish_reason(
                            out["finish_reason"]) if out["finished"] else None,
                    }],
                }
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                if out["finished"]:
                    break
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        out = await self._generate_one(native)
        if out is None:
            return web.json_response({"error": "timeout"}, status=504)
        return web.json_response(
            {
                "id": f"cmpl-{uuid.uuid4().hex}",
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.engine.server_args.served_model_name,
                "choices": [
                    {
                        "index": 0,
                        "text": out["decoded_text"],
                        "finish_reason": _openai_finish_reason(out["finish_reason"]),
                        "logprobs": None,
                    }
                ],
                "usage": {
                    "prompt_tokens": out["prompt_tokens"],
                    "completion_tokens": len(out["output_ids"]),
                    "total_tokens": out["prompt_tokens"] + len(out["output_ids"]),
                },
            }
        )

    async def openai_chat(self, request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON"}, status=400)
        messages = body.get("messages", [])
        # VLM chat: lift image_url parts out of typed content (each becomes
        # an "<image>" placeholder the tokenizer expands to the image token).
        images = []
        norm_msgs = []
        for m in messages:
            c = m.get("content")
            if isinstance(c, list):
                text = ""
                for p in c:
                    if isinstance(p, dict) and p.get("type") == "image_url":
                        images.append(p["image_url"]["url"])
                        text += "<image>"
                    elif isinstance(p, dict) and p.get("type") == "video_url":
                        # Video chat (llava-next-video): the item may be a
                        # frame-directory path or a list of frame URLs/b64;
                        # MultimodalProcessor samples it to num_frames.
                        images.append(p["video_url"]["url"])
                        text += "<image>"
                    elif isinstance(p, dict):
                        text += p.get("text", "")
                m = {**m, "content": text}
            norm_msgs.append(m)
        messages = norm_msgs
        tokenizer = self.engine.tokenizer
        if tokenizer is None:
            return web.json_response(
                {"error": "chat requires a tokenizer with a chat template"}, status=400
            )
        sp = _openai_to_sampling_params(body)
        prompt = None
        named = self.engine.server_args.chat_template
        if not named:
            try:
                prompt = tokenizer.apply_chat_template(
                    messages, tokenize=False, add_generation_prompt=True
                )
            except Exception:
                pass
        if prompt is None:
            # Named/matched template registry (chat_template.py; reference
            # conversation.py get_conv_template/match).
            from ltp_sglang_tpu.chat_template import (
                get_chat_template,
                match_chat_template,
            )

            tpl = (
                get_chat_template(named)
                if named
                else match_chat_template(self.engine.server_args.model_path)
            )
            prompt = tpl.apply(messages)
            if tpl.stop_strs:
                stops = sp.get("stop") or []
                if isinstance(stops, str):
                    stops = [stops]
                sp["stop"] = list(stops) + list(tpl.stop_strs)
        if body.get("tools") and body.get("tool_choice") not in (
            None, "auto", "none"
        ):
            # tool_choice="required" / named function: constrain generation
            # to a valid tool call with schema-conforming arguments
            # (reference function_call/ebnf_composer.py; here composed onto
            # the regex/DFA pipeline).
            from ltp_sglang_tpu.function_call.regex_composer import (
                compose_tool_call_regex,
            )

            rx = compose_tool_call_regex(
                body["tools"], body.get("tool_choice"),
                self.engine.server_args.tool_call_parser,
            )
            if rx is not None:
                sp["regex"] = rx
        gen_body = {"text": prompt, "sampling_params": sp}
        if images:
            gen_body["image_data"] = images
        if body.get("stream"):
            return await self._openai_chat_stream(
                request, body, prompt, sp, images=images
            )
        out = await self._generate_one(gen_body)
        if out is None:
            return web.json_response({"error": "timeout"}, status=504)

        content = out["decoded_text"]
        message = {"role": "assistant", "content": content}
        finish = _openai_finish_reason(out["finish_reason"])
        if self.engine.server_args.reasoning_parser or body.get("separate_reasoning"):
            from ltp_sglang_tpu.reasoning_parser import ReasoningParser

            reasoning, content = ReasoningParser().parse_non_stream(content)
            message["content"] = content
            if reasoning:
                message["reasoning_content"] = reasoning
        if body.get("tools"):
            from ltp_sglang_tpu.function_call.parser import FunctionCallParser

            parser = FunctionCallParser(self.engine.server_args.tool_call_parser)
            normal, calls = parser.parse_non_stream(content)
            if calls:
                message["content"] = normal or None
                message["tool_calls"] = [
                    {
                        "id": f"call_{uuid.uuid4().hex[:12]}",
                        "type": "function",
                        "function": {"name": c.name, "arguments": c.parameters},
                    }
                    for c in calls
                ]
                finish = "tool_calls"
        return web.json_response(
            {
                "id": f"chatcmpl-{uuid.uuid4().hex}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.engine.server_args.served_model_name,
                "choices": [
                    {
                        "index": 0,
                        "message": message,
                        "finish_reason": finish,
                    }
                ],
                "usage": {
                    "prompt_tokens": out["prompt_tokens"],
                    "completion_tokens": len(out["output_ids"]),
                    "total_tokens": out["prompt_tokens"] + len(out["output_ids"]),
                },
            }
        )

    async def _openai_chat_stream(self, request, body, prompt, sp, images=None):
        """SSE chat completion chunks with streamed reasoning / tool-call
        deltas (reference: entrypoints/openai/serving_chat.py SSE path)."""
        chat_id = f"chatcmpl-{uuid.uuid4().hex}"
        created = int(time.time())
        model_name = self.engine.server_args.served_model_name

        def chunk(delta, finish=None):
            return (
                "data: "
                + json.dumps({
                    "id": chat_id,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model_name,
                    "choices": [
                        {"index": 0, "delta": delta, "finish_reason": finish}
                    ],
                })
                + "\n\n"
            ).encode()

        reasoning_parser = None
        if self.engine.server_args.reasoning_parser or body.get("separate_reasoning"):
            from ltp_sglang_tpu.reasoning_parser import ReasoningParser

            reasoning_parser = ReasoningParser()
        tool_parser = None
        if body.get("tools"):
            from ltp_sglang_tpu.function_call.parser import FunctionCallParser

            tool_parser = FunctionCallParser(
                self.engine.server_args.tool_call_parser
            )

        req = self._make_req(
            {"text": prompt, "sampling_params": sp, "stream": True,
             **({"image_data": images} if images else {})}
        )
        out_q = self.loop_thread.submit(req)
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        await resp.write(chunk({"role": "assistant", "content": ""}))
        sent = 0
        finish = "stop"
        tool_idx = 0
        usage = None
        while True:
            out = await out_q.get()
            text = out["decoded_text"]
            delta, sent = text[sent:], len(text)
            if out["finished"]:
                finish = _openai_finish_reason(out["finish_reason"])
                usage = {
                    "prompt_tokens": out["prompt_tokens"],
                    "completion_tokens": len(out["output_ids"]),
                    "total_tokens": out["prompt_tokens"] + len(out["output_ids"]),
                }
            if reasoning_parser is not None:
                r_delta, delta = reasoning_parser.parse_stream_chunk(delta)
                if r_delta:
                    await resp.write(chunk({"reasoning_content": r_delta}))
            if tool_parser is not None and delta:
                delta, calls = tool_parser.parse_stream_chunk(delta)
                for c in calls:
                    await resp.write(chunk({
                        "tool_calls": [{
                            "index": tool_idx,
                            "id": f"call_{uuid.uuid4().hex[:12]}",
                            "type": "function",
                            "function": {"name": c.name,
                                         "arguments": c.parameters},
                        }]
                    }))
                    tool_idx += 1
                    finish = "tool_calls"
            if delta:
                await resp.write(chunk({"content": delta}))
            if out["finished"]:
                if tool_parser is not None:
                    tail = tool_parser.flush()
                    if tail:
                        await resp.write(chunk({"content": tail}))
                break
        await resp.write(chunk({}, finish))
        if usage is not None and (body.get("stream_options") or {}).get(
            "include_usage"
        ):
            await resp.write(
                ("data: " + json.dumps({
                    "id": chat_id,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model_name,
                    "choices": [],
                    "usage": usage,
                }) + "\n\n").encode()
            )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def _openai_to_sampling_params(body: Dict[str, Any]) -> Dict[str, Any]:
    sp = {
        "max_new_tokens": body.get("max_tokens", body.get("max_completion_tokens", 128)),
        "temperature": body.get("temperature", 1.0),
        "top_p": body.get("top_p", 1.0),
        "n": body.get("n", 1),
        "frequency_penalty": body.get("frequency_penalty", 0.0),
        "presence_penalty": body.get("presence_penalty", 0.0),
    }
    if body.get("stop") is not None:
        sp["stop"] = body["stop"]
    rf = body.get("response_format")
    if rf and rf.get("type") == "json_schema":
        sp["json_schema"] = json.dumps(rf["json_schema"].get("schema", {}))
    return sp


def _openai_finish_reason(fr: Optional[Dict]) -> str:
    if fr is None:
        return "stop"
    return "length" if fr.get("type") == "length" else "stop"


def launch_server(server_args: ServerArgs):
    engine = Engine(server_args)
    if server_args.warmup_buckets:
        logger.info("warming serving buckets (this compiles the jit ladder)...")
        engine.warmup()
    server = HttpServer(engine)
    server.loop_thread.start()
    logger.info("serving on http://%s:%d", server_args.host, server_args.port)
    web.run_app(
        server.app, host=server_args.host, port=server_args.port, print=None
    )
