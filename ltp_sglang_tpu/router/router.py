"""HTTP router: front door over N engine replicas.

Counterpart of sgl-router/src/routers/router.rs (regular mode): proxies
/generate and OpenAI routes to a worker chosen by the policy, tracks
in-flight load, health-checks workers, and supports runtime add/remove
(the service-discovery hook). PD pairing mode rides on the disaggregation
work. `python -m ltp_sglang_tpu.router.launch_router --worker-urls ...`.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import time
from typing import List

import aiohttp
from aiohttp import web

from ltp_sglang_tpu.router.policies import POLICIES, Worker

logger = logging.getLogger(__name__)

PROXY_ROUTES = [
    "/generate",
    "/v1/completions",
    "/v1/chat/completions",
]


class Router:
    def __init__(self, worker_urls: List[str], policy: str = "cache_aware",
                 health_check_interval: float = 10.0):
        self.workers = [Worker(u.rstrip("/")) for u in worker_urls]
        self.policy = POLICIES[policy]()
        self.health_check_interval = health_check_interval
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        for route in PROXY_ROUTES:
            self.app.router.add_post(route, self.proxy)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/workers", self.list_workers)
        self.app.router.add_post("/add_worker", self.add_worker)
        self.app.router.add_post("/remove_worker", self.remove_worker)
        self.app.router.add_get("/v1/models", self.proxy_get)
        self.app.on_startup.append(self._start_health_task)
        self._session = None

    async def _start_health_task(self, app):
        self._session = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None)
        )
        asyncio.create_task(self._health_loop())

    async def _health_loop(self):
        while True:
            for w in self.workers:
                try:
                    async with self._session.get(
                        w.url + "/health", timeout=aiohttp.ClientTimeout(total=5)
                    ) as r:
                        w.healthy = r.status == 200
                except Exception:
                    w.healthy = False
                    w.last_failure = time.time()
            await asyncio.sleep(self.health_check_interval)

    def _prompt_key(self, body: dict) -> str:
        if isinstance(body.get("text"), str):
            return body["text"]
        ids = body.get("input_ids")
        if isinstance(ids, list):
            return ",".join(map(str, ids[:256]))
        msgs = body.get("messages")
        if msgs:
            return json.dumps(msgs)[:512]
        prompt = body.get("prompt")
        return str(prompt)[:512] if prompt is not None else ""

    async def proxy(self, request: web.Request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON"}, status=400)
        alive = [w for w in self.workers if w.healthy]
        if not alive:
            return web.json_response({"error": "no healthy workers"}, status=503)
        key = self._prompt_key(body)
        worker = self.policy.select(self.workers, key)
        self.policy.note_routed(worker, key)
        worker.inflight += 1
        worker.total += 1
        try:
            url = worker.url + request.path
            if body.get("stream"):
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream"}
                )
                await resp.prepare(request)
                async with self._session.post(url, json=body) as up:
                    async for chunk in up.content.iter_any():
                        await resp.write(chunk)
                await resp.write_eof()
                return resp
            async with self._session.post(url, json=body) as up:
                data = await up.read()
                return web.Response(
                    body=data, status=up.status, content_type="application/json"
                )
        except Exception as e:
            worker.healthy = False
            worker.last_failure = time.time()
            return web.json_response(
                {"error": f"worker {worker.url} failed: {e}"}, status=502
            )
        finally:
            worker.inflight -= 1

    async def proxy_get(self, request: web.Request):
        alive = [w for w in self.workers if w.healthy]
        if not alive:
            return web.json_response({"error": "no healthy workers"}, status=503)
        async with self._session.get(alive[0].url + request.path) as up:
            return web.Response(body=await up.read(), status=up.status,
                                content_type="application/json")

    async def health(self, request):
        alive = sum(1 for w in self.workers if w.healthy)
        return web.json_response({"healthy_workers": alive, "total": len(self.workers)})

    async def list_workers(self, request):
        return web.json_response(
            [
                {
                    "url": w.url, "healthy": w.healthy,
                    "inflight": w.inflight, "total": w.total,
                }
                for w in self.workers
            ]
        )

    async def add_worker(self, request):
        body = await request.json()
        url = body["url"].rstrip("/")
        if any(w.url == url for w in self.workers):
            return web.json_response({"error": "exists"}, status=400)
        self.workers.append(Worker(url))
        return web.json_response({"success": True})

    async def remove_worker(self, request):
        body = await request.json()
        url = body["url"].rstrip("/")
        self.workers = [w for w in self.workers if w.url != url]
        return web.json_response({"success": True})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=30080)
    p.add_argument("--worker-urls", nargs="+")
    p.add_argument("--policy", default="cache_aware", choices=sorted(POLICIES))
    # PD-pairing mode (router/pd_lb.py; sgl-router pd_router.rs analog).
    p.add_argument("--pd", action="store_true")
    p.add_argument("--prefill-urls", nargs="+")
    p.add_argument("--decode-urls", nargs="+")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.pd:
        from ltp_sglang_tpu.router.pd_lb import PDLoadBalancer

        lb = PDLoadBalancer(args.prefill_urls or [], args.decode_urls or [])
        web.run_app(lb.app, host=args.host, port=args.port, print=None)
        return
    if not args.worker_urls:
        p.error("--worker-urls is required (or use --pd)")
    router = Router(args.worker_urls, args.policy)
    web.run_app(router.app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
