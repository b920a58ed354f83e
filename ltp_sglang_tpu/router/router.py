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


class RouterMetrics:
    """Router-level Prometheus (reference sgl-router/src/metrics.rs):
    requests/errors/retries per worker, circuit-breaker opens, and a request
    latency histogram, on a dedicated registry at GET /metrics."""

    def __init__(self):
        from prometheus_client import (
            CollectorRegistry,
            Counter,
            Gauge,
            Histogram,
        )

        self.registry = CollectorRegistry()
        self.requests = Counter(
            "router_requests_total", "Requests routed", ["worker"],
            registry=self.registry)
        self.errors = Counter(
            "router_request_errors_total", "Upstream failures", ["worker"],
            registry=self.registry)
        self.retries = Counter(
            "router_retries_total", "Requests retried on another worker",
            registry=self.registry)
        self.circuit_opens = Counter(
            "router_circuit_open_total", "Circuit-breaker opens", ["worker"],
            registry=self.registry)
        self.inflight = Gauge(
            "router_inflight_requests", "In-flight per worker", ["worker"],
            registry=self.registry)
        self.latency = Histogram(
            "router_request_duration_seconds", "E2E proxy latency",
            registry=self.registry,
            buckets=(.05, .1, .25, .5, 1, 2.5, 5, 10, 30, 60, 120))


class Router:
    def __init__(self, worker_urls: List[str], policy: str = "cache_aware",
                 health_check_interval: float = 10.0, max_retries: int = 2):
        self.workers = [Worker(u.rstrip("/")) for u in worker_urls]
        self.policy = POLICIES[policy]()
        self.health_check_interval = health_check_interval
        self.max_retries = max_retries
        self.metrics = RouterMetrics()
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        for route in PROXY_ROUTES:
            self.app.router.add_post(route, self.proxy)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/workers", self.list_workers)
        self.app.router.add_post("/add_worker", self.add_worker)
        self.app.router.add_post("/remove_worker", self.remove_worker)
        self.app.router.add_get("/v1/models", self.proxy_get)
        self.app.router.add_get("/metrics", self.prometheus)
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
        key = self._prompt_key(body)
        t0 = time.time()
        tried: set = set()
        last_err = None
        # Retries (reference core/worker.rs): a failed worker is marked and
        # the request re-routes to another available worker, as long as no
        # response bytes reached the client (mid-stream failures can't be
        # transparently replayed).
        for attempt in range(self.max_retries + 1):
            candidates = [
                w for w in self.workers if w.available() and w.url not in tried
            ]
            if not candidates:
                break
            worker = self.policy.select(candidates, key)
            self.policy.note_routed(worker, key)
            tried.add(worker.url)
            if attempt > 0:
                self.metrics.retries.inc()
            worker.inflight += 1
            worker.total += 1
            self.metrics.requests.labels(worker.url).inc()
            self.metrics.inflight.labels(worker.url).set(worker.inflight)
            streamed = False
            try:
                url = worker.url + request.path
                if body.get("stream"):
                    async with self._session.post(url, json=body) as up:
                        if up.status >= 500:
                            raise aiohttp.ClientError(f"upstream {up.status}")
                        resp = web.StreamResponse(
                            headers={"Content-Type": "text/event-stream"}
                        )
                        await resp.prepare(request)
                        streamed = True
                        async for chunk in up.content.iter_any():
                            await resp.write(chunk)
                    await resp.write_eof()
                    worker.note_success()
                    self.metrics.latency.observe(time.time() - t0)
                    return resp
                async with self._session.post(url, json=body) as up:
                    if up.status >= 500:
                        raise aiohttp.ClientError(f"upstream {up.status}")
                    data = await up.read()
                    worker.note_success()
                    self.metrics.latency.observe(time.time() - t0)
                    return web.Response(
                        body=data, status=up.status,
                        content_type="application/json",
                    )
            except Exception as e:
                last_err = f"worker {worker.url}: {e}"
                was_open = worker.circuit_state == "open"
                worker.note_failure()
                self.metrics.errors.labels(worker.url).inc()
                if worker.circuit_state == "open" and not was_open:
                    self.metrics.circuit_opens.labels(worker.url).inc()
                    logger.warning("circuit OPEN for %s", worker.url)
                if streamed:
                    # Bytes already reached the client: cannot replay.
                    return web.json_response(
                        {"error": f"stream interrupted: {last_err}"}, status=502
                    )
            finally:
                worker.inflight -= 1
                self.metrics.inflight.labels(worker.url).set(worker.inflight)
        if not any(w.available() for w in self.workers):
            return web.json_response(
                {"error": "no healthy workers"}, status=503
            )
        return web.json_response(
            {"error": f"all retries failed: {last_err}"}, status=502
        )

    async def proxy_get(self, request: web.Request):
        alive = [w for w in self.workers if w.available()]
        if not alive:
            return web.json_response({"error": "no healthy workers"}, status=503)
        async with self._session.get(alive[0].url + request.path) as up:
            return web.Response(body=await up.read(), status=up.status,
                                content_type="application/json")

    async def prometheus(self, request):
        from prometheus_client import generate_latest

        return web.Response(
            body=generate_latest(self.metrics.registry),
            content_type="text/plain",
        )

    async def health(self, request):
        alive = sum(1 for w in self.workers if w.healthy)
        return web.json_response({"healthy_workers": alive, "total": len(self.workers)})

    async def list_workers(self, request):
        return web.json_response(
            [
                {
                    "url": w.url, "healthy": w.healthy,
                    "inflight": w.inflight, "total": w.total,
                    "circuit": w.circuit_state,
                    "consecutive_failures": w.consecutive_failures,
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

    # -- K8s service discovery hooks (router/service_discovery.py) --
    def sd_add_worker(self, pw):
        url = pw.url.rstrip("/")
        if not any(w.url == url for w in self.workers):
            self.workers.append(Worker(url))

    def sd_remove_worker(self, url: str):
        url = url.rstrip("/")
        self.workers = [w for w in self.workers if w.url != url]


def _parse_selector(items):
    out = {}
    for it in items or []:
        k, _, v = it.partition("=")
        out[k] = v
    return out


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
    # K8s service discovery (router/service_discovery.py; reference
    # sgl-router/src/service_discovery.rs flags).
    p.add_argument("--service-discovery", action="store_true")
    p.add_argument("--selector", nargs="+", metavar="KEY=VALUE")
    p.add_argument("--prefill-selector", nargs="+", metavar="KEY=VALUE")
    p.add_argument("--decode-selector", nargs="+", metavar="KEY=VALUE")
    p.add_argument("--service-discovery-namespace", default=None)
    p.add_argument("--service-discovery-port", type=int, default=8000)
    p.add_argument("--service-discovery-interval", type=float, default=60.0)
    p.add_argument("--sd-api-server", default=None,
                   help="K8s API base URL (default: in-cluster config)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    sd_cfg = None
    if args.service_discovery:
        from ltp_sglang_tpu.router.service_discovery import (
            ServiceDiscoveryConfig,
        )

        sd_cfg = ServiceDiscoveryConfig(
            selector=_parse_selector(args.selector),
            namespace=args.service_discovery_namespace,
            port=args.service_discovery_port,
            check_interval=args.service_discovery_interval,
            pd_mode=args.pd,
            prefill_selector=_parse_selector(args.prefill_selector),
            decode_selector=_parse_selector(args.decode_selector),
            api_server=args.sd_api_server,
        )

    if args.pd:
        from ltp_sglang_tpu.router.pd_lb import PDLoadBalancer

        lb = PDLoadBalancer(args.prefill_urls or [], args.decode_urls or [],
                            allow_empty=sd_cfg is not None)
        if sd_cfg is not None:
            _attach_sd(lb.app, sd_cfg, lb)
        web.run_app(lb.app, host=args.host, port=args.port, print=None)
        return
    if not args.worker_urls and sd_cfg is None:
        p.error("--worker-urls is required (or use --pd / --service-discovery)")
    router = Router(args.worker_urls or [], args.policy)
    if sd_cfg is not None:
        _attach_sd(router.app, sd_cfg, router)
    web.run_app(router.app, host=args.host, port=args.port, print=None)


def _attach_sd(app, sd_cfg, target):
    from ltp_sglang_tpu.router.service_discovery import ServiceDiscovery

    async def _start(app_):
        sd = ServiceDiscovery(sd_cfg, target)
        app_["service_discovery"] = sd
        sd.start()

    app.on_startup.append(_start)


if __name__ == "__main__":
    main()
