"""K8s service discovery: list-then-watch against a fake K8s API server.

Reference behavior: sgl-router/src/service_discovery.rs — pods matching the
label selector join as workers when Ready, leave on deletion/readiness loss;
PD mode classifies by prefill/decode selectors and reads the bootstrap-port
annotation.
"""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer


def mkpod(name, ip, labels, ready=True, phase="Running", annotations=None):
    return {
        "metadata": {"name": name, "labels": labels,
                     "annotations": annotations or {}},
        "status": {
            "phase": phase,
            "podIP": ip,
            "conditions": [
                {"type": "Ready", "status": "True" if ready else "False"}
            ],
        },
    }


class FakeKubeApi:
    """Serves /api/v1/pods with LIST + WATCH (JSON-lines) semantics."""

    def __init__(self, pods):
        self.pods = list(pods)
        self.events = asyncio.Queue()
        self.seen_selectors = []
        self.app = web.Application()
        self.app.router.add_get("/api/v1/pods", self.pods_handler)
        self.app.router.add_get(
            "/api/v1/namespaces/{ns}/pods", self.pods_handler
        )

    async def pods_handler(self, request):
        sel = request.query.get("labelSelector")
        if sel:
            self.seen_selectors.append(sel)
        if request.query.get("watch") != "1":
            return web.json_response(
                {"metadata": {"resourceVersion": "1"}, "items": self.pods}
            )
        resp = web.StreamResponse(headers={"Content-Type": "application/json"})
        await resp.prepare(request)
        while True:
            ev_type, pod = await self.events.get()
            if ev_type == "__CLOSE__":
                break
            await resp.write(
                json.dumps({"type": ev_type, "object": pod}).encode() + b"\n"
            )
        await resp.write_eof()
        return resp


async def _wait_for(cond, timeout=5.0):
    deadline = asyncio.get_event_loop().time() + timeout
    while asyncio.get_event_loop().time() < deadline:
        if cond():
            return True
        await asyncio.sleep(0.02)
    return False


def test_classify_pod_rules():
    from ltp_sglang_tpu.router.service_discovery import (
        ServiceDiscoveryConfig,
        classify_pod,
    )

    cfg = ServiceDiscoveryConfig(selector={"app": "ltp"}, port=9000)
    w = classify_pod(mkpod("a", "10.0.0.1", {"app": "ltp"}), cfg)
    assert w is not None and w.url == "http://10.0.0.1:9000"
    assert classify_pod(mkpod("b", "10.0.0.2", {"app": "other"}), cfg) is None
    assert classify_pod(
        mkpod("c", "10.0.0.3", {"app": "ltp"}, ready=False), cfg) is None
    assert classify_pod(
        mkpod("d", "10.0.0.4", {"app": "ltp"}, phase="Pending"), cfg) is None

    pd = ServiceDiscoveryConfig(
        pd_mode=True, port=8000,
        prefill_selector={"role": "prefill"},
        decode_selector={"role": "decode"},
    )
    wp = classify_pod(
        mkpod("p", "10.1.0.1", {"role": "prefill"},
              annotations={pd.bootstrap_port_annotation: "9123"}), pd)
    assert wp.pod_type == "prefill" and wp.bootstrap_port == 9123
    wd = classify_pod(mkpod("d", "10.1.0.2", {"role": "decode"}), pd)
    assert wd.pod_type == "decode"
    assert classify_pod(mkpod("x", "10.1.0.3", {"role": "other"}), pd) is None


def test_k8s_discovery_regular_router():
    from ltp_sglang_tpu.router.router import Router
    from ltp_sglang_tpu.router.service_discovery import (
        ServiceDiscovery,
        ServiceDiscoveryConfig,
    )

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        fake = FakeKubeApi([mkpod("w0", "10.0.0.1", {"app": "ltp"})])
        kc = TestClient(TestServer(fake.app))
        await kc.start_server()
        api_url = str(kc.make_url("")).rstrip("/")

        router = Router([], policy="round_robin", health_check_interval=1000)
        cfg = ServiceDiscoveryConfig(
            selector={"app": "ltp"}, port=8000, check_interval=30,
            api_server=api_url, token="test-token",
        )
        sd = ServiceDiscovery(cfg, router)
        sd.start()
        try:
            # initial LIST seeds the worker
            assert await _wait_for(
                lambda: [w.url for w in router.workers]
                == ["http://10.0.0.1:8000"]
            )
            assert "app=ltp" in fake.seen_selectors
            # new ready pod via watch ADDED
            await fake.events.put(
                ("ADDED", mkpod("w1", "10.0.0.2", {"app": "ltp"}))
            )
            assert await _wait_for(lambda: len(router.workers) == 2)
            # readiness loss via MODIFIED removes it
            await fake.events.put(
                ("MODIFIED", mkpod("w1", "10.0.0.2", {"app": "ltp"},
                                   ready=False))
            )
            assert await _wait_for(lambda: len(router.workers) == 1)
            # deletion removes the original
            await fake.events.put(
                ("DELETED", mkpod("w0", "10.0.0.1", {"app": "ltp"}))
            )
            assert await _wait_for(lambda: len(router.workers) == 0)
        finally:
            await sd.stop()
            await kc.close()

    loop.run_until_complete(go())
    loop.close()


def test_k8s_discovery_pd_mode():
    from ltp_sglang_tpu.router.pd_lb import PDLoadBalancer
    from ltp_sglang_tpu.router.service_discovery import (
        ServiceDiscovery,
        ServiceDiscoveryConfig,
    )

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def go():
        cfg0 = ServiceDiscoveryConfig(pd_mode=True)
        fake = FakeKubeApi([
            mkpod("p0", "10.2.0.1", {"role": "prefill"},
                  annotations={cfg0.bootstrap_port_annotation: "9001"}),
            mkpod("d0", "10.2.0.2", {"role": "decode"}),
            mkpod("other", "10.2.0.9", {"role": "nothing"}),
        ])
        kc = TestClient(TestServer(fake.app))
        await kc.start_server()
        api_url = str(kc.make_url("")).rstrip("/")

        lb = PDLoadBalancer([], [], allow_empty=True)
        cfg = ServiceDiscoveryConfig(
            pd_mode=True, port=8000, check_interval=30,
            prefill_selector={"role": "prefill"},
            decode_selector={"role": "decode"},
            api_server=api_url, token="t",
        )
        sd = ServiceDiscovery(cfg, lb)
        sd.start()
        try:
            assert await _wait_for(
                lambda: len(lb.prefill) == 1 and len(lb.decode_urls) == 1
            )
            pair = lb.prefill[0]
            assert pair.prefill_url == "http://10.2.0.1:8000"
            assert pair.bootstrap_port == 9001
            assert lb.decode_urls == ["http://10.2.0.2:8000"]
            # decode pod scales up
            await fake.events.put(
                ("ADDED", mkpod("d1", "10.2.0.3", {"role": "decode"}))
            )
            assert await _wait_for(lambda: len(lb.decode_urls) == 2)
            # prefill pod dies -> no pairs left
            await fake.events.put(
                ("DELETED", mkpod("p0", "10.2.0.1", {"role": "prefill"}))
            )
            assert await _wait_for(lambda: len(lb.prefill) == 0)
        finally:
            await sd.stop()
            await kc.close()

    loop.run_until_complete(go())
    loop.close()


def test_pd_lb_pick_errors_with_no_workers():
    from aiohttp import web as _web

    from ltp_sglang_tpu.router.pd_lb import PDLoadBalancer

    lb = PDLoadBalancer([], [], allow_empty=True)
    with pytest.raises(_web.HTTPServiceUnavailable):
        lb._pick({"text": "x"})
