"""PD-pairing load balancer.

Counterpart of disaggregation/mini_lb.py (+ the PD mode of
sgl-router/src/routers/pd_router.rs): for every /generate, pick a
(prefill, decode) server pair, mint a bootstrap room id, send the request to
BOTH — the prefill server computes the prompt and ships KV, the decode server
receives it and streams the continuation. The client reads the decode
server's response.

`python -m ltp_sglang_tpu.router.launch_router --pd \
    --prefill-urls http://p1:8000 --decode-urls http://d1:8001`
"""

from __future__ import annotations

import asyncio
import itertools
import logging
import random
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)


def _prompt_bytes(body: dict) -> bytes:
    if isinstance(body.get("text"), str):
        return body["text"].encode("utf-8", "ignore")
    ids = body.get("input_ids")
    if isinstance(ids, list):
        return ",".join(map(str, ids[:256])).encode()
    prompt = body.get("prompt")
    return str(prompt)[:512].encode("utf-8", "ignore") if prompt else b""


class PDPair:
    def __init__(self, prefill_url: str, decode_url: str,
                 bootstrap_port: Optional[int] = None):
        self.prefill_url = prefill_url.rstrip("/")
        self.decode_url = decode_url.rstrip("/")
        self.bootstrap_host = urlparse(self.prefill_url).hostname
        self.bootstrap_port = bootstrap_port  # discovered from the server


class PDLoadBalancer:
    def __init__(self, prefill_urls: List[str], decode_urls: List[str],
                 bootstrap_ports: Optional[List[int]] = None,
                 allow_empty: bool = False):
        if not allow_empty and (not prefill_urls or not decode_urls):
            raise ValueError("need at least one prefill and one decode URL")
        ports = bootstrap_ports or [None] * len(prefill_urls)
        # id-keyed maps so workers can join/leave at runtime (K8s service
        # discovery); the C++ core keys its load table by the same ids.
        self._next_id = itertools.count()
        self._pairs: Dict[int, PDPair] = {
            next(self._next_id): PDPair(p, "", bp)
            for p, bp in zip(prefill_urls, ports)
        }
        self._decodes: Dict[int, str] = {
            next(self._next_id): d.rstrip("/") for d in decode_urls
        }
        self._rr = itertools.count()
        # C++ router core for cache-aware PD pairing
        # (csrc/router_core.cpp rc_select_pair). Falls back to round-robin
        # when g++ is unavailable.
        self.core = None
        try:
            from ltp_sglang_tpu.router.router_core import RouterCore

            self.core = RouterCore()
            for wid in list(self._pairs) + list(self._decodes):
                self.core.add_worker(wid)
        except Exception as e:
            logger.warning("C++ router core unavailable (%s); round-robin", e)
        self.app = web.Application(client_max_size=64 * 1024 * 1024)
        self.app.router.add_post("/generate", self.generate)
        self.app.router.add_get("/health", self.health)
        self.app.router.add_post("/flush_cache", self.flush_cache)
        self.app.router.add_get("/get_model_info", self.get_model_info)
        self.app.on_startup.append(self._startup)
        self._session: Optional[aiohttp.ClientSession] = None

    @property
    def prefill(self) -> List[PDPair]:
        return list(self._pairs.values())

    @property
    def decode_urls(self) -> List[str]:
        return list(self._decodes.values())

    # -- K8s service discovery hooks (router/service_discovery.py) --
    def sd_add_worker(self, pw):
        url = pw.url.rstrip("/")
        if pw.pod_type == "prefill":
            if any(p.prefill_url == url for p in self._pairs.values()):
                return
            wid = next(self._next_id)
            self._pairs[wid] = PDPair(url, "", pw.bootstrap_port)
        else:
            if url in self._decodes.values():
                return
            wid = next(self._next_id)
            self._decodes[wid] = url
        if self.core is not None:
            self.core.add_worker(wid)

    def sd_remove_worker(self, url: str):
        url = url.rstrip("/")
        for wid, pair in list(self._pairs.items()):
            if pair.prefill_url == url:
                del self._pairs[wid]
                if self.core is not None:
                    self.core.remove_worker(wid)
        for wid, d in list(self._decodes.items()):
            if d == url:
                del self._decodes[wid]
                if self.core is not None:
                    self.core.remove_worker(wid)

    async def _startup(self, app):
        self._session = aiohttp.ClientSession()
        # Discover bootstrap ports from each prefill server.
        for pair in self._pairs.values():
            if pair.bootstrap_port is not None:
                continue
            try:
                async with self._session.get(
                    pair.prefill_url + "/get_server_info"
                ) as r:
                    info = await r.json()
                    pair.bootstrap_port = info.get("pd_bootstrap_port")
            except aiohttp.ClientError as e:
                logger.warning("bootstrap discovery failed for %s: %s",
                               pair.prefill_url, e)

    def _pick(self, body: Optional[dict] = None):
        """Returns (pair, decode_url, (p_id, d_id) or None)."""
        p_ids, d_ids = list(self._pairs), list(self._decodes)
        if not p_ids or not d_ids:
            raise web.HTTPServiceUnavailable(
                text='{"error": "no prefill/decode workers"}',
                content_type="application/json",
            )
        if self.core is not None and body is not None:
            key = _prompt_bytes(body)
            sel = self.core.select_pair(key, p_ids, d_ids)
            if sel is not None:
                p_id, d_id = sel
                self.core.insert(key, p_id)
                self.core.load_add(p_id, 1)
                self.core.load_add(d_id, 1)
                return (self._pairs[p_id], self._decodes[d_id], (p_id, d_id))
        i = next(self._rr)
        return (self._pairs[p_ids[i % len(p_ids)]],
                self._decodes[d_ids[i % len(d_ids)]], None)

    async def generate(self, request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        pair, decode_url, pd_ids = self._pick(body)
        if pair.bootstrap_port is None:
            await self._startup(None)
            if pair.bootstrap_port is None:
                return web.json_response(
                    {"error": "prefill bootstrap port unknown"}, status=503
                )
        room = random.getrandbits(62)
        p_body = {**body, "bootstrap_room": room, "stream": False}
        d_body = {
            **body,
            "bootstrap_room": room,
            "bootstrap_host": pair.bootstrap_host,
            "bootstrap_port": pair.bootstrap_port,
        }

        async def run_prefill():
            async with self._session.post(
                pair.prefill_url + "/generate", json=p_body
            ) as r:
                return r.status, await r.json()

        prefill_task = asyncio.create_task(run_prefill())
        try:
            if body.get("stream", False):
                resp = web.StreamResponse(
                    headers={"Content-Type": "text/event-stream",
                             "Cache-Control": "no-cache"}
                )
                await resp.prepare(request)
                async with self._session.post(
                    decode_url + "/generate", json=d_body,
                    timeout=aiohttp.ClientTimeout(total=600),
                ) as r:
                    async for chunk in r.content.iter_any():
                        await resp.write(chunk)
                await resp.write_eof()
                return resp
            async with self._session.post(
                decode_url + "/generate", json=d_body,
                timeout=aiohttp.ClientTimeout(total=600),
            ) as r:
                return web.json_response(await r.json(), status=r.status)
        finally:
            if self.core is not None and pd_ids is not None:
                self.core.load_add(pd_ids[0], -1)
                self.core.load_add(pd_ids[1], -1)
            try:
                status, pout = await prefill_task
                if status != 200:
                    logger.warning("prefill leg failed: %s %s", status, pout)
            except Exception as e:  # noqa: BLE001
                logger.warning("prefill leg error: %s", e)

    async def health(self, request):
        oks = []
        for url in [p.prefill_url for p in self.prefill] + self.decode_urls:
            try:
                async with self._session.get(url + "/health") as r:
                    oks.append(r.status == 200)
            except aiohttp.ClientError:
                oks.append(False)
        return web.json_response({"healthy": all(oks), "workers": oks},
                                 status=200 if all(oks) else 503)

    async def flush_cache(self, request):
        for url in [p.prefill_url for p in self.prefill] + self.decode_urls:
            try:
                await self._session.post(url + "/flush_cache")
            except aiohttp.ClientError:
                pass
        return web.json_response({"success": True})

    async def get_model_info(self, request):
        async with self._session.get(
            self.decode_urls[0] + "/get_model_info"
        ) as r:
            return web.json_response(await r.json())
