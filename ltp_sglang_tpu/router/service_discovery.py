"""Kubernetes service discovery for the router.

Counterpart of sgl-router/src/service_discovery.rs: watch pods matching a
label selector and add/remove router workers as pods become Ready / go away.
PD mode uses separate prefill/decode selectors and reads the prefill
bootstrap port from a pod annotation.

The image has no `kubernetes` client library, so this speaks the K8s REST
API directly over aiohttp:

- auth/endpoint from the in-cluster service account
  (``KUBERNETES_SERVICE_HOST`` + ``/var/run/secrets/kubernetes.io/...``) or
  an explicit ``api_server``/``token`` (used by tests with a fake API);
- a full LIST (``/api/v1/[namespaces/{ns}/]pods?labelSelector=...``) seeds
  the state and re-runs every ``check_interval`` as a reconcile safety net;
- between lists, a WATCH stream (``?watch=1&resourceVersion=...``) applies
  ADDED/MODIFIED/DELETED pod events incrementally; 410 Gone or stream EOF
  falls back to a fresh LIST (standard list-then-watch resume protocol).

Workers join only when the pod is Running with condition Ready=True, and
leave on deletion or readiness loss — same inclusion rule as the
reference's ``PodInfo::is_ready`` path.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import ssl
from dataclasses import dataclass, field
from typing import Dict, Optional

import aiohttp

logger = logging.getLogger(__name__)

SA_DIR = "/var/run/secrets/kubernetes.io/serviceaccount"
BOOTSTRAP_PORT_ANNOTATION = "ltp-sglang.ai/bootstrap-port"


@dataclass
class ServiceDiscoveryConfig:
    """Mirrors the reference ServiceDiscoveryConfig
    (service_discovery.rs:21-48)."""

    selector: Dict[str, str] = field(default_factory=dict)
    namespace: Optional[str] = None  # None = all namespaces
    port: int = 8000
    check_interval: float = 60.0
    pd_mode: bool = False
    prefill_selector: Dict[str, str] = field(default_factory=dict)
    decode_selector: Dict[str, str] = field(default_factory=dict)
    bootstrap_port_annotation: str = BOOTSTRAP_PORT_ANNOTATION
    # Test/bare-metal override; in-cluster config is used when None.
    api_server: Optional[str] = None
    token: Optional[str] = None
    verify_tls: bool = True

    def label_selector(self) -> str:
        """K8s labelSelector query string. In PD mode selection happens
        client-side per pod (a pod matches prefill OR decode), so the
        server-side filter is the union via repeated lists; we request
        unfiltered and filter locally when both selectors are set."""
        return ",".join(f"{k}={v}" for k, v in sorted(self.selector.items()))


@dataclass
class PodWorker:
    name: str
    url: str
    pod_type: str  # "regular" | "prefill" | "decode"
    bootstrap_port: Optional[int] = None


def _matches(labels: Dict[str, str], selector: Dict[str, str]) -> bool:
    if not selector:
        return False
    return all(labels.get(k) == v for k, v in selector.items())


def classify_pod(pod: dict, cfg: ServiceDiscoveryConfig) -> Optional[PodWorker]:
    """Return a PodWorker if the pod matches the config and is Ready,
    else None (reference PodInfo::should_include + from_pod)."""
    meta = pod.get("metadata", {})
    status = pod.get("status", {})
    labels = meta.get("labels") or {}
    name = meta.get("name")
    ip = status.get("podIP")
    if not name or not ip:
        return None
    if status.get("phase") != "Running":
        return None
    ready = any(
        c.get("type") == "Ready" and c.get("status") == "True"
        for c in status.get("conditions") or []
    )
    if not ready:
        return None
    if cfg.pd_mode:
        if _matches(labels, cfg.prefill_selector):
            ptype = "prefill"
        elif _matches(labels, cfg.decode_selector):
            ptype = "decode"
        else:
            return None
    else:
        if not _matches(labels, cfg.selector):
            return None
        ptype = "regular"
    bp = None
    ann = (meta.get("annotations") or {}).get(cfg.bootstrap_port_annotation)
    if ann is not None:
        try:
            bp = int(ann)
        except ValueError:
            logger.warning("pod %s: bad bootstrap-port annotation %r", name, ann)
    return PodWorker(name, f"http://{ip}:{cfg.port}", ptype, bp)


class KubeApi:
    """Minimal pods LIST/WATCH client over the K8s REST API."""

    def __init__(self, cfg: ServiceDiscoveryConfig):
        self.cfg = cfg
        if cfg.api_server:
            self.base = cfg.api_server.rstrip("/")
            self.token = cfg.token
            self._ssl = None if cfg.verify_tls else False
        else:
            host = os.environ.get("KUBERNETES_SERVICE_HOST")
            port = os.environ.get("KUBERNETES_SERVICE_PORT", "443")
            if not host:
                raise RuntimeError(
                    "not in-cluster (KUBERNETES_SERVICE_HOST unset) and no "
                    "--sd-api-server given"
                )
            self.base = f"https://{host}:{port}"
            with open(os.path.join(SA_DIR, "token")) as f:
                self.token = f.read().strip()
            ca = os.path.join(SA_DIR, "ca.crt")
            self._ssl = (
                ssl.create_default_context(cafile=ca)
                if os.path.exists(ca) else None
            )

    def _headers(self) -> Dict[str, str]:
        h = {"Accept": "application/json"}
        if self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h

    def _pods_path(self) -> str:
        ns = self.cfg.namespace
        return f"/api/v1/namespaces/{ns}/pods" if ns else "/api/v1/pods"

    async def list_pods(self, session: aiohttp.ClientSession):
        """Full LIST. Returns (pods, resourceVersion)."""
        params = {}
        sel = self.cfg.label_selector()
        if sel and not self.cfg.pd_mode:
            params["labelSelector"] = sel
        async with session.get(
            self.base + self._pods_path(), params=params,
            headers=self._headers(), ssl=self._ssl,
        ) as r:
            r.raise_for_status()
            body = await r.json()
        rv = (body.get("metadata") or {}).get("resourceVersion", "")
        return body.get("items") or [], rv

    async def watch_pods(self, session: aiohttp.ClientSession, rv: str):
        """WATCH stream from resourceVersion `rv`. Yields (type, pod).
        Raises on 410 Gone (caller re-LISTs)."""
        params = {"watch": "1", "allowWatchBookmarks": "true"}
        if rv:
            params["resourceVersion"] = rv
        sel = self.cfg.label_selector()
        if sel and not self.cfg.pd_mode:
            params["labelSelector"] = sel
        async with session.get(
            self.base + self._pods_path(), params=params,
            headers=self._headers(), ssl=self._ssl,
            timeout=aiohttp.ClientTimeout(total=None, sock_read=None),
        ) as r:
            r.raise_for_status()
            # Watch responses are newline-delimited JSON event objects.
            buf = b""
            async for chunk in r.content.iter_any():
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if not line.strip():
                        continue
                    ev = json.loads(line)
                    if ev.get("type") == "BOOKMARK":
                        continue
                    yield ev.get("type"), ev.get("object") or {}


class ServiceDiscovery:
    """List-then-watch loop feeding worker add/remove callbacks.

    `target` must expose `sd_add_worker(PodWorker)` and
    `sd_remove_worker(url: str)`; Router and PDLoadBalancer both do.
    """

    def __init__(self, cfg: ServiceDiscoveryConfig, target):
        self.cfg = cfg
        self.api = KubeApi(cfg)
        self.target = target
        self.workers: Dict[str, PodWorker] = {}  # pod name -> worker
        self._task: Optional[asyncio.Task] = None

    def start(self):
        self._task = asyncio.create_task(self.run())
        return self._task

    async def stop(self):
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass

    def _apply(self, pod: dict, deleted: bool):
        name = (pod.get("metadata") or {}).get("name")
        if not name:
            return
        w = None if deleted else classify_pod(pod, self.cfg)
        cur = self.workers.get(name)
        if w is None:
            if cur is not None:
                del self.workers[name]
                logger.info("k8s: pod %s gone -> remove %s", name, cur.url)
                self.target.sd_remove_worker(cur.url)
            return
        if cur is not None and cur.url == w.url and cur.pod_type == w.pod_type:
            return  # no change
        if cur is not None:
            self.target.sd_remove_worker(cur.url)
        self.workers[name] = w
        logger.info("k8s: pod %s ready -> add %s (%s)", name, w.url, w.pod_type)
        self.target.sd_add_worker(w)

    def _reconcile(self, pods: list):
        seen = set()
        for pod in pods:
            name = (pod.get("metadata") or {}).get("name")
            if name:
                seen.add(name)
            self._apply(pod, deleted=False)
        for name in list(self.workers):
            if name not in seen:
                w = self.workers.pop(name)
                logger.info("k8s: pod %s vanished -> remove %s", name, w.url)
                self.target.sd_remove_worker(w.url)

    async def run(self):
        async with aiohttp.ClientSession() as session:
            while True:
                try:
                    pods, rv = await self.api.list_pods(session)
                    self._reconcile(pods)
                except asyncio.CancelledError:
                    raise
                except Exception as e:  # noqa: BLE001 — keep watching
                    logger.warning("k8s list failed: %s; retrying", e)
                    await asyncio.sleep(min(self.cfg.check_interval, 5.0))
                    continue
                try:
                    deadline = (
                        asyncio.get_event_loop().time() + self.cfg.check_interval
                    )
                    agen = self.api.watch_pods(session, rv)
                    while True:
                        timeout = deadline - asyncio.get_event_loop().time()
                        if timeout <= 0:
                            break  # periodic reconcile via fresh LIST
                        ev_type, pod = await asyncio.wait_for(
                            agen.__anext__(), timeout=timeout
                        )
                        self._apply(pod, deleted=ev_type == "DELETED")
                except (StopAsyncIteration, asyncio.TimeoutError):
                    pass  # stream ended or reconcile due -> re-LIST
                except asyncio.CancelledError:
                    raise
                except Exception as e:  # noqa: BLE001 — incl. 410 Gone
                    logger.warning("k8s watch failed: %s; re-listing", e)
                    await asyncio.sleep(1.0)
