"""Router load-balancing policies.

Counterpart of sgl-router/src/policies/ (Rust: cache_aware.rs:399,
power_of_two.rs, round_robin.rs, random.rs). The cache-aware policy keeps an
approximate radix tree of recently routed prompts per worker and routes to
the worker with the longest shared prefix (prefix-cache affinity), falling
back to least-load when the match is weak — same balance_abs_threshold idea
as the reference.
"""

from __future__ import annotations

import random
import time
from typing import Dict, List, Optional, Tuple


class Worker:
    """Worker health + circuit-breaker state (reference
    sgl-router/src/core/worker.rs: consecutive failures open the circuit for
    a cooldown; the first request after cooldown is the half-open trial —
    success closes the circuit, failure re-opens it)."""

    CB_FAILURE_THRESHOLD = 3
    CB_COOLDOWN_S = 30.0

    def __init__(self, url: str):
        self.url = url
        self.healthy = True
        self.inflight = 0
        self.total = 0
        self.last_failure = 0.0
        self.consecutive_failures = 0
        self.circuit_open_until = 0.0
        self.circuit_opens = 0  # lifetime count (metrics)

    @property
    def circuit_state(self) -> str:
        if self.consecutive_failures < self.CB_FAILURE_THRESHOLD:
            return "closed"
        if time.time() < self.circuit_open_until:
            return "open"
        return "half_open"  # cooldown elapsed: next request is the trial

    def available(self) -> bool:
        return self.healthy and self.circuit_state != "open"

    def note_success(self):
        self.consecutive_failures = 0

    def note_failure(self):
        self.last_failure = time.time()
        self.consecutive_failures += 1
        if self.consecutive_failures >= self.CB_FAILURE_THRESHOLD:
            newly = self.circuit_open_until < time.time()
            self.circuit_open_until = time.time() + self.CB_COOLDOWN_S
            if newly:
                self.circuit_opens += 1


class BasePolicy:
    def select(self, workers: List[Worker], prompt_key: str) -> Worker:
        raise NotImplementedError

    def note_routed(self, worker: Worker, prompt_key: str):
        pass


class RoundRobinPolicy(BasePolicy):
    def __init__(self):
        self._i = 0

    def select(self, workers, prompt_key):
        alive = [w for w in workers if w.available()]
        w = alive[self._i % len(alive)]
        self._i += 1
        return w


class RandomPolicy(BasePolicy):
    def select(self, workers, prompt_key):
        return random.choice([w for w in workers if w.available()])


class PowerOfTwoPolicy(BasePolicy):
    """Pick two random workers, route to the less loaded."""

    def select(self, workers, prompt_key):
        alive = [w for w in workers if w.available()]
        if len(alive) == 1:
            return alive[0]
        a, b = random.sample(alive, 2)
        return a if a.inflight <= b.inflight else b


class ShortestQueuePolicy(BasePolicy):
    def select(self, workers, prompt_key):
        alive = [w for w in workers if w.available()]
        return min(alive, key=lambda w: w.inflight)


class _PrefixTree:
    """Small character-radix tree recording which worker served a prefix."""

    def __init__(self, max_entries: int = 4096):
        self.entries: List[Tuple[str, str]] = []  # (prompt_key, worker_url)
        self.max_entries = max_entries

    def insert(self, key: str, url: str):
        self.entries.append((key[:512], url))
        if len(self.entries) > self.max_entries:
            self.entries = self.entries[-self.max_entries // 2 :]

    def best_match(self, key: str) -> Tuple[int, Optional[str]]:
        best_len, best_url = 0, None
        for k, url in self.entries:
            n = 0
            for a, b in zip(k, key):
                if a != b:
                    break
                n += 1
            if n > best_len:
                best_len, best_url = n, url
        return best_len, best_url


class CacheAwarePolicy(BasePolicy):
    """Longest-prefix affinity with load-based fallback
    (sgl-router/src/policies/cache_aware.rs).

    Hot path runs in the C++ router core (csrc/router_core.cpp: byte-radix
    tree + load table, LRU-bounded) via ctypes; the Python tree below is the
    no-toolchain fallback."""

    def __init__(self, min_match: int = 16, balance_abs_threshold: int = 32):
        self.min_match = min_match
        self.balance_abs_threshold = balance_abs_threshold
        self.tree = None
        self.core = None
        try:
            from ltp_sglang_tpu.router.router_core import RouterCore

            self.core = RouterCore()
            self._ids: Dict[str, int] = {}
            self._last_load: Dict[str, int] = {}
        except Exception as e:  # no g++ / build failure
            import logging

            logging.getLogger(__name__).warning(
                "C++ router core unavailable (%s); using Python tree", e
            )
            self.tree = _PrefixTree()

    # --- C++-core bookkeeping -------------------------------------------
    def _wid(self, w: Worker) -> int:
        wid = self._ids.get(w.url)
        if wid is None:
            wid = len(self._ids)
            self._ids[w.url] = wid
            self.core.add_worker(wid)
            self._last_load[w.url] = 0
        return wid

    def _sync(self, workers):
        for w in workers:
            wid = self._wid(w)
            self.core.set_health(wid, w.healthy)
            delta = w.inflight - self._last_load[w.url]
            if delta:
                self.core.load_add(wid, delta)
                self._last_load[w.url] = w.inflight

    def select(self, workers, prompt_key):
        alive = {w.url: w for w in workers if w.available()}
        if self.core is not None:
            self._sync(workers)
            wid = self.core.select(
                prompt_key.encode("utf-8", "ignore"),
                self.min_match, self.balance_abs_threshold,
            )
            by_id = {self._ids[w.url]: w for w in workers if w.url in self._ids}
            if wid >= 0 and wid in by_id and by_id[wid].available():
                return by_id[wid]
            return min(alive.values(), key=lambda w: w.inflight)
        match_len, url = self.tree.best_match(prompt_key)
        least = min(alive.values(), key=lambda w: w.inflight)
        if url is not None and url in alive and match_len >= self.min_match:
            cand = alive[url]
            # Don't pile onto a hot worker just for cache affinity.
            if cand.inflight - least.inflight <= self.balance_abs_threshold:
                return cand
        return least

    def note_routed(self, worker, prompt_key):
        if self.core is not None:
            self.core.insert(
                prompt_key.encode("utf-8", "ignore"), self._wid(worker)
            )
        else:
            self.tree.insert(prompt_key, worker.url)


POLICIES = {
    "round_robin": RoundRobinPolicy,
    "random": RandomPolicy,
    "power_of_two": PowerOfTwoPolicy,
    "shortest_queue": ShortestQueuePolicy,
    "cache_aware": CacheAwarePolicy,
}
