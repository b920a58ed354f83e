"""Decode-side PD disaggregation controller.

Counterpart of disaggregation/decode.py (DecodePreallocQueue:131 +
DecodeTransferQueue:531 + event_loop integration :661-783) reshaped for the
single-controller TPU engine:

- `submit` PREALLOCATES page-aligned KV slots up front and opens a
  SocketKVReceiver whose background thread only does network I/O into host
  buffers (the reference's RDMA write lands in GPU memory; here DCN bytes
  land in host RAM and a Pallas row-DMA write installs them).
- `process` runs as a scheduler pre-step hook (under the engine loop lock),
  installing arrived layer-chunks between decode steps — the transfer
  genuinely overlaps running decode — and, on completion, inserting the
  prefix into the radix tree and enqueueing the request through the NORMAL
  admission path (the transferred prefix is a radix hit; the request's
  pre-seeded first token reuses the retract-resume invariant).
- Failures (socket death, timeout, pool exhaustion) abort the one request
  and free its preallocation; the engine keeps serving.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ltp_sglang_tpu.disaggregation.conn import KVPoll, SocketKVReceiver
from ltp_sglang_tpu.managers.schedule_batch import FINISH_ABORT, Req

logger = logging.getLogger(__name__)

# Install-batch row bucket: pad chunk installs to these sizes so the jitted
# kv-write compiles once per bucket, not once per prompt length.
_INSTALL_BUCKETS = (256, 1024, 4096, 16384)


def _bucket(n: int) -> int:
    for b in _INSTALL_BUCKETS:
        if n <= b:
            return b
    return -(-n // _INSTALL_BUCKETS[-1]) * _INSTALL_BUCKETS[-1]


class _PendingTransfer:
    __slots__ = (
        "req", "receiver", "slots", "n_cached", "meta", "k_chunks",
        "deadline", "failed", "done", "locked_node", "on_ready",
    )

    def __init__(self, req: Req, receiver: SocketKVReceiver,
                 slots: np.ndarray, n_cached: int, deadline: float,
                 on_ready: Optional[Any]):
        self.req = req
        self.receiver = receiver
        self.slots = slots
        self.n_cached = n_cached
        self.meta: Optional[Dict] = None
        self.k_chunks: Dict[int, np.ndarray] = {}  # layer -> k rows awaiting v
        self.deadline = deadline
        self.failed: Optional[str] = None
        self.done = False
        self.locked_node = None
        self.on_ready = on_ready


class PDDecodeController:
    def __init__(self, engine):
        self.engine = engine
        self.scheduler = engine.scheduler
        self.runner = engine.model_runner
        self.page_size = engine.server_args.page_size
        self.timeout = engine.server_args.pd_transfer_timeout
        self.pending: Dict[str, _PendingTransfer] = {}
        # rid -> transfer that produced a scheduler request; entry retired
        # (prefix unlock) when the request finishes.
        self.active: Dict[str, _PendingTransfer] = {}
        import jax

        # (k_cache, v_cache, layer_idx, locs, k_new, v_new, num_valid) ->
        # row-DMA write (Pallas on TPU, scatter on CPU), jitted standalone.
        self._install = jax.jit(self.runner.model.kv_write, donate_argnums=(0, 1))
        self.scheduler.pre_step_hooks.append(self.process)

    # ------------------------------------------------------------- intake
    def submit(self, req: Req, bootstrap_room: int, bootstrap_host: str,
               bootstrap_port: int, on_ready=None) -> Req:
        """Register a PD continuation request. The caller builds `req` via
        Engine._make_req; tokens/first_token arrive with the transfer."""
        P = self.page_size
        n_cached = (len(req.origin_input_ids) // P) * P
        with self.engine._loop_lock:  # allocator races with running steps
            alloc = self.scheduler.token_to_kv_pool_allocator
            slots = alloc.alloc(n_cached) if n_cached else np.empty(0, np.int32)
            if slots is None:
                # Make room the way admission does (decode.py prealloc headroom).
                self.scheduler.tree_cache.evict(n_cached)
                slots = alloc.alloc(n_cached)
        if slots is None:
            req.finished_reason = FINISH_ABORT("PD prealloc: KV pool exhausted")
            self.scheduler._emit_output(req)
            return req
        receiver = SocketKVReceiver(
            bootstrap_room, bootstrap_host, bootstrap_port,
            num_tokens=n_cached, timeout=self.timeout,
        )
        self.pending[req.rid] = _PendingTransfer(
            req, receiver, np.asarray(slots, np.int32), n_cached,
            time.time() + self.timeout, on_ready,
        )
        return req

    # ------------------------------------------------------------- pump
    def process(self):
        """Scheduler pre-step hook: drain receiver events, install chunks,
        enqueue completed transfers, abort failures/timeouts."""
        now = time.time()
        for rid in list(self.pending.keys()):
            entry = self.pending[rid]
            self._drain(entry)
            if entry.failed is not None:
                self._abort(entry, entry.failed)
                del self.pending[rid]
            elif entry.done:
                self._activate(entry)
                del self.pending[rid]
            elif now > entry.deadline:
                self._abort(entry, "PD transfer timed out")
                del self.pending[rid]
        for rid in list(self.active.keys()):
            entry = self.active[rid]
            if entry.req.finished():
                if entry.locked_node is not None:
                    self.scheduler.tree_cache.dec_lock_ref(entry.locked_node)
                del self.active[rid]

    def _drain(self, entry: _PendingTransfer):
        import queue as _queue

        while True:
            try:
                ev = entry.receiver.events.get_nowait()
            except _queue.Empty:
                return
            kind = ev[0]
            if kind == "meta":
                entry.meta = ev[1]
                n = entry.n_cached
                if len(entry.meta["tokens"]) < n:
                    entry.failed = (
                        f"prefill sent {len(entry.meta['tokens'])} tokens, "
                        f"decode preallocated {n}"
                    )
                    return
            elif kind == "chunk":
                _, which, layer, arr = ev
                if which == "k":
                    entry.k_chunks[layer] = arr
                else:
                    k_arr = entry.k_chunks.pop(layer, None)
                    if k_arr is None:
                        entry.failed = f"v chunk for layer {layer} before k"
                        return
                    self._install_layer(entry, layer, k_arr, arr)
            elif kind == "done":
                entry.done = True
                return
            elif kind == "failed":
                entry.failed = ev[1]
                return

    def _adapt_rows(self, arr: np.ndarray, cache) -> np.ndarray:
        """Reconcile per-token KV row widths between P and D fleets with
        DIFFERENT TP geometries (reference test_disaggregation_different_tp /
        common/conn.py): only the MLA latent row's tp-dependent zero padding
        may legally differ — pad or truncate the flattened row to the decode
        side's width. Any other mismatch fails the transfer loudly."""
        r_c, ln_c = cache.shape[2], cache.shape[3]
        if arr.shape[1:] == (r_c, ln_c):
            return arr
        model = self.runner.model
        if not getattr(model, "latent_cache", False):
            raise ValueError(
                f"PD kv row shape {arr.shape[1:]} != decode cache "
                f"{(r_c, ln_c)} and the model is not latent-padded"
            )
        n = arr.shape[0]
        flat = arr.reshape(n, -1)
        want = r_c * ln_c
        if flat.shape[1] > want:
            # The dropped tail must be the tp-alignment zero padding.
            flat = flat[:, :want]
        else:
            flat = np.pad(flat, ((0, 0), (0, want - flat.shape[1])))
        return flat.reshape(n, r_c, ln_c)

    def _install_layer(self, entry: _PendingTransfer, layer: int,
                       k_arr: np.ndarray, v_arr: np.ndarray):
        import jax.numpy as jnp

        n = entry.n_cached
        if n == 0:
            return
        r = self.runner
        try:
            k_arr = self._adapt_rows(k_arr, r.k_cache)
            v_arr = self._adapt_rows(v_arr, r.v_cache)
        except ValueError as e:
            entry.failed = str(e)
            return
        b = _bucket(n)
        locs = np.zeros(b, np.int32)
        locs[:n] = entry.slots
        kp = np.zeros((b,) + k_arr.shape[1:], k_arr.dtype)
        vp = np.zeros((b,) + v_arr.shape[1:], v_arr.dtype)
        kp[:n] = k_arr[:n]
        vp[:n] = v_arr[:n]
        r.k_cache, r.v_cache = self._install(
            r.k_cache, r.v_cache, jnp.asarray(layer, jnp.int32),
            jnp.asarray(locs), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(n, jnp.int32),
        )

    def _activate(self, entry: _PendingTransfer):
        """Transfer complete: publish the prefix and enter normal admission."""
        req, meta = entry.req, entry.meta
        if meta is None:
            self._abort(entry, "transfer finished without metadata")
            return
        n = entry.n_cached
        tree = self.scheduler.tree_cache
        if n:
            tokens = [int(t) for t in meta["tokens"][:n]]
            dup = tree.insert(tokens, entry.slots)
            if dup:
                # Prefix already cached locally; release our duplicate rows.
                self.scheduler.token_to_kv_pool_allocator.free(entry.slots[:dup])
            match = tree.match_prefix(tokens)
            tree.inc_lock_ref(match.last_node)
            entry.locked_node = match.last_node
        # Pre-seeded first token: admission recomputes fill_ids = prompt +
        # [first_token]; the prompt is a radix hit, the extend computes the
        # first token's KV and samples token 2 (retract-resume invariant).
        req.output_ids = [int(meta["first_token"])]
        self.scheduler.add_request(req)
        self.active[req.rid] = entry
        if entry.on_ready is not None:
            entry.on_ready(req)

    def _abort(self, entry: _PendingTransfer, message: str):
        logger.warning("PD decode transfer aborted (rid=%s): %s",
                       entry.req.rid, message)
        if entry.locked_node is not None:
            self.scheduler.tree_cache.dec_lock_ref(entry.locked_node)
        if entry.n_cached:
            self.scheduler.token_to_kv_pool_allocator.free(entry.slots)
        entry.req.finished_reason = FINISH_ABORT(f"PD transfer failed: {message}")
        self.scheduler._emit_output(entry.req)

    # ------------------------------------------------------------- library API
    def wait(self, req: Req, timeout: float = 120.0) -> Req:
        """Pump the engine loop until the PD request finishes (library mode;
        under the HTTP server the loop thread pumps instead)."""
        deadline = time.time() + timeout
        while not req.finished():
            if time.time() > deadline:
                raise TimeoutError(f"PD request {req.rid} did not finish")
            with self.engine._loop_lock:
                worked = self.scheduler.event_loop_step()
            if not worked:
                time.sleep(0.002)
        return req
