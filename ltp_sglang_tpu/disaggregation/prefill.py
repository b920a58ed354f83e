"""Prefill-side PD disaggregation controller.

Counterpart of disaggregation/prefill.py (PrefillBootstrapQueue:58 + the
prefill event-loop transfer hooks :266-343): the prefill engine computes the
prompt (+ first token) through its NORMAL serving path, then a transfer
thread streams the prompt's KV pages to the registered decode receiver —
overlapping the next prefill's compute. The bootstrap server (room registry +
data plane) lives on this side, as in the reference.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ltp_sglang_tpu.disaggregation.conn import (
    KVPoll,
    PDBootstrapServer,
    SocketKVSender,
)

logger = logging.getLogger(__name__)


class PDPrefillController:
    def __init__(self, engine, bootstrap_port: int = 0,
                 registration_timeout: float = 30.0):
        self.engine = engine
        self.bootstrap_server = PDBootstrapServer(port=bootstrap_port)
        self.registration_timeout = registration_timeout
        self.states: Dict[int, str] = {}  # room -> queued/sending/done/failed
        self._jobs: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._transfer_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self.bootstrap_server.port

    # ------------------------------------------------------------- intake
    def dispatch(self, bootstrap_room: int, token_ids: List[int],
                 first_token: int):
        """Called after the prefill request finished (first token sampled):
        snapshot the prompt KV to host and queue the async network send."""
        payload = self._export(token_ids)
        if payload is None:
            self.states[bootstrap_room] = "failed: prompt KV evicted"
            self._jobs.put((bootstrap_room, None))
            return
        payload["first_token"] = int(first_token)
        self.states[bootstrap_room] = "queued"
        self._jobs.put((bootstrap_room, payload))

    def _export(self, token_ids: List[int]) -> Optional[Dict[str, Any]]:
        """Gather the prompt's KV rows to host RAM. Runs under the engine
        loop lock: a concurrent step would donate (invalidate) the cache
        arrays mid-gather."""
        eng = self.engine
        with eng._loop_lock:
            sched = eng.scheduler
            match = sched.tree_cache.match_prefix(list(token_ids))
            slots = np.asarray(match.device_indices)
            if len(slots) == 0:
                return None
            r = eng.model_runner
            k_rows = np.asarray(r.k_cache[:, slots])  # [L, n, rk, lnk]
            v_rows = np.asarray(r.v_cache[:, slots])
        return {
            "tokens": [int(t) for t in token_ids[: len(slots)]],
            "k_rows": k_rows,
            "v_rows": v_rows,
        }

    # ------------------------------------------------------------- transfer
    def _transfer_loop(self):
        while not self._stop.is_set():
            try:
                room, payload = self._jobs.get(timeout=0.2)
            except queue.Empty:
                continue
            sender = SocketKVSender(self.bootstrap_server, room)
            deadline = time.time() + self.registration_timeout
            while sender.poll() == KVPoll.Bootstrapping:
                if self._stop.is_set() or time.time() > deadline:
                    break
                time.sleep(0.002)
            if sender.poll() != KVPoll.WaitingForInput:
                self.states[room] = "failed: no receiver registered"
                logger.warning("PD prefill: no receiver for room %d", room)
                continue
            if payload is None:
                # Export failed after the receiver registered: tell it.
                entry = self.bootstrap_server.take_room(room)
                if entry is not None:
                    try:
                        from ltp_sglang_tpu.disaggregation.net import send_frame

                        send_frame(entry[0], {"type": "abort",
                                              "reason": "prompt KV evicted"})
                    finally:
                        entry[0].close()
                continue
            self.states[room] = "sending"
            sender.send(payload)
            if sender.poll() == KVPoll.Success:
                self.states[room] = "done"
            else:
                self.states[room] = f"failed: {sender._err}"
                logger.warning("PD prefill transfer failed for room %d: %s",
                               room, sender._err)

    def shutdown(self):
        self._stop.set()
        self.bootstrap_server.close()
