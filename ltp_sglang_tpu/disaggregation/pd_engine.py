"""Prefill/decode disaggregated serving roles.

Counterpart of disaggregation/prefill.py + decode.py loops reduced to the
single-controller design: a PrefillWorker computes the prompt (+first token)
and ships KV via a transfer backend; a DecodeWorker imports the pages and
continues generation through the NORMAL engine path (the imported pages are a
radix prefix hit, so no special decode-side batch type is needed).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from ltp_sglang_tpu.disaggregation.conn import TRANSFER_BACKENDS, KVPoll
from ltp_sglang_tpu.disaggregation.transfer import export_kv, import_kv


class PrefillWorker:
    def __init__(self, engine, transfer_backend: str = "fake"):
        self.engine = engine
        self.sender_cls = TRANSFER_BACKENDS[transfer_backend][0]

    def prefill(self, bootstrap_room: int, input_ids: List[int],
                sampling_params: Optional[Dict] = None):
        """Run prefill (+1 token), push KV pages + first token to the room."""
        sp = dict(sampling_params or {})
        sp["max_new_tokens"] = 1
        out = self.engine.generate(input_ids=input_ids, sampling_params=sp)
        first_token = out["output_ids"][0]
        # cache_finished_req inserted prompt+output[:-1] = the full prompt.
        payload = export_kv(self.engine, input_ids)
        payload["first_token"] = first_token
        sender = self.sender_cls(bootstrap_room)
        deadline = time.time() + 30
        while sender.poll() == KVPoll.Bootstrapping:
            if time.time() > deadline:
                raise TimeoutError("no decode receiver registered for room")
            time.sleep(0.005)
        sender.send(payload)
        return first_token


class DecodeWorker:
    def __init__(self, engine, transfer_backend: str = "fake"):
        self.engine = engine
        self.receiver_cls = TRANSFER_BACKENDS[transfer_backend][1]

    def register(self, bootstrap_room: int):
        return self.receiver_cls(bootstrap_room)

    def decode(self, receiver, input_ids: List[int], sampling_params: Dict,
               timeout: float = 60.0):
        """Wait for the KV handoff, then continue generation."""
        deadline = time.time() + timeout
        while receiver.poll() != KVPoll.Success:
            if time.time() > deadline:
                raise TimeoutError("PD transfer did not complete")
            time.sleep(0.005)
        payload = receiver.recv()
        import_kv(self.engine, payload)
        # Continue: the prompt + first token; prompt KV is a radix hit.
        sp = dict(sampling_params)
        sp["max_new_tokens"] = max(sp.get("max_new_tokens", 128) - 1, 0)
        full = list(input_ids) + [payload["first_token"]]
        out = self.engine.generate(input_ids=full, sampling_params=sp)
        out["output_ids"] = [payload["first_token"]] + out["output_ids"]
        return out
