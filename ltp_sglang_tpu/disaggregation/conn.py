"""PD disaggregation: KV transfer interface + fake (in-process) backend.

Counterpart of disaggregation/base/conn.py:15-130 (KVPoll states :34-40,
BaseKVManager/Sender/Receiver/BootstrapServer) and disaggregation/fake/conn.py
(the fake backend the reference uses for warmup/tests). The real TPU data
plane (DCN inter-slice transfer / jax device_put between meshes) plugs in
behind the same sender/receiver contract.
"""

from __future__ import annotations

import enum
import threading
from typing import Any, Dict, Optional


class KVPoll(enum.IntEnum):
    Failed = 0
    Bootstrapping = 1
    WaitingForInput = 2
    Transferring = 3
    Success = 4


class BaseKVSender:
    def send(self, payload: Any):
        raise NotImplementedError

    def poll(self) -> KVPoll:
        raise NotImplementedError


class BaseKVReceiver:
    def poll(self) -> KVPoll:
        raise NotImplementedError

    def recv(self) -> Any:
        raise NotImplementedError


class KVBootstrapServer:
    """Pairs senders and receivers by bootstrap_room id (base/conn.py:96)."""

    _instance: Optional["KVBootstrapServer"] = None

    def __init__(self):
        self.rooms: Dict[int, Dict[str, Any]] = {}
        self.lock = threading.Lock()

    @classmethod
    def instance(cls) -> "KVBootstrapServer":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def put(self, room: int, payload: Any):
        with self.lock:
            self.rooms.setdefault(room, {})["payload"] = payload

    def get(self, room: int):
        with self.lock:
            return self.rooms.get(room, {}).get("payload")

    def register(self, room: int):
        with self.lock:
            self.rooms.setdefault(room, {})["registered"] = True

    def registered(self, room: int) -> bool:
        with self.lock:
            return self.rooms.get(room, {}).get("registered", False)

    def clear(self, room: int):
        with self.lock:
            self.rooms.pop(room, None)


class FakeKVSender(BaseKVSender):
    def __init__(self, bootstrap_room: int):
        self.room = bootstrap_room
        self.server = KVBootstrapServer.instance()
        self._sent = False

    def poll(self) -> KVPoll:
        if self._sent:
            return KVPoll.Success
        if self.server.registered(self.room):
            return KVPoll.WaitingForInput
        return KVPoll.Bootstrapping

    def send(self, payload: Any):
        self.server.put(self.room, payload)
        self._sent = True


class FakeKVReceiver(BaseKVReceiver):
    def __init__(self, bootstrap_room: int):
        self.room = bootstrap_room
        self.server = KVBootstrapServer.instance()
        self.server.register(bootstrap_room)

    def poll(self) -> KVPoll:
        return (
            KVPoll.Success
            if self.server.get(self.room) is not None
            else KVPoll.WaitingForInput
        )

    def recv(self) -> Any:
        payload = self.server.get(self.room)
        self.server.clear(self.room)
        return payload


TRANSFER_BACKENDS = {"fake": (FakeKVSender, FakeKVReceiver)}
