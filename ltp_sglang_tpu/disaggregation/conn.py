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


class PDBootstrapServer:
    """Prefill-side TCP bootstrap + data-plane server (base/conn.py:128,
    mooncake/conn.py bootstrap HTTP server). Decode receivers connect,
    register a bootstrap room, and keep the connection open; the prefill
    sender later streams layer-chunked KV frames down the same socket."""

    def __init__(self, port: int = 0, host: str = "0.0.0.0"):
        import socket as _socket

        self._srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(128)
        self.port = self._srv.getsockname()[1]
        self.rooms: Dict[int, Any] = {}  # room -> (socket, meta dict)
        self.lock = threading.Lock()
        self._stop = False
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    def _accept_loop(self):
        from ltp_sglang_tpu.disaggregation.net import recv_frame

        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                hdr, _ = recv_frame(conn)
                if hdr.get("type") != "register":
                    conn.close()
                    continue
                with self.lock:
                    self.rooms[int(hdr["room"])] = (conn, hdr)
            except Exception:
                conn.close()

    def take_room(self, room: int):
        with self.lock:
            return self.rooms.pop(room, None)

    def peek_room(self, room: int) -> bool:
        with self.lock:
            return room in self.rooms

    def close(self):
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass


class SocketKVSender(BaseKVSender):
    """Streams KV layer-chunks over the registered room connection.

    States: Bootstrapping (no receiver yet) -> WaitingForInput (receiver
    registered) -> Transferring (stream in progress) -> Success | Failed.
    `send` is blocking (run it on the prefill controller's transfer thread
    so it overlaps the engine loop); `poll` is thread-safe.
    """

    def __init__(self, bootstrap_server: PDBootstrapServer, bootstrap_room: int):
        self.server = bootstrap_server
        self.room = bootstrap_room
        self._state = KVPoll.Bootstrapping
        self._err: Optional[str] = None

    def poll(self) -> KVPoll:
        if self._state == KVPoll.Bootstrapping and self.server.peek_room(self.room):
            self._state = KVPoll.WaitingForInput
        return self._state

    def failure_exception(self):
        raise RuntimeError(f"PD transfer failed for room {self.room}: {self._err}")

    def send(self, payload: Dict[str, Any]):
        """payload: tokens, first_token, k_rows [L, n, r, ln], v_rows."""
        import numpy as np

        from ltp_sglang_tpu.disaggregation.net import send_frame

        entry = self.server.take_room(self.room)
        if entry is None:
            self._state = KVPoll.Failed
            self._err = "no receiver registered"
            return
        conn, _ = entry
        k_rows, v_rows = payload["k_rows"], payload["v_rows"]
        L = k_rows.shape[0]
        self._state = KVPoll.Transferring
        try:
            send_frame(conn, {
                "type": "meta",
                "room": self.room,
                "tokens": [int(t) for t in payload["tokens"]],
                "first_token": int(payload["first_token"]),
                "num_layers": int(L),
                "k_shape": list(k_rows.shape[1:]),
                "v_shape": list(v_rows.shape[1:]),
                "k_dtype": str(k_rows.dtype),
                "v_dtype": str(v_rows.dtype),
            })
            for li in range(L):
                send_frame(conn, {"type": "chunk", "which": "k", "layer": li},
                           np.ascontiguousarray(k_rows[li]).tobytes())
                send_frame(conn, {"type": "chunk", "which": "v", "layer": li},
                           np.ascontiguousarray(v_rows[li]).tobytes())
            send_frame(conn, {"type": "done"})
            self._state = KVPoll.Success
        except Exception as e:  # noqa: BLE001 — any socket failure fails the room
            self._state = KVPoll.Failed
            self._err = str(e)
        finally:
            try:
                conn.close()
            except OSError:
                pass


class SocketKVReceiver(BaseKVReceiver):
    """Decode-side receiver: registers the room, then a background thread
    pushes ("meta"|"chunk"|"done"|"failed", ...) events into `events` for the
    decode controller to install incrementally (overlapping decode steps)."""

    def __init__(self, bootstrap_room: int, bootstrap_host: str,
                 bootstrap_port: int, num_tokens: int = 0,
                 timeout: float = 10.0):
        import queue as _queue

        from ltp_sglang_tpu.disaggregation.net import connect, send_frame

        self.room = bootstrap_room
        self.events: "_queue.Queue" = _queue.Queue()
        self._state = KVPoll.Bootstrapping
        self._err: Optional[str] = None
        try:
            self._sock = connect(bootstrap_host, bootstrap_port, timeout=timeout)
            send_frame(self._sock, {
                "type": "register", "room": bootstrap_room,
                "num_tokens": int(num_tokens),
            })
            self._sock.settimeout(None)
            self._state = KVPoll.WaitingForInput
        except Exception as e:  # noqa: BLE001
            self._state = KVPoll.Failed
            self._err = str(e)
            self.events.put(("failed", str(e)))
            return
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._thread.start()

    def poll(self) -> KVPoll:
        return self._state

    def failure_exception(self):
        raise RuntimeError(f"PD transfer failed for room {self.room}: {self._err}")

    def _recv_loop(self):
        import numpy as np

        from ltp_sglang_tpu.disaggregation.net import recv_frame

        meta = None
        try:
            while True:
                hdr, payload = recv_frame(self._sock)
                t = hdr.get("type")
                if t == "meta":
                    meta = hdr
                    self._state = KVPoll.Transferring
                    self.events.put(("meta", hdr))
                elif t == "chunk":
                    which = hdr["which"]
                    shape = meta[f"{which}_shape"]
                    dtype = meta[f"{which}_dtype"]
                    arr = np.frombuffer(payload, dtype=_np_dtype(dtype)).reshape(shape)
                    self.events.put(("chunk", which, int(hdr["layer"]), arr))
                elif t == "done":
                    self._state = KVPoll.Success
                    self.events.put(("done",))
                    return
                elif t == "abort":
                    raise ConnectionError(
                        f"prefill aborted: {hdr.get('reason', 'unknown')}"
                    )
                else:
                    raise ConnectionError(f"unexpected frame type {t!r}")
        except Exception as e:  # noqa: BLE001
            self._state = KVPoll.Failed
            self._err = str(e)
            self.events.put(("failed", str(e)))
        finally:
            try:
                self._sock.close()
            except OSError:
                pass


def _np_dtype(name: str):
    """Resolve dtype names incl. ml_dtypes (bfloat16, float8_*) safely."""
    import numpy as np

    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


TRANSFER_BACKENDS = {"fake": (FakeKVSender, FakeKVReceiver)}
