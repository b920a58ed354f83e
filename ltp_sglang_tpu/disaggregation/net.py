"""Framed socket protocol for the PD data plane.

Wire format per frame: 8-byte header = (u32 json_len, u32 payload_len),
then json_len bytes of UTF-8 JSON metadata, then payload_len raw bytes.
This replaces the reference's RDMA transfer engines (mooncake/nixl,
disaggregation/mooncake/conn.py) with plain TCP — the TPU deployment story
moves bytes over DCN between hosts; the sender/receiver state machine and
bootstrap protocol above this module are transport-agnostic.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Any, Dict, Optional, Tuple

_HDR = struct.Struct("<II")
# Cap a single frame's JSON header; payloads are chunked by the caller.
_MAX_JSON = 16 * 1024 * 1024


def send_frame(sock: socket.socket, header: Dict[str, Any], payload: bytes = b""):
    meta = json.dumps(header).encode()
    sock.sendall(_HDR.pack(len(meta), len(payload)) + meta + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise ConnectionError("peer closed mid-frame")
        got += r
    return bytes(buf)


def recv_frame(sock: socket.socket) -> Tuple[Dict[str, Any], bytes]:
    jl, pl = _HDR.unpack(_recv_exact(sock, _HDR.size))
    if jl > _MAX_JSON:
        raise ConnectionError(f"oversized frame header ({jl} bytes)")
    header = json.loads(_recv_exact(sock, jl)) if jl else {}
    payload = _recv_exact(sock, pl) if pl else b""
    return header, payload


def connect(host: str, port: int, timeout: Optional[float] = None) -> socket.socket:
    s = socket.create_connection((host, port), timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s
