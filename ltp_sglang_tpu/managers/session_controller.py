"""Multi-turn sessions: requests chained on a shared, growing prefix.

Counterpart of managers/session_controller.py:21-68. A session tracks the
token history of each request in a tree; a follow-up request continues from a
chosen ancestor (default: the latest), and the radix cache turns the shared
history into KV reuse automatically.
"""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Dict, List, Optional


@dataclasses.dataclass
class SessionNode:
    rid: str
    tokens: List[int]  # full committed history incl. this turn's output
    parent: Optional[str] = None


class Session:
    def __init__(self, session_id: str, capacity_of_str_len: int = 8192):
        self.session_id = session_id
        self.nodes: Dict[str, SessionNode] = {}
        self.last_rid: Optional[str] = None
        self.created = time.time()

    def base_tokens(self, parent_rid: Optional[str]) -> List[int]:
        rid = parent_rid or self.last_rid
        if rid is None or rid not in self.nodes:
            return []
        return list(self.nodes[rid].tokens)

    def record(self, rid: str, tokens: List[int], parent: Optional[str]):
        self.nodes[rid] = SessionNode(rid, list(tokens), parent)
        self.last_rid = rid


class SessionController:
    def __init__(self):
        self.sessions: Dict[str, Session] = {}

    def open_session(self, session_id: Optional[str] = None) -> str:
        sid = session_id or uuid.uuid4().hex
        if sid in self.sessions:
            raise ValueError(f"session {sid} already exists")
        self.sessions[sid] = Session(sid)
        return sid

    def close_session(self, session_id: str):
        self.sessions.pop(session_id, None)

    def get(self, session_id: str) -> Session:
        s = self.sessions.get(session_id)
        if s is None:
            raise ValueError(f"unknown session {session_id}")
        return s
