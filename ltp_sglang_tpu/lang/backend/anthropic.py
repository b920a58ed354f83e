"""Anthropic third-party backend for @function programs.

Counterpart of python/sglang/lang/backend/anthropic.py, SDK-free: plain
urllib against the Messages API. The program's accumulated text becomes one
user message; select() falls back to asking the model to emit exactly one of
the choices (the Messages API exposes no continuation logprobs).
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Any, Dict, List, Optional


class Anthropic:
    def __init__(
        self,
        model: str,
        base_url: str = "https://api.anthropic.com",
        api_key: Optional[str] = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")
        self.timeout = timeout

    def _post(self, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self.base_url + "/v1/messages",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def generate(self, prompt=None, sampling_params=None, **_):
        sp = sampling_params or {}
        body: Dict[str, Any] = {
            "model": self.model,
            "max_tokens": sp.get("max_new_tokens", 128),
            "messages": [{"role": "user", "content": prompt or ""}],
        }
        if "temperature" in sp:
            body["temperature"] = sp["temperature"]
        if sp.get("stop"):
            stop = sp["stop"]
            body["stop_sequences"] = [stop] if isinstance(stop, str) else list(stop)
        out = self._post(body)
        text = "".join(
            b.get("text", "") for b in out.get("content", []) if b.get("type") == "text"
        )
        return {"text": text, "meta_info": out.get("usage", {})}

    def select(self, prompt: str, choices: List[str]) -> str:
        instr = (
            prompt
            + "\n\nAnswer with exactly one of the following options, verbatim: "
            + " | ".join(choices)
        )
        out = self.generate(
            prompt=instr, sampling_params={"max_new_tokens": 32, "temperature": 0.0}
        )
        text = out["text"].strip()
        for c in choices:
            if c in text:
                return c
        return choices[0]
