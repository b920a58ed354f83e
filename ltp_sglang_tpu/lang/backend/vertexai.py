"""VertexAI third-party backend for @function programs.

Counterpart of python/sglang/lang/backend/vertexai.py, SDK-free: plain
urllib against the Vertex `generateContent` REST endpoint. Auth is a bearer
token (`VERTEXAI_ACCESS_TOKEN`, e.g. from `gcloud auth print-access-token`)
plus project/location (`VERTEXAI_PROJECT` / `VERTEXAI_LOCATION`); the
google-cloud SDK is deliberately not required. select() asks the model to
emit one of the choices verbatim (the REST surface exposes no continuation
logprobs).
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Any, Dict, List, Optional


class VertexAI:
    def __init__(
        self,
        model: str,
        project: Optional[str] = None,
        location: Optional[str] = None,
        access_token: Optional[str] = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.project = project or os.environ.get("VERTEXAI_PROJECT", "")
        self.location = location or os.environ.get(
            "VERTEXAI_LOCATION", "us-central1"
        )
        self.access_token = access_token or os.environ.get(
            "VERTEXAI_ACCESS_TOKEN", ""
        )
        self.timeout = timeout

    def _url(self) -> str:
        return (
            f"https://{self.location}-aiplatform.googleapis.com/v1/projects/"
            f"{self.project}/locations/{self.location}/publishers/google/"
            f"models/{self.model}:generateContent"
        )

    def _post(self, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self._url(),
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.access_token}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def generate(self, prompt=None, sampling_params=None, **_):
        sp = sampling_params or {}
        gen_cfg: Dict[str, Any] = {
            "maxOutputTokens": sp.get("max_new_tokens", 128),
        }
        if "temperature" in sp:
            gen_cfg["temperature"] = sp["temperature"]
        if "top_p" in sp:
            gen_cfg["topP"] = sp["top_p"]
        if sp.get("stop"):
            stop = sp["stop"]
            gen_cfg["stopSequences"] = (
                [stop] if isinstance(stop, str) else list(stop)
            )
        out = self._post({
            "contents": [{"role": "user", "parts": [{"text": prompt or ""}]}],
            "generationConfig": gen_cfg,
        })
        cands = out.get("candidates") or [{}]
        parts = (cands[0].get("content") or {}).get("parts") or []
        text = "".join(p.get("text", "") for p in parts)
        return {"text": text, "meta_info": out.get("usageMetadata", {})}

    def select(self, prompt: str, choices: List[str]) -> str:
        instr = (
            prompt
            + "\n\nAnswer with exactly one of the following options, verbatim: "
            + " | ".join(choices)
        )
        out = self.generate(
            prompt=instr,
            sampling_params={"max_new_tokens": 32, "temperature": 0.0},
        )
        text = out["text"].strip()
        for c in choices:
            if c in text:
                return c
        return choices[0]
