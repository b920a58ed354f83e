"""OpenAI-compatible third-party backend for @function programs.

Counterpart of python/sglang/lang/backend/openai.py, SDK-free: plain urllib
against any OpenAI-compatible server (api.openai.com, a vLLM/sglang gateway,
or this framework's own /v1 routes). Chat models flatten the program text
into a single user message; completion models pass it through. select() on
completion models scores each choice via `echo` + `logprobs` (the legacy
completions logprob surface); chat models raise — the API exposes no way to
score a fixed continuation.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Any, Dict, List, Optional


class OpenAI:
    def __init__(
        self,
        model: str,
        base_url: str = "https://api.openai.com/v1",
        api_key: Optional[str] = None,
        is_chat_model: Optional[bool] = None,
        timeout: float = 600.0,
    ):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.timeout = timeout
        if is_chat_model is None:
            # Completion-style markers win over the family name, so e.g.
            # gpt-3.5-turbo-instruct routes to /completions (reference
            # lang/backend/openai.py model tables).
            is_chat_model = not any(
                t in model for t in ("instruct", "davinci", "babbage")
            )
        self.is_chat_model = is_chat_model

    def _post(self, path: str, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    @staticmethod
    def _sp_to_openai(sp: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if "max_new_tokens" in sp:
            out["max_tokens"] = sp["max_new_tokens"]
        for k in ("temperature", "top_p", "stop"):
            if k in sp:
                out[k] = sp[k]
        return out

    def generate(self, prompt=None, sampling_params=None, **_):
        sp = self._sp_to_openai(sampling_params or {})
        if self.is_chat_model:
            body = {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt or ""}],
                **sp,
            }
            out = self._post("/chat/completions", body)
            text = out["choices"][0]["message"]["content"]
        else:
            body = {"model": self.model, "prompt": prompt or "", **sp}
            out = self._post("/completions", body)
            text = out["choices"][0]["text"]
        return {"text": text, "meta_info": out.get("usage", {})}

    def select(self, prompt: str, choices: List[str]) -> str:
        """Completion models: echo+logprobs scoring, token-length normalized
        (reference openai.py select)."""
        if self.is_chat_model:
            raise NotImplementedError(
                "select() needs continuation scoring; the chat completions "
                "API cannot echo prompt logprobs — use a completion model "
                "or a RuntimeEndpoint"
            )
        scores = []
        for c in choices:
            out = self._post(
                "/completions",
                {
                    "model": self.model,
                    "prompt": prompt + c,
                    "max_tokens": 0,
                    "echo": True,
                    "logprobs": 0,
                },
            )
            lps = out["choices"][0]["logprobs"]["token_logprobs"]
            offs = out["choices"][0]["logprobs"]["text_offset"]
            span = [
                lp
                for lp, off in zip(lps, offs)
                if lp is not None and off >= len(prompt)
            ] or [lp for lp in lps if lp is not None][-1:]
            scores.append(sum(span) / max(len(span), 1))
        return choices[max(range(len(choices)), key=lambda i: scores[i])]
