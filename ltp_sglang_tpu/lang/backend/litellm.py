"""LiteLLM third-party backend for @function programs.

Counterpart of python/sglang/lang/backend/litellm.py. LiteLLM proxies an
OpenAI-compatible surface for ~100 providers, so this backend is the OpenAI
backend pointed at a LiteLLM proxy (`LITELLM_BASE_URL`, default the local
proxy port) — when the `litellm` package itself is installed, its in-process
`completion()` is used instead.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ltp_sglang_tpu.lang.backend.openai import OpenAI


class LiteLLM(OpenAI):
    def __init__(
        self,
        model: str,
        base_url: Optional[str] = None,
        api_key: Optional[str] = None,
        timeout: float = 600.0,
        **kwargs,
    ):
        try:
            import litellm  # noqa: F401

            self._litellm = litellm
        except ImportError:
            self._litellm = None
        super().__init__(
            model,
            base_url=base_url
            or os.environ.get("LITELLM_BASE_URL", "http://localhost:4000/v1"),
            api_key=api_key or os.environ.get("LITELLM_API_KEY", ""),
            is_chat_model=kwargs.pop("is_chat_model", True),
            timeout=timeout,
        )

    def generate(self, prompt=None, sampling_params=None, **kw):
        if self._litellm is None:
            return super().generate(prompt=prompt, sampling_params=sampling_params, **kw)
        sp = sampling_params or {}
        out = self._litellm.completion(
            model=self.model,
            messages=[{"role": "user", "content": prompt or ""}],
            max_tokens=sp.get("max_new_tokens", 128),
            temperature=sp.get("temperature", 1.0),
        )
        return {
            "text": out["choices"][0]["message"]["content"],
            "meta_info": dict(out.get("usage") or {}),
        }

    def select(self, prompt: str, choices: List[str]) -> str:
        if self._litellm is None:
            return super().select(prompt, choices)
        instr = (
            prompt
            + "\n\nAnswer with exactly one of the following options, verbatim: "
            + " | ".join(choices)
        )
        text = self.generate(
            prompt=instr,
            sampling_params={"max_new_tokens": 32, "temperature": 0.0},
        )["text"].strip()
        for c in choices:
            if c in text:
                return c
        return choices[0]
