"""DSL backends.

Counterpart of python/sglang/lang/backend/: programs run against either a
local in-process Engine (pass the Engine itself — it already has the
`generate` contract) or a remote server via RuntimeEndpoint (the HTTP
/generate client). Kept dependency-light: plain urllib, blocking calls —
run_batch/run_forks supply the concurrency."""

from __future__ import annotations

import base64
import json
import urllib.request
from typing import Any, Dict, List, Optional


class RuntimeEndpoint:
    """HTTP backend for @function programs (lang/backend/runtime_endpoint.py)."""

    def __init__(self, base_url: str, api_key: Optional[str] = None,
                 timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def _post(self, path: str, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {self.api_key}"}
                   if self.api_key else {}),
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    @staticmethod
    def _encode_images(images: List[Any]) -> List[str]:
        out = []
        for im in images:
            if isinstance(im, str):
                out.append(im)  # path / base64 / data URI pass through
            elif isinstance(im, (bytes, bytearray)):
                out.append(base64.b64encode(im).decode())
            else:
                import io

                import numpy as np
                from PIL import Image as PILImage

                buf = io.BytesIO()
                PILImage.fromarray(np.asarray(im)).save(buf, format="PNG")
                out.append(base64.b64encode(buf.getvalue()).decode())
        return out

    def generate(self, prompt=None, sampling_params=None, input_ids=None,
                 image_data=None, return_logprob=False, logprob_start_len=-1,
                 top_logprobs_num=0, **_):
        body: Dict[str, Any] = {"sampling_params": sampling_params or {}}
        if prompt is not None:
            body["text"] = prompt
        if input_ids is not None:
            body["input_ids"] = input_ids
        if image_data:
            body["image_data"] = self._encode_images(list(image_data))
        if return_logprob:
            body["return_logprob"] = True
            body["logprob_start_len"] = int(logprob_start_len)
            body["top_logprobs_num"] = int(top_logprobs_num)
        return self._post("/generate", body)

    def get_server_info(self) -> Dict[str, Any]:
        with urllib.request.urlopen(
            self.base_url + "/get_server_info", timeout=self.timeout
        ) as r:
            return json.loads(r.read())
