"""Serializable per-request custom logit processors.

Reference surface: srt/sampling/custom_logit_processor.py — a request ships a
dill-serialized `CustomLogitProcessor` subclass (base64 text) plus
`sampling_params.custom_params`; the sampler calls the processor on the
pre-sampling logits of the rows that requested it, grouping rows that share
the same serialized processor into one batched call.

TPU redesign: the jitted decode step cannot call arbitrary Python, so rows
with a processor take the host sampling path — the step returns the
post-penalty/bias/mask logits (`return_logits`), the processor runs on host
numpy, and the token is re-sampled on host with the request's
temperature/top-k/top-p (scheduler._apply_custom_processors). The scheduler
also forces decode-window K=1 for these batches, exactly like the score API's
per-step label logprobs. Gated by --enable-custom-logit-processor; requests
that set the field while the flag is off are rejected loudly at submit time
(reference tokenizer_manager validation).
"""

from __future__ import annotations

import base64
from abc import ABC, abstractmethod
from functools import lru_cache
from typing import Any, Dict, List, Optional

import numpy as np


class CustomLogitProcessor(ABC):
    """Subclass and implement __call__; ship with `.to_str()`.

    __call__ receives the logits rows [N, V] (float32 numpy, after penalties
    / logit_bias / grammar mask) of the N requests in this batch that share
    this processor, plus their `custom_params` dicts (None when the request
    set none), and returns the processed [N, V] rows.
    """

    @abstractmethod
    def __call__(
        self, logits: np.ndarray, custom_param_list: List[Optional[Dict[str, Any]]]
    ) -> np.ndarray:
        ...

    def to_str(self) -> str:
        """Serialize the CLASS (reference uses dill the same way) to a
        base64 string suitable for the `custom_logit_processor` field."""
        import dill

        return base64.b64encode(dill.dumps(type(self))).decode()


@lru_cache(maxsize=64)
def _from_str_cached(serialized: str):
    import dill

    cls = dill.loads(base64.b64decode(serialized))
    return cls()


def deserialize_processor(serialized: str) -> CustomLogitProcessor:
    """base64(dill(class)) -> instance; cached so repeated requests with the
    same processor reuse one instance (reference from_str lru_cache)."""
    proc = _from_str_cached(serialized)
    if not callable(proc):
        raise ValueError("custom_logit_processor must deserialize to a callable")
    return proc


def host_sample_row(
    row: np.ndarray,
    temperature: float,
    top_k: int,
    top_p: float,
    min_p: float,
    rng: np.random.Generator,
) -> int:
    """Host-side sampler mirroring ops/sampling semantics for one row:
    greedy when temperature ~ 0, else top-k -> top-p -> min-p filtered
    categorical sampling."""
    row = row.astype(np.float64)
    if temperature < 1e-5:
        return int(np.argmax(row))
    row = row / max(temperature, 1e-5)
    V = row.shape[0]
    if top_k and 0 < top_k < V:
        kth = np.partition(row, V - top_k)[V - top_k]
        row = np.where(row < kth, -np.inf, row)
    probs = np.exp(row - row.max())
    probs = probs / probs.sum()
    if 0.0 < top_p < 1.0:
        order = np.argsort(-probs)
        csum = np.cumsum(probs[order])
        keep_sorted = csum - probs[order] < top_p  # always keep the top token
        keep = np.zeros(V, bool)
        keep[order] = keep_sorted
        probs = np.where(keep, probs, 0.0)
        probs = probs / probs.sum()
    if min_p > 0.0:
        probs = np.where(probs < min_p * probs.max(), 0.0, probs)
        probs = probs / probs.sum()
    return int(rng.choice(V, p=probs))
