"""Batched sampling tensors assembled per ScheduleBatch.

Counterpart of sampling/sampling_batch_info.py:22-350: padded per-request
temperature/top_p/top_k/min_p arrays plus grammar vocab masks and logit bias,
with filter/merge mirroring batch membership changes. Host-side numpy; the
ModelRunner ships them to device with the forward batch.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ltp_sglang_tpu.sampling.sampling_params import TOP_K_ALL


@dataclasses.dataclass
class SamplingBatchInfo:
    temperatures: np.ndarray  # [B] float32
    top_ps: np.ndarray  # [B] float32
    top_ks: np.ndarray  # [B] int32
    min_ps: np.ndarray  # [B] float32
    is_all_greedy: bool
    need_min_p: bool
    vocab_size: int
    # Grammar constraint: per-request grammar objects fill a vocab mask each
    # step (constrained/ base_grammar_backend contract).
    grammars: Optional[List] = None
    logit_bias: Optional[np.ndarray] = None  # [B, V] float32 or None

    @classmethod
    def from_reqs(cls, reqs, vocab_size: int) -> "SamplingBatchInfo":
        n = len(reqs)
        temperatures = np.array(
            [r.sampling_params.temperature for r in reqs], dtype=np.float32
        )
        top_ps = np.array([r.sampling_params.top_p for r in reqs], dtype=np.float32)
        top_ks = np.array(
            [min(r.sampling_params.effective_top_k(), vocab_size) for r in reqs],
            dtype=np.int32,
        )
        min_ps = np.array([r.sampling_params.min_p for r in reqs], dtype=np.float32)
        grammars = [getattr(r, "grammar", None) for r in reqs]
        if not any(g is not None for g in grammars):
            grammars = None

        logit_bias = None
        for i, r in enumerate(reqs):
            lb = r.sampling_params.logit_bias
            if lb:
                if logit_bias is None:
                    logit_bias = np.zeros((n, vocab_size), dtype=np.float32)
                for tok, bias in lb.items():
                    t = int(tok)
                    if 0 <= t < vocab_size:
                        logit_bias[i, t] = bias

        return cls(
            temperatures=temperatures,
            top_ps=top_ps,
            top_ks=top_ks,
            min_ps=min_ps,
            is_all_greedy=bool(np.all(top_ks == 1)),
            need_min_p=bool(np.any(min_ps > 0)),
            vocab_size=vocab_size,
            grammars=grammars,
            logit_bias=logit_bias,
        )

    def __len__(self):
        return len(self.temperatures)

    def filter_batch(self, keep_indices: np.ndarray):
        self.temperatures = self.temperatures[keep_indices]
        self.top_ps = self.top_ps[keep_indices]
        self.top_ks = self.top_ks[keep_indices]
        self.min_ps = self.min_ps[keep_indices]
        if self.grammars is not None:
            self.grammars = [self.grammars[i] for i in keep_indices]
        if self.logit_bias is not None:
            self.logit_bias = self.logit_bias[keep_indices]
        self.is_all_greedy = bool(np.all(self.top_ks == 1))
        self.need_min_p = bool(np.any(self.min_ps > 0))

    def merge_batch(self, other: "SamplingBatchInfo"):
        self.temperatures = np.concatenate([self.temperatures, other.temperatures])
        self.top_ps = np.concatenate([self.top_ps, other.top_ps])
        self.top_ks = np.concatenate([self.top_ks, other.top_ks])
        self.min_ps = np.concatenate([self.min_ps, other.min_ps])
        if self.grammars is not None or other.grammars is not None:
            n_self = len(self.top_ps) - len(other.top_ps)  # top_ps already merged
            mine = self.grammars or [None] * n_self
            theirs = other.grammars or [None] * len(other.top_ps)
            self.grammars = mine + theirs
        if self.logit_bias is not None or other.logit_bias is not None:
            n_self = len(self.top_ps) - len(other.top_ps)
            lb_self = (
                self.logit_bias
                if self.logit_bias is not None
                else np.zeros((n_self, self.vocab_size), dtype=np.float32)
            )
            lb_other = (
                other.logit_bias
                if other.logit_bias is not None
                else np.zeros((len(other.top_ps), self.vocab_size), dtype=np.float32)
            )
            self.logit_bias = np.concatenate([lb_self, lb_other])
        self.is_all_greedy = self.is_all_greedy and other.is_all_greedy
        self.need_min_p = self.need_min_p or other.need_min_p

    def padded(self, bucket_size: int) -> "SamplingBatchInfo":
        """Pad to the batch bucket with greedy rows."""
        n = len(self.temperatures)
        pad = bucket_size - n
        if pad == 0:
            return self
        return SamplingBatchInfo(
            temperatures=np.pad(self.temperatures, (0, pad), constant_values=1.0),
            top_ps=np.pad(self.top_ps, (0, pad), constant_values=1.0),
            top_ks=np.pad(self.top_ks, (0, pad), constant_values=1),
            min_ps=np.pad(self.min_ps, (0, pad), constant_values=0.0),
            is_all_greedy=self.is_all_greedy,
            need_min_p=self.need_min_p,
            vocab_size=self.vocab_size,
            grammars=None,
            logit_bias=(
                np.pad(self.logit_bias, ((0, pad), (0, 0)))
                if self.logit_bias is not None
                else None
            ),
        )
