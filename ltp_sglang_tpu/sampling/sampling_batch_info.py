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
    # Penalties (penaltylib): set when any request uses them; the scheduler
    # then runs single-step decode and ships count/seen tensors per step.
    frequency_penalties: Optional[np.ndarray] = None  # [B]
    presence_penalties: Optional[np.ndarray] = None  # [B]
    repetition_penalties: Optional[np.ndarray] = None  # [B]
    has_penalties: bool = False
    # Per-step tensors built by build_penalty_tensors (not filtered/merged).
    output_counts: Optional[np.ndarray] = None  # [B, V] float32
    seen_mask: Optional[np.ndarray] = None  # [B, V] bool

    @property
    def sampler_kind(self) -> str:
        """Which device sampler variant this batch needs (jit-cache key)."""
        from ltp_sglang_tpu.ops.sampling import TOP_K_WINDOW

        if self.is_all_greedy:
            return "greedy"
        if bool(np.all(self.top_ks <= TOP_K_WINDOW)):
            return "window"
        unrestricted = (self.top_ps >= 1.0) & (self.min_ps <= 0.0)
        if bool(np.all(unrestricted | (self.top_ks == 1))):
            return "free"
        return "full_sort"

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

        freq = np.array(
            [r.sampling_params.frequency_penalty for r in reqs], dtype=np.float32
        )
        pres = np.array(
            [r.sampling_params.presence_penalty for r in reqs], dtype=np.float32
        )
        rep = np.array(
            [r.sampling_params.repetition_penalty for r in reqs], dtype=np.float32
        )
        has_penalties = bool(
            np.any(freq != 0.0) or np.any(pres != 0.0) or np.any(rep != 1.0)
        )

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
            frequency_penalties=freq,
            presence_penalties=pres,
            repetition_penalties=rep,
            has_penalties=has_penalties,
        )

    def build_vocab_mask(self, reqs, bucket_size: int):
        """[B, V] bool (True = forbidden) from per-request grammars, or None
        when no request is constrained (sampling_batch_info.py:171-223)."""
        grams = [getattr(r, "grammar", None) for r in reqs]
        if not any(g is not None for g in grams):
            return None
        mask = np.zeros((bucket_size, self.vocab_size), dtype=bool)
        for i, g in enumerate(grams):
            if g is not None:
                g.fill_vocab_mask(mask[i])
        return mask

    def build_penalty_tensors(self, reqs, bucket_size: int):
        """[B, V] per-step tensors for apply_penalties (padded)."""
        B, V = bucket_size, self.vocab_size
        counts = np.zeros((B, V), dtype=np.float32)
        seen = np.zeros((B, V), dtype=bool)
        for i, r in enumerate(reqs):
            if r.output_ids:
                out = np.asarray(r.output_ids, dtype=np.int64)
                np.add.at(counts[i], out, 1.0)
                seen[i, out] = True
            if r.origin_input_ids:
                seen[i, np.asarray(r.origin_input_ids, dtype=np.int64)] = True
        self.output_counts = counts
        self.seen_mask = seen

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
        if self.frequency_penalties is not None:
            self.frequency_penalties = self.frequency_penalties[keep_indices]
            self.presence_penalties = self.presence_penalties[keep_indices]
            self.repetition_penalties = self.repetition_penalties[keep_indices]
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
        if self.frequency_penalties is not None and other.frequency_penalties is not None:
            self.frequency_penalties = np.concatenate(
                [self.frequency_penalties, other.frequency_penalties]
            )
            self.presence_penalties = np.concatenate(
                [self.presence_penalties, other.presence_penalties]
            )
            self.repetition_penalties = np.concatenate(
                [self.repetition_penalties, other.repetition_penalties]
            )
        self.is_all_greedy = self.is_all_greedy and other.is_all_greedy
        self.need_min_p = self.need_min_p or other.need_min_p
        self.has_penalties = self.has_penalties or other.has_penalties

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
            frequency_penalties=(
                np.pad(self.frequency_penalties, (0, pad))
                if self.frequency_penalties is not None
                else None
            ),
            presence_penalties=(
                np.pad(self.presence_penalties, (0, pad))
                if self.presence_penalties is not None
                else None
            ),
            repetition_penalties=(
                np.pad(self.repetition_penalties, (0, pad), constant_values=1.0)
                if self.repetition_penalties is not None
                else None
            ),
            has_penalties=self.has_penalties,
        )
