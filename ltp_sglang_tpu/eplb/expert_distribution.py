"""Expert distribution recording.

Counterpart of eplb/expert_distribution.py (ExpertDistributionRecorder:40).
TPU design: per-expert token counts are computed IN-PROGRAM (a one-hot sum
over the routing indices — a few VPU ops) and streamed to the host through
an ordered jax.debug.callback. Layer attribution uses the callback arrival
order (the engine loop is single-threaded and MoE layers fire in scan
order), cycling over the model's MoE layer count.

Recording is a TRACE-TIME flag: flipping it invalidates the runner's jit
cache (the engine's start/stop endpoints clear it), matching the reference's
"not for steady-state serving" stance for detailed capture modes.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class ExpertDistributionRecorder:
    _instance: Optional["ExpertDistributionRecorder"] = None

    def __init__(self):
        self.enabled = False
        self.num_moe_layers = 0
        self.num_experts = 0
        self._counts: Optional[np.ndarray] = None  # [L_moe, E] int64
        self._cursor = 0
        self._lock = threading.Lock()

    @classmethod
    def instance(cls) -> "ExpertDistributionRecorder":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    # ----------------------------------------------------------- lifecycle
    def start(self, num_moe_layers: int, num_experts: int):
        with self._lock:
            self.num_moe_layers = num_moe_layers
            self.num_experts = num_experts
            self._counts = np.zeros((num_moe_layers, num_experts), np.int64)
            self._cursor = 0
            self.enabled = True

    def stop(self):
        with self._lock:
            self.enabled = False

    def reset(self):
        with self._lock:
            if self._counts is not None:
                self._counts[:] = 0
            self._cursor = 0

    def dump(self) -> Optional[np.ndarray]:
        with self._lock:
            return None if self._counts is None else self._counts.copy()

    # ------------------------------------------------------------- capture
    def _accumulate(self, layer, counts):
        with self._lock:
            if self._counts is None:
                return
            c = np.asarray(counts, np.int64)
            row = self._counts[int(layer) % self.num_moe_layers]
            if c.shape != row.shape:
                # A raising host callback aborts the whole multi-device
                # runtime — never let a width mismatch (e.g. a stale program
                # traced against a different expert count) become fatal. But
                # silently dropped counts skew the next rebalance, so warn
                # (rate-limited) with both shapes so persistent mismatches
                # are visible.
                self._mismatch_warns = getattr(self, "_mismatch_warns", 0) + 1
                if self._mismatch_warns <= 3 or self._mismatch_warns % 1000 == 0:
                    logger.warning(
                        "expert-distribution width mismatch #%d: recorded %s "
                        "vs table row %s; excess counts dropped",
                        self._mismatch_warns, c.shape, row.shape,
                    )
                n = min(c.shape[0], row.shape[0])
                row[:n] += c[:n]
                return
            row += c

    def record_in_program(self, indices, num_experts: int, valid=None,
                          layer_tag=None):
        """Called from the traced MoE path with routing indices [T, k];
        `valid` [T] masks bucket-padding tokens out of the counts and
        `layer_tag` (a traced per-layer scalar, installed by EPLBManager at
        record start) attributes the counts — unordered callbacks are the
        only kind supported on multi-device programs."""
        if not self.enabled or layer_tag is None:
            return
        import jax
        import jax.numpy as jnp

        T, k = indices.shape
        flat = indices.reshape(-1)
        hot = (
            flat[:, None] == jnp.arange(num_experts, dtype=flat.dtype)[None, :]
        )
        if valid is not None:
            hot = hot & jnp.repeat(valid.reshape(-1), k)[:, None]
        counts = jnp.sum(hot, axis=0, dtype=jnp.int32)
        jax.debug.callback(self._accumulate, layer_tag, counts)


recorder = ExpertDistributionRecorder.instance()
