"""Expert-parallel load balancing (EPLB).

Counterpart of eplb/eplb_manager.py:16 + eplb_algorithms/. The reference
replicates hot experts onto redundant physical slots; this TPU EP design
keeps one copy per expert (moe_ffn_ep shards contiguous expert blocks per
chip), so rebalancing is a PERMUTATION of logical experts onto physical
slots that equalizes per-chip load — greedy LPT bin packing per layer.

Applying a rebalance permutes the stacked expert weights along E (a one-time
sharded gather; XLA moves the rows over ICI) and installs an
`expert_perm [L, E]` leaf in the layer params: the MoE path maps logical
routing indices to physical slots with one take per layer. Outputs are
exactly permutation-invariant, so serving results do not change — only the
per-chip token balance does.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def rebalance_experts(counts: np.ndarray, ep_size: int) -> Tuple[np.ndarray, Dict]:
    """counts [L, E] -> perm [L, E] (logical -> physical slot) via greedy
    LPT: heaviest experts first, each into the least-loaded rank with free
    slots. Returns (perm, stats)."""
    L, E = counts.shape
    assert E % ep_size == 0, (E, ep_size)
    cap = E // ep_size
    perm = np.zeros((L, E), np.int64)
    imb_before = np.zeros(L)
    imb_after = np.zeros(L)
    for li in range(L):
        c = counts[li].astype(np.float64)
        order = np.argsort(-c)  # heaviest first
        load = np.zeros(ep_size)
        used = np.zeros(ep_size, np.int64)
        for e in order:
            free = np.flatnonzero(used < cap)
            r = free[np.argmin(load[free])]
            perm[li, e] = r * cap + used[r]
            used[r] += 1
            load[r] += c[e]
        naive = c.reshape(ep_size, cap).sum(axis=1)
        mean = max(c.sum() / ep_size, 1e-9)
        imb_before[li] = naive.max() / mean
        imb_after[li] = load.max() / mean
    stats = {
        "imbalance_before": float(imb_before.mean()),
        "imbalance_after": float(imb_after.mean()),
    }
    return perm, stats


class EPLBManager:
    def __init__(self, engine):
        self.engine = engine
        self.runner = engine.model_runner

    def _moe_layers(self) -> Optional[Dict]:
        """The layer-param dict holding stacked expert leaves (deepseek
        splits dense/moe layer stacks; llama-family MoEs keep one)."""
        p = self.runner.params
        for key in ("layers_moe", "layers"):
            d = p.get(key)
            if isinstance(d, dict) and "experts_gate" in d:
                return d
        return None

    def _moe_meta(self) -> Optional[Tuple[int, int]]:
        layers = self._moe_layers()
        if layers is None:
            return None
        w = layers["experts_gate"]
        return w.shape[0], w.shape[1]

    def start_record(self) -> bool:
        import jax.numpy as jnp

        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        meta = self._moe_meta()
        if meta is None:
            return False
        n_layers, E = meta
        with self.engine._loop_lock:
            # Per-layer tag leaf: rides the layer scan so unordered capture
            # callbacks (the only multi-device-safe kind) know their layer.
            layers = self._moe_layers()
            layers["moe_layer_idx"] = self._replicated(
                jnp.arange(n_layers, dtype=jnp.int32)
            )
            recorder.start(n_layers, E)
            self.runner._step_cache.clear()  # recording is a trace-time flag
        return True

    def stop_record(self):
        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        with self.engine._loop_lock:
            recorder.stop()
            layers = self._moe_layers()
            if layers is not None:
                layers.pop("moe_layer_idx", None)
            self.runner._step_cache.clear()

    def _replicated(self, arr):
        mesh_ctx = self.runner.mesh_ctx
        if mesh_ctx is not None and not mesh_ctx.is_single_device:
            import jax

            return jax.device_put(arr, mesh_ctx.replicated())
        return arr

    def dump_record(self):
        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        return recorder.dump()

    def rebalance(self, ep_size: Optional[int] = None) -> Optional[Dict]:
        """Compute + apply a placement from the recorded distribution.
        Returns the balance stats, or None if nothing to do."""
        import jax.numpy as jnp

        counts = self.dump_record()
        meta = self._moe_meta()
        if counts is None or meta is None or counts.sum() == 0:
            return None
        mesh_ctx = self.runner.mesh_ctx
        if ep_size is None:
            ep_size = mesh_ctx.tp_size if mesh_ctx is not None else 1
        E = counts.shape[1]
        if ep_size <= 1 or E % ep_size:
            return None
        with self.engine._loop_lock:  # params swap races with steps
            # Counts are recorded on LOGICAL expert ids (moe_topk runs before
            # the perm map), so `perm` is the logical -> physical placement.
            perm, stats = rebalance_experts(counts, ep_size)
            layers = self._moe_layers()
            old_perm = layers.get("expert_perm")
            perm_logical = perm
            # Weight rows currently sit at the OLD physical slots; the new
            # row p' holds logical perm_inv[p'], found at old_perm[that].
            perm_inv = np.argsort(perm, axis=1)  # physical -> logical
            if old_perm is not None:
                inv = np.take_along_axis(np.asarray(old_perm), perm_inv, axis=1)
            else:
                inv = perm_inv
            for leaf in ("experts_gate", "experts_up", "experts_down",
                         "experts_gate_up"):
                if leaf not in layers:
                    continue
                w = layers[leaf]
                idx = jnp.asarray(inv).reshape(
                    inv.shape + (1,) * (w.ndim - 2)
                )
                layers[leaf] = jnp.take_along_axis(w, idx, axis=1)
            layers["expert_perm"] = self._replicated(
                jnp.asarray(perm_logical, jnp.int32)
            )
            self.runner._step_cache.clear()  # params pytree structure changed
        logger.info(
            "EPLB rebalance applied: imbalance %.3f -> %.3f (ep=%d)",
            stats["imbalance_before"], stats["imbalance_after"], ep_size,
        )
        return stats
