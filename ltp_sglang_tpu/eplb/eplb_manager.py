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


def replicate_experts_adaptive(c: np.ndarray, n_redundant: int) -> np.ndarray:
    """Load-adaptive replica counts (reference eplb_algorithms/deepseek.py
    replicate_experts): each of the `n_redundant` extra physical slots goes
    to whichever expert currently has the highest per-replica load — hot
    experts can earn 3+ replicas while a merely-warm one gets none.
    c [E] -> n_rep [E] int, sum(n_rep) == E + n_redundant."""
    E = c.shape[0]
    n_rep = np.ones(E, np.int64)
    per = c.astype(np.float64).copy()
    for _ in range(int(n_redundant)):
        e = int(np.argmax(per))
        n_rep[e] += 1
        per[e] = c[e] / n_rep[e]
    return n_rep


def _pack_items(items, ep_size: int, cap: int, rank_base=0):
    """LPT-pack (logical_id, load) items onto `ep_size` ranks of `cap`
    slots. Returns (slots {e: [phys...]}, loads [ep_size], p2l [cap*ep])."""
    items = sorted(items, key=lambda t: -t[1])
    load = np.zeros(ep_size)
    used = np.zeros(ep_size, np.int64)
    slots: Dict[int, list] = {}
    p2l = np.zeros(ep_size * cap, np.int64)
    for e, w in items:
        free = np.flatnonzero(used < cap)
        r = free[np.argmin(load[free])]
        p = (rank_base + r) * cap + used[r]
        used[r] += 1
        load[r] += w
        slots.setdefault(e, []).append(p)
        p2l[r * cap + used[r] - 1] = e
    return slots, load, p2l


def _slots_to_table(slots: Dict[int, list], L_E: int, rcols: int) -> np.ndarray:
    """{e: [phys...]} -> [E, rcols] cyclic replica table (experts with fewer
    replicas than rcols continue the cycle, so the router's modulo column
    pick spreads traffic uniformly across each expert's true replicas;
    `rcols` is the GLOBAL max replica count across layers)."""
    table = np.zeros((L_E, rcols), np.int64)
    for e, s in slots.items():
        for j in range(rcols):
            table[e, j] = s[j % len(s)]
    return table


def rebalance_experts_redundant(
    counts: np.ndarray, ep_size: int, n_redundant: int
) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Replicated placement (reference eplb_algorithms/deepseek.py
    rebalance_experts global path, redesigned for the stacked-weight TPU
    layout): load-adaptive replica counts, then all E+R physical replicas
    LPT-packed onto ranks.

    counts [L, E] -> (replica_table [L, E, Rcols] logical -> physical
    replica slots (cyclic), phys_to_logical [L, E+R], stats)."""
    L, E = counts.shape
    R = int(n_redundant)
    assert 0 < R <= E, (R, E)
    e_phys = E + R
    assert e_phys % ep_size == 0, (e_phys, ep_size)
    cap = e_phys // ep_size
    layer_slots = []
    p2l = np.zeros((L, e_phys), np.int64)
    imb_before = np.zeros(L)
    imb_after = np.zeros(L)
    for li in range(L):
        c = counts[li].astype(np.float64)
        n_rep = replicate_experts_adaptive(c, R)
        items = [
            (e, c[e] / n_rep[e]) for e in range(E) for _ in range(n_rep[e])
        ]
        slots, load, p2l_li = _pack_items(items, ep_size, cap)
        p2l[li] = p2l_li
        layer_slots.append(slots)
        mean = max(c.sum() / ep_size, 1e-9)
        pad = (-E) % ep_size  # naive contiguous layout, zero-padded
        cp = np.concatenate([c, np.zeros(pad)])
        imb_before[li] = cp.reshape(ep_size, -1).sum(1).max() / mean
        imb_after[li] = load.max() / mean
    rcols = max(
        max(len(s) for s in slots.values()) for slots in layer_slots
    )
    table = np.stack(
        [_slots_to_table(slots, E, rcols) for slots in layer_slots]
    )
    stats = {
        "imbalance_before": float(imb_before.mean()),
        "imbalance_after": float(imb_after.mean()),
        "n_redundant": R,
        "max_replicas": int(rcols),
    }
    return table, p2l, stats


def rebalance_experts_hierarchical(
    counts: np.ndarray, ep_size: int, num_nodes: int, num_groups: int,
    n_redundant: int,
) -> Tuple[np.ndarray, np.ndarray, Dict]:
    """Hierarchical placement (reference eplb_algorithms/deepseek.py:85):
    (1) balanced-pack the expert GROUPS onto nodes — group-limited routing
    keeps a token's experts on one node so its dispatch rides the fast
    intra-node fabric (ICI here, NVLink there); (2) adaptively replicate
    each node's logical experts over the node's spare physical slots;
    (3) LPT-pack replicas onto the node's chips.

    counts [L, E] -> (replica_table [L, E, Rcols], p2l [L, E+R], stats)."""
    L, E = counts.shape
    R = int(n_redundant)
    e_phys = E + R
    assert E % num_groups == 0, (E, num_groups)
    assert num_groups % num_nodes == 0, (num_groups, num_nodes)
    assert ep_size % num_nodes == 0, (ep_size, num_nodes)
    assert e_phys % ep_size == 0, (e_phys, ep_size)
    group_size = E // num_groups
    ranks_per_node = ep_size // num_nodes
    cap = e_phys // ep_size
    slots_per_node = cap * ranks_per_node
    log_per_node = E // num_nodes
    red_per_node = slots_per_node - log_per_node
    assert red_per_node >= 0

    layer_slots = []
    p2l = np.zeros((L, e_phys), np.int64)
    imb_after = np.zeros(L)
    imb_before = np.zeros(L)
    for li in range(L):
        c = counts[li].astype(np.float64)
        gl = c.reshape(num_groups, group_size).sum(1)  # group loads
        # (1) balanced packing: heaviest group to least-loaded node with
        # room (groups_per_node fixed).
        gpn = num_groups // num_nodes
        nload = np.zeros(num_nodes)
        nused = np.zeros(num_nodes, np.int64)
        gnode = np.zeros(num_groups, np.int64)
        for g in np.argsort(-gl):
            free = np.flatnonzero(nused < gpn)
            n = free[np.argmin(nload[free])]
            gnode[g] = n
            nused[n] += 1
            nload[n] += gl[g]
        slots_all: Dict[int, list] = {}
        load_all = np.zeros(ep_size)
        for n in range(num_nodes):
            es = np.concatenate([
                np.arange(g * group_size, (g + 1) * group_size)
                for g in np.flatnonzero(gnode == n)
            ])
            cn = c[es]
            n_rep = replicate_experts_adaptive(cn, red_per_node)
            items = [
                (int(es[j]), cn[j] / n_rep[j])
                for j in range(len(es))
                for _ in range(n_rep[j])
            ]
            slots, load, _ = _pack_items(
                items, ranks_per_node, cap, rank_base=n * ranks_per_node
            )
            slots_all.update(slots)
            load_all[n * ranks_per_node : (n + 1) * ranks_per_node] = load
        for e, s in slots_all.items():
            for p in s:
                p2l[li, p] = e
        layer_slots.append(slots_all)
        mean = max(c.sum() / ep_size, 1e-9)
        pad = (-E) % ep_size
        cp = np.concatenate([c, np.zeros(pad)])
        imb_before[li] = cp.reshape(ep_size, -1).sum(1).max() / mean
        imb_after[li] = load_all.max() / mean
    rcols = max(
        max(len(s) for s in slots.values()) for slots in layer_slots
    )
    table = np.stack(
        [_slots_to_table(slots, E, rcols) for slots in layer_slots]
    )
    stats = {
        "imbalance_before": float(imb_before.mean()),
        "imbalance_after": float(imb_after.mean()),
        "n_redundant": R,
        "num_nodes": num_nodes,
        "num_groups": num_groups,
        "max_replicas": int(rcols),
    }
    return table, p2l, stats


def _phys_to_logical_from_leaf(perm_leaf, n_layers: int, E: int) -> np.ndarray:
    """Recover physical slot -> logical expert for the CURRENT weight stack
    from the installed routing leaf (1-D perm, 2-D replica table per layer,
    or None == identity)."""
    if perm_leaf is None:
        return np.tile(np.arange(E, dtype=np.int64), (n_layers, 1))
    leaf = np.asarray(perm_leaf)
    if leaf.ndim == 2:  # [L, E] permutation: logical -> physical
        return np.argsort(leaf, axis=1)
    # [L, E, Rcols] replica table.
    e_phys = int(leaf.max()) + 1
    p2l = np.zeros((n_layers, e_phys), np.int64)
    for li in range(n_layers):
        for e in range(leaf.shape[1]):
            for j in range(leaf.shape[2]):
                p2l[li, leaf[li, e, j]] = e
    return p2l


import contextlib


class EPLBManager:
    def __init__(self, engine):
        self.engine = engine
        self.runner = engine.model_runner
        self.periodic_state: Optional[Dict] = None

    def _maybe_lock(self, locked: bool):
        """The scheduler pre-step hook already runs under the engine loop
        lock (a non-reentrant Lock) — `locked=True` skips re-acquiring."""
        if locked:
            return contextlib.nullcontext()
        return self.engine._loop_lock

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
        """(n_moe_layers, n_LOGICAL_experts). Counts are recorded on router
        top-k indices, which are logical ids (moe_topk runs before the
        placement map) — so after a redundant placement the weight stacks
        have E+R physical rows but the recorder must still be E wide."""
        layers = self._moe_layers()
        if layers is None:
            return None
        w = layers["experts_gate"]
        if isinstance(w, dict):  # quantized expert stack (moe.py leaf dicts)
            w = w.get("w8i", w.get("w8"))
        leaf = layers.get("expert_perm")
        if leaf is not None and getattr(leaf, "ndim", 0) >= 2:
            return w.shape[0], leaf.shape[1]
        return w.shape[0], w.shape[1]

    def start_record(self, locked: bool = False) -> bool:
        import jax.numpy as jnp

        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        meta = self._moe_meta()
        if meta is None:
            return False
        n_layers, E = meta
        with self._maybe_lock(locked):
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

    def rebalance(self, ep_size: Optional[int] = None,
                  n_redundant: int = 0, locked: bool = False) -> Optional[Dict]:
        """Compute + apply a placement from the recorded distribution.
        `n_redundant > 0` replicates the hottest experts onto that many
        extra physical slots (the stacked expert weights grow to E+R rows;
        E+R must divide ep_size). Returns the balance stats, or None if
        nothing to do."""
        import jax.numpy as jnp

        counts = self.dump_record()
        meta = self._moe_meta()
        if counts is None or meta is None or counts.sum() == 0:
            return None
        mesh_ctx = self.runner.mesh_ctx
        if ep_size is None:
            ep_size = mesh_ctx.tp_size if mesh_ctx is not None else 1
        n_layers, E = counts.shape
        if ep_size <= 1 or (E + n_redundant) % ep_size:
            return None
        with self._maybe_lock(locked):  # params swap races with steps
            layers = self._moe_layers()
            old_leaf = layers.get("expert_perm")
            # Physical slot -> logical expert of the CURRENT weight rows;
            # `first_slot[l, e]` is a row currently holding logical e.
            old_p2l = _phys_to_logical_from_leaf(old_leaf, n_layers, E)
            order = np.argsort(old_p2l, axis=1, kind="stable")
            first_slot = np.zeros((n_layers, E), np.int64)
            for li in range(n_layers):
                srt = old_p2l[li][order[li]]
                first_slot[li] = order[li][np.searchsorted(srt, np.arange(E))]
            # Counts are recorded on LOGICAL expert ids (moe_topk runs before
            # the placement map), so placements are logical -> physical.
            if n_redundant > 0:
                table, new_p2l, stats = rebalance_experts_redundant(
                    counts, ep_size, n_redundant
                )
                new_leaf = jnp.asarray(table, jnp.int32)
            else:
                perm, stats = rebalance_experts(counts, ep_size)
                new_p2l = np.argsort(perm, axis=1)
                new_leaf = jnp.asarray(perm, jnp.int32)
            # New physical row p holds logical new_p2l[p], whose weights
            # currently live at row first_slot[new_p2l[p]].
            inv = np.take_along_axis(first_slot, new_p2l, axis=1)
            for leaf in ("experts_gate", "experts_up", "experts_down",
                         "experts_gate_up"):
                if leaf not in layers:
                    continue

                def _permute(w):
                    idx = jnp.asarray(inv).reshape(
                        inv.shape + (1,) * (w.ndim - 2)
                    )
                    return jnp.take_along_axis(w, idx, axis=1)

                w = layers[leaf]
                # Quantized stacks: permute every leaf (w8/w8i + scales all
                # share the leading [L, E] layout).
                layers[leaf] = (
                    {k2: _permute(v2) for k2, v2 in w.items()}
                    if isinstance(w, dict)
                    else _permute(w)
                )
            layers["expert_perm"] = self._replicated(new_leaf)
            self.runner._step_cache.clear()  # params pytree structure changed
        logger.info(
            "EPLB rebalance applied: imbalance %.3f -> %.3f (ep=%d, +%d)",
            stats["imbalance_before"], stats["imbalance_after"], ep_size,
            n_redundant,
        )
        return stats

    # ------------------------------------------------- periodic auto-rebalance
    @staticmethod
    def _imbalance_under(counts: np.ndarray, p2l: np.ndarray,
                         ep_size: int) -> float:
        """Mean-over-layers max/mean per-rank load of `counts` [L, E] under
        an installed placement described by `p2l` [L, P] (physical slot ->
        logical expert; traffic splits evenly across an expert's distinct
        replicas — the cyclic modulo pick is near-uniform)."""
        L, P = p2l.shape
        cap = P // ep_size
        imb = np.zeros(L)
        for li in range(L):
            n_rep = np.bincount(p2l[li], minlength=counts.shape[1])
            per = counts[li].astype(np.float64) / np.maximum(n_rep, 1)
            load = per[p2l[li]].reshape(ep_size, cap).sum(axis=1)
            imb[li] = load.max() / max(counts[li].sum() / ep_size, 1e-9)
        return float(imb.mean())

    def enable_periodic(self, every_n: int, n_redundant: int = 0,
                        min_gain: float = 0.05):
        """Periodic auto-rebalance (reference eplb/eplb_manager.py:16
        EPLBManager.on_forward_pass_end cadence): records the expert
        distribution continuously and, every `every_n` scheduler forward
        passes, computes a placement from the window's counts and applies it
        ONLY when it beats the CURRENT placement's imbalance by more than
        `min_gain` (relative) — a rebalance costs a step-cache recompile, so
        marginal gains are skipped. Runs as a scheduler pre-step hook (the
        loop lock is already held there)."""
        sched = self.engine.scheduler
        state = {"last_ct": -1, "applied": 0, "checked": 0, "every": every_n}
        self.periodic_state = state

        def hook():
            if state["last_ct"] < 0:
                if self.start_record(locked=True):
                    state["last_ct"] = sched.forward_ct
                return
            if sched.forward_ct - state["last_ct"] < every_n:
                return
            state["last_ct"] = sched.forward_ct
            state["checked"] += 1
            if self.maybe_rebalance(n_redundant=n_redundant,
                                    min_gain=min_gain, locked=True):
                state["applied"] += 1

        sched.pre_step_hooks.append(hook)

    def maybe_rebalance(self, n_redundant: int = 0, min_gain: float = 0.05,
                        locked: bool = False) -> Optional[Dict]:
        """One periodic check: apply a rebalance iff the candidate improves
        the current placement's imbalance by > min_gain. Resets the
        recording window either way."""
        from ltp_sglang_tpu.eplb.expert_distribution import recorder

        counts = self.dump_record()
        meta = self._moe_meta()
        mesh_ctx = self.runner.mesh_ctx
        ep_size = mesh_ctx.tp_size if mesh_ctx is not None else 1
        if (
            counts is None or meta is None or counts.sum() == 0
            or ep_size <= 1 or (counts.shape[1] + n_redundant) % ep_size
        ):
            return None
        n_layers, E = counts.shape
        layers = self._moe_layers()
        cur_p2l = _phys_to_logical_from_leaf(
            layers.get("expert_perm") if layers else None, n_layers, E
        )
        cur_imb = self._imbalance_under(counts, cur_p2l, ep_size)
        if n_redundant > 0:
            _, new_p2l, stats = rebalance_experts_redundant(
                counts, ep_size, n_redundant
            )
        else:
            perm, stats = rebalance_experts(counts, ep_size)
            new_p2l = np.argsort(perm, axis=1)
        cand_imb = self._imbalance_under(counts, new_p2l, ep_size)
        if cand_imb >= cur_imb * (1.0 - min_gain):
            recorder.reset()
            logger.debug(
                "EPLB periodic: skipped (cur %.3f -> cand %.3f, gain < %.2f)",
                cur_imb, cand_imb, min_gain,
            )
            return None
        out = self.rebalance(n_redundant=n_redundant, locked=locked)
        recorder.reset()
        if out is not None:
            out["imbalance_current"] = cur_imb
            out["imbalance_candidate"] = cand_imb
        return out
