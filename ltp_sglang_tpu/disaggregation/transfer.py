"""KV page export/import between engines (the PD data plane).

TPU-native PD design (SURVEY §7.7): the prefill engine's computed pages are
exported as (tokens, K rows, V rows) and imported into the decode engine's
pool + RADIX TREE, so the decode engine's normal admission path finds the
whole prompt as a cached prefix — continuation needs no special batch type
(the reference instead patches requests into the decode loop with metadata
buffers; the radix-migration formulation is simpler and reuses every existing
invariant). Replaces csrc/kvcacheio/transfer_kv_* page gather/scatter.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def export_kv(engine, token_ids: List[int]) -> Dict[str, Any]:
    """Gather KV rows for a cached token sequence from the engine's pool."""
    sched = engine.scheduler
    match = sched.tree_cache.match_prefix(list(token_ids))
    slots = np.asarray(match.device_indices)
    if len(slots) == 0:
        raise ValueError("tokens not present in prefill engine cache")
    r = engine.model_runner
    k_rows = np.asarray(r.k_cache[:, slots])  # [L, n, rk, lnk]
    v_rows = np.asarray(r.v_cache[:, slots])
    return {
        "tokens": list(token_ids[: len(slots)]),
        "k_rows": k_rows,
        "v_rows": v_rows,
    }


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _write_rows(kc, vc, slots, k_rows, v_rows):
    kc = kc.at[:, slots].set(k_rows.astype(kc.dtype))
    vc = vc.at[:, slots].set(v_rows.astype(vc.dtype))
    return kc, vc


def import_kv(engine, payload: Dict[str, Any]) -> int:
    """Install transferred pages into this engine's pool + radix tree.
    Returns the number of imported tokens."""
    tokens = payload["tokens"]
    n = len(tokens)
    sched = engine.scheduler
    r = engine.model_runner
    alloc = sched.token_to_kv_pool_allocator

    slots = alloc.alloc(n)
    if slots is None:
        sched.tree_cache.evict(n)
        slots = alloc.alloc(n)
    if slots is None:
        raise RuntimeError("decode engine KV pool exhausted during PD import")
    slots = np.asarray(slots, dtype=np.int32)

    r.k_cache, r.v_cache = _write_rows(
        r.k_cache, r.v_cache, jnp.asarray(slots),
        jnp.asarray(payload["k_rows"]), jnp.asarray(payload["v_rows"]),
    )
    dup = sched.tree_cache.insert(tokens, slots)
    if dup > 0:
        # Already-present prefix: free our duplicate copies.
        alloc.free(slots[:dup])
    return n
