"""Multi-adapter LoRA serving.

Counterpart of lora/lora_manager.py:46 + the batched shrink/expand Triton
kernels (lora/triton_ops/): adapters are stacked into [n_adapters, L, K, r]
/ [n_adapters, L, r, N] device tensors (rank-padded so heterogeneous ranks
stack), and applied per token with the same sort + lax.ragged_dot machinery
as MoE (layers/moe.py) — the TPU grouped-GEMM replacement for sgemm_lora_a/b.
Adapter id 0 is the reserved "no adapter" slot (zero weights).

Checkpoints: HF PEFT format (adapter_config.json + adapter_model.safetensors,
names base_model.model.model.layers.N.<proj>.lora_A.weight).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def lora_apply(x, ids_tok, A, B, scaling):
    """x: [T, K]; ids_tok: [T] adapter ids; A: [na, K, r]; B: [na, r, N];
    scaling: [na]. Returns delta [T, N]."""
    na = A.shape[0]
    order = jnp.argsort(ids_tok)
    x_sorted = x[order]
    group_sizes = (
        (ids_tok[None, :] == jnp.arange(na, dtype=ids_tok.dtype)[:, None])
        .sum(axis=1)
        .astype(jnp.int32)
    )
    z = jax.lax.ragged_dot(
        x_sorted, A.astype(x.dtype), group_sizes, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    y = jax.lax.ragged_dot(
        z, B.astype(x.dtype), group_sizes, preferred_element_type=jnp.float32
    )
    inv = jnp.argsort(order)
    y = y[inv]
    scale_tok = scaling[ids_tok]
    return (y * scale_tok[:, None]).astype(x.dtype)


class LoRAManager:
    def __init__(self, num_layers: int, max_adapters: int = 8):
        self.num_layers = num_layers
        self.max_adapters = max_adapters
        self.name_to_id: Dict[str, int] = {}
        self.raw: Dict[int, Dict] = {}  # id -> {target: (A [L,K,r], B [L,r,N])}
        self.scaling: List[float] = [0.0]
        self.max_rank = 1
        self.device_weights: Optional[Dict] = None  # built lazily

    # ------------------------------------------------------------- loading
    def load_adapter(self, path: str, name: Optional[str] = None) -> int:
        name = name or os.path.basename(path.rstrip("/"))
        if name in self.name_to_id:
            return self.name_to_id[name]
        if len(self.name_to_id) + 1 >= self.max_adapters:
            raise RuntimeError("max_loras_per_batch exceeded")
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        rank = cfg["r"]
        alpha = cfg.get("lora_alpha", rank)
        from safetensors import safe_open

        fn = os.path.join(path, "adapter_model.safetensors")
        tensors = {}
        with safe_open(fn, framework="flax") as f:
            for k in f.keys():
                tensors[k] = np.asarray(f.get_tensor(k), dtype=np.float32)

        per_target: Dict[str, tuple] = {}
        for tgt in TARGETS:
            As, Bs = [], []
            found = False
            for i in range(self.num_layers):
                a_key = None
                for prefix in (
                    f"base_model.model.model.layers.{i}.self_attn.{tgt}",
                    f"base_model.model.model.layers.{i}.mlp.{tgt}",
                ):
                    if f"{prefix}.lora_A.weight" in tensors:
                        a_key = prefix
                        break
                if a_key is None:
                    As, Bs = [], []
                    break
                found = True
                # PEFT: lora_A [r, K], lora_B [N, r]; delta = B @ A @ x.
                As.append(tensors[f"{a_key}.lora_A.weight"].T)  # [K, r]
                Bs.append(tensors[f"{a_key}.lora_B.weight"].T)  # [r, N]
            if found and As:
                per_target[tgt] = (np.stack(As), np.stack(Bs))

        adapter_id = len(self.scaling)
        self.name_to_id[name] = adapter_id
        self.raw[adapter_id] = per_target
        self.scaling.append(alpha / rank)
        self.max_rank = max(self.max_rank, rank)
        self.device_weights = None  # rebuild
        logger.info("loaded LoRA adapter %s (id=%d, r=%d)", name, adapter_id, rank)
        return adapter_id

    def unload_adapter(self, name: str):
        aid = self.name_to_id.pop(name, None)
        if aid is not None:
            self.raw.pop(aid, None)
            self.device_weights = None

    def resolve(self, lora_path: Optional[str]) -> int:
        if not lora_path:
            return 0
        if lora_path in self.name_to_id:
            return self.name_to_id[lora_path]
        return self.load_adapter(lora_path)

    # ------------------------------------------------------------ stacking
    def build_device_weights(self, shapes: Dict[str, tuple], dtype) -> Dict:
        """shapes: target -> (K, N) of the base projection. Returns
        {target: {"A": [L, na, K, r], "B": [L, na, r, N]}, "scaling": [na]}
        (layer-major so the model's scan-over-layers slices them)."""
        if self.device_weights is not None:
            return self.device_weights
        na = len(self.scaling)
        L, r = self.num_layers, self.max_rank
        out = {}
        for tgt, (K, N) in shapes.items():
            A = np.zeros((L, na, K, r), np.float32)
            B = np.zeros((L, na, r, N), np.float32)
            for aid, per_target in self.raw.items():
                if tgt in per_target:
                    a, b = per_target[tgt]  # [L, K, ra], [L, ra, N]
                    A[:, aid, :, : a.shape[2]] = a
                    B[:, aid, : b.shape[1], :] = b
            out[tgt] = {
                "A": jnp.asarray(A, dtype=dtype),
                "B": jnp.asarray(B, dtype=dtype),
            }
        out["scaling"] = jnp.asarray(self.scaling, jnp.float32)
        self.device_weights = out
        return out

    @property
    def has_adapters(self) -> bool:
        return len(self.scaling) > 1
