"""Device mesh construction and sharding helpers.

The TPU replacement for the reference's distributed/parallel_state.py
(GroupCoordinator + NCCL groups, :173-1419): instead of one process per device
with explicit collectives, one controller builds a `jax.sharding.Mesh` with
named axes ("dp", "tp") — expert parallelism reuses axes via submeshes — and
annotates arrays with PartitionSpecs. XLA emits the psum/all-gather over ICI
that the reference issues through pynccl/custom allreduce.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh
    dp_size: int
    tp_size: int
    pp_size: int = 1

    def sharding(self, spec: PartitionSpec) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, PartitionSpec())

    @property
    def is_single_device(self) -> bool:
        return self.mesh.devices.size == 1


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    devices=None,
) -> MeshContext:
    devices = devices if devices is not None else jax.devices()
    n = dp_size * tp_size * pp_size
    if n > len(devices):
        raise ValueError(
            f"need {n} devices (dp={dp_size} x tp={tp_size} x pp={pp_size}), "
            f"have {len(devices)}"
        )
    # pp outermost: stage hand-offs ride neighbor ICI links.
    dev_array = np.array(devices[:n]).reshape(pp_size, dp_size, tp_size)
    mesh = Mesh(dev_array, axis_names=("pp", "dp", "tp"))
    return MeshContext(mesh=mesh, dp_size=dp_size, tp_size=tp_size, pp_size=pp_size)


def adapt_specs_to_params(specs, params):
    """Align a dense spec tree with quantized param subtrees.

    Models announce projection specs as {"kernel": P(layer, k, n)}; quantized
    checkpoints replace "kernel" with packed leaves (int4: w4/scales/zeros
    [/perm]; fp8: w8/weight_scale[_blockN]; int8: w8i/weight_scale). Each
    packed leaf keeps the SAME logical (K, N) orientation as the kernel, so
    the kernel's PartitionSpec carries over directly — K-sharded leaves
    (row-parallel) divide because K/2, K/G, K/bs all share the tp factor, and
    per-leaf divisibility still falls back to replication in shard_pytree.
    GPTQ act-order `perm` ([L, K] of indices into the FULL K) is replicated.
    Without this pass a quantized multi-chip load degraded to replicating
    every weight (reference contrast: quant methods subclass the parallel
    linears, linear.py:113-1123, so sharding is never lost there)."""
    _QUANT_LEAVES = ("w4", "w8", "w8i")
    # Fused projections (fuse_quant_projections) inherit their column half's
    # spec — both are column-parallel (N-sharded), so the concat preserves it.
    _FUSED = {"qkv_proj": "q_proj", "gate_up_proj": "gate_proj"}
    if not isinstance(params, dict):
        return specs
    out = {}
    for k, v in params.items():
        s = specs.get(k) if isinstance(specs, dict) else None
        if s is None and k in _FUSED and isinstance(specs, dict):
            s = specs.get(_FUSED[k])
        if (
            isinstance(v, dict)
            and any(q in v for q in _QUANT_LEAVES)
            and isinstance(s, dict)
            and "kernel" in s
        ):
            kspec = s["kernel"]
            leaf_specs = {}
            for leaf in v:
                if leaf == "perm":
                    leaf_specs[leaf] = PartitionSpec(kspec[0], None)
                elif leaf == "weight_scale" and getattr(v[leaf], "ndim", 0) <= 1:
                    leaf_specs[leaf] = PartitionSpec(kspec[0])
                elif leaf == "bias":
                    leaf_specs[leaf] = s.get(
                        "bias", PartitionSpec(kspec[0], kspec[2])
                    )
                else:
                    leaf_specs[leaf] = kspec
            out[k] = leaf_specs
        elif (
            isinstance(v, dict)
            and any(q in v for q in _QUANT_LEAVES)
            and isinstance(s, PartitionSpec)
        ):
            # Quantized EXPERT stacks: the model announces one spec for the
            # dense [L, E, K, N] array (expert dim sharded); every quantized
            # leaf keeps the same leading (L, E) dims, so truncate/extend the
            # spec to each leaf's rank (moe.resolve_expert_weights contract).
            leaf_specs = {}
            for leaf, arr in v.items():
                nd = getattr(arr, "ndim", len(s))
                dims = list(s)[:nd] + [None] * max(0, nd - len(s))
                leaf_specs[leaf] = PartitionSpec(*dims)
            out[k] = leaf_specs
        elif isinstance(v, dict) and isinstance(s, dict):
            out[k] = adapt_specs_to_params(s, v)
        else:
            out[k] = s if s is not None else PartitionSpec()
    return out


def shard_pytree(params, specs, mesh_ctx: Optional[MeshContext]):
    """Place a param pytree with NamedShardings (or leave as-is if no mesh).

    Leaves whose shape does not divide the announced spec fall back to
    replication, and a specs tree whose structure does not match the params
    (e.g. a quantized checkpoint with extra packed leaves) degrades to
    replicating everything with a warning instead of hard-failing.
    """
    if mesh_ctx is None or mesh_ctx.is_single_device:
        return params

    def place(x, spec: PartitionSpec):
        try:
            for dim, names in enumerate(spec):
                if names is None:
                    continue
                axes = names if isinstance(names, tuple) else (names,)
                n = int(np.prod([mesh_ctx.mesh.shape[a] for a in axes]))
                if dim >= x.ndim or x.shape[dim] % n != 0:
                    spec = PartitionSpec()
                    break
            return jax.device_put(x, mesh_ctx.sharding(spec))
        except Exception:
            return jax.device_put(x, mesh_ctx.replicated())

    try:
        return jax.tree.map(place, params, specs)
    except ValueError:
        logger.warning(
            "param spec tree does not match params; replicating all leaves"
        )
        return jax.tree.map(lambda x: jax.device_put(x, mesh_ctx.replicated()), params)
