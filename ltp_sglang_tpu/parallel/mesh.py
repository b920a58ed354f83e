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
