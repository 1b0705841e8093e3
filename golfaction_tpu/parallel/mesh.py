"""Device-mesh construction and sharding helpers (SURVEY.md §2 parallelism).

The reference is single-device (SURVEY.md: one workstation, no distributed
code anywhere); the build scales the same workloads over TPU slices the
JAX-native way: one `Mesh` with a `data` axis (clips/batch sharded) and a
reserved `model` axis, `NamedSharding` annotations, and XLA-inserted
collectives over ICI (no NCCL/MPI analogue needed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from golfaction_tpu.config import MeshConfig


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    data_parallel = -1 means "all devices / model_parallel".
    """
    devices = list(devices if devices is not None else jax.devices())
    mp = max(cfg.model_parallel, 1)
    dp = cfg.data_parallel
    if dp == -1:
        dp = len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(
            f"mesh {dp}x{mp} needs {dp * mp} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put every array in a batch pytree with its batch axis sharded."""
    sh = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
