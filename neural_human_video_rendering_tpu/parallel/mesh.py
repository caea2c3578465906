"""Device mesh + sharding helpers (data-parallel scale-out over ICI).

The reference's entire parallelism story is single-host
``torch.nn.DataParallel`` that its launchers never even exercise
(SURVEY.md §2 "Parallelism"; reference: pretrainTrans.sh:4). The TPU-native
replacement: one ``jax.sharding.Mesh`` with a ``data`` axis, batches sharded
over it, parameters/optimizer state replicated, and gradient psums inserted
by XLA when the jitted train step's out-shardings are replicated. This
scales the same code from 1 chip to a pod slice — collectives ride ICI, and
multi-slice runs ride DCN with no code change (single-controller JAX).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_multihost(mesh: Mesh) -> bool:
    """True when the mesh spans devices this process cannot address."""
    if jax.process_count() <= 1:
        return False
    local = set(jax.local_devices())
    return any(d not in local for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Put a host batch on the mesh with its leading dim sharded over `data`.

    Single-host: plain device_put. Multi-host: each process holds only ITS
    slice of the global batch (the BatchLoader's per-process dataset shard),
    so assemble the global array from process-local data — device_put would
    crash on non-addressable devices (ADVICE r1 #1).
    """
    sh = batch_sharding(mesh)
    if _is_multihost(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a PyTree over every mesh device. Multi-host: every process
    passes the same full value (same seed -> same init), assembled into one
    globally-replicated array per leaf."""
    sh = replicated_sharding(mesh)
    if _is_multihost(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
