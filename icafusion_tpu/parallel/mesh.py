"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
DDP/NCCL stack (SURVEY §2.8, §5.8; reference train.py:567-573, :232-235).

Single-controller SPMD: devices form a Mesh(('data',)); the train/eval step is jitted
with the batch sharded over 'data' and params replicated. Gradient all-reduce becomes
a compiler-inserted psum over ICI — there is no user-visible communication code. On
multi-host pods, call jax.distributed.initialize() first and the same program spans
slices over DCN; rank-0-only side effects map to jax.process_index() == 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh; all other dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicate_tree(tree, mesh: Mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of batch-major arrays with the leading dim sharded over
    the mesh (host->device scatter; the TPU-native .to(device))."""
    s = batch_sharding(mesh, axis)
    return jax.device_put(batch, s)
