"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
DDP/NCCL stack (SURVEY §2.8, §5.8; reference train.py:567-573, :232-235).

Single-controller SPMD: devices form a Mesh(('data',)); the train/eval step is jitted
with the batch sharded over 'data' and params replicated. Gradient all-reduce becomes
a compiler-inserted psum over ICI — there is no user-visible communication code.

Multi-PROCESS (multi-host) pods: call jax.distributed.initialize() first; the mesh
then spans every process's devices and the SAME jitted program runs on all hosts
(collectives ride ICI within a slice / DCN across slices). The host-side differences
are exactly the reference's DDP contract, mapped:

- per-process dataset sharding (reference DistributedSampler, datasets.py:119)
  -> each process materializes only its contiguous row range of every global
  batch (process_batch_slice); the permutation is seed-deterministic so all
  processes agree without communication;
- global batch assembly from per-rank tensors (DDP feeds each rank its local
  batch) -> jax.make_array_from_process_local_data (shard_batch below);
- replicated state on a mesh with non-addressable devices cannot use a plain
  device_put -> make_array_from_callback per process (replicate_tree below);
- rank-0-only side effects (reference `rank in [-1,0]` gates train.py:71/:210)
  -> jax.process_index() == 0 in train/fit.py.

Proven by a real 2-process CPU cluster run (tools/multihost_train.py): per-epoch
losses match the 1-process 8-device run on the same data.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all).

    Under multi-process JAX, jax.devices() spans every process, ordered
    process-major — so the mesh's row->device layout is identical to the
    single-process run with the same total device count."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh; all other dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicate_tree(tree, mesh: Mesh):
    """Place a pytree fully replicated on every device of the mesh.

    Multi-process: device_put rejects non-addressable target devices, so each
    process contributes its own addressable replicas via make_array_from_callback
    (every process holds the full host value — same bytes by seed determinism)."""
    s = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, s)

    def put_one(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put_one, tree)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of batch-major arrays with the leading dim sharded over
    the mesh (host->device scatter; the TPU-native .to(device)).

    Single-process: arrays are the GLOBAL batch (async device_put scatter).
    Multi-process: arrays are THIS PROCESS's contiguous row range of the
    global batch (see process_batch_slice); the global jax.Array is assembled
    with make_array_from_process_local_data — the reference's
    DistributedSampler + per-rank DataLoader contract (datasets.py:119),
    without any gather."""
    s = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, s)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def process_batch_slice(global_batch: int, mesh: Mesh,
                        axis: str = "data") -> Tuple[int, int]:
    """The contiguous [start, stop) row range of a (global_batch, ...) array
    that THIS process's addressable devices own under batch_sharding(mesh).

    This is what each process's loader materializes — the counterpart of the
    reference's DistributedSampler rank slice (datasets.py:119). Asserts the
    ownership really is contiguous (true for a 1-D mesh over process-major
    jax.devices()) so make_array_from_process_local_data sees rows in order."""
    s = batch_sharding(mesh, axis)
    imap = s.devices_indices_map((global_batch,))
    mine = sorted(
        (imap[d][0].start or 0,
         global_batch if imap[d][0].stop is None else imap[d][0].stop)
        for d in s.addressable_devices if d in imap)
    assert mine, "process owns no shard of the batch axis"
    start, stop = mine[0][0], mine[-1][1]
    covered = sum(b - a for a, b in mine)
    assert covered == stop - start, (
        f"non-contiguous process shard {mine}; reorder mesh devices "
        "process-major (make_mesh does)")
    return int(start), int(stop)
