"""Device mesh + sharding utilities: the TPU-native replacement for the
reference's ``torch.nn.DataParallel`` (reference scripts/train.py:93-96).

Design (SURVEY.md §5 'distributed communication backend'):
- a 1-D ``Mesh`` over the 'data' axis; batches are sharded on axis 0,
  parameters/optimizer state are replicated,
- gradients are all-reduced implicitly by XLA over ICI when the jitted
  train step consumes sharded batches and produces replicated params —
  no hand-written collectives needed at this model scale,
- BatchNorm statistics are computed over the GLOBAL batch (the sharded
  batch is one logical array, so XLA inserts the cross-device reductions
  for the batch mean/var).  This is cross-replica synced BN — a
  deliberate deviation from DataParallel's per-GPU statistics
  (SURVEY.md §5 asks to document the choice): results are then
  independent of the device count, and single-device runs match the
  reference exactly.

The same helpers drive the multi-chip dry-run (``__graft_entry__.py``)
with virtual CPU devices.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices=-1, devices=None):
    """Build a 1-D data-parallel mesh.  n_devices=-1 -> all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Sharding for batch arrays: axis 0 split over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Device-put a pytree of host arrays with axis-0 'data' sharding.

    Batch size must divide the mesh size; callers drop remainders
    (drop_last=True semantics, like the reference loaders)."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_size(mesh):
    """Size of the mesh's 'data' axis (1 when mesh is None)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get(DATA_AXIS, 1))


def pad_batch_to(batch, target_batch):
    """Pad axis 0 up to target_batch (repeat last element); returns
    (padded_tree, original_size).  Used when the final eval batch does not
    divide the mesh."""
    def pad(x):
        n = x.shape[0]
        if n == target_batch:
            return x
        reps = np.concatenate([x, np.repeat(x[-1:], target_batch - n, axis=0)])
        return reps

    first = jax.tree_util.tree_leaves(batch)[0]
    return jax.tree_util.tree_map(pad, batch), first.shape[0]
