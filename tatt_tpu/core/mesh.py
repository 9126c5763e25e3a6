"""Device mesh and sharding helpers.

The reference's only distribution mechanism is single-process
``torch.nn.DataParallel`` replication (``interfaces/base.py:386-396``).
The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over ICI with the
batch dimension sharded across the ``"data"`` axis; gradients are combined
by XLA-inserted all-reduces when the train step is jitted with these
shardings.  Frozen judge recognizers replicate per device exactly like
DataParallel replicas.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. ``n_devices`` of 0 means all visible."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over ICI."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(mesh: Mesh, batch):
    """Place a pytree of K-stacked host batches (leading axis = scan step,
    axis 1 = batch) with the BATCH dim sharded over ICI.  Companion to
    ``train.steps.make_multi_train_step``."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading dim of every leaf to a multiple of the mesh size and
    return (padded_tree, real_count).  Needed because eval sets are not
    divisible by the device count (reference uses drop_last only for train,
    ``interfaces/base.py:215``)."""
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return jax.tree_util.tree_map(_pad, batch), n
