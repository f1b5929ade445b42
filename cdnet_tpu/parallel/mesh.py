"""Device mesh + sharding helpers.

TPU-native replacement for the reference's only parallelism mechanism,
single-process `nn.DataParallel` (`/root/reference/train.py:185`;
SURVEY.md §2.4): a `jax.sharding.Mesh` with a batch-sharded data axis.
Gradients reduce over ICI via the `psum` XLA inserts for the sharded batch
axis — no NCCL-style calls anywhere. The mesh shape is config data, so the
same code runs 1-chip, v5e-8, or multi-host DCN without changes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=(-1,), axis_names=("data",), devices=None) -> Mesh:
    """Build a mesh; -1 in ``shape`` absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with the leading axis sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (params / optimizer state)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
