"""Device mesh + sharding helpers — the distributed layer (SURVEY.md §2c).

The reference is a single-process single-device trainer with NO distributed
layer of any kind [SURVEY.md §2c, K-high]; this module is the rebuild's
first-class replacement:

  * Data parallelism: 1-D ``Mesh('data')``; batches sharded over the axis,
    params/optimizer state replicated.  Under ``jax.jit`` XLA's GSPMD
    partitioner inserts the gradient all-reduce (``psum``) over ICI — no
    hand-written communication (SURVEY.md §2c "Communication backend").
  * Spatial tiling ("sequence parallel" analog): ``Mesh('spatial')`` used by
    parallel/tiling.py for halo-exchanged tiled inference on large scans.
  * TP/PP/EP: not applicable to a ~12k-param FCN (SURVEY.md §2c); the mesh
    helpers accept arbitrary axis tuples so higher-dim meshes remain
    expressible.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code then spans DCN-connected hosts (ICI intra-slice).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis: str | tuple[str, ...] = "data",
    devices: list | None = None,
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a Mesh over the first n devices (1-D by default)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    assert shape is not None, "shape required for multi-axis meshes"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_to_mesh(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    s = replicated(mesh)
    return jax.device_put(tree, s)


def shard_batch_to_mesh(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dim over the mesh axis (dp batch split)."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
