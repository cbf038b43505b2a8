"""Device mesh topology for multi-chip SuGaR training.

The reference is strictly single-GPU (SURVEY.md §2.9); distribution here is
a new, first-class component. Axes:

- ``data``  — camera/view batch parallelism: each data-group renders
  different training views per step; gradients all-reduce over ICI.
- ``gauss`` — Gaussian-primitive sharding (the tensor-parallel analog):
  parameter buffers, Adam moments and densification stats are sharded along
  the capacity axis; preprocess/Adam/densify-stats stay fully sharded, and
  XLA inserts the gather/all-reduce collectives around the render's global
  sort.

On a single host this maps to the chips of one slice (ICI); across hosts
``jax.distributed.initialize`` extends the same mesh over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_gauss: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Create a (data, gauss) mesh over the available devices.

    Defaults: all devices on the ``data`` axis (pure camera parallelism).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None and n_gauss is None:
        n_data, n_gauss = n, 1
    elif n_data is None:
        n_data = n // n_gauss
    elif n_gauss is None:
        n_gauss = n // n_data
    assert n_data * n_gauss == n, (n_data, n_gauss, n)
    arr = np.asarray(devices).reshape(n_data, n_gauss)
    return Mesh(arr, axis_names=("data", "gauss"))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (capacity, ...) Gaussian buffers: shard dim 0 on gauss."""
    return NamedSharding(mesh, P("gauss"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (batch, ...) per-camera arrays: shard dim 0 on data."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(tree, mesh: Mesh):
    """Place all (capacity, ...) leaves of a Gaussian param/adam/stats tree
    on the gauss axis."""
    s = gauss_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
