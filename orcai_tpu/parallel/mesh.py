"""Device mesh construction and sharding helpers.

The reference's only multi-device code is a tf MirroredStrategy wrapper in
hpsearch (hpsearch.py:186-205). Here parallelism is first-class: a
`jax.sharding.Mesh` over all addressable devices with a "data" axis (and an
optional "model" axis for tensor-parallel experiments); training steps are
jit-compiled with batch inputs sharded over "data" and parameters
replicated, letting XLA GSPMD insert the gradient all-reduce over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Mesh over (data, model) axes; defaults to all devices on data."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_size(batch_size: int, mesh: Mesh) -> int:
    """Round batch size up to a multiple of the data-axis size."""
    n = mesh.shape["data"]
    return -(-batch_size // n) * n


def mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Largest data-parallel mesh whose size divides the batch size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])
