"""Device mesh construction and batch sharding helpers.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3); all
multi-chip execution in this framework is new design: one global
``jax.sharding.Mesh`` with a ``data`` axis (minibatch edges / users) and a
``model`` axis (catalog rows, embedding-table rows), XLA collectives over
ICI inserted by GSPMD from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data_axis: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a 2D ('data', 'model') mesh over the first ``n_devices`` devices.

    ``data_axis`` fixes the data-parallel extent; by default the model axis
    gets 2 when the device count is even, else 1.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if len(axis_names) == 1:
        return Mesh(np.asarray(devices), tuple(axis_names))
    if data_axis is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
        data_axis = n // model
    model = n // data_axis
    arr = np.asarray(devices).reshape(data_axis, model)
    return Mesh(arr, tuple(axis_names))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Put a pytree of batch arrays with the leading dim sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
