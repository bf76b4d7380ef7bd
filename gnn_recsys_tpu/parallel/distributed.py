"""Multi-host runtime initialization.

The reference has no distributed backend (SURVEY §2.3); on TPU pods the
runtime story is: one `jax.distributed.initialize` per host process, a
single global mesh spanning all chips (ICI inside a slice, DCN across
slices), and the sharded steps in :mod:`gnn_recsys_tpu.parallel.sharded`.

On Cloud TPU pods `initialize()` auto-discovers the coordinator from the
TPU environment; elsewhere pass coordinator/process info explicitly (or
via the standard JAX env vars).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime.

    With no arguments this is best-effort (auto-discovery on Cloud TPU;
    silently a no-op in single-process environments).  With EXPLICIT
    coordinator/process arguments a failure raises — a silently
    un-initialized 2-process run would train two divergent models.
    Already-initialized runtimes are a no-op either way.
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e).lower():
            return
        if explicit:
            raise
        # single-process / non-cluster environment: best-effort no-op


def global_mesh(axis_names=("data", "model"), data_axis: Optional[int] = None):
    """A mesh over every chip of every host (call after initialize)."""
    from gnn_recsys_tpu.parallel.mesh import make_mesh

    return make_mesh(len(jax.devices()), data_axis=data_axis,
                     axis_names=axis_names)


def global_put(mesh, tree, spec=None):
    """Build GLOBAL multi-host jax.Arrays from per-host-identical data.

    In a multi-process runtime plain ``device_put`` only addresses local
    devices; GSPMD steps need arrays spanning the global mesh.  Every
    process calls this with the SAME host values (and the same ``spec``)
    and each materializes only its addressable shards.

    spec: a ``PartitionSpec`` applied to every leaf (default: replicated).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, spec if spec is not None else PartitionSpec())

    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    return jax.tree.map(put, tree)
