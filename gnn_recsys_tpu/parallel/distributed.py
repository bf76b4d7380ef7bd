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
    """Initialize the multi-host runtime (no-op if already initialized
    or single-process)."""
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def global_mesh(axis_names=("data", "model"), data_axis: Optional[int] = None):
    """A mesh over every chip of every host (call after initialize)."""
    from gnn_recsys_tpu.parallel.mesh import make_mesh

    return make_mesh(len(jax.devices()), data_axis=data_axis,
                     axis_names=axis_names)
