"""Worker process for the 2-process CPU multi-host simulation test.

Launched by ``tests/test_multihost.py`` as::

    python tests/multihost_worker.py <port> <process_id> <num_processes>

Each process: force the CPU platform with 2 local devices and gloo
cross-process collectives, ``initialize_multihost`` against the shared
coordinator, build the GLOBAL ('data',) mesh spanning both processes, and
run ONE GSPMD minibatch training step on global arrays.  Prints
``LOSS <value>`` — the parent asserts both processes agree and match the
single-process step.

The reference has no distributed execution at all (SURVEY §2.3); this is
the north-star multi-host recipe: jax.distributed per host + one global
mesh + the same jitted step as single-chip.
"""

import sys


def main() -> None:
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # In-process platform override (env vars are rewritten by the machine's
    # sitecustomize — see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_default_matmul_precision", "highest")

    from gnn_recsys_tpu.parallel.distributed import (
        global_mesh,
        global_put,
        initialize_multihost,
    )

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs, jax.devices()
    assert len(jax.local_devices()) == 2

    from jax.sharding import PartitionSpec as P

    from tests.multihost_world import build_world

    mesh = global_mesh(axis_names=("data",))
    state, graph, feats, batch, tables, model, cfg, etypes, rng = build_world()

    from gnn_recsys_tpu.train.minibatch import make_minibatch_step

    step = make_minibatch_step(
        model, cfg, etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in etypes},
    )
    # Globalize: everything replicated except the per-edge batch arrays,
    # which shard over 'data' (across BOTH processes).
    state = global_put(mesh, state)
    graph = global_put(mesh, graph)
    feats = global_put(mesh, feats)
    tables = global_put(mesh, tables)
    batch = global_put(mesh, batch, spec=P("data"))
    rng = global_put(mesh, rng)

    state, loss = step(state, graph, feats, batch, tables, rng)
    # loss is replicated: every process can read it via its local shard.
    local = loss.addressable_shards[0].data
    print(f"LOSS {float(local):.8f}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
