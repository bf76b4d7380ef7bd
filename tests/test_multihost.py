"""2-process CPU multi-host simulation (VERDICT r1 #7 / SURVEY §2.3).

Launches two REAL OS processes, each with 2 local CPU devices and gloo
cross-process collectives, coordinated by ``jax.distributed``.  Both run
one GSPMD minibatch training step over the global 4-device ('data',) mesh
and must agree on the loss — which must also match the same step run
single-process on this test's virtual devices.
"""

import os
import socket
import subprocess
import sys


import numpy as np
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_gspmd_step_matches_single_process():
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert lines, f"no LOSS line in: {out!r}"
        losses.append(float(lines[0].split()[1]))
    # both processes observe the same replicated loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # and it matches the single-process step (same world, same rng)
    from tests.multihost_world import build_world
    from gnn_recsys_tpu.train.minibatch import make_minibatch_step

    state, g, feats, batch, tables, model, cfg, etypes, rng = build_world()
    step = make_minibatch_step(
        model, cfg, etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in etypes},
    )
    _, loss = step(state, g, feats, batch, tables, rng)
    np.testing.assert_allclose(losses[0], float(loss), rtol=1e-4)
