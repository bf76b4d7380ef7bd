"""Smoke the hard-synthetic HP harness end-to-end on a micro world.

Protects benchmarks/hp_search_hard.py (the reference-budget search
driver): the hyper->model/config mapping must run a real trial for both
optimizers, write checkpoints + a report, and resume.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_hp_hard_micro_world(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    logdir = str(tmp_path / "hp")
    cmd = [sys.executable,
           os.path.join(REPO, "benchmarks", "hp_search_hard.py"),
           "--n-calls", "2", "--users", "600", "--items", "200",
           "--epochs", "1", "--edge-batch", "512",
           "--logdir", logdir, "--optimizer", "gp"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    report = json.load(open(os.path.join(logdir, "report_gp.json")))
    assert report["n_trials"] == 2
    assert report["best_recall"] is not None
    assert any(f.startswith("checkpoint") for f in os.listdir(logdir))

    # Resume: same command with a higher budget runs exactly one more.
    cmd[cmd.index("--n-calls") + 1] = "3"
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    report = json.load(open(os.path.join(logdir, "report_gp.json")))
    assert report["n_trials"] == 3


def test_checkpoint_json_roundtrip_and_legacy_pkl(tmp_path):
    """Checkpoints are JSON (non-executable) since round 5; legacy .pkl
    checkpoints from earlier rounds remain loadable (trusted local runs
    only — see load_checkpoint docstring)."""
    import os

    from gnn_recsys_tpu.config import HyperParams
    from gnn_recsys_tpu.hpsearch import (
        SearchState,
        Trial,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    state = SearchState(
        trials=[Trial(hyper=HyperParams(lr=3e-3), objective=-0.021)],
        seed=46,
    )
    p = str(tmp_path / "checkpoint20260821_000000.json")
    save_checkpoint(state, p)
    got = load_checkpoint(p)
    assert got.trials[0].hyper == state.trials[0].hyper
    assert got.trials[0].objective == state.trials[0].objective
    assert latest_checkpoint(str(tmp_path)) == p

    legacy = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "hp_search_r4_gp_checkpoint.pkl",
    )
    if os.path.exists(legacy):
        old = load_checkpoint(legacy)
        assert len(old.trials) >= 54
        assert old.best is not None and -old.best.objective > 0.02
