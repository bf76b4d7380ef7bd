"""GP-EI optimizer tests: encoding round-trip, EI math, convergence vs
random search, and hpsearch driver integration (capability parity with the
reference's ``gp_minimize(acq_func='EI')``, /root/reference/main.py:577-606).
"""

import dataclasses

import numpy as np
import pytest

from gnn_recsys_tpu.gp_opt import (
    GPOptimizer,
    Space,
    _GP,
    expected_improvement,
)

SPEC = {
    "x": ("float", -2.0, 2.0, False),
    "lr": ("float", 1e-4, 1e-1, True),
    "depth": ("int", 2, 6),
    "agg": ("cat", ["mean", "max", "sum"]),
    "norm": ("cat", [True, False]),
}


def test_encode_decode_roundtrip():
    space = Space(SPEC)
    rng = np.random.default_rng(0)
    for _ in range(50):
        enc = space.sample(rng)[0]
        params = space.decode(enc)
        assert params["agg"] in ("mean", "max", "sum")
        assert params["norm"] in (True, False)
        assert 2 <= params["depth"] <= 6 and isinstance(params["depth"], int)
        assert -2.0 <= params["x"] <= 2.0
        assert 1e-4 <= params["lr"] <= 1e-1 + 1e-12
        # Re-encoding a decoded point is a fixed point (up to int rounding).
        enc2 = space.encode(params)
        params2 = space.decode(enc2)
        assert params2["agg"] == params["agg"]
        assert params2["depth"] == params["depth"]
        assert params2["x"] == pytest.approx(params["x"], abs=1e-9)
        assert params2["lr"] == pytest.approx(params["lr"], rel=1e-9)


def test_expected_improvement_math():
    # Zero sigma -> zero EI; larger sigma -> larger EI at equal mean.
    mu = np.array([0.5, 0.5, 0.5])
    sigma = np.array([0.0, 0.1, 1.0])
    ei = expected_improvement(mu, sigma, best=0.4)
    assert ei[0] == 0.0
    assert ei[2] > ei[1] > 0.0
    # A mean far below best dominates.
    ei2 = expected_improvement(
        np.array([0.0, 0.5]), np.array([0.1, 0.1]), best=0.4
    )
    assert ei2[0] > ei2[1]


def test_gp_fits_smooth_function():
    space = Space({"x": ("float", 0.0, 1.0, False)})
    rng = np.random.default_rng(1)
    xs = space.sample(rng, 30)
    ys = np.sin(3.0 * xs[:, 0])
    gp = _GP(xs, ys)
    xq = space.sample(rng, 10)
    mu, sigma = gp.predict(xq)
    err = np.abs(mu - np.sin(3.0 * xq[:, 0]))
    assert float(np.mean(err)) < 0.1
    # Predictions at training points should be near-interpolating.
    mu_t, _ = gp.predict(xs[:5])
    assert np.abs(mu_t - ys[:5]).max() < 0.1


def _objective(p):
    # Minimum at x=0.7, lr=1e-2, depth=4, agg='max', norm=True.
    cat_pen = {"mean": 0.3, "max": 0.0, "sum": 0.5}[p["agg"]]
    return (
        (p["x"] - 0.7) ** 2
        + (np.log10(p["lr"]) + 2.0) ** 2 * 0.2
        + (p["depth"] - 4) ** 2 * 0.05
        + cat_pen
        + (0.0 if p["norm"] else 0.25)
    )


def test_gp_ei_beats_random_search():
    n_trials = 40
    space = Space(SPEC)

    opt = GPOptimizer(space, n_initial_points=8, seed=46)
    for _ in range(n_trials):
        p = opt.ask()
        opt.tell(p, _objective(p))
    _, best_gp = opt.best

    rng = np.random.default_rng(46)
    best_rand = min(
        _objective(space.decode(space.sample(rng)[0]))
        for _ in range(n_trials)
    )
    # The surrogate should find a clearly better optimum than pure random
    # at the same budget, and land near the true optimum (value 0).
    assert best_gp < best_rand
    assert best_gp < 0.15


def test_gp_optimizer_x0_first():
    space = Space(SPEC)
    x0 = {"x": 1.5, "lr": 1e-3, "depth": 2, "agg": "sum", "norm": False}
    opt = GPOptimizer(space, x0=[x0], n_initial_points=4, seed=0)
    first = opt.ask()
    assert first["agg"] == "sum" and first["depth"] == 2
    assert first["x"] == pytest.approx(1.5, abs=1e-9)


def test_run_search_gp_driver(tmp_path):
    from gnn_recsys_tpu.config import HyperParams
    from gnn_recsys_tpu.hpsearch import run_search

    calls = []

    def fitness(h: HyperParams) -> float:
        calls.append(h)
        # Recall peaks at delta=0.25, lr=1e-3.
        return 1.0 - (h.delta - 0.25) ** 2 - (np.log10(h.lr) + 3.0) ** 2 * 0.05

    state = run_search(
        fitness, n_calls=14, logdir=str(tmp_path), from_beginning=True,
        optimizer="gp", seed=46,
    )
    assert len(state.trials) == 14
    # Defaults-first (skopt x0 semantics).
    assert calls[0] == HyperParams()
    assert state.best is not None and -state.best.objective <= 1.0

    # Resume: two more trials continue from the checkpoint, surrogate replay
    # included (no crash, count grows, history preserved).
    seen = len(calls)
    state2 = run_search(
        fitness, n_calls=16, logdir=str(tmp_path), optimizer="gp", seed=46,
    )
    assert len(state2.trials) == 16
    assert len(calls) == seen + 2
    assert state2.trials[:14] == state.trials
