"""Hyperparameter search driver.

Covers the reference's skopt-based hyperparametrization
(``/root/reference/main.py:450-607``): the same 14-dimension space
(``SearchableHyperparameters``, main.py:485-511), defaults-first evaluation
(skopt ``x0``, main.py:508-511), per-trial crash-recovery checkpoints named
``checkpoint<date>.pkl`` with resume-from-latest (main.py:561-606,
src/utils.py:25-32), and ``random_state=46`` determinism.

Optimizer: a pure-numpy GP-EI surrogate loop (:mod:`gnn_recsys_tpu.gp_opt`
— Matern-5/2 GP, one-hot categorical encoding, EI acquisition), the same
algorithm as the reference's ``gp_minimize(acq_func='EI')``.
``optimizer='random'`` falls back to defaults-first + uniform exploration +
incumbent perturbation.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import pickle
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from gnn_recsys_tpu.config import HyperParams


def _logger():
    from gnn_recsys_tpu.utils.logging import get_logger

    return get_logger(__name__)

# The 14-dim space, reference main.py:485-507.
SEARCH_SPACE: Dict[str, Tuple] = {
    "aggregator_hetero": ("cat", ["mean", "sum", "max"]),
    "aggregator_type": ("cat", ["mean", "mean_nn", "pool_nn"]),
    "clicks_sample": ("float", 0.2, 1.0, False),
    "delta": ("float", 0.15, 0.35, False),
    "dropout": ("float", 0.0, 0.8, False),
    "embedding_layer": ("cat", [True, False]),
    "embed_dim": ("cat", ["small", "medium", "large"]),
    "lr": ("float", 1e-4, 1e-2, True),
    "n_layers": ("int", 3, 5),
    "neg_sample_size": ("int", 700, 3000),
    "norm": ("cat", [True, False]),
    "popularity_importance": ("cat", ["no", "small", "medium", "large"]),
    "purchases_sample": ("float", 0.5, 1.0, False),
    "use_recency": ("cat", [True, False]),
}


def sample_hyperparams(rng: np.random.Generator) -> HyperParams:
    """Uniform draw from the search space."""
    kwargs = {}
    for name, spec in SEARCH_SPACE.items():
        kind = spec[0]
        if kind == "cat":
            kwargs[name] = spec[1][rng.integers(0, len(spec[1]))]
        elif kind == "float":
            lo, hi, log = spec[1], spec[2], spec[3]
            if log:
                kwargs[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            else:
                kwargs[name] = float(rng.uniform(lo, hi))
        elif kind == "int":
            kwargs[name] = int(rng.integers(spec[1], spec[2] + 1))
    return HyperParams(**kwargs)


def perturb_hyperparams(
    base: HyperParams, rng: np.random.Generator, n_dims: int = 3
) -> HyperParams:
    """Resample a few dimensions of the incumbent (local exploitation)."""
    kwargs = dataclasses.asdict(base)
    names = list(SEARCH_SPACE.keys())
    fresh = dataclasses.asdict(sample_hyperparams(rng))
    for name in rng.choice(names, size=min(n_dims, len(names)), replace=False):
        kwargs[name] = fresh[name]
    return HyperParams(**kwargs)


@dataclasses.dataclass
class Trial:
    hyper: HyperParams
    objective: float  # NEGATIVE recall (minimized, skopt convention)


@dataclasses.dataclass
class SearchState:
    trials: List[Trial]
    seed: int = 46

    @property
    def best(self) -> Optional[Trial]:
        if not self.trials:
            return None
        return min(self.trials, key=lambda t: t.objective)


def _checkpoint_name() -> str:
    # JSON, not pickle: a checkpoint is data a resumed run load-executes,
    # and unpickling is arbitrary code execution if the file was ever
    # touched by an untrusted party (e.g. a PR editing a committed
    # artifact).  The trial list is plain dataclasses — JSON round-trips
    # it losslessly and the GP is rebuilt from the trials on resume.
    return ("checkpoint"
            + datetime.datetime.now().strftime("%Y%m%d_%H%M%S") + ".json")


def latest_checkpoint(logdir: str = ".") -> Optional[str]:
    files = sorted(
        (f for f in os.listdir(logdir) if f.startswith("checkpoint")
         and (f.endswith(".json") or f.endswith(".pkl"))),
        key=lambda f: os.path.splitext(f)[0],
    )
    return os.path.join(logdir, files[-1]) if files else None


def load_checkpoint(path: str) -> SearchState:
    """Load a search checkpoint.

    ``.json`` (current format) reconstructs the state from plain data.
    Legacy ``.pkl`` checkpoints unpickle — pickle can execute arbitrary
    code, so ONLY load .pkl files produced by your own local runs (they
    are kept readable for resuming pre-round-5 searches).
    """
    if path.endswith(".json"):
        import json

        with open(path) as f:
            d = json.load(f)
        return SearchState(
            trials=[
                Trial(hyper=HyperParams(**t["hyper"]),
                      objective=float(t["objective"]))
                for t in d["trials"]
            ],
            seed=int(d.get("seed", 46)),
        )
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint(state: SearchState, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "seed": state.seed,
                "trials": [
                    {"hyper": dataclasses.asdict(t.hyper),
                     "objective": t.objective}
                    for t in state.trials
                ],
            },
            f,
        )


def run_search(
    fitness: Callable[[HyperParams], float],
    n_calls: int = 200,
    logdir: str = ".",
    from_beginning: bool = False,
    seed: int = 46,
    exploit_prob: float = 0.3,
    optimizer: str = "gp",
    verbose: bool = False,
) -> SearchState:
    """Minimize ``-recall``: ``fitness`` returns the recall of one trial
    (the reference's ``fitness`` returns ``-recall`` to gp_minimize,
    main.py:513-527 — here fitness returns recall and the driver negates).

    optimizer: ``'gp'`` (GP-EI surrogate, the reference's algorithm) or
    ``'random'`` (surrogate-free explore/exploit).

    Resumes from the latest ``checkpoint*.pkl`` in ``logdir`` unless
    ``from_beginning`` (reference main.py:587-606); on resume the GP is
    re-seeded with every completed trial.
    """
    state = SearchState(trials=[], seed=seed)
    if not from_beginning:
        ck = latest_checkpoint(logdir)
        if ck:
            state = load_checkpoint(ck)

    rng = np.random.default_rng(seed + len(state.trials))
    gp = None
    if optimizer == "gp":
        from gnn_recsys_tpu.gp_opt import GPOptimizer, Space

        gp = GPOptimizer(
            Space(SEARCH_SPACE),
            x0=[dataclasses.asdict(HyperParams())],  # defaults-first
            seed=seed,
        )
        for t in state.trials:  # replay history into the surrogate
            gp.tell(dataclasses.asdict(t.hyper), t.objective)
    os.makedirs(logdir, exist_ok=True)
    while len(state.trials) < n_calls:
        if gp is not None:
            hyper = HyperParams(**gp.ask())
        elif not state.trials:
            hyper = HyperParams()  # defaults-first (skopt x0)
        elif state.best is not None and rng.random() < exploit_prob:
            hyper = perturb_hyperparams(state.best.hyper, rng)
        else:
            hyper = sample_hyperparams(rng)
        recall = fitness(hyper)
        if gp is not None:
            gp.tell(dataclasses.asdict(hyper), -float(recall))
        state.trials.append(Trial(hyper=hyper, objective=-float(recall)))
        save_checkpoint(state, os.path.join(logdir, _checkpoint_name()))
        if verbose:
            best = state.best
            _logger().info(
                "trial %d: recall=%.4f best=%.4f",
                len(state.trials), recall, -best.objective,
            )
    return state
