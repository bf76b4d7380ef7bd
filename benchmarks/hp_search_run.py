"""End-to-end hyperparameter search on TPU: GP-EI over REAL trials.

The HP driver is unit-tested against toy objectives (tests/test_gp_opt.py);
this harness runs the actual production loop the reference runs
(``/root/reference/main.py:517-606``): CSV ETL -> graph -> minibatch
training -> test recall per trial, with the in-repo Matern-5/2 GP-EI
optimizer proposing each next configuration, defaults evaluated first
(skopt x0 semantics), per-trial ``checkpoint<date>.pkl`` persistence, and
resume-from-latest exercised at the end (one extra call after a fresh
``run_search`` against the same logdir).

Synthetic CSVs follow the reference file layout (clustered preferences so
recall is informative).  Each distinct (n_layers, embed_dim,
aggregator...) configuration recompiles, so keep ``--n-calls`` modest on a
tunneled device.

Shape bucketing (``FixedParams.bucket_shapes``) + the persistent XLA
compilation cache collapse compile keys across HP points: neg_sample_size
rounds up to 128 multiples and eid counts truncate to 256 multiples, so
trials sharing (n_layers, embed_dim, aggregator, norm, embedding_layer)
reuse compiled programs instead of recompiling per float-valued sample
fraction.  A ``report.json`` with trials/hour and the best configuration
is written to the logdir.

Crash recovery: run with ``--n-calls N``, kill -9 mid-search, rerun the
same command — the search resumes from the last ``checkpoint*.pkl`` and
only runs the remaining trials (exercised by the round-3 demo run).

Usage: python benchmarks/hp_search_run.py [--n-calls 5] [--epochs 4]
           [--logdir outputs/hp_run]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_csv_world(outdir, num_users=2000, num_items=400, num_groups=20,
                   per_user=12, seed=0):
    """Reference-layout CSVs with clustered user->item-group preferences."""
    import numpy as np
    import pandas as pd

    from gnn_recsys_tpu.config import ColumnConfig

    C = ColumnConfig()
    rng = np.random.default_rng(seed)
    user_group = rng.integers(0, num_groups, num_users)
    item_group = np.arange(num_items) % num_groups
    rows = []
    ts = 0
    for u in range(num_users):
        # 80% in-cluster interactions, 20% uniform noise.
        for _ in range(per_user):
            if rng.random() < 0.8:
                cands = np.flatnonzero(item_group == user_group[u])
                it = int(rng.choice(cands))
            else:
                it = int(rng.integers(0, num_items))
            day = 1 + int(27 * ts / (num_users * per_user))
            rows.append((f"u{u}", f"it{it}", int(rng.random() < 0.5),
                         f"2021-05-{day:02d}", ts))
            ts += 1
    df = pd.DataFrame(
        rows, columns=[C.ctm_id, C.specific_item_id, C.buy, C.hit_date,
                       C.hit_timestamp],
    )
    itf = pd.DataFrame({
        C.specific_item_id: [f"it{i}" for i in range(num_items)],
        C.general_item_id: [f"g{i // 2}" for i in range(num_items)],
        "is_junior": np.arange(num_items) % 2,
        "is_male": (np.arange(num_items) + 1) % 2,
        "is_female": np.zeros(num_items, int),
        "eco_design": np.ones(num_items, int),
    })
    uf = pd.DataFrame({
        C.ctm_id: [f"u{i}" for i in range(num_users)],
        "is_male": np.arange(num_users) % 2,
        "is_female": (np.arange(num_users) + 1) % 2,
    })
    os.makedirs(outdir, exist_ok=True)
    paths = {}
    for name, d in [("interactions", df), ("item_feat", itf),
                    ("user_feat", uf)]:
        p = os.path.join(outdir, f"{name}.csv")
        d.to_csv(p, index=False)
        paths[name] = p
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-calls", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--logdir", default="outputs/hp_run")
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=400)
    ap.add_argument("--from-beginning", action="store_true")
    args = ap.parse_args()

    import jax

    from gnn_recsys_tpu.config import DataPaths, FixedParams, HyperParams
    from gnn_recsys_tpu.hpsearch import run_search
    from gnn_recsys_tpu.trial import run_trial

    # Persistent compile cache: bucketed shapes make keys repeat across
    # trials AND across resumed runs.
    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"compile cache unavailable: {e!r}", file=sys.stderr)

    csvs = make_csv_world(
        os.path.join(args.logdir, "data"),
        num_users=args.users, num_items=args.items,
    )
    paths = DataPaths(
        train_path=csvs["interactions"],
        test_path=csvs["interactions"],
        item_feat_path=csvs["item_feat"],
        user_feat_path=csvs["user_feat"],
        result_filepath=os.path.join(args.logdir, "result_log.txt"),
    )
    fixed = FixedParams(
        num_epochs=args.epochs,
        patience=args.epochs + 1,
        edge_batch_size=512,
        include_sport=False,
        bucket_shapes=True,  # collapse compile keys across HP points
        run_inference=0,  # robustness re-eval off in the throughput demo
    )

    trial_times = []

    def fitness(hyper: HyperParams) -> float:
        t0 = time.perf_counter()
        result = run_trial(fixed, hyper, paths=paths, verbose=False)
        dt = time.perf_counter() - t0
        trial_times.append(dt)
        print(
            f"trial {len(trial_times)}: recall@10={result.recall:.4f} "
            f"precision={result.precision:.4f} "
            f"(agg={hyper.aggregator_type}/{hyper.aggregator_hetero} "
            f"layers={hyper.n_layers} dims={hyper.embed_dim} "
            f"lr={hyper.lr:.2e}) in {dt:.0f}s",
            flush=True,
        )
        return result.recall

    t0 = time.perf_counter()
    state = run_search(
        fitness, n_calls=args.n_calls, logdir=args.logdir,
        from_beginning=args.from_beginning, optimizer="gp", verbose=True,
    )
    best = state.best
    print(
        f"\nsearch done: {len(state.trials)} trials in "
        f"{time.perf_counter() - t0:.0f}s; best recall@10 = "
        f"{-best.objective:.4f}\nbest hyper: {best.hyper}"
    )

    # Crash-recovery: a FRESH run_search against the same logdir must
    # resume from the checkpoint (reference main.py:587-606) and only run
    # the one extra trial.
    n_before = len(state.trials)
    state2 = run_search(
        fitness, n_calls=args.n_calls + 1, logdir=args.logdir,
        optimizer="gp", verbose=True,
    )
    assert len(state2.trials) == args.n_calls + 1
    print(
        f"resume OK: checkpoint replayed {n_before} trials, ran 1 more; "
        f"best recall@10 = {-state2.best.objective:.4f}"
    )

    import dataclasses
    import json

    report = {
        "n_trials": len(state2.trials),
        "trials_per_hour": round(
            3600.0 * len(trial_times) / max(sum(trial_times), 1e-9), 1
        ),
        "mean_trial_s": round(sum(trial_times) / len(trial_times), 1),
        "trial_s": [round(t, 1) for t in trial_times],
        "best_recall": round(-state2.best.objective, 5),
        "best_hyper": dataclasses.asdict(state2.best.hyper),
        "recalls": [round(-t.objective, 5) for t in state2.trials],
    }
    with open(os.path.join(args.logdir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.logdir}/report.json "
          f"({report['trials_per_hour']} trials/hour)")


if __name__ == "__main__":
    main()
