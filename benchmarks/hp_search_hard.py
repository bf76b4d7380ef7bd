"""Reference-budget HP search (200 GP-EI trials) on the HARD synthetic.

The reference runs ``gp_minimize(n_calls=200, acq_func='EI',
random_state=46)`` over its 14-dim space (``/root/reference/main.py:
577-606``).  Round 3 demonstrated the full CSV->ETL->train->recall
pipeline under the same GP at 26 trials; this harness runs the FULL
reference budget on the latent-factor + Zipf benchmark
(``make_hard_synthetic_data`` — the data where training-regime choices
actually separate, see benchmarks/quality_hard.py), with:

  * the same 14-dim space (``hpsearch.SEARCH_SPACE``), defaults-first;
  * shape bucketing (neg pool rounded to 128 multiples, fixed fanouts)
    + the persistent compile cache, so trials reuse compiled programs;
  * per-trial ``checkpoint<date>.pkl`` persistence — kill -9 mid-run and
    rerun the same command to resume (reference main.py:587-606);
  * ``--optimizer random`` as the equal-budget control arm: run both and
    compare best-so-far trajectories at the same trial count.

The graph is built ONCE; per-trial work is the hyper-dependent part the
reference also redoes per trial: edge subsampling (clicks_sample /
purchases_sample), model build, training, retrieval eval (recall@10 with
already-bought exclusion and the popularity boost when the trial's
``popularity_importance`` asks for it).

Usage:
  python benchmarks/hp_search_hard.py --n-calls 200 \
      [--users 20000] [--items 6000] [--epochs 6] \
      [--logdir outputs/hp_hard] [--optimizer gp|random]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-calls", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--users", type=int, default=20_000)
    ap.add_argument("--items", type=int, default=6_000)
    ap.add_argument("--edge-batch", type=int, default=8192)
    ap.add_argument("--logdir", default="outputs/hp_hard")
    ap.add_argument("--optimizer", default="gp", choices=("gp", "random"))
    ap.add_argument("--from-beginning", action="store_true")
    ap.add_argument("--budget-s", type=float, default=0.0,
                    help="stop cleanly (checkpoint intact) after this many "
                         "seconds; 0 = no limit")
    args = ap.parse_args()

    import jax

    try:
        cache = os.path.join(REPO, ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"compile cache unavailable: {e!r}", file=sys.stderr)

    import jax.numpy as jnp
    import numpy as np

    from gnn_recsys_tpu.config import HyperParams
    from gnn_recsys_tpu.hpsearch import run_search
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
    from gnn_recsys_tpu.retrieval.recs import model_score_fn
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        infer_embeddings,
        train_minibatch,
    )
    from gnn_recsys_tpu.utils.synthetic import make_hard_synthetic_data

    on_tpu = jax.default_backend() == "tpu"
    t0 = time.perf_counter()
    data = make_hard_synthetic_data(
        num_users=args.users, num_items=args.items, seed=0, max_fanout=32,
        with_clicks=True,
    )
    g = data.train_graph
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    fdim = int(feats["user"].shape[1])
    bu, bi = data.train_pairs[("user", "buys", "item")]
    train_etypes = tuple(data.train_pairs.keys())
    host_edges = {et: (u, i) for et, (u, i) in data.train_pairs.items()}
    # Reference popularity semantics: per-item fraction of purchases
    # (counts/sum — src/utils_data.py import via etl.import_features),
    # NOT counts/max: the reference weights (0.05-0.2) are calibrated
    # against softmax ratings (~1/catalog each), so a [0,1]-normalized
    # vector would drown the model for every pop!=no trial.
    deg = np.bincount(bi, minlength=args.items).astype(np.float32)
    popularity = jnp.asarray(deg / max(deg.sum(), 1.0))
    print(f"build: {time.perf_counter() - t0:.1f}s "
          f"devices={jax.devices()}", file=sys.stderr)

    trial_times = []
    start_wall = time.perf_counter()

    def fitness(hyper: HyperParams) -> float:
        t0 = time.perf_counter()
        model = ConvModel(
            canonical_etypes=g.canonical_etypes,
            dims=(("user", fdim), ("item", fdim),
                  ("hidden", hyper.hidden_dim), ("out", hyper.out_dim)),
            n_layers=hyper.n_layers,
            norm=hyper.norm,
            dropout=hyper.dropout,
            aggregator_type=hyper.aggregator_type,
            pred="cos",
            aggregator_hetero=hyper.aggregator_hetero,
            embedding_layer=hyper.embedding_layer,
            dtype=jnp.bfloat16 if on_tpu else None,
            leaf_kernel=on_tpu,
        )
        n_conv = model.num_conv_layers
        # Bucketed fanouts (one compile key per depth); dedup bounds the
        # deep trees by unique node count exactly as run_trial does.
        fanouts = tuple([8, 4, 4, 4, 4][:n_conv])
        dedup = n_conv >= 3
        pool = -(-hyper.neg_sample_size // 128) * 128  # bucket to 128
        cfg = MinibatchConfig(
            edge_batch_size=args.edge_batch,
            fanouts=fanouts,
            neg_sample_size=min(hyper.neg_sample_size, pool),
            neg_mode="dense_pool",
            neg_pool_size=pool,
            dedup=dedup,
            delta=hyper.delta,
            lr=hyper.lr,
            num_epochs=args.epochs,
            metrics_every=0,
            patience=args.epochs + 1,
            use_recency=hyper.use_recency,  # recency==1 here: exercises
            k=10,                           # the path, a no-op divisor
        )
        # Per-trial edge subsampling (reference train_valid_split's
        # clicks_sample / purchases_sample, src/utils_data.py:254-266):
        # a deterministic draw per fraction keeps resumed trials exact.
        rng = np.random.default_rng(46)
        train_eids = {}
        for et in train_etypes:
            n = g.num_edges(et)
            frac = (hyper.clicks_sample if "click" in et[1]
                    else hyper.purchases_sample)
            m = max(1, int(round(n * frac)))
            # Round DOWN to the 256-eid bucket like FixedParams.bucket
            # shapes do, so sample fractions don't mint compile keys.
            m = max(256, m - (m % 256)) if n >= 256 else m
            train_eids[et] = rng.permutation(n)[:m].astype(np.int32)
        state, hist = train_minibatch(
            model, g, data.graph, feats, train_eids, None, cfg,
            host_edges=host_edges,
        )
        h = infer_embeddings(model, state.params, g, feats,
                             ntypes=("user", "item"))
        sfn = model_score_fn(model.pred, state.params)
        _, recall, _ = get_metrics_at_k(
            h["user"], h["item"], data.test_ground_truth, (bu, bi), 10,
            popularity=popularity if hyper.use_popularity else None,
            weight_popularity=hyper.weight_popularity,
            score_fn=sfn,
        )
        dt = time.perf_counter() - t0
        trial_times.append(dt)
        print(
            f"trial {len(trial_times)}: recall@10={recall:.5f} "
            f"(agg={hyper.aggregator_type}/{hyper.aggregator_hetero} "
            f"layers={hyper.n_layers} dims={hyper.embed_dim} "
            f"pool={pool} lr={hyper.lr:.2e} pop="
            f"{hyper.popularity_importance}) in {dt:.0f}s",
            flush=True,
        )
        if args.budget_s and time.perf_counter() - start_wall > args.budget_s:
            raise TimeoutError("budget-s reached (checkpoints intact)")
        return float(recall)

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.perf_counter()
    try:
        state = run_search(
            fitness, n_calls=args.n_calls, logdir=args.logdir,
            from_beginning=args.from_beginning, optimizer=args.optimizer,
            verbose=True,
        )
    except TimeoutError as e:
        print(f"stopped: {e}", file=sys.stderr)
        from gnn_recsys_tpu.hpsearch import latest_checkpoint, load_checkpoint

        state = load_checkpoint(latest_checkpoint(args.logdir))
    best = state.best
    recalls = [-t.objective for t in state.trials]
    best_so_far = list(np.maximum.accumulate(recalls)) if recalls else []
    report = {
        "optimizer": args.optimizer,
        "n_trials": len(state.trials),
        "world": {"users": args.users, "items": args.items,
                  "epochs": args.epochs, "edge_batch": args.edge_batch},
        "trials_per_hour": round(
            3600.0 * len(trial_times) / max(sum(trial_times), 1e-9), 1
        ) if trial_times else None,
        "mean_trial_s": round(
            sum(trial_times) / max(len(trial_times), 1), 1
        ),
        "best_recall": round(-best.objective, 5) if best else None,
        "best_hyper": dataclasses.asdict(best.hyper) if best else None,
        "recalls": [round(r, 5) for r in recalls],
        "best_so_far": [round(r, 5) for r in best_so_far],
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    os.makedirs(args.logdir, exist_ok=True)
    out = os.path.join(args.logdir, f"report_{args.optimizer}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"{len(state.trials)} trials, best recall@10="
          f"{report['best_recall']}; report -> {out}")


if __name__ == "__main__":
    main()
