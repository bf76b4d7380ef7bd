"""Hard quality benchmark: latent-factor + Zipf synthetic where training
regimes SEPARATE (round-2 verdict item 5: the clustered synthetic
saturated its oracle in ~1 epoch, so no HP choice could fail).

Data: ``make_hard_synthetic_data`` — interactions from
``P(i|u) ∝ exp(beta*<z_u,z_i> + w*logpop_i)`` with power-law popularity
and weak noisy low-rank features (the model must learn multi-hop
collaborative structure; features alone cannot recover the latents).

Anchors per run:
  * floor  — popularity-only ranking (one global top-k list);
  * ceiling — the generator-optimal latent scorer, evaluated through the
    SAME retrieval stack (get_recs with a custom score_fn,
    already-bought exclusion);
  * the trained model must land in between, keep improving past epoch 3,
    and DIFFER across the contrasting configs.

Configs: reference defaults (mean_nn / hidden 256 / lr .00565 / 2500
negatives, ``/root/reference/main.py:510-511``) vs. a plain-mean
aggregator vs. a 64-negative run.

Usage: python benchmarks/quality_hard.py [--epochs 12] [--cpu] [--small]
Artifacts: outputs/quality_hard.json, plots/quality_hard.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--items", type=int, default=15_000)
    ap.add_argument("--edge-batch", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="2k users / 800 items (CI-sized)")
    ap.add_argument("--configs", default="default,mean,few_neg",
                    help="comma list: default|mean|few_neg|shallow|...")
    ap.add_argument("--lr-schedule", default="const",
                    choices=("const", "cosine"))
    ap.add_argument("--metrics-every", type=int, default=2)
    ap.add_argument("--out-name", default="quality_hard")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        cache = os.path.join(REPO, ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"compile cache unavailable: {e!r}", file=sys.stderr)
    import jax.numpy as jnp
    import numpy as np

    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.retrieval.metrics import recs_to_metrics
    from gnn_recsys_tpu.retrieval.recs import get_recs
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        train_minibatch,
    )
    from gnn_recsys_tpu.utils.synthetic import make_hard_synthetic_data

    if args.small:
        args.users, args.items, args.edge_batch = 2_000, 800, 1024

    t0 = time.perf_counter()
    data = make_hard_synthetic_data(
        num_users=args.users, num_items=args.items, seed=0, max_fanout=32,
    )
    g = data.train_graph
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    fdim = int(feats["user"].shape[1])
    bu, bi = data.train_pairs[("user", "buys", "item")]
    gtu, gti = data.test_ground_truth
    k = 10
    print(f"build: {time.perf_counter() - t0:.1f}s "
          f"devices={jax.devices()}", file=sys.stderr)

    # ---------------- anchors (through the real retrieval stack) --------
    ab = build_padded_pair_set(bu, bi, num_src=args.users)
    user_ids = jnp.asarray(np.unique(gtu), jnp.int32)
    beta, popw = 6.0, 0.5  # the generator defaults used above
    lp = jnp.asarray(data.item_logpop)

    def oracle_score(u_chunk, item_emb):
        return beta * (u_chunk @ item_emb.T) + popw * lp[None, :]

    recs = get_recs(
        jnp.asarray(data.user_latent), jnp.asarray(data.item_latent),
        user_ids, k, already_bought=ab, score_fn=oracle_score,
    )
    _, recall_ceiling, _ = recs_to_metrics(recs, user_ids, gtu, gti,
                                           args.items)
    pop_top = np.argsort(-np.bincount(bi, minlength=args.items))[:k]
    recall_pop = float(np.isin(gti, pop_top).mean())
    anchors = {
        "recall_random": round(k / args.items, 5),
        "recall_popularity": round(recall_pop, 5),
        "recall_latent_ceiling": round(recall_ceiling, 5),
    }
    print(f"anchors: {anchors}", file=sys.stderr)

    # ---------------- configs ------------------------------------------
    def build_model(agg, n_layers=3, pred="cos", hetero="sum",
                    embedding_layer=True, norm=True, dropout=0.0,
                    hidden=256, out=128):
        # norm default True == ConvModel's default == every historical
        # quality run in docs/results (the reference default is also
        # norm=True, main.py:510).
        return ConvModel(
            canonical_etypes=g.canonical_etypes,
            dims=(("user", fdim), ("item", fdim),
                  ("hidden", hidden), ("out", out)),
            n_layers=n_layers,
            aggregator_type=agg,
            pred=pred,
            aggregator_hetero=hetero,
            norm=norm,
            dropout=dropout,
            # embedding_layer True (2 conv hops at n_layers=3) matches
            # the throughput bench; embedding_layer=False gives the
            # reference-DEFAULT depth (3 conv hops at n_layers=3,
            # /root/reference/main.py:497,510 + src/model.py:382-406) —
            # the 'deep3*' configs below run that regime.
            embedding_layer=embedding_layer,
            dtype=None if args.cpu else jnp.bfloat16,
        )

    CONFIGS = {
        # reference defaults: mean_nn, lr .00565, delta .266, 2500 negs
        "default": dict(agg="mean_nn", lr=5.65e-3, pool=2560),
        "mean": dict(agg="mean", lr=5.65e-3, pool=2560),
        "few_neg": dict(agg="mean_nn", lr=5.65e-3, pool=64),
        "shallow": dict(agg="mean_nn", lr=5.65e-3, pool=2560, n_layers=2),
        # MLP scoring head (reference pred='nn', src/model.py:240-305):
        # unlike cosine it can express MAGNITUDE — the popularity prior —
        # directly in the learned score.
        "nn_pred": dict(agg="mean_nn", lr=5.65e-3, pool=2560, pred="nn"),
        # HP-informed long-run candidates (round-4 search on the 20k
        # world surfaced max-hetero / larger deltas as competitive).
        "hp_best": dict(agg="mean_nn", lr=1.4e-3, pool=2560,
                        hetero="max"),
        # Reference-DEFAULT depth: n_layers=3 with NO embedding layer =
        # 3 conv hops (main.py:497,510; src/model.py:382-406), sampled
        # fanouts (8,4,4) with dedup blocks.
        "deep3": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                      embedding_layer=False),
        # Reference-default depth AND neighbor_sampler='full'
        # (src/utils_data.py:85): every padded neighbor row in full,
        # through the lane-packed leaf cache (attach_leaf_features).
        "deep3_full": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                           embedding_layer=False, full_fanout=True),
        # 2-conv full-fanout (embedding layer on).
        "full2": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                      full_fanout=True),
        # Full-fanout needs a LOWER lr than the sampled regime: its
        # low-variance gradients at the reference-default 5.65e-3 drive
        # item embeddings toward collapse (mean pairwise cos 0.92 vs
        # 0.70 at 1.4e-3 on the small world; recall at 50k drops to
        # random) — the hinge's degenerate minimum.  1.4e-3 is also the
        # round-4 HP search's lr mode.
        "deep3_full_lr14": dict(agg="mean_nn", lr=1.4e-3, pool=2560,
                                embedding_layer=False, full_fanout=True),
        "deep3_full_lr5": dict(agg="mean_nn", lr=5e-4, pool=2560,
                               embedding_layer=False, full_fanout=True),
        "full2_lr14": dict(agg="mean_nn", lr=1.4e-3, pool=2560,
                           full_fanout=True),
        # The reference's ACTUAL defaults (main.py:510 default_parameters,
        # mapped to the dir()-sorted dims): mean_nn/sum, DROPOUT .5 (the
        # knob every earlier quality run left at 0), norm True,
        # embedding_layer False (3 conv hops), lr .00565, delta .266,
        # 2500 negatives, full-neighbor sampler.  (norm=True was already
        # the ConvModel default in every historical run — the
        # full-fanout collapse at lr 5.65e-3 is DIRECTIONAL and the L2
        # row-norm does not prevent it; dropout might.)
        "ref_default": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                            embedding_layer=False, full_fanout=True,
                            dropout=0.5),
        # ref-default depth/sampler with the collapse-safe lr and
        # moderate dropout.
        "deep3_full_lr14_drop": dict(agg="mean_nn", lr=1.4e-3, pool=2560,
                                     embedding_layer=False,
                                     full_fanout=True, dropout=0.3),
        # EXTENSION objective (not in the reference): sampled-softmax
        # over the dense pool (models/loss.py:sampled_softmax_loss) —
        # the known stronger implicit-feedback objective; everything
        # else identical to 'default'.
        "softmax": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                        loss="sampled_softmax", tau=0.1),
        "softmax_tau05": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                              loss="sampled_softmax", tau=0.05),
        "softmax_tau2": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                             loss="sampled_softmax", tau=0.2),
        # tau=0.2 rose monotonically to raw 0.0157 at 120 ep (hinge
        # plateaus at 0.0140) — sweep upward and run longer.
        "softmax_tau3": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                             loss="sampled_softmax", tau=0.3),
        "softmax_tau15": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                              loss="sampled_softmax", tau=0.15),
        "softmax_tau5": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                             loss="sampled_softmax", tau=0.5),
        "softmax_tau2_deep3": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                                   loss="sampled_softmax", tau=0.2,
                                   embedding_layer=False),
        # Capacity probe: reference 'Large' dims (hidden 512 / out 256,
        # main.py:86-89).
        "large_dims": dict(agg="mean_nn", lr=5.65e-3, pool=2560,
                           hidden=512, out=256),
    }
    train_etypes = tuple(data.train_pairs.keys())
    train_eids = {et: np.arange(g.num_edges(et)) for et in train_etypes}
    host_edges = {
        et: (u, i, np.ones_like(u, dtype=np.float32))
        for et, (u, i) in data.train_pairs.items()
    }

    results = {}
    g_leaf = None  # lane-packed leaf cache, built once on first use
    for name in args.configs.split(","):
        c = CONFIGS[name]
        model = build_model(c["agg"], c.get("n_layers", 3),
                            c.get("pred", "cos"), c.get("hetero", "sum"),
                            c.get("embedding_layer", True),
                            c.get("norm", True), c.get("dropout", 0.0),
                            c.get("hidden", 256), c.get("out", 128))
        n_conv = model.num_conv_layers
        if c.get("full_fanout"):
            fanouts = (-1,) * n_conv
            if g_leaf is None:
                from gnn_recsys_tpu.graph.hetero import attach_leaf_features

                g_leaf = attach_leaf_features(
                    g, feats, dtype=None if args.cpu else jnp.bfloat16)
            g_run = g_leaf
        else:
            fanouts = tuple([8, 4, 4, 4][:n_conv])
            g_run = g
        cfg = MinibatchConfig(
            edge_batch_size=args.edge_batch,
            fanouts=fanouts,
            neg_sample_size=min(2500, c["pool"]),
            neg_mode="dense_pool",
            neg_pool_size=c["pool"],
            dedup=n_conv >= 3,  # bound deep/full trees by unique nodes
            delta=c.get("delta", 0.266),
            loss=c.get("loss", "max_margin"),
            softmax_tau=c.get("tau", 0.1),
            lr=c["lr"],
            lr_schedule=args.lr_schedule,
            num_epochs=args.epochs,
            metrics_every=args.metrics_every,
            patience=args.epochs,  # no early stop; we want the curve
            k=k,
        )
        t0 = time.perf_counter()
        state, history = train_minibatch(
            model, g_run, data.graph, feats, train_eids, None, cfg,
            test_ground_truth=data.test_ground_truth,
            already_bought=(bu, bi),
            verbose=True,
            host_edges=host_edges,
        )
        wall = time.perf_counter() - t0
        rec = [round(float(r), 5) for r in history["recall"]]
        # Popularity-boosted final eval (reference src/metrics.py:69-72 —
        # the 'popularity_importance' HP): cosine scores are magnitude-
        # normalized, so on popularity-heavy data the raw model cannot
        # express the popularity prior; the boost composes the two.
        from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
        from gnn_recsys_tpu.train.minibatch import infer_embeddings

        from gnn_recsys_tpu.retrieval.recs import model_score_fn

        sfn = model_score_fn(model.pred, state.params)
        h = infer_embeddings(model, state.params, g, feats,
                             ntypes=("user", "item"))
        deg = np.bincount(bi, minlength=args.items).astype(np.float32)
        # Reference popularity semantics: purchase FRACTION
        # (counts/sum, etl.import_features) — matched to the reference
        # boost weights {0.05, 0.1, 0.2} against ~1/catalog softmax
        # scores.
        pop = jnp.asarray(deg / max(deg.sum(), 1.0))
        # The popularity VECTOR is caller-supplied (reference
        # src/metrics.py:69-72 reads g.ndata['popularity'] — a count
        # fraction).  The generator's prior is exp(w * LOG-pop), so the
        # log-count vector is the matched functional form: with ORACLE
        # latents, cos+w*logpop reaches 0.0416 of the 0.0421 full
        # ceiling vs 0.0325 for the linear fraction (round-4 ceiling
        # decomposition).  Both are swept here.
        logpop = np.log1p(deg)
        logpop = jnp.asarray(logpop / max(logpop.max(), 1e-9))
        # Small weights matter: softmax over a 15k catalog is ~1e-4 per
        # item, so large w makes the popularity prior dominate the
        # ranking outright.
        boosted = {}
        for vec_name, vec, grid in (
            # fraction vector: reference weights + a wider tail (its
            # per-item scale is ~1/catalog, like the softmax scores)
            ("lin", pop, (0.05, 0.1, 0.2, 1.0, 5.0)),
            # log-count vector normalized to [0,1]: small weights
            ("log", logpop, (3e-4, 1e-3, 3e-3, 0.01, 0.03, 0.1)),
        ):
            for w in grid:
                _, r_b, _ = get_metrics_at_k(
                    h["user"], h["item"], data.test_ground_truth,
                    (bu, bi), k,
                    popularity=vec, weight_popularity=w, backend="xla",
                    score_fn=sfn,
                )
                boosted[f"{vec_name}:{w}"] = round(float(r_b), 5)
        results[name] = {
            "recall_curve": rec,
            "recall_boosted_final": boosted,
            "loss_curve": [round(float(x), 5)
                           for x in history["train_loss"]],
            "train_wall_s": round(wall, 1),
        }
        print(f"[{name}] recall curve: {rec} boosted: {boosted} "
              f"(wall {wall:.0f}s)", file=sys.stderr)

        # Flush after every config so a timeout/kill keeps finished runs.
        os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
        out_path = os.path.join(REPO, "outputs", f"{args.out_name}.json")
        payload = {
            "meta": {
                "users": args.users, "items": args.items,
                "epochs": args.epochs, "edge_batch": args.edge_batch,
                "device": str(jax.devices()[0]),
            },
            "anchors": anchors,
            "results": results,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"-> {out_path}", file=sys.stderr)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4.5))
        for name, r in results.items():
            xs = np.arange(1, len(r["recall_curve"]) + 1) * 2
            ax.plot(xs, r["recall_curve"], marker="o", label=name)
        ax.axhline(anchors["recall_latent_ceiling"], ls="--", c="gray",
                   label="latent ceiling")
        ax.axhline(anchors["recall_popularity"], ls=":", c="gray",
                   label="popularity floor")
        ax.set_xlabel("epoch")
        ax.set_ylabel("test recall@10")
        ax.set_title("hard synthetic: training-regime separation")
        ax.legend()
        os.makedirs(os.path.join(REPO, "plots"), exist_ok=True)
        fig.savefig(os.path.join(REPO, "plots", f"{args.out_name}.png"),
                    dpi=120, bbox_inches="tight")
        print(f"-> plots/{args.out_name}.png", file=sys.stderr)
    except Exception as e:  # matplotlib optional
        print(f"plot skipped: {e!r}", file=sys.stderr)

    print(json.dumps({"anchors": anchors,
                      "final": {n: r["recall_curve"][-1]
                                for n, r in results.items()}}))


if __name__ == "__main__":
    main()
