"""End-to-end CLI drill on temporally-drifting hard-synthetic data.

Round-3 verdict item 8: the zero-egress environment blocks staging a real
interaction log, so this harness extends the hard synthetic (latent
factor + Zipf popularity, benchmarks/quality_hard.py) with TEMPORAL
DRIFT — items have finite active windows over an ~540-day history — so
the reference's date-window ETL semantics (``days_of_purchases=365``,
``days_of_clicks=30``, ``lifespan_of_items=180``;
``/root/reference/src/builder.py:96-119``) actually FILTER rows, then
drives all three CLIs on the files:

  1. ``cli.main_hp``        — GP-EI trials over the presplit train/test;
  2. ``cli.main_train``     — 1-day presplit full train, artifacts saved;
  3. ``cli.main_inference`` — loads the run dir, recs for named external
                              ids and ``--all``.

Asserts along the way: each date window drops a nonzero number of rows
(drift is real), every CLI exits 0, train artifacts round-trip, and
inference returns k recs per requested user with external id mapping.

Usage: python benchmarks/e2e_drift_cli.py [--outdir outputs/e2e_drift]
       [--users 3000] [--items 900] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_drift_csvs(outdir, num_users=3000, num_items=900, per_user=30,
                    total_days=540, latent_dim=8, beta=5.0,
                    pop_weight=0.5, seed=0):
    """Reference-layout CSVs with latent-factor prefs + item lifecycles.

    Each item is active in a finite [birth, death) day window (uniform
    birth over the history, 120-300 day lifetimes); users interact only
    with items active that day, preferring high ``<z_u, z_i>`` + popular
    items.  60/40 buys/clicks.  The LAST day carries extra purchase mass
    so the 1-day test presplit (reference main_train.py:89-96) has
    support.
    """
    import numpy as np
    import pandas as pd

    from gnn_recsys_tpu.config import ColumnConfig

    C = ColumnConfig()
    rng = np.random.default_rng(seed)
    zu = rng.normal(size=(num_users, latent_dim))
    zi = rng.normal(size=(num_items, latent_dim))
    logpop = -0.9 * np.log(rng.permutation(num_items) + 1.0)
    birth = rng.integers(0, total_days - 60, num_items)
    death = np.minimum(birth + rng.integers(120, 300, num_items),
                       total_days)
    base = pd.Timestamp("2020-01-01")
    rows = []
    for u in range(num_users):
        # Half the interactions land in the last 120 days so recent
        # windows keep the graph connected; the rest spread over history.
        days = np.concatenate([
            rng.integers(0, total_days, per_user // 2),
            rng.integers(total_days - 120, total_days, per_user // 2),
        ])
        for d in days:
            active = np.flatnonzero((birth <= d) & (d < death))
            if len(active) == 0:
                continue
            logits = beta * (zi[active] @ zu[u]) / np.sqrt(latent_dim) \
                + pop_weight * logpop[active]
            logits -= logits.max()
            pvec = np.exp(logits)
            it = int(rng.choice(active, p=pvec / pvec.sum()))
            buy = int(rng.random() < 0.6)
            date = base + pd.Timedelta(days=int(d))
            rows.append((f"u{u}", f"it{it}", buy,
                         date.strftime("%Y-%m-%d"),
                         int(d) * 100000 + len(rows)))
    df = pd.DataFrame(rows, columns=[C.ctm_id, C.specific_item_id, C.buy,
                                     C.hit_date, C.hit_timestamp])
    itf = pd.DataFrame({
        C.specific_item_id: [f"it{i}" for i in range(num_items)],
        C.general_item_id: [f"g{i // 3}" for i in range(num_items)],
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
    return paths, df


def assert_windows_filter(df, item_feat_path):
    """The reference date windows must each drop rows on this data."""
    import pandas as pd

    from gnn_recsys_tpu.config import ColumnConfig, FixedParams
    from gnn_recsys_tpu.data.etl import format_dfs

    C = ColumnConfig()
    fp = FixedParams()  # 365 / 30 / 180 day windows
    item_feat = pd.read_csv(item_feat_path)

    empty_is = pd.DataFrame({C.specific_item_id: [], C.spt_id: []})
    empty_us = pd.DataFrame({C.ctm_id: [], C.spt_id: []})
    empty_sg = pd.DataFrame(
        {C.sports_id: [], C.sportsgroup_id: [], C.spt_id: []}
    )
    empty_sf = pd.DataFrame({C.spt_id: []})
    user_feat = pd.DataFrame({C.ctm_id: []})

    def n_rows(days_p, days_c, lifespan):
        out = format_dfs(
            df.copy(), df.iloc[0:0].copy(), empty_is, empty_us, empty_sg,
            item_feat, user_feat, empty_sf, empty_sf,
            days_of_purchases=days_p, days_of_clicks=days_c,
            lifespan_of_items=lifespan, columns=C,
            print_fn=lambda *a, **k: None,
        )
        return len(out[0])

    full = n_rows(10_000, 10_000, 10_000)
    cut_p = n_rows(fp.days_of_purchases, 10_000, 10_000)
    cut_c = n_rows(10_000, fp.days_of_clicks, 10_000)
    cut_l = n_rows(365, 10_000, fp.lifespan_of_items)
    assert cut_p < full, "days_of_purchases dropped nothing"
    assert cut_c < full, "days_of_clicks dropped nothing"
    assert cut_l < cut_p, "lifespan_of_items dropped nothing"
    return {"rows_full": full, "rows_purchase_window": cut_p,
            "rows_click_window": cut_c, "rows_lifespan": cut_l}


def run(cmd, timeout=1500):
    print("+", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         timeout=timeout)
    dt = time.perf_counter() - t0
    if res.returncode != 0:
        print(res.stdout[-4000:])
        print(res.stderr[-4000:])
        raise SystemExit(f"FAILED ({dt:.0f}s): {' '.join(cmd)}")
    print(f"  ok in {dt:.0f}s", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="outputs/e2e_drift")
    ap.add_argument("--users", type=int, default=3000)
    ap.add_argument("--items", type=int, default=900)
    ap.add_argument("--quick", action="store_true",
                    help="2 HP trials / 3 epochs")
    args = ap.parse_args()
    import pandas as pd

    from gnn_recsys_tpu.data.presplit import presplit_data

    report = {}
    t_all = time.perf_counter()
    datadir = os.path.join(args.outdir, "data")
    paths, df = make_drift_csvs(datadir, args.users, args.items)
    report["interactions"] = len(df)

    report["window_filtering"] = assert_windows_filter(
        df, paths["item_feat"]
    )
    print("window filtering:", report["window_filtering"], flush=True)

    # HP presplit (14-day test window, reference presplit defaults).
    item_feat = pd.read_csv(paths["item_feat"])
    train_df, test_df = presplit_data(item_feat, df)
    train_p = os.path.join(datadir, "train.csv")
    test_p = os.path.join(datadir, "test.csv")
    train_df.to_csv(train_p, index=False)
    test_df.to_csv(test_p, index=False)

    n_calls = 2 if args.quick else 3
    epochs = 3 if args.quick else 5
    hp_dir = os.path.join(args.outdir, "hp")
    os.makedirs(hp_dir, exist_ok=True)
    run([sys.executable, "-m", "gnn_recsys_tpu.cli.main_hp",
         "--train-path", train_p, "--test-path", test_p,
         "--item-feat-path", paths["item_feat"],
         "--user-feat-path", paths["user_feat"],
         "--n-calls", str(n_calls), "--num-epochs", str(epochs),
         "--remove", "0.3", "--edge-batch-size", "1024",
         "--logdir", hp_dir,
         "--result-filepath", os.path.join(hp_dir, "result_log.txt")])
    assert os.path.exists(os.path.join(hp_dir, "result_log.txt"))
    ckpts = [f for f in os.listdir(hp_dir) if f.startswith("checkpoint")]
    assert ckpts, "no HP checkpoint written"

    # Best hyper -> JSON for main_train (the reference reads the skopt
    # checkpoint the same way, main_train.py:60-74).
    import dataclasses
    import pickle

    from gnn_recsys_tpu.hpsearch import latest_checkpoint

    with open(latest_checkpoint(hp_dir), "rb") as f:
        state = pickle.load(f)
    hyper_json = os.path.join(hp_dir, "best_hyper.json")
    with open(hyper_json, "w") as f:
        json.dump(dataclasses.asdict(state.best.hyper), f)
    report["hp_trials"] = len(state.trials)
    report["hp_best_recall"] = round(-state.best.objective, 5)

    run_dir = os.path.join(args.outdir, "models", "run1")
    run([sys.executable, "-m", "gnn_recsys_tpu.cli.main_train",
         "--interactions-path", paths["interactions"],
         "--item-feat-path", paths["item_feat"],
         "--user-feat-path", paths["user_feat"],
         "--hyper-json", hyper_json,
         "--num-epochs", str(epochs), "--patience", str(epochs + 1),
         "--edge-batch-size", "1024",
         "--out-dir", run_dir,
         "--result-filepath", os.path.join(args.outdir, "train_log.txt")])
    saved = os.listdir(run_dir)
    print("train artifacts:", saved, flush=True)
    report["train_artifacts"] = sorted(saved)

    ids = [f"u{i}" for i in (7, 42, 1234)]
    res = run([sys.executable, "-m", "gnn_recsys_tpu.cli.main_inference",
               "--run-dir", run_dir] +
              sum((["--user-ids", i] for i in ids), []) + ["--k", "10"])
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("u")]
    assert len(lines) == len(ids), res.stdout
    for ln in lines:
        uid, items = ln.split(":", 1)
        assert uid in ids
        n_items = len(items.strip().strip("[]").split(","))
        assert n_items == 10, ln
    report["inference_users"] = len(lines)

    res = run([sys.executable, "-m", "gnn_recsys_tpu.cli.main_inference",
               "--run-dir", run_dir, "--all", "--k", "5"])
    all_lines = [ln for ln in res.stdout.splitlines()
                 if ln.startswith("u")]
    assert len(all_lines) > args.users // 2, len(all_lines)
    report["inference_all_users"] = len(all_lines)
    report["wall_s"] = round(time.perf_counter() - t_all, 1)

    out = os.path.join(REPO, "docs", "results", "e2e_drift_cli.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("E2E OK ->", out)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
