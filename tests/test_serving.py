"""Serving stack tests: graph serialization, checkpointing, trial runner,
CLIs (click test runner), HP search, qualitative evaluation."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from gnn_recsys_tpu.config import ColumnConfig, FixedParams, HyperParams
from gnn_recsys_tpu.graph.serialize import load_graph, save_graph
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

C = ColumnConfig()


def make_csv_world(tmp_path, num_users=40, num_items=25, n=500, seed=0):
    """Small CSV dataset on disk in the reference's file layout."""
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        C.ctm_id: [f"u{i}" for i in rng.integers(0, num_users, n)],
        C.specific_item_id: [f"it{i}" for i in rng.integers(0, num_items, n)],
        C.buy: rng.integers(0, 2, n),
        C.hit_date: [f"2021-05-{d:02d}" for d in rng.integers(1, 28, n)],
        C.hit_timestamp: np.arange(n),
    }).sort_values(C.hit_timestamp)
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
    paths = {}
    for name, d in [("interactions", df), ("item_feat", itf),
                    ("user_feat", uf)]:
        p = os.path.join(tmp_path, f"{name}.csv")
        d.to_csv(p, index=False)
        paths[name] = p
    return paths, df, itf, uf


def test_graph_serialize_round_trip(tmp_path):
    data = make_synthetic_data(num_users=20, num_items=12, with_clicks=True,
                               with_sports=True, seed=1)
    g = data.graph
    path = os.path.join(tmp_path, "g.npz")
    save_graph(g, path)
    g2 = load_graph(path)
    assert g2.canonical_etypes == g.canonical_etypes
    assert g2.num_nodes_dict == g.num_nodes_dict
    for et in g.canonical_etypes:
        np.testing.assert_array_equal(g.rels[et].src, g2.rels[et].src)
        np.testing.assert_array_equal(g.rels[et].nbr, g2.rels[et].nbr)
        np.testing.assert_array_equal(g.rels[et].nbr_mask, g2.rels[et].nbr_mask)
        for name in g.rels[et].edata:
            np.testing.assert_array_equal(
                g.rels[et].edata[name], g2.rels[et].edata[name]
            )
    for nt in g.ntypes:
        for name in g.ndata[nt]:
            np.testing.assert_array_equal(
                g.ndata[nt][name], g2.ndata[nt][name]
            )


def test_save_load_params_round_trip(tmp_path):
    from gnn_recsys_tpu.train.checkpoint import load_params, save_params

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    save_params(params, os.path.join(tmp_path, "params"))
    loaded = load_params(os.path.join(tmp_path, "params"))
    np.testing.assert_array_equal(loaded["a"], params["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], params["b"]["c"])


@pytest.mark.slow
def test_full_train_then_inference_cli(tmp_path):
    """CSV files -> main_train CLI -> run dir -> main_inference CLI."""
    from gnn_recsys_tpu.cli.main_inference import main as infer_cli
    from gnn_recsys_tpu.cli.main_train import main as train_cli

    paths, df, itf, uf = make_csv_world(tmp_path)
    out_dir = os.path.join(tmp_path, "run")
    hyper_json = os.path.join(tmp_path, "hyper.json")
    with open(hyper_json, "w") as f:
        json.dump(
            {"embed_dim": "small", "neg_sample_size": 10,
             "aggregator_type": "mean", "dropout": 0.0, "n_layers": 3,
             "use_recency": False, "embedding_layer": True,
             "popularity_importance": "no"},
            f,
        )
    runner = CliRunner()
    res = runner.invoke(
        train_cli,
        [
            "--interactions-path", paths["interactions"],
            "--item-feat-path", paths["item_feat"],
            "--user-feat-path", paths["user_feat"],
            "--out-dir", out_dir,
            "--hyper-json", hyper_json,
            "--num-epochs", "3",
            "--edge-batch-size", "128",
            "--test-days", "5",
            "--result-filepath", os.path.join(tmp_path, "log.txt"),
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "FULL TRAIN recall=" in res.output
    assert os.path.exists(os.path.join(out_dir, "graph.npz"))
    assert os.path.exists(os.path.join(out_dir, "model.json"))

    # inference for two known users
    known = pd.read_csv(paths["interactions"])[C.ctm_id].unique()[:2]
    res = runner.invoke(
        infer_cli,
        ["--run-dir", out_dir, "--k", "5",
         "--user-ids", known[0], "--user-ids", known[1]],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    lines = [l for l in res.output.strip().splitlines() if ":" in l]
    assert len(lines) == 2
    # each line lists 5 external item ids
    assert lines[0].count("it") == 5 or lines[0].count("'") >= 5

    # --mesh N: distributed serving (embedding inference sharded over all
    # devices + catalog-sharded retrieval) must return the SAME recs.
    res_mesh = runner.invoke(
        infer_cli,
        ["--run-dir", out_dir, "--k", "5",
         "--user-ids", known[0], "--user-ids", known[1], "--mesh", "8"],
        catch_exceptions=False,
    )
    assert res_mesh.exit_code == 0, res_mesh.output
    mesh_lines = [
        l for l in res_mesh.output.strip().splitlines() if ":" in l
    ]
    assert mesh_lines == lines


@pytest.mark.slow
def test_run_trial_on_dataframes(tmp_path):
    from gnn_recsys_tpu.trial import run_trial

    _, df, itf, uf = make_csv_world(tmp_path, n=400)
    from gnn_recsys_tpu.data.presplit import presplit_data

    tr, te = presplit_data(itf, df, num_min=2, test_size_days=6)
    fixed = FixedParams(include_sport=False, num_epochs=3,
                        edge_batch_size=128, valid_size=0.1)
    hyper = HyperParams(embed_dim="small", n_layers=3, neg_sample_size=10,
                        aggregator_type="mean", use_recency=True,
                        embedding_layer=True, dropout=0.0)
    result = run_trial(
        fixed, hyper,
        dataframes=dict(train=tr, test=te, item_feat=itf, user_feat=uf),
        neg_pool_size=32,
    )
    assert np.isfinite(result.recall)
    assert result.train_time_s > 0
    assert len(result.history["train_loss"]) == 3
    # In-loop inference eval ran (run_inference defaults to 1, reference
    # utils_data.py:98): recall of the same weights on a graph rebuilt
    # with remove_on_inference user sampling.
    assert result.inference_recall is not None
    assert np.isfinite(result.inference_recall)
    assert result.inference_recall_all_users is None  # run_inference == 1

    # start_epoch plumbs through to the training loop: epochs
    # [start_epoch, num_epochs) run (reference main.py:537 -> run.py:83).
    fixed2 = dataclasses.replace(fixed, start_epoch=1, run_inference=0)
    result2 = run_trial(
        fixed2, hyper,
        dataframes=dict(train=tr, test=te, item_feat=itf, user_feat=uf),
        neg_pool_size=32,
    )
    assert len(result2.history["train_loss"]) == 2
    assert result2.inference_recall is None  # run_inference == 0


def test_hpsearch_resume(tmp_path):
    from gnn_recsys_tpu.hpsearch import latest_checkpoint, run_search

    calls = []

    def fitness(h):
        calls.append(h)
        return float(h.delta)  # deterministic pseudo-recall

    s1 = run_search(fitness, n_calls=3, logdir=str(tmp_path), seed=46)
    assert len(s1.trials) == 3
    # first trial is the defaults (x0)
    assert s1.trials[0].hyper == HyperParams()
    # resume adds only the remaining trials
    s2 = run_search(fitness, n_calls=5, logdir=str(tmp_path), seed=46)
    assert len(s2.trials) == 5
    assert len(calls) == 5
    assert latest_checkpoint(str(tmp_path)) is not None
    # objectives are negated recalls
    assert s2.best.objective == -max(t.hyper.delta for t in s2.trials)


def test_explore_and_coverage(tmp_path, capsys):
    from gnn_recsys_tpu.evaluation.explore import (
        check_coverage,
        explore_recs,
        explore_sports,
    )

    _, df, itf, uf = make_csv_world(tmp_path)
    pdt_id = pd.DataFrame({
        C.specific_item_id: itf[C.specific_item_id],
        "pdt_new_id": np.arange(len(itf)),
    })
    ctm_id = pd.DataFrame({
        C.ctm_id: uf[C.ctm_id],
        "ctm_new_id": np.arange(len(uf)),
    })
    recs = {0: [1, 2, 3], 1: [4, 5, 6]}
    ui = df.copy()
    ui["ctm_new_id"] = 0
    ui["pdt_new_id"] = 1
    explore_recs(recs, ui, itf, pdt_id, ctm_id, num_choices=2)
    out = check_coverage(ui, itf, pdt_id, recs)
    assert set(out) == {"transactions", "recommendations"}
    assert 0 <= out["recommendations"]["is_junior"] <= 1

    spt_id = pd.DataFrame({C.spt_id: ["s0", "s1", "s2"],
                           "spt_new_id": [0, 1, 2]})
    sport_feat = pd.DataFrame({C.spt_id: ["s0", "s1", "s2"],
                               "name": ["run", "bike", "swim"]})
    emb = np.asarray([[1, 0], [0.9, 0.1], [0, 1]], np.float32)
    sims = explore_sports(emb, sport_feat, spt_id, num_choices=3, top=1)
    assert sims["run"] == ["bike"]


def test_inference_eval_with_overrides(tmp_path):
    """Train on one data regime, re-evaluate on a rebuilt regime
    (reference inference_hp.inference_fn semantics)."""
    from gnn_recsys_tpu.data.presplit import presplit_data
    from gnn_recsys_tpu.inference_eval import inference_fn
    from gnn_recsys_tpu.trial import build_model, minibatch_config
    from gnn_recsys_tpu.data.etl import GraphData
    from gnn_recsys_tpu.data.split import train_valid_split
    from gnn_recsys_tpu.train.minibatch import train_minibatch

    _, df, itf, uf = make_csv_world(tmp_path, n=400, seed=9)
    tr, te = presplit_data(itf, df, num_min=2, test_size_days=6)
    fixed = FixedParams(include_sport=False, num_epochs=2,
                        edge_batch_size=128)
    hyper = HyperParams(embed_dim="small", neg_sample_size=8,
                        aggregator_type="mean", dropout=0.0,
                        embedding_layer=True, use_recency=False,
                        popularity_importance="no")
    dfs = dict(train=tr, test=te, item_feat=itf, user_feat=uf)
    gd = GraphData.from_dataframes(fixed, **dfs)
    split = train_valid_split(gd.graph, gd.ground_truth_test, fixed)
    model = build_model(gd, fixed, hyper)
    cfg = minibatch_config(fixed, hyper, model, neg_pool_size=16)
    cfg.num_epochs = 2
    feats = {nt: gd.graph.ndata[nt]["features"] for nt in gd.graph.ntypes}
    state, _ = train_minibatch(model, split.train_graph, gd.graph, feats,
                               split.train_eids, None, cfg)
    # re-evaluate under a shorter purchase window
    p, r, c = inference_fn(state.params, model, fixed, hyper, dfs,
                           days_of_purchases=15, days_of_clicks=15)
    assert 0 <= p <= 1 and 0 <= r <= 1 and 0 <= c <= 1


def test_throughput_meter():
    import time as _t
    from gnn_recsys_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter()
    m.start()
    _t.sleep(0.01)
    rate = m.stop(100)
    assert rate > 0 and m.mean_edges_per_s > 0


@pytest.mark.slow
def test_run_trial_with_sports(tmp_path):
    """include_sport end-to-end: 10-etype hetero graph through a trial."""
    from gnn_recsys_tpu.data.presplit import presplit_data
    from gnn_recsys_tpu.trial import run_trial

    _, df, itf, uf = make_csv_world(tmp_path, n=400, seed=4)
    tr, te = presplit_data(itf, df, num_min=2, test_size_days=6)
    items = itf[C.specific_item_id]
    item_sport = pd.DataFrame({
        C.specific_item_id: items,
        C.spt_id: [f"s{i % 4}" for i in range(len(items))],
    })
    user_sport = pd.DataFrame({
        C.ctm_id: uf[C.ctm_id],
        C.spt_id: [f"s{i % 4}" for i in range(len(uf))],
    })
    sport_sportg = pd.DataFrame({
        C.sports_id: [f"s{i}" for i in range(4)],
        C.sportsgroup_id: ["g0", "g0", "g1", "g1"],
    })
    sport_feat = pd.DataFrame({C.spt_id: [f"s{i}" for i in range(4)] + ["g0", "g1"],
                               "name": list("abcdef")})
    sport_onehot = pd.DataFrame({
        C.spt_id: [f"s{i}" for i in range(4)] + ["g0", "g1"],
        **{f"h{j}": [1 if i == j else 0 for i in range(6)] for j in range(6)},
    })
    fixed = FixedParams(include_sport=True, num_epochs=2, edge_batch_size=128,
                        inference_mode="full_graph")
    hyper = HyperParams(embed_dim="small", neg_sample_size=8,
                        aggregator_type="mean", dropout=0.0,
                        embedding_layer=True, use_recency=True,
                        popularity_importance="small")
    save_dir = os.path.join(tmp_path, "sports_run")
    # check_embedding=True exercises explore_recs / explore_sports /
    # check_coverage on the trained sports model (reference main.py:314-400);
    # save_threshold=-1 forces a save so inference_ondemand can run below.
    result = run_trial(
        fixed, hyper,
        dataframes=dict(train=tr, test=te, item_feat=itf, user_feat=uf,
                        item_sport=item_sport, user_sport=user_sport,
                        sport_sportg=sport_sportg, sport_feat=sport_feat,
                        sport_onehot=sport_onehot),
        neg_pool_size=16,
        save_dir=save_dir,
        save_threshold=-1.0,
        check_embedding=True,
    )
    assert np.isfinite(result.recall)
    assert result.saved_to == save_dir

    # Full 10-etype schema through on-demand inference with full_graph
    # embedding (reference main_inference.py flow on a sports graph).
    from gnn_recsys_tpu.inference import inference_ondemand

    known = tr[C.ctm_id].unique()[:3]
    recs = inference_ondemand(save_dir, list(known), k=5,
                              inference_mode="full_graph")
    assert set(recs) == set(known)
    assert all(len(v) == 5 for v in recs.values())


def test_bucket_shapes_collapses_compile_keys(tmp_path):
    """bucket_shapes rounds negatives up to 128 and truncates eid sets to
    256 multiples — HP trials differing only in float-valued sample
    fractions / raw negative counts then share compiled shapes."""
    from gnn_recsys_tpu.trial import build_model, minibatch_config

    _, df, itf, uf = make_csv_world(tmp_path, n=400)
    from gnn_recsys_tpu.data.etl import GraphData

    fixed = FixedParams(include_sport=False, bucket_shapes=True,
                        run_inference=0)
    h1 = HyperParams(neg_sample_size=701)
    h2 = HyperParams(neg_sample_size=767)
    gd = GraphData.from_dataframes(fixed, train=df, test=df, item_feat=itf,
                                   user_feat=uf)
    m = build_model(gd, fixed, h1)
    c1 = minibatch_config(fixed, h1, m)
    c2 = minibatch_config(fixed, h2, m)
    assert c1.neg_sample_size == c2.neg_sample_size == 768
    # Exact semantics preserved when the knob is off.
    off = dataclasses.replace(fixed, bucket_shapes=False)
    assert minibatch_config(off, h1, m).neg_sample_size == 701


@pytest.mark.slow
def test_run_trial_partial_sampler(tmp_path):
    """neighbor_sampler='partial' (the reference's fanout-[1,1,1]
    MultiLayerNeighborSampler, sampling.py:158-159) runs end-to-end at
    trial level and produces finite metrics."""
    from gnn_recsys_tpu.trial import run_trial

    _, df, itf, uf = make_csv_world(tmp_path, n=400)
    from gnn_recsys_tpu.data.presplit import presplit_data

    tr, te = presplit_data(itf, df, num_min=2, test_size_days=6)
    fixed = FixedParams(include_sport=False, num_epochs=2,
                        edge_batch_size=128, valid_size=0.1,
                        neighbor_sampler="partial", run_inference=0)
    hyper = HyperParams(embed_dim="small", n_layers=3, neg_sample_size=10,
                        aggregator_type="mean_nn", use_recency=False,
                        embedding_layer=False, dropout=0.1)
    result = run_trial(
        fixed, hyper,
        dataframes=dict(train=tr, test=te, item_feat=itf, user_feat=uf),
        neg_pool_size=32,
    )
    assert np.isfinite(result.recall)
    assert len(result.history["train_loss"]) == 2


def test_run_trial_max_fanout_caps_rows(tmp_path):
    """FixedParams.max_fanout bounds the padded CSC width at graph build
    (most-recent edges kept; TPU memory control on power-law data)."""
    from gnn_recsys_tpu.data.etl import GraphData

    _, df, itf, uf = make_csv_world(tmp_path, n=400)
    fixed = FixedParams(include_sport=False, max_fanout=4, run_inference=0)
    gd = GraphData.from_dataframes(fixed, train=df, test=df, item_feat=itf,
                                   user_feat=uf, max_fanout=fixed.max_fanout)
    for et, rel in gd.graph.rels.items():
        assert rel.max_fanout <= 8, (et, rel.max_fanout)  # cap + tile pad


def test_softmax_trained_serving_defaults_boost_free():
    """Boost-transfer policy (r5 finding): the reference popularity boost
    (src/metrics.py:69-72) serves by default only on hinge-trained
    latents; softmax-trained models serve boost-free even when
    popularity_importance is on.  Feature-side popularity is unaffected."""
    import dataclasses

    from gnn_recsys_tpu.config import HyperParams

    h = HyperParams(popularity_importance="medium")
    assert h.use_popularity
    assert h.serve_with_popularity_boost

    hs = dataclasses.replace(h, loss="sampled_softmax")
    assert hs.use_popularity  # popularity FEATURES still built
    assert not hs.serve_with_popularity_boost

    assert not HyperParams().serve_with_popularity_boost  # 'no' default
