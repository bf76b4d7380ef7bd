"""ETL pipeline tests: presplit, id mapping, duplicates policies, features,
recency/occurrence, train/valid split — semantics of reference
presplit.py / src/builder.py / src/utils_data.py / src/sampling.py:5-114."""

import numpy as np
import pandas as pd
import pytest

from gnn_recsys_tpu.config import GENERAL, SPECIFIC, ColumnConfig, FixedParams
from gnn_recsys_tpu.data.etl import GraphData, create_ids, format_dfs
from gnn_recsys_tpu.data.presplit import presplit_data
from gnn_recsys_tpu.data.split import train_valid_split

C = ColumnConfig()
ET_BUYS = ("user", "buys", "item")
ET_CLICKS = ("user", "clicks", "item")
REV_BUYS = ("item", "bought-by", "user")


def interactions_df(rows):
    """rows: list of (user, specific_item, buy, date, ts)."""
    return pd.DataFrame(
        rows,
        columns=[C.ctm_id, C.specific_item_id, C.buy, C.hit_date,
                 C.hit_timestamp],
    )


def item_feat_df(items, generals=None):
    n = len(items)
    return pd.DataFrame({
        C.specific_item_id: items,
        C.general_item_id: generals if generals is not None else items,
        "is_junior": np.arange(n) % 2,
        "is_male": (np.arange(n) + 1) % 2,
        "is_female": np.zeros(n, int),
        "eco_design": np.ones(n, int),
    })


def user_feat_df(users):
    n = len(users)
    return pd.DataFrame({
        C.ctm_id: users,
        "is_male": np.arange(n) % 2,
        "is_female": (np.arange(n) + 1) % 2,
    })


def toy_data():
    rows = [
        ("u1", "A", 1, "2021-01-01", 1),
        ("u1", "B", 0, "2021-01-02", 2),
        ("u2", "A", 1, "2021-01-03", 3),
        ("u2", "A", 1, "2021-01-04", 4),  # duplicate purchase u2-A
        ("u3", "C", 0, "2021-01-05", 5),
        ("u1", "C", 1, "2021-01-06", 6),
        ("u3", "B", 1, "2021-01-07", 7),
    ]
    train = interactions_df(rows)
    test = interactions_df([
        ("u1", "B", 1, "2021-01-08", 8),
        ("u2", "C", 0, "2021-01-09", 9),
    ])
    itf = item_feat_df(["A", "B", "C", "D"], generals=["gA", "gB", "gA", "gD"])
    uf = user_feat_df(["u1", "u2", "u3"])
    return train, test, itf, uf


def test_presplit_semantics():
    train, test, itf, uf = toy_data()
    df = pd.concat([train, test], ignore_index=True)
    # u2 has 3 interactions, u1 has 4, u3 has 2 -> num_min=3 drops u3
    tr, te = presplit_data(itf, df, num_min=3, remove_unk=True,
                           test_size_days=3)
    assert "u3" not in set(tr[C.ctm_id]) | set(te[C.ctm_id])
    # temporal boundary: most recent 2021-01-09 minus 3 days = 01-06
    assert (tr[C.hit_date] <= "2021-01-06").all()
    assert (te[C.hit_date] > "2021-01-06").all()
    # test-set users must appear in train
    assert set(te[C.ctm_id]) <= set(tr[C.ctm_id])


def test_presplit_remove_unknown_items():
    train, test, itf, uf = toy_data()
    df = pd.concat([train, test], ignore_index=True)
    df.loc[len(df)] = ("u1", "UNKNOWN", 1, "2021-01-05", 10)
    tr, te = presplit_data(itf, df, num_min=0, remove_unk=True,
                           test_size_days=2)
    assert "UNKNOWN" not in set(tr[C.specific_item_id])


def test_create_ids_contiguous_and_unseen_appended():
    train, test, itf, uf = toy_data()
    sport_empty = pd.DataFrame({C.spt_id: [], C.sports_id: [],
                                C.sportsgroup_id: []})
    ctm, pdt, spt = create_ids(train, sport_empty, sport_empty, itf)
    # users in first-appearance order
    assert ctm[C.ctm_id].tolist() == ["u1", "u2", "u3"]
    assert ctm.ctm_new_id.tolist() == [0, 1, 2]
    # items: train order A,B,C then unseen D appended last
    assert pdt[C.specific_item_id].tolist() == ["A", "B", "C", "D"]
    assert pdt.pdt_new_id.tolist() == [0, 1, 2, 3]


def test_graphdata_keep_all_duplicates():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="keep_all", include_sport=False,
                     days_of_purchases=710, days_of_clicks=710,
                     lifespan_of_items=710)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf)
    # 5 purchases (incl. duplicate u2-A twice), 2 clicks
    assert gd.graph.num_edges(ET_BUYS) == 5
    assert gd.graph.num_edges(ET_CLICKS) == 2
    # reverse shares edge order
    b, rb = gd.graph.rels[ET_BUYS], gd.graph.rels[REV_BUYS]
    assert np.asarray(b.src).tolist() == np.asarray(rb.dst).tolist()
    assert np.asarray(b.dst).tolist() == np.asarray(rb.src).tolist()
    # unseen item D exists as node 3 with features, but no edges
    assert gd.num_nodes["item"] == 4
    assert np.asarray(gd.graph.ndata["item"]["features"])[3].sum() != 0


def test_graphdata_count_occurrence():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="count_occurrence", include_sport=False)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf)
    # duplicate u2-A collapsed: 4 purchase edges, occurrence 2 for u2-A
    assert gd.graph.num_edges(ET_BUYS) == 4
    occ = np.asarray(gd.graph.rels[ET_BUYS].edata["occurrence"])
    src = np.asarray(gd.graph.rels[ET_BUYS].src)
    dst = np.asarray(gd.graph.rels[ET_BUYS].dst)
    # find the u2->A edge (u2 = id 1, A = id 0)
    i = np.where((src == 1) & (dst == 0))[0]
    assert len(i) == 1 and occ[i[0]] == 2.0
    # all other occurrence values are 1
    assert occ.sum() == 5.0
    # reverse carries the same occurrence values
    occ_rev = np.asarray(gd.graph.rels[REV_BUYS].edata["occurrence"])
    np.testing.assert_array_equal(occ, occ_rev)


def test_graphdata_recency():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="keep_all", include_sport=False)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf, use_recency=True)
    rec = np.asarray(gd.graph.rels[ET_BUYS].edata["recency"])
    # max train date 2021-01-07; purchases at 01-01,01-03,01-04,01-06,01-07
    # -> days +1 = 7,5,4,2,1 (edge order = timestamp order)
    assert sorted(rec.tolist()) == [1.0, 2.0, 4.0, 5.0, 7.0]


def test_graphdata_popularity():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="keep_all", include_sport=False)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf, use_popularity=True,
                                   days_popularity=100)
    pop = np.asarray(gd.graph.ndata["item"]["popularity"]).ravel()
    # counts over full window: A:3, B:2, C:2 of 7 interactions
    np.testing.assert_allclose(pop[:3], [3 / 7, 2 / 7, 2 / 7])
    assert pop[3] == 0  # unseen item


def test_graphdata_general_item_id():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="keep_all", include_sport=False,
                     item_id_type=GENERAL)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf)
    # A and C share general id gA -> 3 general items: gA, gB, gD
    assert gd.num_nodes["item"] == 3
    # general ids get zero features (src/builder.py:454-455)
    assert np.asarray(gd.graph.ndata["item"]["features"]).sum() == 0


def test_graphdata_user_features_scatter():
    train, test, itf, uf = toy_data()
    fp = FixedParams(duplicates="keep_all", include_sport=False)
    gd = GraphData.from_dataframes(fp, train, test, item_feat=itf,
                                   user_feat=uf)
    feats = np.asarray(gd.graph.ndata["user"]["features"])
    # u1 row: is_male=0, is_female=1 ; u2: 1,0 ; u3: 0,1
    np.testing.assert_array_equal(feats, [[0, 1], [1, 0], [0, 1]])


def test_graphdata_with_sports():
    train, test, itf, uf = toy_data()
    item_sport = pd.DataFrame({
        C.specific_item_id: ["A", "B", "C"],
        C.spt_id: ["s1", "s1", "s2"],
    })
    user_sport = pd.DataFrame({
        C.ctm_id: ["u1", "u2"],
        C.spt_id: ["s1", "s2"],
    })
    sport_sportg = pd.DataFrame({
        C.sports_id: ["s1", "s2"],
        C.sportsgroup_id: ["g1", "g1"],
    })
    sport_feat = pd.DataFrame({C.spt_id: ["s1", "s2", "g1"],
                               "name": ["a", "b", "c"]})
    sport_onehot = pd.DataFrame({
        C.spt_id: ["s1", "s2", "g1"],
        "h0": [1, 0, 0], "h1": [0, 1, 0], "h2": [0, 0, 1],
    })
    fp = FixedParams(duplicates="keep_all", include_sport=True)
    gd = GraphData.from_dataframes(
        fp, train, test, item_sport=item_sport, user_sport=user_sport,
        sport_sportg=sport_sportg, item_feat=itf, user_feat=uf,
        sport_feat=sport_feat, sport_onehot=sport_onehot,
    )
    assert gd.num_nodes["sport"] == 3  # s1, s2, g1
    assert gd.graph.num_edges(("item", "utilized-for", "sport")) == 3
    assert gd.graph.num_edges(("user", "practices", "sport")) == 2
    assert gd.graph.num_edges(("sport", "belongs-to", "sport")) == 2
    assert np.asarray(gd.graph.ndata["sport"]["features"]).shape == (3, 3)


def test_format_dfs_time_windows():
    train, test, itf, uf = toy_data()
    out = format_dfs(
        train, test, pd.DataFrame({C.specific_item_id: [], C.spt_id: []}),
        pd.DataFrame({C.ctm_id: [], C.spt_id: []}),
        pd.DataFrame({C.sports_id: [], C.sportsgroup_id: [], C.spt_id: []}),
        itf, uf, pd.DataFrame({C.spt_id: []}), pd.DataFrame({C.spt_id: []}),
        days_of_purchases=3, days_of_clicks=710, lifespan_of_items=710,
    )
    ui_train = out[0]
    # purchases older than 2021-01-04 dropped, clicks kept
    buys = ui_train[ui_train[C.buy] == 1]
    clicks = ui_train[ui_train[C.buy] == 0]
    assert (buys[C.hit_date] >= "2021-01-04").all()
    assert len(clicks) == 2


def test_format_dfs_report_model_coverage():
    """report_model_coverage prints how many test users are uncoverable
    under the chosen windows (reference src/builder.py:167-176).

    Computed AFTER the test-user filters, like the reference: a buys-only
    time window can leave a test user with zero train interactions (u3's
    only purchase is old; their click survives, so the test filter keeps
    them — on a clicks window they would be orphaned instead).
    """
    train, test, itf, uf = toy_data()
    # u9 appears only in test; the remove==0 filter drops them pre-report.
    test = pd.concat([test, interactions_df(
        [("u9", "A", 1, "2021-01-09", 10)])], ignore_index=True)
    user_sport = pd.DataFrame({C.ctm_id: ["u2"], C.spt_id: ["s0"]})
    lines = []
    format_dfs(
        train, test, pd.DataFrame({C.specific_item_id: [], C.spt_id: []}),
        user_sport,
        pd.DataFrame({C.sports_id: [], C.sportsgroup_id: [], C.spt_id: []}),
        itf, uf, pd.DataFrame({C.spt_id: []}), pd.DataFrame({C.spt_id: []}),
        report_model_coverage=True,
        print_fn=lines.append,
    )
    assert lines[0] == "There are 0 users with no interactions"
    assert lines[1] == "and 0 with also no sports associated"
    assert lines[2] == "out of 2"  # u1, u2 survive; u9 filtered out


def test_train_valid_split_semantics():
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(num_users=50, num_items=30,
                               interactions_per_user=10, with_clicks=True,
                               seed=4)
    fp = FixedParams(include_sport=False, valid_size=0.1, subtrain_size=0.2)
    split = train_valid_split(data.graph, data.test_ground_truth, fp)
    e_buys = data.graph.num_edges(ET_BUYS)
    n_valid = e_buys - int(e_buys * 0.9)
    assert len(split.valid_eids[ET_BUYS]) == n_valid
    # valid eids are the LAST (most recent) edges
    assert split.valid_eids[ET_BUYS].min() == int(e_buys * 0.9)
    # train graph lost the valid edges and their reverses
    assert split.train_graph.num_edges(ET_BUYS) == e_buys - n_valid
    assert split.train_graph.num_edges(REV_BUYS) == e_buys - n_valid
    assert len(split.train_eids[ET_BUYS]) == e_buys - n_valid
    # subtrain users ⊆ train users; ground truths align
    t_src = np.asarray(split.train_graph.rels[ET_BUYS].src)
    assert set(split.subtrain_uids) <= set(t_src.tolist())
    assert len(split.ground_truth_valid[0]) > 0
    assert split.all_iids.shape[0] == 30
    # recency subsampling keeps the most recent fraction
    split2 = train_valid_split(data.graph, data.test_ground_truth, fp,
                               purchases_sample=0.5)
    e_train = e_buys - n_valid
    assert len(split2.train_eids[ET_BUYS]) == e_train - int(e_train * 0.5)
    assert split2.train_eids[ET_BUYS].min() == int(e_train * 0.5)


@pytest.mark.slow
def test_etl_to_training_end_to_end():
    """CSV-level dataframes -> GraphData -> split -> short minibatch run."""
    rng = np.random.default_rng(0)
    n_rows = 400
    users = [f"u{i}" for i in rng.integers(0, 40, n_rows)]
    items = [f"it{i}" for i in rng.integers(0, 25, n_rows)]
    dates = [f"2021-02-{d:02d}" for d in rng.integers(1, 28, n_rows)]
    df = pd.DataFrame({
        C.ctm_id: users, C.specific_item_id: items,
        C.buy: rng.integers(0, 2, n_rows),
        C.hit_date: dates, C.hit_timestamp: np.arange(n_rows),
    }).sort_values(C.hit_timestamp)
    itf = item_feat_df([f"it{i}" for i in range(25)])
    uf = user_feat_df([f"u{i}" for i in range(40)])
    tr, te = presplit_data(itf, df, num_min=2, test_size_days=5)
    fp = FixedParams(duplicates="keep_all", include_sport=False)
    gd = GraphData.from_dataframes(fp, tr, te, item_feat=itf, user_feat=uf,
                                   use_recency=True)
    split = train_valid_split(gd.graph, gd.ground_truth_test, fp)

    import jax.numpy as jnp
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.train.minibatch import MinibatchConfig, train_minibatch

    g = gd.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 2), ("item", 4), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean", pred="cos",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    cfg = MinibatchConfig(edge_batch_size=128, fanouts=(-1, -1),
                          neg_sample_size=5, neg_pool_size=16,
                          num_epochs=3, metrics_every=0, patience=10)
    state, hist = train_minibatch(
        model, split.train_graph, g, feats, split.train_eids,
        split.valid_eids, cfg,
    )
    assert np.isfinite(hist["train_loss"]).all()
    assert np.isfinite(hist["valid_loss"]).all()


def test_config_json_round_trip(tmp_path):
    import os

    from gnn_recsys_tpu.config import (
        FixedParams,
        HyperParams,
        load_config,
        save_config,
    )

    fp = FixedParams(duplicates="keep_last", remove=0.5)
    hp = HyperParams(embed_dim="large", lr=0.005)
    save_config(fp, os.path.join(tmp_path, "f.json"))
    save_config(hp, os.path.join(tmp_path, "h.json"))
    assert load_config(FixedParams, os.path.join(tmp_path, "f.json")) == fp
    hp2 = load_config(HyperParams, os.path.join(tmp_path, "h.json"))
    assert hp2 == hp and hp2.hidden_dim == 512


def test_hard_synthetic_generator_invariants():
    """make_hard_synthetic_data: train/test items disjoint per user (Gumbel
    top-k without replacement), power-law item degrees, latent anchors
    present, features low-rank+noisy (not group one-hots)."""
    from gnn_recsys_tpu.utils.synthetic import make_hard_synthetic_data

    d = make_hard_synthetic_data(num_users=300, num_items=200,
                                 interactions_per_user=8, test_per_user=2,
                                 seed=3)
    bu, bi = d.train_pairs[("user", "buys", "item")]
    gtu, gti = d.test_ground_truth
    assert len(bu) == 300 * 8 and len(gtu) == 300 * 2
    # No train/test overlap within a user; no duplicate draws per user.
    for u in range(0, 300, 37):
        tr = set(bi[bu == u].tolist())
        te = set(gti[gtu == u].tolist())
        assert len(tr) == 8 and len(te) == 2
        assert not (tr & te)
    # Power-law-ish: the busiest item gets far more than the median.
    deg = np.bincount(bi, minlength=200)
    assert deg.max() > 3 * max(np.median(deg), 1)  # skewed even at tiny scale
    assert d.user_latent.shape == (300, 16)
    assert d.item_logpop.shape == (200,)
    # Clicks present and drawn from the weaker process.
    cu, ci = d.train_pairs[("user", "clicks", "item")]
    assert len(cu) == 300 * 8
