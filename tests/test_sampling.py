"""Neighbor-sampling op tests + sampled-tree vs full-graph parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.ops.sampling import sample_neighbors
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

ET_BUYS = ("user", "buys", "item")


@pytest.fixture(scope="module")
def data():
    return make_synthetic_data(
        num_users=30, num_items=20, num_groups=3, interactions_per_user=5,
        with_clicks=True, with_sports=True, seed=2,
    )


def adj_sets(rel):
    src, dst = np.asarray(rel.src), np.asarray(rel.dst)
    out = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        out.setdefault(d, set()).add(s)
    return out


def test_full_mode_returns_all_neighbors(data):
    rel = data.graph.rels[ET_BUYS]
    ids = jnp.arange(20, dtype=jnp.int32)
    nbr, eid, mask = sample_neighbors(rel, ids, fanout=1, mode="full")
    adj = adj_sets(rel)
    for d in range(20):
        got = set(np.asarray(nbr[d])[np.asarray(mask[d])].tolist())
        assert got == adj.get(d, set())


def test_uniform_mode_draws_valid_neighbors(data):
    rel = data.graph.rels[ET_BUYS]
    ids = jnp.arange(20, dtype=jnp.int32)
    nbr, eid, mask = sample_neighbors(
        rel, ids, fanout=6, rng=jax.random.PRNGKey(0), mode="uniform"
    )
    adj = adj_sets(rel)
    deg = np.asarray(rel.deg)[:20]
    for d in range(20):
        if deg[d] == 0:
            assert not np.asarray(mask[d]).any()
        else:
            assert np.asarray(mask[d]).all()
            assert set(np.asarray(nbr[d]).tolist()) <= adj[d]
    # eids point at real edges with the right endpoints
    src, dst = np.asarray(rel.src), np.asarray(rel.dst)
    for d in range(20):
        for s_, e_, m_ in zip(np.asarray(nbr[d]), np.asarray(eid[d]),
                              np.asarray(mask[d])):
            if m_:
                assert src[e_] == s_ and dst[e_] == d


def test_exclusion_masks_edges(data):
    rel = data.graph.rels[ET_BUYS]
    ids = jnp.arange(20, dtype=jnp.int32)
    # Exclude ALL edges of the first 5 destinations.
    dst = np.asarray(rel.dst)
    excl = np.sort(np.where(dst < 5)[0]).astype(np.int32)
    nbr, eid, mask = sample_neighbors(
        rel, ids, fanout=1, mode="full",
        exclude_sorted_eids=jnp.asarray(excl),
    )
    m = np.asarray(mask)
    assert not m[:5].any()
    deg = np.asarray(rel.deg)[5:20]
    assert (m[5:20].sum(axis=1) == deg).all()


def _model_for(g, agg="mean", hetero="sum", n_layers=3):
    return ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("sport", 8), ("hidden", 16),
              ("out", 8)),
        n_layers=n_layers,
        aggregator_type=agg,
        aggregator_hetero=hetero,
        pred="cos",
        dropout=0.0,
    )


@pytest.mark.parametrize("agg", ["mean", "pool_nn", "mean_edge"])
@pytest.mark.parametrize("hetero", ["sum", "mean"])
@pytest.mark.slow
def test_sampled_full_fanout_matches_full_graph(data, agg, hetero):
    """THE parity gate: recursion with full fanouts == layer-wise full pass."""
    g = data.graph
    model = _model_for(g, agg, hetero)
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)

    def full(mdl):
        h = mdl.embed_features(feats)
        return mdl.get_repr(g, h, deterministic=True)

    h_full = model.apply(params, method=full)

    seeds = {
        "user": jnp.arange(g.num_nodes("user"), dtype=jnp.int32),
        "item": jnp.arange(g.num_nodes("item"), dtype=jnp.int32),
    }

    def sampled(mdl):
        return mdl.sampled_repr(
            g, feats, seeds, (-1, -1), jax.random.PRNGKey(1),
            deterministic=True,
        )

    h_samp = model.apply(params, method=sampled)
    for nt in ("user", "item"):
        np.testing.assert_allclose(
            np.asarray(h_samp[nt]), np.asarray(h_full[nt]),
            rtol=2e-4, atol=2e-5,
        )


def test_sampled_tree_nodedup_matches_full_graph(data):
    """The pure-tree path (dedup=False) passes the same parity gate."""
    g = data.graph
    model = _model_for(g)
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)

    def full(mdl):
        h = mdl.embed_features(feats)
        return mdl.get_repr(g, h, deterministic=True)

    h_full = model.apply(params, method=full)
    seeds = {"user": jnp.arange(g.num_nodes("user"), dtype=jnp.int32)}

    def sampled(mdl):
        return mdl.sampled_repr(
            g, feats, seeds, (-1, -1), jax.random.PRNGKey(1),
            deterministic=True, dedup=False,
        )

    h_samp = model.apply(params, method=sampled)
    np.testing.assert_allclose(
        np.asarray(h_samp["user"]), np.asarray(h_full["user"]),
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.slow
def test_dedup_duplicate_seeds_identical_rows(data):
    """Dedup'd forward computes each unique node once: duplicated seed ids
    must yield BIT-identical output rows (the tree path samples each
    occurrence independently)."""
    g = data.graph
    model = _model_for(g)
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)
    seeds = {"user": jnp.asarray([5, 9, 5, 5, 9], jnp.int32)}

    def sampled(mdl):
        return mdl.sampled_repr(g, feats, seeds, (3, 3),
                                jax.random.PRNGKey(7), deterministic=True,
                                dedup=True)

    h = np.asarray(model.apply(params, method=sampled)["user"])
    np.testing.assert_array_equal(h[0], h[2])
    np.testing.assert_array_equal(h[0], h[3])
    np.testing.assert_array_equal(h[1], h[4])
    assert not np.array_equal(h[0], h[1])


@pytest.mark.slow
def test_dedup_matches_tree_at_full_fanout(data):
    """With fanout=-1 both paths aggregate the same full neighbor rows."""
    g = data.graph
    model = _model_for(g, agg="mean_nn", hetero="sum")
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)
    seeds = {
        "user": jnp.asarray([0, 1, 2, 2], jnp.int32),
        "item": jnp.asarray([3, 3, 4], jnp.int32),
    }

    def run(mdl, dedup):
        return mdl.sampled_repr(g, feats, seeds, (-1, -1),
                                jax.random.PRNGKey(1), deterministic=True,
                                dedup=dedup)

    h_d = model.apply(params, True, method=run)
    h_t = model.apply(params, False, method=run)
    for nt in seeds:
        np.testing.assert_allclose(
            np.asarray(h_d[nt]), np.asarray(h_t[nt]), rtol=2e-4, atol=2e-5
        )


def test_sampled_uniform_fanout_runs_and_is_seeded(data):
    g = data.graph
    model = _model_for(g)
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)
    seeds = {"user": jnp.asarray([0, 3, 7], jnp.int32)}

    def sampled(mdl, key):
        return mdl.sampled_repr(g, feats, seeds, (4, 4), key,
                                deterministic=True)

    h1 = model.apply(params, jax.random.PRNGKey(5), method=sampled)
    h2 = model.apply(params, jax.random.PRNGKey(5), method=sampled)
    h3 = model.apply(params, jax.random.PRNGKey(6), method=sampled)
    np.testing.assert_allclose(np.asarray(h1["user"]), np.asarray(h2["user"]))
    assert not np.allclose(np.asarray(h1["user"]), np.asarray(h3["user"]))
    assert h1["user"].shape == (3, 8)


def test_deeper_model_three_conv_layers(data):
    """n_layers=4 (3 conv layers) through the sampled path — the search
    space goes to 5 layers (reference main.py:497)."""
    g = data.graph
    model = _model_for(g, n_layers=4)
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)
    seeds = {"user": jnp.asarray([0, 1], jnp.int32)}

    def sampled(mdl):
        return mdl.sampled_repr(g, feats, seeds, (2, 2, 2),
                                jax.random.PRNGKey(2), deterministic=True)

    h = model.apply(params, method=sampled)
    assert h["user"].shape == (2, 8)
    assert np.isfinite(np.asarray(h["user"])).all()


def test_exclusion_flags_equivalent_to_searchsorted(data):
    # The positional-flag fast path must mask exactly the edges the
    # legacy sorted-eid searchsorted path masks, in both sampler modes.
    from gnn_recsys_tpu.ops.sampling import exclusion_flags

    rel = data.graph.rels[ET_BUYS]
    ids = jnp.arange(20, dtype=jnp.int32)
    dst = np.asarray(rel.dst)
    excl = np.sort(np.where(dst % 3 == 0)[0]).astype(np.int32)
    flags = exclusion_flags(rel, jnp.asarray(excl))
    for mode, rng in (("full", None), ("uniform", jax.random.PRNGKey(7))):
        nbr_a, _, mask_a = sample_neighbors(
            rel, ids, fanout=4, rng=rng, mode=mode,
            exclude_sorted_eids=jnp.asarray(excl),
        )
        nbr_b, _, mask_b = sample_neighbors(
            rel, ids, fanout=4, rng=rng, mode=mode, exclude_flags=flags,
        )
        np.testing.assert_array_equal(np.asarray(nbr_a), np.asarray(nbr_b))
        np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))


def test_eid_pos_roundtrip(tmp_path, data):
    # eid_pos maps each edge to its padded slot; serialization keeps it.
    from gnn_recsys_tpu.graph.serialize import load_graph, save_graph

    rel = data.graph.rels[ET_BUYS]
    pos = np.asarray(rel.eid_pos)
    nbr_eid = np.asarray(rel.nbr_eid).reshape(-1)
    mask = np.asarray(rel.nbr_mask).reshape(-1)
    in_table = pos < nbr_eid.shape[0] * 0 + np.asarray(rel.nbr).size
    for e in range(len(pos)):
        if in_table[e]:
            assert mask[pos[e]] and nbr_eid[pos[e]] == e
    path = tmp_path / "g.npz"
    save_graph(data.graph, str(path))
    g2 = load_graph(str(path))
    np.testing.assert_array_equal(
        np.asarray(g2.rels[ET_BUYS].eid_pos), pos
    )


def test_exclusion_table_equivalent_to_searchsorted(data):
    # The sign-marked neighbor-table fast path must mask exactly the
    # edges the legacy sorted-eid path masks, with identical nbr values.
    from gnn_recsys_tpu.ops.sampling import exclusion_table

    rel = data.graph.rels[ET_BUYS]
    ids = jnp.arange(20, dtype=jnp.int32)
    dst = np.asarray(rel.dst)
    excl = np.sort(np.where(dst % 3 == 0)[0]).astype(np.int32)
    table = exclusion_table(rel, jnp.asarray(excl))
    for mode, rng in (("full", None), ("uniform", jax.random.PRNGKey(7))):
        nbr_a, _, mask_a = sample_neighbors(
            rel, ids, fanout=4, rng=rng, mode=mode,
            exclude_sorted_eids=jnp.asarray(excl),
        )
        nbr_b, _, mask_b = sample_neighbors(
            rel, ids, fanout=4, rng=rng, mode=mode, nbr_table=table,
        )
        np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
        # nbr values must agree wherever the slot is valid
        m = np.asarray(mask_b)
        np.testing.assert_array_equal(
            np.asarray(nbr_a)[m], np.asarray(nbr_b)[m]
        )


def test_zero_degree_nodes_yield_in_bounds_padding():
    """Regression: Relation.nbr is -1-padded (degree rides the row gather);
    returned neighbor ids must still be IN-BOUNDS for every invalid slot,
    because downstream feature gathers use jnp.take's default FILL mode —
    an out-of-bounds id becomes NaN and 0 * NaN poisons masked slots."""
    from gnn_recsys_tpu.graph.hetero import build_relation

    # Destinations 3 and 7 of 10 have NO incoming edges.
    src = np.asarray([1, 2, 5, 5, 9, 4], np.int32)
    dst = np.asarray([0, 0, 1, 2, 4, 9], np.int32)
    rel = build_relation(src, dst, num_dst=10)
    zero_deg = np.asarray([3, 7])
    assert (np.asarray(rel.deg)[zero_deg] == 0).all()
    ids = jnp.asarray(zero_deg, jnp.int32)
    for mode, kw in (("uniform", dict(rng=jax.random.PRNGKey(3))),
                     ("full", {})):
        nbr, _, mask = sample_neighbors(rel, ids, fanout=4, mode=mode, **kw)
        assert not np.asarray(mask).any()
        vals = np.asarray(nbr)
        assert (vals >= 0).all() and (vals < 10).all(), mode
        # NaN-poisoning check: gather float features at the returned ids.
        feats = jnp.ones((10, 4), jnp.float32)
        assert np.isfinite(np.asarray(jnp.take(feats, nbr, axis=0))).all()


def test_row_derived_degree_matches_deg_array(data):
    """The sampler derives degree as count(row != -1); it must equal the
    packer's deg array for every node of every relation."""
    for et, rel in data.graph.rels.items():
        row_deg = np.asarray((jnp.asarray(rel.nbr) != -1).sum(axis=1))
        np.testing.assert_array_equal(
            row_deg, np.asarray(rel.deg), err_msg=str(et)
        )


def test_uniform_wide_row_fallback(data):
    """Relations wider than ROW_GATHER_KMAX route through the O(1)-per-slot
    flat-gather path (ADVICE r2: the one-hot select is O(kmax) per slot,
    ruinous at uncapped hub degrees).  Same draw semantics as the fast
    path: valid draws from the true neighbor list, eids consistent,
    zero-degree rows fully masked, exclusion honored."""
    from gnn_recsys_tpu.graph.hetero import build_relation
    from gnn_recsys_tpu.ops.sampling import ROW_GATHER_KMAX, exclusion_flags

    rng = np.random.default_rng(7)
    num_dst = 12
    # One hub destination with degree >> ROW_GATHER_KMAX, uncapped build.
    hub_deg = ROW_GATHER_KMAX * 2 + 5
    src = np.concatenate([
        rng.integers(0, 50, hub_deg),          # dst 0, the hub
        rng.integers(0, 50, 8),                # dst 1
    ]).astype(np.int32)
    dst = np.concatenate([
        np.zeros(hub_deg), np.ones(8)
    ]).astype(np.int32)
    rel = build_relation(src, dst, num_dst=num_dst)
    assert rel.max_fanout > ROW_GATHER_KMAX  # fallback path engaged

    ids = jnp.arange(num_dst, dtype=jnp.int32)
    nbr, eid, mask = sample_neighbors(
        rel, ids, fanout=16, rng=jax.random.PRNGKey(3), mode="uniform"
    )
    adj = adj_sets(rel)
    src_a, dst_a = np.asarray(rel.src), np.asarray(rel.dst)
    for d in range(num_dst):
        m = np.asarray(mask[d])
        if d in adj:
            assert m.all()
            assert set(np.asarray(nbr[d]).tolist()) <= adj[d]
            for s_, e_ in zip(np.asarray(nbr[d])[m], np.asarray(eid[d])[m]):
                assert src_a[e_] == s_ and dst_a[e_] == d
        else:
            assert not m.any()

    # Determinism: same key -> same draws.
    nbr2, _, _ = sample_neighbors(
        rel, ids, fanout=16, rng=jax.random.PRNGKey(3), mode="uniform"
    )
    assert (np.asarray(nbr) == np.asarray(nbr2)).all()

    # Exclude every edge of the hub: its draws must all be masked out.
    excl = jnp.asarray(np.where(dst_a == 0)[0].astype(np.int32))
    flags = exclusion_flags(rel, excl)
    _, _, mask_x = sample_neighbors(
        rel, ids, fanout=16, rng=jax.random.PRNGKey(3), mode="uniform",
        exclude_flags=flags,
    )
    assert not np.asarray(mask_x[0]).any()
    assert np.asarray(mask_x[1]).all()


@pytest.mark.parametrize("agg", ["mean", "mean_nn", "pool_nn"])
@pytest.mark.parametrize("embedding_layer", [True, False])
@pytest.mark.parametrize("fanout_mode", ["full"])
def test_packed_leaf_matches_unpacked(data, agg, embedding_layer, fanout_mode):
    """attach_leaf_features must not change the full-fanout forward: the
    packed contiguous row reads return exactly the feature rows the
    per-slot random gathers did (f32, same seeds, exclusion active).
    Sampled (uniform) leaves have no packed path by design — the slot
    select costs more than the gathers it avoids (full_neighbors_packed
    docstring) — so only mode='full' diverges in implementation."""
    import dataclasses as dc

    from gnn_recsys_tpu.graph.hetero import attach_leaf_features
    from gnn_recsys_tpu.train.full_batch import init_model

    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("sport", 8), ("hidden", 16),
              ("out", 8)),
        n_layers=3, aggregator_type=agg, aggregator_hetero="sum",
        pred="cos", dropout=0.0, embedding_layer=embedding_layer,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    params = init_model(model, g, feats, seed=0)
    gp = attach_leaf_features(g, feats)
    for et in g.canonical_etypes:
        assert gp.rels[et].nbr_feat is not None

    seeds = {"user": jnp.arange(12, dtype=jnp.int32),
             "item": jnp.arange(10, dtype=jnp.int32)}
    n_conv = model.num_conv_layers
    fanouts = tuple(
        ([4, 3, 2][:n_conv]) if fanout_mode == "uniform" else [-1] * n_conv
    )
    rng = jax.random.PRNGKey(7)
    # Exclude a few edges so the sign-marked-table path is exercised too.
    excl = {et: jnp.arange(3, dtype=jnp.int32) for et in g.canonical_etypes}

    def run(graph):
        return model.apply(
            params, graph, feats, seeds, fanouts, rng,
            exclude_eids=excl, method=model.sampled_repr,
        )

    ref = run(g)
    got = run(gp)
    for nt in ref:
        np.testing.assert_array_equal(np.asarray(ref[nt]),
                                      np.asarray(got[nt]), err_msg=nt)
