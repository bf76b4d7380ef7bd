"""ConvModel tests: shapes, aggregators, norm, predictors, manual parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

ET_BUYS = ("user", "buys", "item")


def small_setup(aggregator="mean", pred="cos", n_layers=3, hetero_agg="sum",
                with_sports=False):
    data = make_synthetic_data(
        num_users=20, num_items=15, num_groups=3, interactions_per_user=4,
        test_per_user=2, feat_dim=6, with_clicks=True, with_sports=with_sports,
        seed=0,
    )
    g = data.graph
    dims = (("user", 6), ("item", 6), ("sport", 6), ("hidden", 16), ("out", 8))
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=dims,
        n_layers=n_layers,
        aggregator_type=aggregator,
        pred=pred,
        aggregator_hetero=hetero_agg,
        dropout=0.1,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    pairs = {ET_BUYS: (jnp.asarray([0, 1, 2]), jnp.asarray([3, 4, 5]))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs,
                        deterministic=True)
    return model, g, feats, pairs, params, data


@pytest.mark.parametrize(
    "aggregator",
    ["mean", "mean_nn", "pool_nn", "mean_edge", "mean_nn_edge", "pool_nn_edge",
     "lstm", "lstm_edge"],
)
def test_forward_all_aggregators(aggregator):
    model, g, feats, pairs, params, _ = small_setup(aggregator)
    h, pos, neg = model.apply(params, g, feats, pairs, pairs,
                              deterministic=True)
    assert h["user"].shape == (20, 8)
    assert h["item"].shape == (15, 8)
    assert pos[ET_BUYS].shape == (3,)
    # Per-etype L2 norm happens BEFORE the cross-etype sum (DGL semantics):
    # with two incoming etypes each unit-norm, row norms lie in (0, 2].
    norms = np.linalg.norm(np.asarray(h["user"]), axis=1)
    assert np.isfinite(norms).all()
    assert (norms <= 2.0 + 1e-4).all()


@pytest.mark.parametrize("hetero_agg", ["sum", "mean", "max"])
def test_hetero_aggregations(hetero_agg):
    model, g, feats, pairs, params, _ = small_setup(hetero_agg=hetero_agg)
    h, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)
    assert np.isfinite(np.asarray(h["item"])).all()


def test_cosine_scores_bounded():
    model, g, feats, pairs, params, _ = small_setup(pred="cos")
    _, pos, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)
    s = np.asarray(pos[ET_BUYS])
    assert (s >= -1.0001).all() and (s <= 1.0001).all()


def test_nn_predictor_in_unit_interval():
    model, g, feats, pairs, params, _ = small_setup(pred="nn")
    _, pos, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)
    s = np.asarray(pos[ET_BUYS])
    assert (s >= 0).all() and (s <= 1).all()


def test_layer_count_semantics():
    # embedding_layer=True and n_layers=3 -> 2 conv layers (reference
    # src/model.py:379-406 + sampling.py:153-155).
    model, *_ = small_setup(n_layers=3)
    assert model.num_conv_layers == 2


def test_dropout_changes_only_when_stochastic():
    model, g, feats, pairs, params, _ = small_setup()
    h1, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)
    h2, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)
    np.testing.assert_allclose(h1["user"], h2["user"])
    h3, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(h1["user"], h3["user"])


def test_manual_parity_single_etype_mean():
    """Hand-compute a 2-layer pass on a tiny single-etype graph."""
    from gnn_recsys_tpu.graph.hetero import build_hetero_graph

    src = np.array([0, 1, 1], dtype=np.int32)
    dst = np.array([0, 0, 1], dtype=np.int32)
    g = build_hetero_graph(
        {("user", "buys", "item"): (src, dst),
         ("item", "bought-by", "user"): (dst, src)},
        {"user": 2, "item": 2},
    )
    fu = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    fi = np.array([[1.0, 1.0], [0.5, -0.5]], dtype=np.float32)
    feats = {"user": jnp.asarray(fu), "item": jnp.asarray(fi)}
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 2), ("item", 2), ("hidden", 4), ("out", 3)),
        n_layers=2, norm=False, dropout=0.0, aggregator_type="mean",
        aggregator_hetero="sum", embedding_layer=True,
    )
    pairs = {ET_BUYS: (jnp.asarray([0]), jnp.asarray([0]))}
    params = model.init(jax.random.PRNGKey(0), g, feats, pairs, pairs)
    h, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)

    p = params["params"]
    eu = fu @ np.asarray(p["user_embed"]["proj_feats"]["kernel"]) + np.asarray(
        p["user_embed"]["proj_feats"]["bias"])
    ei = fi @ np.asarray(p["item_embed"]["proj_feats"]["kernel"]) + np.asarray(
        p["item_embed"]["proj_feats"]["bias"])
    lb = p["layer0_user__buys__item"]
    lr = p["layer0_item__bought-by__user"]
    # item 0 <- mean(users 0,1); item 1 <- user 1
    agg_i = np.stack([(eu[0] + eu[1]) / 2, eu[1]])
    zi = np.maximum(
        ei @ np.asarray(lb["fc_self"]["kernel"])
        + agg_i @ np.asarray(lb["fc_neigh"]["kernel"]), 0)
    # user 0 <- item 0 ; user 1 <- mean(item 0, item 1)
    agg_u = np.stack([ei[0], (ei[0] + ei[1]) / 2])
    zu = np.maximum(
        eu @ np.asarray(lr["fc_self"]["kernel"])
        + agg_u @ np.asarray(lr["fc_neigh"]["kernel"]), 0)
    np.testing.assert_allclose(np.asarray(h["item"]), zi, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h["user"]), zu, rtol=1e-5, atol=1e-5)


def test_generic_numpy_oracle_hetero_forward():
    """Full hetero forward (mean agg, sum hetero, L2 norm, embedding layer)
    vs an independent numpy implementation on a random 4-etype graph."""
    model, g, feats, pairs, params, _ = small_setup(
        aggregator="mean", hetero_agg="sum"
    )
    # re-init without dropout for exactness
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=model.dims, n_layers=3, aggregator_type="mean", pred="cos",
        aggregator_hetero="sum", dropout=0.0, norm=True,
    )
    params = model.init(jax.random.PRNGKey(1), g, feats, pairs, pairs)
    h, _, _ = model.apply(params, g, feats, pairs, pairs, deterministic=True)

    p = params["params"]

    def np_dense(name_prefix, x, layer_key=None):
        w = p[name_prefix]["proj_feats"]["kernel"]
        b = p[name_prefix]["proj_feats"]["bias"]
        return np.asarray(x) @ np.asarray(w) + np.asarray(b)

    # embedding layer
    hh = {nt: np_dense(f"{nt}_embed", feats[nt]) for nt in g.ntypes}

    def mean_agg(h_src, rel, num_dst):
        src = np.asarray(rel.src); dst = np.asarray(rel.dst)
        out = np.zeros((num_dst, h_src.shape[1]))
        cnt = np.zeros(num_dst)
        for s, d in zip(src, dst):
            out[d] += h_src[s]; cnt[d] += 1
        return out / np.maximum(cnt, 1)[:, None]

    for layer_idx in range(2):
        new_h = {}
        for et in g.canonical_etypes:
            key = f"layer{layer_idx}_" + "__".join(et)
            lw = p[key]
            agg = mean_agg(hh[et[0]], g.rels[et], g.num_nodes(et[2]))
            z = hh[et[2]] @ np.asarray(lw["fc_self"]["kernel"]) + \
                agg @ np.asarray(lw["fc_neigh"]["kernel"])
            z = np.maximum(z, 0)
            norms = np.linalg.norm(z, axis=1, keepdims=True)
            z = z / np.where(norms == 0, 1.0, norms)
            new_h.setdefault(et[2], []).append(z)
        hh = {nt: np.sum(zs, axis=0) for nt, zs in new_h.items()}

    for nt in ("user", "item"):
        np.testing.assert_allclose(np.asarray(h[nt]), hh[nt],
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize(
    "kw,val",
    [
        ("aggregator_type", "bogus"),
        ("pred", "bogus"),
        ("aggregator_hetero", "bogus"),
    ],
)
def test_bad_config_rejected_at_construction(kw, val):
    # Eager validation (reference validates in __init__ too,
    # src/model.py:143-149,408-413): the KeyError must fire at
    # construction, not at first trace.
    with pytest.raises(KeyError, match=val):
        ConvModel(
            canonical_etypes=(("user", "buys", "item"),),
            dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
            **{kw: val},
        )
