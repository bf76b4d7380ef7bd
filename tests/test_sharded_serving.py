"""Catalog-sharded retrieval + mesh embedding inference vs single-device.

SURVEY §7 step 8 ("sharded catalog axis in the MIPS scorer") and §2.3: the
sharded serving path must return EXACTLY the single-device results — the
per-shard top-fetch + all_gather + global top-k merge is a lossless
decomposition, and the popularity boost's global softmax is reconstructed
from per-shard pmax/psum statistics.  All on the virtual 8-device CPU mesh
(tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.ops.membership import build_padded_pair_set
from gnn_recsys_tpu.parallel.mesh import make_mesh
from gnn_recsys_tpu.retrieval.recs import get_recs, model_score_fn
from gnn_recsys_tpu.retrieval.sharded import (
    get_recs_sharded,
    infer_embeddings_sharded,
    shard_catalog,
)
from gnn_recsys_tpu.train.full_batch import init_model
from gnn_recsys_tpu.train.minibatch import infer_embeddings
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

K = 10


@pytest.fixture(scope="module")
def embs():
    rng = np.random.default_rng(7)
    user_emb = jnp.asarray(
        rng.standard_normal((96, 16)).astype(np.float32)
    )
    # 201 items: NOT divisible by 8 — exercises the catalog padding +
    # validity masking of the sharded path.
    item_emb = jnp.asarray(
        rng.standard_normal((201, 16)).astype(np.float32)
    )
    user_ids = jnp.asarray(rng.permutation(96)[:40], jnp.int32)
    bu = rng.integers(0, 96, size=400).astype(np.int32)
    bi = rng.integers(0, 201, size=400).astype(np.int32)
    bought = build_padded_pair_set(bu, bi, num_src=96)
    pop = jnp.asarray(rng.random(201).astype(np.float32) / 201.0)
    return user_emb, item_emb, user_ids, bought, pop


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_devices=8, data_axis=2)  # ('data'=2, 'model'=4)


def test_sharded_equals_single_plain(embs, mesh):
    user_emb, item_emb, user_ids, bought, _ = embs
    ref = get_recs(user_emb, item_emb, user_ids, K)
    out = get_recs_sharded(mesh, user_emb, item_emb, user_ids, K)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_equals_single_already_bought(embs, mesh):
    user_emb, item_emb, user_ids, bought, _ = embs
    ref = get_recs(user_emb, item_emb, user_ids, K, already_bought=bought)
    out = get_recs_sharded(
        mesh, user_emb, item_emb, user_ids, K, already_bought=bought
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_equals_single_boosted(embs, mesh):
    """Popularity boost: the global softmax must be reconstructed exactly
    (reference formula src/metrics.py:69-72)."""
    user_emb, item_emb, user_ids, bought, pop = embs
    ref = get_recs(
        user_emb, item_emb, user_ids, K, already_bought=bought,
        popularity=pop, weight_popularity=0.1,
    )
    out = get_recs_sharded(
        mesh, user_emb, item_emb, user_ids, K, already_bought=bought,
        popularity=pop, weight_popularity=0.1,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_equals_single_hub_route(mesh):
    """max_row > OVERFETCH_MAX_ROW: in-shard mask-then-rank."""
    rng = np.random.default_rng(3)
    user_emb = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    item_emb = jnp.asarray(
        rng.standard_normal((640, 8)).astype(np.float32)
    )
    # One hub user who bought most of the catalog.
    bu = np.concatenate([
        np.zeros(600, np.int32), rng.integers(1, 8, 50).astype(np.int32)
    ])
    bi = np.concatenate([
        rng.permutation(640)[:600].astype(np.int32),
        rng.integers(0, 640, 50).astype(np.int32),
    ])
    bought = build_padded_pair_set(bu, bi, num_src=8)
    assert bought.max_row > 256
    user_ids = jnp.arange(8, dtype=jnp.int32)
    ref = get_recs(user_emb, item_emb, user_ids, K, already_bought=bought)
    out = get_recs_sharded(
        mesh, user_emb, item_emb, user_ids, K, already_bought=bought
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_pallas_backend_interpret(embs, mesh):
    """The fused MIPS kernel per shard (interpret mode on CPU)."""
    user_emb, item_emb, user_ids, bought, _ = embs
    # Pallas route requires an evenly divisible catalog: use 192 rows.
    item192 = item_emb[:192]
    rng = np.random.default_rng(5)
    bought2 = build_padded_pair_set(
        rng.integers(0, 96, 300).astype(np.int32),
        rng.integers(0, 192, 300).astype(np.int32),
        num_src=96,
    )
    ref = get_recs(user_emb, item192, user_ids, K,
                   already_bought=bought2)
    out = get_recs_sharded(
        mesh, user_emb, item192, user_ids, K, already_bought=bought2,
        backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_mlp_score_fn(embs, mesh):
    """Custom (factorized-MLP) score functions shard too: per-item-tile
    scoring has no catalog-global term."""
    user_emb, item_emb, user_ids, bought, _ = embs
    rng = np.random.default_rng(11)
    d = user_emb.shape[1]
    params = {
        "params": {
            "pred_layer": {
                "hidden_1": {
                    "kernel": rng.standard_normal((2 * d, 128)).astype(
                        np.float32) * 0.1,
                    "bias": np.zeros(128, np.float32),
                },
                "hidden_2": {
                    "kernel": rng.standard_normal((128, 32)).astype(
                        np.float32) * 0.1,
                    "bias": np.zeros(32, np.float32),
                },
                "output": {
                    "kernel": rng.standard_normal((32, 1)).astype(
                        np.float32) * 0.1,
                    "bias": np.zeros(1, np.float32),
                },
            }
        }
    }
    sfn = model_score_fn("nn", params)
    ref = get_recs(user_emb, item_emb, user_ids, K, score_fn=sfn)
    out = get_recs_sharded(
        mesh, user_emb, item_emb, user_ids, K, score_fn=sfn
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_shard_catalog_placement(embs, mesh):
    user_emb, item_emb, user_ids, _, pop = embs
    item_s, pop_s, n = shard_catalog(mesh, item_emb, pop)
    assert n == 201 and item_s.shape[0] % 4 == 0  # 'model' axis = 4
    ref = get_recs(user_emb, item_emb, user_ids, K)
    out = get_recs_sharded(
        mesh, user_emb, item_s, user_ids, K, num_items=n
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_infer_embeddings_sharded_equals_single(mesh):
    data = make_synthetic_data(
        num_users=60, num_items=28, num_groups=4,
        interactions_per_user=6, with_clicks=True, seed=9,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    params = init_model(model, g, feats, seed=0)
    ref = infer_embeddings(model, params, g, feats)
    out = infer_embeddings_sharded(
        model, params, g, feats, mesh, node_chunk=16
    )
    for nt in ("user", "item"):
        np.testing.assert_allclose(
            np.asarray(out[nt]), np.asarray(ref[nt]), rtol=2e-5, atol=2e-6
        )


def test_sharded_recs_over_both_mesh_axes(embs, mesh):
    """axis=('data','model'): the catalog shards over the PRODUCT of both
    axes (8-way) — serving uses every chip of a 2-D training mesh."""
    user_emb, item_emb, user_ids, bought, pop = embs
    ref = get_recs(user_emb, item_emb, user_ids, K, already_bought=bought,
                   popularity=pop, weight_popularity=0.1)
    out = get_recs_sharded(
        mesh, user_emb, item_emb, user_ids, K, already_bought=bought,
        popularity=pop, weight_popularity=0.1, axis=("data", "model"),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_get_metrics_at_k_mesh_equals_single(embs, mesh):
    from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k

    user_emb, item_emb, user_ids, bought, pop = embs
    rng = np.random.default_rng(13)
    gtu = rng.integers(0, 96, 50).astype(np.int32)
    gti = rng.integers(0, 201, 50).astype(np.int32)
    bu = rng.integers(0, 96, 200).astype(np.int32)
    bi = rng.integers(0, 201, 200).astype(np.int32)
    ref = get_metrics_at_k(user_emb, item_emb, (gtu, gti), (bu, bi), K,
                           popularity=pop, weight_popularity=0.1,
                           backend="xla")
    got = get_metrics_at_k(user_emb, item_emb, (gtu, gti), (bu, bi), K,
                           popularity=pop, weight_popularity=0.1,
                           mesh=mesh)
    assert ref == got
