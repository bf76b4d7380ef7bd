"""BASELINE config[0] gate: 2-layer mean GraphSAGE, full-batch, synthetic
bipartite click graph — recall@10 must clearly beat a popularity baseline."""

import jax.numpy as jnp
import numpy as np

from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.retrieval.metrics import recs_to_metrics
from gnn_recsys_tpu.train.full_batch import (
    FullBatchConfig,
    train_full_batch,
)
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data


def popularity_baseline_recall(data, k=10):
    buys_u, buys_i = data.train_pairs[("user", "buys", "item")]
    pop = np.bincount(buys_i, minlength=data.num_items)
    top = np.argsort(-pop)[:k]
    gt_u, gt_i = data.test_ground_truth
    user_ids = np.unique(gt_u)
    recs = jnp.asarray(np.tile(top, (len(user_ids), 1)))
    _, recall, _ = recs_to_metrics(
        recs, jnp.asarray(user_ids), gt_u, gt_i, data.num_items
    )
    return recall


def test_full_batch_beats_popularity():
    data = make_synthetic_data(
        num_users=120, num_items=60, num_groups=4, interactions_per_user=10,
        test_per_user=3, feat_dim=8, with_clicks=True, seed=0,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 32), ("out", 16)),
        n_layers=3,  # embedding layer + 2 conv layers
        aggregator_type="mean",
        pred="cos",
        aggregator_hetero="sum",
        dropout=0.0,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    cfg = FullBatchConfig(
        delta=0.266, neg_sample_size=20, lr=3e-3, num_epochs=60,
        eval_every=20, k=10,
    )
    state, history = train_full_batch(
        model, data.train_graph, data.graph, feats, data.train_pairs,
        data.test_ground_truth, cfg,
        already_bought=data.train_pairs[("user", "buys", "item")],
    )
    pop_recall = popularity_baseline_recall(data, k=10)
    model_recall = max(history["recall"])
    # The clustered synthetic graph is learnable: the GNN should clearly
    # beat recommending the globally-popular items.
    assert model_recall > pop_recall + 0.05, (
        f"model recall {model_recall:.3f} vs popularity {pop_recall:.3f}"
    )
    # loss went down
    assert history["loss"][-1] < history["loss"][0]


def test_full_batch_nn_predictor_end_to_end():
    """pred='nn' trains AND evaluates retrieval with the MLP head — the
    whole loop stays consistent (reference src/metrics.py:61-63 scores
    retrieval with the same predictor used in training)."""
    data = make_synthetic_data(
        num_users=100, num_items=50, num_groups=4, interactions_per_user=10,
        test_per_user=3, feat_dim=8, with_clicks=True, seed=2,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 32), ("out", 16)),
        n_layers=3,
        aggregator_type="mean",
        pred="nn",
        aggregator_hetero="sum",
        dropout=0.0,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    cfg = FullBatchConfig(
        delta=0.266, neg_sample_size=20, lr=3e-3, num_epochs=40,
        eval_every=20, k=10,
    )
    state, history = train_full_batch(
        model, data.train_graph, data.graph, feats, data.train_pairs,
        data.test_ground_truth, cfg,
        already_bought=data.train_pairs[("user", "buys", "item")],
    )
    assert history["loss"][-1] < history["loss"][0]
    pop_recall = popularity_baseline_recall(data, k=10)
    assert max(history["recall"]) > pop_recall, (
        f"nn recall {max(history['recall']):.3f} vs pop {pop_recall:.3f}"
    )
