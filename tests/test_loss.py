"""Max-margin loss vs a reference-faithful numpy oracle
(semantics of /root/reference/src/model.py:473-533)."""

import jax.numpy as jnp
import numpy as np

from gnn_recsys_tpu.models.loss import max_margin_loss

ET1 = ("user", "buys", "item")
ET2 = ("user", "clicks", "item")


def oracle(pos, neg, delta, mask=None, recency=None):
    all_scores = []
    for et in neg:
        n = neg[et]
        p = pos[et]
        m = mask[et] if mask is not None else np.zeros_like(n)
        s = np.maximum(n + delta - p[:, None] - m, 0.0)
        if recency is not None and et in recency:
            s = s / recency[et][:, None]
        all_scores.append(s)
    flat = np.concatenate([s.reshape(-1) for s in all_scores])
    return flat.mean()


def test_loss_basic():
    rng = np.random.default_rng(0)
    pos = {ET1: rng.normal(size=8).astype(np.float32)}
    neg = {ET1: rng.normal(size=(8, 5)).astype(np.float32)}
    got = max_margin_loss(
        {k: jnp.asarray(v) for k, v in pos.items()},
        {k: jnp.asarray(v) for k, v in neg.items()},
        delta=0.266,
    )
    np.testing.assert_allclose(float(got), oracle(pos, neg, 0.266), rtol=1e-6)


def test_loss_multi_etype_mask_recency():
    rng = np.random.default_rng(1)
    pos = {
        ET1: rng.normal(size=6).astype(np.float32),
        ET2: rng.normal(size=4).astype(np.float32),
    }
    neg = {
        ET1: rng.normal(size=(6, 3)).astype(np.float32),
        ET2: rng.normal(size=(4, 3)).astype(np.float32),
    }
    mask = {
        ET1: (rng.random((6, 3)) < 0.3).astype(np.float32),
        ET2: (rng.random((4, 3)) < 0.3).astype(np.float32),
    }
    rec = {ET1: rng.uniform(1, 10, size=6).astype(np.float32)}
    got = max_margin_loss(
        {k: jnp.asarray(v) for k, v in pos.items()},
        {k: jnp.asarray(v) for k, v in neg.items()},
        delta=0.2,
        negative_mask={k: jnp.asarray(v) for k, v in mask.items()},
        recency_scores={k: jnp.asarray(v) for k, v in rec.items()},
    )
    np.testing.assert_allclose(
        float(got), oracle(pos, neg, 0.2, mask, rec), rtol=1e-5
    )


def test_loss_pair_mask_excludes_padding():
    pos = {ET1: jnp.asarray([1.0, 0.0])}
    neg = {ET1: jnp.asarray([[0.5, 0.5], [99.0, 99.0]])}
    pm = {ET1: jnp.asarray([True, False])}
    got = max_margin_loss(pos, neg, delta=0.0, pair_mask=pm)
    # only first row counts: relu(0.5 - 1.0) = 0 twice -> mean 0
    np.testing.assert_allclose(float(got), 0.0, atol=1e-7)


def test_sampled_softmax_loss_numpy_oracle():
    """The extension objective vs a plain numpy softmax cross-entropy:
    false negatives removed from the partition, recency as per-positive
    weight, padded rows excluded."""
    import numpy as np

    from gnn_recsys_tpu.models.loss import sampled_softmax_loss

    rng = np.random.default_rng(0)
    et = ("user", "buys", "item")
    b, s, tau = 5, 7, 0.1
    pos = rng.normal(size=b).astype(np.float32)
    neg = rng.normal(size=(b, s)).astype(np.float32)
    fneg = (rng.random((b, s)) < 0.2).astype(np.float32)
    rec = (1.0 + rng.random(b)).astype(np.float32)
    pmask = np.asarray([True, True, False, True, True])

    got = float(sampled_softmax_loss(
        {et: jnp.asarray(pos)}, {et: jnp.asarray(neg)}, tau=tau,
        negative_mask={et: jnp.asarray(fneg)},
        recency_scores={et: jnp.asarray(rec)},
        pair_mask={et: jnp.asarray(pmask)},
    ))

    total = wsum = 0.0
    for i in range(b):
        logits = np.concatenate(
            [[pos[i]], np.where(fneg[i] > 0, -np.inf, neg[i])]
        ) / tau
        m = logits.max()
        lse = m + np.log(np.exp(logits - m).sum())
        nll = lse - logits[0]
        w = (1.0 / rec[i]) * (1.0 if pmask[i] else 0.0)
        total += nll * w
        wsum += w
    np.testing.assert_allclose(got, total / wsum, rtol=1e-5)


def test_sampled_softmax_trains_and_beats_init():
    """cfg.loss='sampled_softmax' end-to-end: loss decreases and recall
    beats the untrained model on the clustered synthetic."""
    import numpy as np

    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        infer_embeddings,
        train_minibatch,
    )
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=200, num_items=60, num_groups=4,
        interactions_per_user=8, with_clicks=True, seed=2,
    )
    g = data.graph
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 32), ("out", 16)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
    )
    cfg = MinibatchConfig(
        edge_batch_size=128, fanouts=(4, 4), neg_sample_size=32,
        neg_mode="dense_pool", neg_pool_size=32,
        loss="sampled_softmax", softmax_tau=0.1,
        lr=5e-3, num_epochs=8, metrics_every=0, patience=99,
    )
    eids = {et: np.arange(g.num_edges(et))
            for et in data.train_pairs}
    state, hist = train_minibatch(model, g, g, feats, eids, None, cfg)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    h = infer_embeddings(model, state.params, g, feats)
    bu, bi = data.train_pairs[("user", "buys", "item")]
    _, recall, _ = get_metrics_at_k(
        h["user"], h["item"], data.test_ground_truth,
        (np.asarray(bu), np.asarray(bi)), 10,
    )
    assert recall > 0.15, recall

    import pytest

    with pytest.raises(KeyError, match="unknown loss"):
        from gnn_recsys_tpu.train.minibatch import make_minibatch_step
        import dataclasses

        make_minibatch_step(
            model, dataclasses.replace(cfg, loss="bogus"),
            tuple(data.train_pairs.keys()), with_update=True,
            with_exclusion=False, has_reverse={},
        )
