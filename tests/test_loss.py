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
