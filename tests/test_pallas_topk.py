"""Pallas MIPS top-k kernel vs jax.lax.top_k (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.ops.pallas.topk_mips import mips_topk


def ref_topk(u, it, k):
    scores = u @ it.T
    return jax.lax.top_k(scores, k)


@pytest.mark.parametrize("u,i,d,k", [(17, 100, 16, 5), (128, 1000, 32, 10)])
def test_mips_topk_matches_lax(u, i, d, k):
    rng = np.random.default_rng(0)
    ue = rng.normal(size=(u, d)).astype(np.float32)
    ie = rng.normal(size=(i, d)).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(ue), jnp.asarray(ie), k,
                          tile_users=8, tile_items=128, interpret=True)
    rvals, ridx = ref_topk(jnp.asarray(ue), jnp.asarray(ie), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                               rtol=1e-5, atol=1e-5)
    # scores at returned indices must equal the reference top-k scores
    scores = ue @ ie.T
    got_scores = np.take_along_axis(scores, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_scores, np.asarray(rvals),
                               rtol=1e-5, atol=1e-5)


def test_mips_topk_handles_duplicate_scores():
    # All-equal scores: indices must be k distinct items.
    ue = jnp.ones((4, 8), jnp.float32)
    ie = jnp.ones((40, 8), jnp.float32)
    vals, idx = mips_topk(ue, ie, 6, tile_users=4, tile_items=16,
                          interpret=True)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 6
    np.testing.assert_allclose(np.asarray(vals), 8.0)


def test_mips_topk_catalog_padding():
    # num_items far from a tile multiple; padded columns must never win.
    rng = np.random.default_rng(1)
    ue = rng.normal(size=(5, 8)).astype(np.float32)
    ie = rng.normal(size=(37, 8)).astype(np.float32) - 10.0  # all negative-ish
    vals, idx = mips_topk(jnp.asarray(ue), jnp.asarray(ie), 4,
                          tile_users=8, tile_items=16, interpret=True)
    assert (np.asarray(idx) < 37).all()


def test_get_recs_pallas_backend_matches_xla():
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.retrieval.recs import get_recs
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    ue = rng.normal(size=(30, 16)).astype(np.float32)
    ie = rng.normal(size=(90, 16)).astype(np.float32)
    ab_u = rng.integers(0, 30, 50).astype(np.int32)
    ab_i = rng.integers(0, 90, 50).astype(np.int32)
    ps = build_padded_pair_set(ab_u, ab_i, num_src=30)
    uids = jnp.arange(30, dtype=jnp.int32)
    r_xla = np.asarray(get_recs(jnp.asarray(ue), jnp.asarray(ie), uids, 7,
                                already_bought=ps, backend="xla"))
    r_pal = np.asarray(get_recs(jnp.asarray(ue), jnp.asarray(ie), uids, 7,
                                already_bought=ps, backend="pallas"))
    # identical up to float ties: compare the score multisets per row
    un = ue / np.linalg.norm(ue, axis=1, keepdims=True)
    inn = ie / np.linalg.norm(ie, axis=1, keepdims=True)
    scores = un @ inn.T
    for r in range(30):
        np.testing.assert_allclose(
            np.sort(scores[r, r_xla[r]]), np.sort(scores[r, r_pal[r]]),
            rtol=1e-5, atol=1e-6,
        )
        banned = set(ab_i[ab_u == r].tolist())
        assert not (set(r_pal[r].tolist()) & banned)


def test_mips_topk_boosted_matches_xla():
    """Two-pass boosted kernel == softmax(scores) + w*pop then top_k."""
    from gnn_recsys_tpu.ops.pallas.topk_mips import mips_topk_boosted

    rng = np.random.default_rng(5)
    u, i, d, k, w = 13, 333, 16, 6, 2.5
    ue = rng.normal(size=(u, d)).astype(np.float32)
    ie = rng.normal(size=(i, d)).astype(np.float32)
    pop = rng.uniform(0, 0.05, i).astype(np.float32)
    vals, idx = mips_topk_boosted(
        jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(pop), k, weight=w,
        tile_users=8, tile_items=64, interpret=True,
    )
    scores = jnp.asarray(ue) @ jnp.asarray(ie).T
    boosted = jax.nn.softmax(scores, axis=-1) + w * jnp.asarray(pop)[None, :]
    rvals, ridx = jax.lax.top_k(boosted, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                               rtol=1e-5, atol=1e-6)
    got = np.take_along_axis(np.asarray(boosted), np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, np.asarray(rvals), rtol=1e-5, atol=1e-6)


def test_get_recs_pallas_popularity_matches_xla():
    """Fast serving path covers the full reference scoring semantics:
    popularity boost + already-bought exclusion through backend='pallas'."""
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.retrieval.recs import get_recs

    rng = np.random.default_rng(6)
    ue = rng.normal(size=(25, 16)).astype(np.float32)
    ie = rng.normal(size=(80, 16)).astype(np.float32)
    pop = rng.uniform(0, 0.1, 80).astype(np.float32)
    ab_u = rng.integers(0, 25, 40).astype(np.int32)
    ab_i = rng.integers(0, 80, 40).astype(np.int32)
    ps = build_padded_pair_set(ab_u, ab_i, num_src=25)
    uids = jnp.arange(25, dtype=jnp.int32)
    kw = dict(already_bought=ps, popularity=jnp.asarray(pop),
              weight_popularity=3.0)
    r_xla = np.asarray(get_recs(jnp.asarray(ue), jnp.asarray(ie), uids, 7,
                                backend="xla", **kw))
    r_pal = np.asarray(get_recs(jnp.asarray(ue), jnp.asarray(ie), uids, 7,
                                backend="pallas", **kw))
    un = ue / np.linalg.norm(ue, axis=1, keepdims=True)
    inn = ie / np.linalg.norm(ie, axis=1, keepdims=True)
    scores = un @ inn.T
    e = np.exp(scores - scores.max(axis=1, keepdims=True))
    boosted = e / e.sum(axis=1, keepdims=True) + 3.0 * pop[None, :]
    for r in range(25):
        np.testing.assert_allclose(
            np.sort(boosted[r, r_xla[r]]), np.sort(boosted[r, r_pal[r]]),
            rtol=1e-4, atol=1e-6,
        )
        banned = set(ab_i[ab_u == r].tolist())
        assert not (set(r_pal[r].tolist()) & banned)


def test_mips_topk_bf16_close_to_f32():
    rng = np.random.default_rng(4)
    ue = rng.normal(size=(16, 64)).astype(np.float32)
    ie = rng.normal(size=(300, 64)).astype(np.float32)
    v32, i32 = mips_topk(jnp.asarray(ue), jnp.asarray(ie), 5,
                         tile_users=8, tile_items=128, interpret=True)
    v16, i16 = mips_topk(jnp.asarray(ue), jnp.asarray(ie), 5,
                         tile_users=8, tile_items=128, interpret=True,
                         bf16=True)
    # bf16 scoring reorders only near-ties; top-k VALUES stay close
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               rtol=2e-2, atol=5e-2)
