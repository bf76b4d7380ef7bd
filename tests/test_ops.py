"""Message-passing op tests vs numpy oracles; COO vs CSC equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.graph.hetero import coo_to_padded_csc
from gnn_recsys_tpu.ops.message import (
    coo_segment_max,
    coo_segment_mean,
    csc_gather_max,
    csc_gather_mean,
    edge_dot,
)
from gnn_recsys_tpu.ops.edge_hash import build_edge_hash, edge_hash_lookup
from gnn_recsys_tpu.ops.negative import uniform_negative_dst
import jax


@pytest.fixture
def coo():
    rng = np.random.default_rng(1)
    num_src, num_dst, e, d = 40, 30, 200, 16
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    h = rng.normal(size=(num_src, d)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=e).astype(np.float32)
    return src, dst, h, w, num_dst


def oracle_mean(src, dst, h, w, num_dst):
    d = h.shape[1]
    out = np.zeros((num_dst, d), dtype=np.float64)
    cnt = np.zeros(num_dst)
    for k in range(len(src)):
        m = h[src[k]] * (w[k] if w is not None else 1.0)
        out[dst[k]] += m
        cnt[dst[k]] += 1
    return (out / np.maximum(cnt, 1)[:, None]).astype(np.float32)


def oracle_max(src, dst, h, w, num_dst):
    d = h.shape[1]
    out = np.full((num_dst, d), -np.inf)
    for k in range(len(src)):
        m = h[src[k]] * (w[k] if w is not None else 1.0)
        out[dst[k]] = np.maximum(out[dst[k]], m)
    out[~np.isfinite(out).all(axis=1)] = 0.0
    return out.astype(np.float32)


@pytest.mark.parametrize("weighted", [False, True])
def test_coo_mean_vs_oracle(coo, weighted):
    src, dst, h, w, num_dst = coo
    w_ = w if weighted else None
    got = coo_segment_mean(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                           num_dst, None if w_ is None else jnp.asarray(w_))
    np.testing.assert_allclose(got, oracle_mean(src, dst, h, w_, num_dst),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_coo_max_vs_oracle(coo, weighted):
    src, dst, h, w, num_dst = coo
    w_ = w if weighted else None
    got = coo_segment_max(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                          num_dst, None if w_ is None else jnp.asarray(w_))
    np.testing.assert_allclose(got, oracle_max(src, dst, h, w_, num_dst),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_csc_matches_coo(coo, weighted):
    src, dst, h, w, num_dst = coo
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(src, dst, num_dst)
    w_ = jnp.asarray(w) if weighted else None
    mean_csc = csc_gather_mean(jnp.asarray(h), jnp.asarray(nbr),
                               jnp.asarray(nbr_mask), jnp.asarray(nbr_eid), w_)
    mean_coo = coo_segment_mean(jnp.asarray(h), jnp.asarray(src),
                                jnp.asarray(dst), num_dst, w_)
    np.testing.assert_allclose(mean_csc, mean_coo, rtol=1e-5, atol=1e-5)
    max_csc = csc_gather_max(jnp.asarray(h), jnp.asarray(nbr),
                             jnp.asarray(nbr_mask), jnp.asarray(nbr_eid), w_)
    max_coo = coo_segment_max(jnp.asarray(h), jnp.asarray(src),
                              jnp.asarray(dst), num_dst, w_)
    np.testing.assert_allclose(max_csc, max_coo, rtol=1e-5, atol=1e-5)


def test_edge_dot():
    rng = np.random.default_rng(2)
    hu = rng.normal(size=(10, 8)).astype(np.float32)
    hv = rng.normal(size=(12, 8)).astype(np.float32)
    src = np.array([0, 3, 9], dtype=np.int32)
    dst = np.array([1, 0, 11], dtype=np.int32)
    got = edge_dot(jnp.asarray(hu), jnp.asarray(hv), jnp.asarray(src), jnp.asarray(dst))
    want = np.array([hu[s] @ hv[d] for s, d in zip(src, dst)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_edge_hash_membership():
    src = np.array([0, 0, 2, 5], dtype=np.int32)
    dst = np.array([1, 3, 2, 0], dtype=np.int32)
    table = build_edge_hash(src, dst)
    u = jnp.asarray([[0, 0], [2, 5]], dtype=jnp.int32)
    v = jnp.asarray([[1, 2], [2, 1]], dtype=jnp.int32)
    got = edge_hash_lookup(table, u, v)
    assert got.tolist() == [[True, False], [True, False]]


def test_edge_hash_random_oracle():
    rng = np.random.default_rng(5)
    e = 5000
    src = rng.integers(0, 1000, e).astype(np.int32)
    dst = rng.integers(0, 800, e).astype(np.int32)
    table = build_edge_hash(src, dst)
    edge_set = set(zip(src.tolist(), dst.tolist()))
    qu = rng.integers(0, 1000, 2000).astype(np.int32)
    qv = rng.integers(0, 800, 2000).astype(np.int32)
    got = np.asarray(edge_hash_lookup(table, jnp.asarray(qu), jnp.asarray(qv)))
    want = np.array([(a, b) in edge_set for a, b in zip(qu, qv)])
    assert (got == want).all()


def test_edge_hash_empty():
    table = build_edge_hash(np.array([], np.int32), np.array([], np.int32))
    got = edge_hash_lookup(table, jnp.asarray([1, 2]), jnp.asarray([3, 4]))
    assert got.tolist() == [False, False]


def test_uniform_negative_dst_shapes_and_range():
    key = jax.random.PRNGKey(0)
    pos_src = jnp.asarray([5, 7, 9], dtype=jnp.int32)
    ns, nd = uniform_negative_dst(key, pos_src, num_dst=20, neg_sample_size=50)
    assert ns.shape == (3, 50) and nd.shape == (3, 50)
    assert (np.asarray(ns) == np.asarray(pos_src)[:, None]).all()
    assert (np.asarray(nd) >= 0).all() and (np.asarray(nd) < 20).all()
    # roughly uniform
    counts = np.bincount(np.asarray(nd).ravel(), minlength=20)
    assert counts.min() > 0


def test_csc_gather_accepts_minus1_padded_relation(coo):
    """The public contract: feeding Relation.nbr (padding stored as -1,
    build_relation invariant) directly must not NaN-poison the masked
    reductions (ADVICE r2: jnp.take fill-mode under jit)."""
    from gnn_recsys_tpu.graph.hetero import build_relation

    src, dst, h, w, num_dst = coo
    rel = build_relation(src, dst, num_dst=num_dst, edata={"w": w})
    for w_ in (None, jnp.asarray(w)):
        mean_ref = coo_segment_mean(jnp.asarray(h), jnp.asarray(src),
                                    jnp.asarray(dst), num_dst, w_)
        got = jax.jit(csc_gather_mean)(jnp.asarray(h), rel.nbr, rel.nbr_mask,
                                       rel.nbr_eid, w_)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(got, mean_ref, rtol=1e-5, atol=1e-5)
        max_ref = coo_segment_max(jnp.asarray(h), jnp.asarray(src),
                                  jnp.asarray(dst), num_dst, w_)
        got = jax.jit(csc_gather_max)(jnp.asarray(h), rel.nbr, rel.nbr_mask,
                                      rel.nbr_eid, w_)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(got, max_ref, rtol=1e-5, atol=1e-5)
