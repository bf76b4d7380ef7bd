"""Fused leaf-aggregation kernel (ops/pallas/leaf_agg.py).

Interpret-mode (CPU) exactness + gradient checks against the jnp oracle,
and model-level equality: ``ConvModel(leaf_kernel=True)`` must reproduce
the folded jnp leaf path bit-for-bit in f32 on CPU.  Real-TPU Mosaic
compile/exactness lives in tests/test_tpu_kernels.py (tpu tier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.ops.pallas.leaf_agg import (
    leaf_mean_nn,
    leaf_mean_nn_reference,
)


def _case(seed=0, k=8, p=48, f=8, h=64, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(k, p, f)), dtype)
    mask = jnp.asarray(rng.random((p, k)) < 0.7, jnp.float32)
    count = jnp.sum(mask, axis=1, keepdims=True)
    ms = mask / jnp.maximum(count, 1.0)
    w = jnp.asarray(rng.normal(size=(f, h)) * 0.3, dtype)
    b = jnp.asarray(rng.normal(size=(h,)) * 0.1, dtype)
    return x, ms, w, b


def test_forward_matches_oracle():
    x, ms, w, b = _case()
    out = leaf_mean_nn(x, ms, w, b, 16, True)
    ref = leaf_mean_nn_reference(x, ms, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_forward_all_masked_row_is_zero():
    x, ms, w, b = _case()
    ms = ms.at[3].set(0.0)
    out = leaf_mean_nn(x, ms, w, b, 16, True)
    np.testing.assert_allclose(np.asarray(out[3]), 0.0, atol=1e-7)


def test_gradients_match_oracle():
    x, ms, w, b = _case(seed=1)

    def loss_kernel(w, b):
        out = leaf_mean_nn(x, ms, w, b, 16, True)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    def loss_ref(w, b):
        out = leaf_mean_nn_reference(x, ms, w, b)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    gk = jax.grad(loss_kernel, argnums=(0, 1))(w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(w, b)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)


def test_model_leaf_kernel_equals_jnp_path():
    """End-to-end: the sampled-tree forward + grads with leaf_kernel on/off."""
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=20, num_items=15, num_groups=3, interactions_per_user=4,
        test_per_user=2, feat_dim=8, with_clicks=True, seed=0,
    )
    graph = data.graph
    feats = {nt: graph.ndata[nt]["features"] for nt in graph.ntypes}
    model_off = ConvModel(
        canonical_etypes=graph.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3,
        aggregator_type="mean_nn",
    )
    seeds = {
        "user": jnp.arange(12, dtype=jnp.int32),
        "item": jnp.arange(10, dtype=jnp.int32),
    }
    fanouts = (4, 3)
    rng = jax.random.PRNGKey(7)
    pairs = {("user", "buys", "item"): (jnp.asarray([0, 1]),
                                        jnp.asarray([2, 3]))}
    params = model_off.init(jax.random.PRNGKey(0), graph, feats, pairs,
                            pairs, deterministic=True)
    model_on = model_off.clone(leaf_kernel=True)

    def fwd(model, params):
        def run(mdl):
            return mdl.sampled_repr(graph, feats, seeds, fanouts, rng,
                                    deterministic=True)

        out = model.apply(params, method=run)
        return out

    a = fwd(model_off, params)
    b = fwd(model_on, params)
    for nt in a:
        np.testing.assert_allclose(
            np.asarray(a[nt]), np.asarray(b[nt]), rtol=1e-5, atol=1e-6
        )

    def loss(model, params):
        out = fwd(model, params)
        return sum(jnp.sum(v ** 2) for v in out.values())

    ga = jax.grad(lambda p: loss(model_off, p))(params)
    gb = jax.grad(lambda p: loss(model_on, p))(params)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    assert len(flat_a) == len(flat_b)
    for va, vb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-5
        )


def test_leaf_kernel_ragged_parent_count():
    """Non-multiple-of-block parent counts pad and slice correctly."""
    x, ms, w, b = _case(seed=2, p=40)
    out = leaf_mean_nn(
        jnp.pad(x, ((0, 0), (0, 8), (0, 0))),
        jnp.pad(ms, ((0, 8), (0, 0))),
        w, b, 16, True,
    )[:40]
    ref = leaf_mean_nn_reference(x, ms, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
