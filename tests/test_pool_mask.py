"""Dense-pool false-negative mask: fused kernel == broadcast compare."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_recsys_tpu.ops.membership import (
    build_padded_pair_set,
    pair_set_contains,
    pair_set_contains_pool,
)


def _world(seed=0, n_users=50, n_items=40, n_edges=300, b=33, p=70):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_users, n_edges).astype(np.int32)
    dst = rng.integers(0, n_items, n_edges).astype(np.int32)
    ps = build_padded_pair_set(src, dst, num_src=n_users)
    u = jnp.asarray(rng.integers(0, n_users, b), jnp.int32)
    pool = jnp.asarray(rng.integers(0, n_items, p), jnp.int32)
    return ps, u, pool


def test_pool_mask_matches_general_contains():
    ps, u, pool = _world()
    want = pair_set_contains(
        ps, u, jnp.broadcast_to(pool[None, :], (u.shape[0], pool.shape[0]))
    ).astype(jnp.float32)
    got_jnp = pair_set_contains_pool(ps, u, pool, use_kernel=False)
    got_k = pair_set_contains_pool(ps, u, pool, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(got_jnp), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want))


def test_pool_mask_kernel_padding_rows_never_match():
    # users with zero edges -> all -1 rows -> all-zero mask rows
    rng = np.random.default_rng(1)
    src = np.zeros(5, np.int32)  # only user 0 has edges
    dst = rng.integers(0, 10, 5).astype(np.int32)
    ps = build_padded_pair_set(src, dst, num_src=4)
    u = jnp.asarray([0, 1, 2, 3], jnp.int32)
    pool = jnp.asarray(rng.integers(0, 10, 17), jnp.int32)
    got = pair_set_contains_pool(ps, u, pool, use_kernel=True)
    assert np.asarray(got)[1:].sum() == 0
    want0 = np.isin(np.asarray(pool), dst).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(got)[0], want0)


def test_minibatch_step_equal_with_pool_mask_kernel():
    """One dense-pool training step: kernel flag on == off, bit for bit."""
    import optax

    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=40, num_items=30, num_groups=4, interactions_per_user=5,
        test_per_user=1, feat_dim=8, with_clicks=True, seed=2,
    )
    g = data.graph
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean_nn",
    )
    params = init_model(model, g, feats, seed=0)
    etypes = tuple(data.train_pairs.keys())
    tables = {
        et: build_padded_pair_set(u, i, num_src=40)
        for et, (u, i) in data.train_pairs.items()
    }
    batch = {}
    for et, (u, i) in data.train_pairs.items():
        batch[et] = {
            "u": jnp.asarray(u[:16], jnp.int32),
            "i": jnp.asarray(i[:16], jnp.int32),
            "recency": jnp.ones((16,), jnp.float32),
            "eids": jnp.arange(16, dtype=jnp.int32),
        }
    rng = jax.random.PRNGKey(5)
    losses = {}
    for flag in (False, True):
        cfg = MinibatchConfig(
            edge_batch_size=32, fanouts=(3, 3), neg_mode="dense_pool",
            neg_pool_size=24, neg_sample_size=24,
            pool_mask_kernel=flag,
        )
        step = make_minibatch_step(
            model, cfg, etypes, with_update=True, with_exclusion=True,
            has_reverse={et: True for et in etypes},
        )
        # Fresh param copies per variant: the jitted step donates state.
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, params),
            tx=optax.adam(1e-3),
        )
        state, loss = step(state, g, feats, batch, tables, rng)
        losses[flag] = float(loss)
    # The mask VALUES are asserted exactly equal in the tests above;
    # the end-to-end gate is the loss, which must match bit-for-bit.
    # (Post-Adam params are NOT compared: two separately compiled
    # programs reduce gradients in different orders, and Adam's
    # sqrt(v) normalization turns ulp-level gradient noise into
    # ~1e-3-relative parameter wiggle on near-zero-gradient elements.)
    assert losses[False] == losses[True]
