"""Deterministic tiny world shared by the multi-host worker processes and
the parent test — every process must build EXACTLY the same host values."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

ET = ("user", "buys", "item")
ETC = ("user", "clicks", "item")
BATCH = 16  # divisible by the 4-device global data axis


def build_world():
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import MinibatchConfig
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=32, num_items=16, num_groups=2, interactions_per_user=6,
        with_clicks=True, seed=7,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 8), ("out", 8)),
        n_layers=2, aggregator_type="mean", pred="cos",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2)
    )
    cfg = MinibatchConfig(
        edge_batch_size=2 * BATCH, fanouts=(2,), neg_sample_size=4,
        neg_mode="shared_pool", neg_pool_size=8,
    )
    etypes = (ET, ETC)
    batch = {}
    for et in etypes:
        src = np.asarray(g.rels[et].src)[:BATCH]
        dst = np.asarray(g.rels[et].dst)[:BATCH]
        batch[et] = {
            "u": jnp.asarray(src, jnp.int32),
            "i": jnp.asarray(dst, jnp.int32),
            "recency": jnp.ones((BATCH,), jnp.float32),
            "eids": jnp.arange(BATCH, dtype=jnp.int32),
        }
    tables = {
        et: build_padded_pair_set(
            np.asarray(g.rels[et].src), np.asarray(g.rels[et].dst),
            num_src=g.num_nodes("user"),
        )
        for et in etypes
    }
    rng = jax.random.PRNGKey(5)
    return state, g, feats, batch, tables, model, cfg, etypes, rng
