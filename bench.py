"""Benchmark: training throughput (positive edges/s) of the jit-compiled
full-batch train step on the flagship hetero GraphSAGE model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

``vs_baseline`` is the speedup over a reference-style eager execution of the
exact same math (per-op dispatch, no fusion — how the DGL/PyTorch reference
executes), measured on the same device.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=20_000,
        num_items=8_000,
        num_groups=32,
        interactions_per_user=10,
        test_per_user=2,
        feat_dim=8,
        with_clicks=True,
        seed=0,
        max_fanout=64,
    )
    g = data.graph
    # Reference default "Medium" dims: hidden 256 / out 128 (main.py:86-89).
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 256), ("out", 128)),
        n_layers=3,
        aggregator_type="mean",
        pred="cos",
        aggregator_hetero="sum",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    return model, data, g, feats


def main():
    from gnn_recsys_tpu.ops.edge_hash import build_edge_hash
    from gnn_recsys_tpu.train.full_batch import (
        FullBatchConfig,
        TrainState,
        init_model,
        make_full_batch_step,
    )
    import optax

    model, data, g, feats = build()
    cfg = FullBatchConfig(neg_sample_size=16)
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3)
    )
    train_etypes = tuple(data.train_pairs.keys())
    pos_pairs = {
        et: (jnp.asarray(u, jnp.int32), jnp.asarray(i, jnp.int32))
        for et, (u, i) in data.train_pairs.items()
    }
    edge_tables = {
        et: build_edge_hash(np.asarray(g.rels[et].src), np.asarray(g.rels[et].dst))
        for et in train_etypes
    }
    recency = {}
    num_pos = sum(int(u.shape[0]) for u, _ in pos_pairs.values())

    step_fn = make_full_batch_step(model, cfg, train_etypes)
    rng = jax.random.PRNGKey(0)

    # Warmup / compile.
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, loss = step_fn(state, g, feats, pos_pairs, edge_tables, recency, sub)
    jax.block_until_ready(loss)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, loss = step_fn(state, g, feats, pos_pairs, edge_tables, recency, sub)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    edges_per_s = num_pos * n_steps / dt

    # Reference-style eager baseline: same math, per-op dispatch, no jit.
    with jax.disable_jit():
        eager_steps = 1
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        for _ in range(eager_steps):
            state, loss = step_fn(state, g, feats, pos_pairs, edge_tables,
                                  recency, sub)
        jax.block_until_ready(loss)
        eager_dt = time.perf_counter() - t0
    eager_edges_per_s = num_pos * eager_steps / eager_dt

    print(
        f"devices={jax.devices()} pos_edges={num_pos} "
        f"step={dt / n_steps * 1e3:.1f}ms eager_step={eager_dt / eager_steps * 1e3:.1f}ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / eager_edges_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
