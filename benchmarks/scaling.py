"""Scaling benchmark: training edges/s across mesh sizes.

North-star metric (BASELINE.md): >80% linear edges/s scaling efficiency
from 1 chip to a multi-chip mesh.  On a real pod slice this measures true
ICI scaling; on a single host it can exercise the virtual CPU mesh to
validate the sharded program (structure, not speed).

Usage:
    python benchmarks/scaling.py [--devices 1 2 4 8] [--cpu]
Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU platform")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))
    import jax.numpy as jnp
    import optax

    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.parallel.mesh import make_mesh
    from gnn_recsys_tpu.parallel.sharded import (
        make_gspmd_minibatch_step,
        shard_batch_dict,
        shard_inputs,
    )
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import MinibatchConfig
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=20_000, num_items=8_000, num_groups=32,
        interactions_per_user=10, with_clicks=True, seed=0, max_fanout=32,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 128), ("out", 64)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
        dtype=jnp.bfloat16,
    )
    feats0 = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    cfg = MinibatchConfig(
        edge_batch_size=args.batch, fanouts=(8, 4), neg_sample_size=100,
        neg_mode="shared_pool", neg_pool_size=1024,
    )
    etypes = tuple(data.train_pairs.keys())
    tables0 = {
        et: build_padded_pair_set(u, i, num_src=data.num_users)
        for et, (u, i) in data.train_pairs.items()
    }
    params = init_model(model, g, feats0, seed=0)

    base_rate = None
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip {n}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = make_mesh(n, data_axis=n)  # pure DP mesh for scaling curve
        # fresh param copies: the step donates its state buffers
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, params),
            tx=optax.adam(1e-3),
        )
        step = make_gspmd_minibatch_step(model, cfg, etypes, mesh)
        state, gs, fs, ts = shard_inputs(mesh, state, g, feats0, tables0,
                                         row_shard_ntypes=())
        batch = {}
        per_et = (args.batch // len(etypes) // n) * n
        for et, (u, i) in data.train_pairs.items():
            batch[et] = {
                "u": jnp.asarray(u[:per_et], jnp.int32),
                "i": jnp.asarray(i[:per_et], jnp.int32),
                "recency": jnp.ones((per_et,), jnp.float32),
                "eids": jnp.arange(per_et, dtype=jnp.int32),
            }
        batch = shard_batch_dict(mesh, batch)
        rng = jax.random.PRNGKey(0)
        for _ in range(2):  # compile + warm
            rng, sub = jax.random.split(rng)
            state, loss = step(state, gs, fs, batch, ts, sub)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            rng, sub = jax.random.split(rng)
            state, loss = step(state, gs, fs, batch, ts, sub)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        rate = per_et * len(etypes) * args.steps / dt
        if base_rate is None:
            base_rate = rate / n  # per-device at the smallest mesh
        eff = rate / (n * base_rate)
        print(json.dumps({
            "metric": "train_edges_per_s",
            "devices": n,
            "value": round(rate, 1),
            "unit": "edges/s",
            "scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
