"""Bytes-on-the-wire comparison: GSPMD-inferred collectives vs the
explicit all-to-all lookup-exchange step, on the virtual 8-device mesh.

Both steps compute the same training math with the item feature table
row-sharded over the 'model' axis (tests/test_multichip.py asserts the
explicit step equals the DP step).  This harness compiles each and sums
the output bytes of every collective op in the optimized HLO
(all-reduce / all-gather / all-to-all / collective-permute / reduce-
scatter) — the traffic a real ICI would carry per step.

Usage: python benchmarks/comm_bytes.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from gnn_recsys_tpu.models.conv_model import ConvModel  # noqa: E402
from gnn_recsys_tpu.ops.membership import build_padded_pair_set  # noqa: E402
from gnn_recsys_tpu.parallel.mesh import make_mesh  # noqa: E402
from gnn_recsys_tpu.parallel.sharded import (  # noqa: E402
    make_gspmd_minibatch_step,
    make_shardmap_tp_dp_step,
    shard_batch_dict,
    shard_inputs,
)
from gnn_recsys_tpu.train.full_batch import TrainState, init_model  # noqa: E402
from gnn_recsys_tpu.train.minibatch import MinibatchConfig  # noqa: E402
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}
COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind in optimized HLO text."""
    out = {k: 0 for k in COLLECTIVES}
    # e.g.:  %all-to-all.3 = (s32[8,16]{...}, ...) all-to-all(...)
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+(.*?)\s+(" + "|".join(COLLECTIVES) + r")\(",
                      line)
        if not m:
            continue
        kind = m.group(2)
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            out[kind] += n * DTYPE_BYTES[dt]
    return out


def main():
    data = make_synthetic_data(
        num_users=512, num_items=256, num_groups=8,
        interactions_per_user=8, with_clicks=True, seed=5,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 64), ("out", 32)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2)
    )
    cfg = MinibatchConfig(
        edge_batch_size=256, fanouts=(4, 4), neg_sample_size=32,
        neg_mode="dense_pool", neg_pool_size=64,
    )
    etypes = tuple(data.train_pairs.keys())
    batch = {}
    for et in etypes:
        src = np.asarray(g.rels[et].src)[:128]
        dst = np.asarray(g.rels[et].dst)[:128]
        batch[et] = {
            "u": jnp.asarray(src, jnp.int32),
            "i": jnp.asarray(dst, jnp.int32),
            "recency": jnp.ones((128,), jnp.float32),
            "eids": jnp.arange(128, dtype=jnp.int32),
        }
    tables = {
        et: build_padded_pair_set(
            np.asarray(g.rels[et].src), np.asarray(g.rels[et].dst),
            num_src=g.num_nodes("user"),
        )
        for et in etypes
    }
    mesh = make_mesh(8, data_axis=4)
    rng = jax.random.PRNGKey(0)

    # GSPMD: same jaxpr as single-device; placement drives collectives.
    gs = make_gspmd_minibatch_step(model, cfg, etypes, mesh)
    s_state, s_graph, s_feats, s_tables = shard_inputs(
        mesh, state, g, feats, tables, row_shard_ntypes=("item",)
    )
    s_batch = shard_batch_dict(mesh, batch)
    gs_comp = (
        jax.jit(gs)
        .lower(s_state, s_graph, s_feats, s_batch, s_tables, rng)
        .compile()
    )
    gs_bytes = collective_bytes(gs_comp.as_text())

    # Explicit: shard_map + row_sharded_lookup_a2a per leaf lookup.
    tp = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",)
    )
    tp_comp = tp.lower(state, g, feats, batch, tables, rng).compile()
    tp_bytes = collective_bytes(tp_comp.as_text())

    print(f"mesh: {dict(mesh.shape)}  batch/etype: 128  "
          f"item table: {feats['item'].shape}")
    for name, b in (("gspmd-inferred", gs_bytes), ("explicit-a2a", tp_bytes)):
        tot = sum(b.values())
        parts = ", ".join(f"{k}={v / 1024:.1f}KiB"
                          for k, v in b.items() if v)
        print(f"{name:15s} total {tot / 1024:8.1f} KiB/step  ({parts})")


if __name__ == "__main__":
    main()
