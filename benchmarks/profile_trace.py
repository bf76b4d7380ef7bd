"""Op-level TPU time attribution via ``jax.profiler.trace``.

The chained-scan slope method (utils/timing.py) gives honest END-TO-END
step times over the tunneled device, but no attribution.  This harness
captures a short profiler trace of repeated dispatches and aggregates
device-side op durations from the exported Chrome trace — the tool that
located the scalar-gather bottleneck (1-D int32 gathers at ~7 ns/element,
~60% of the sampled-tree forward) whose row-gather fix took the production
step from 22.1 to 13.2 ms.

Per-dispatch RPC latency inflates WALL time between ops but not the
per-op durations, so the attribution is valid even though the sum of op
times can disagree with chained-scan wall time; use both.

Usage:
  python benchmarks/profile_trace.py [--what fwd|step] [--iters 20]
      [--small/--full] [--topk 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir: str, iters: int, topk: int) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    agg: dict = {}
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        ln = e.get("args", {}).get("long_name")
        if not ln:
            continue  # host-side python frames etc.
        rec = agg.setdefault(
            e["name"], [0, 0, e["args"].get("hlo_category", "?"), ln]
        )
        rec[0] += e.get("dur", 0)
        rec[1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    tot = sum(v[0] for v in agg.values())
    print(
        f"device op time: {tot / 1e3:.1f} ms over {iters} iters "
        f"-> {tot / iters / 1e3:.2f} ms/iter"
    )
    by_cat = collections.Counter()
    for _, (d, _, cat, _) in agg.items():
        by_cat[cat] += d
    for cat, d in by_cat.most_common():
        print(f"  {d / iters / 1e3:7.3f} ms/it {100 * d / tot:5.1f}%  {cat}")
    print()
    csum = 0
    for n, (d, c, cat, ln) in rows[:topk]:
        csum += d
        print(
            f"{d / iters / 1e3:7.3f} ms/it {100 * d / tot:5.1f}% "
            f"cum{100 * csum / tot:5.1f}%  x{c:4d} {cat:18s} {ln[:120]}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="step", choices=("fwd", "step"))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--full", action="store_true",
                    help="bench-size graph (default: small)")
    ap.add_argument("--topk", type=int, default=30)
    ap.add_argument("--out", default=None, help="keep trace dir here")
    ap.add_argument("--leaf-kernel", action="store_true",
                    help="profile with the fused Pallas leaf kernel on")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import bench
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )

    t0 = time.perf_counter()
    model, data, g, feats = bench.build(small_graph=not args.full)
    if args.leaf_kernel:
        model = model.clone(leaf_kernel=True)
    params = init_model(model, g, feats, seed=0)
    print(f"build+init {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    if args.what == "fwd":
        ku = jnp.arange(2048, dtype=jnp.int32) % data.num_users
        ki = jnp.arange(2048 + 4096, dtype=jnp.int32) % data.num_items

        def fn(params, r):
            reprs = model.apply(
                params, g, feats, {"user": ku, "item": ki}, (8, 4), r,
                method=model.sampled_repr,
            )
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                reprs, jnp.float32(0),
            )

        jf = jax.jit(fn)
        arg0 = params
    else:
        cfg = MinibatchConfig(
            edge_batch_size=2048, fanouts=(8, 4), neg_sample_size=2500,
            neg_mode="dense_pool", neg_pool_size=2560,
        )
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.adam(1e-3)
        )
        train_etypes = tuple(data.train_pairs.keys())
        edge_tables = {
            et: build_padded_pair_set(u, i, num_src=data.num_users)
            for et, (u, i) in data.train_pairs.items()
        }
        store = {
            et: (jnp.asarray(u, jnp.int32), jnp.asarray(i, jnp.int32))
            for et, (u, i) in data.train_pairs.items()
        }
        counts = {et: int(store[et][0].shape[0]) for et in train_etypes}
        total = sum(counts.values())
        per_et = {
            et: max(1, 2048 * counts[et] // total) for et in train_etypes
        }
        step_raw = make_minibatch_step(
            model, cfg, train_etypes, with_update=True, with_exclusion=True,
            has_reverse={et: True for et in train_etypes}, jit=False,
        )

        def fn(state, r):
            batch = {}
            for et in train_etypes:
                start = jax.random.randint(
                    r, (), 0, counts[et] - per_et[et], jnp.int32
                )
                eids = start + jnp.arange(per_et[et], dtype=jnp.int32)
                batch[et] = {
                    "u": jnp.take(store[et][0], eids),
                    "i": jnp.take(store[et][1], eids),
                    "recency": jnp.ones((per_et[et],), jnp.float32),
                    "eids": eids,
                }
            new_state, loss = step_raw(
                state, g, feats, batch, edge_tables, r
            )
            return new_state, loss

        jf = jax.jit(fn)
        arg0 = state

    t0 = time.perf_counter()
    out = jf(arg0, rng)
    jax.block_until_ready(out)
    print(f"compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    trace_dir = args.out or tempfile.mkdtemp(prefix="jtrace_")
    with jax.profiler.trace(trace_dir):
        r = rng
        for i in range(args.iters):
            r = jax.random.fold_in(r, i)
            out = jf(arg0, r)
        jax.block_until_ready(out)
    aggregate(trace_dir, args.iters, args.topk)


if __name__ == "__main__":
    main()
