"""A/B the fused Pallas leaf kernel vs the XLA folded-leaf path.

Runs the production minibatch step (bench.py shapes) twice — ConvModel
``leaf_kernel`` off/on — with the honest chained-scan slope timing.

Usage: python benchmarks/leaf_ab.py [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--variants", default="off,on")
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--pool-mask-kernel", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import build
    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )
    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    model, data, g, feats = build(
        small_graph=args.small, small_dims=args.small
    )
    cfg = MinibatchConfig(
        edge_batch_size=2048, fanouts=(8, 4), neg_sample_size=2500,
        neg_mode="dense_pool", neg_pool_size=2560,
        pool_mask_kernel=args.pool_mask_kernel,
    )
    params = init_model(model, g, feats, seed=0)
    train_etypes = tuple(data.train_pairs.keys())
    store_src = {et: u for et, (u, i) in data.train_pairs.items()}
    store_dst = {et: i for et, (u, i) in data.train_pairs.items()}
    edge_tables = {
        et: build_padded_pair_set(
            store_src[et], store_dst[et], num_src=data.num_users
        )
        for et in train_etypes
    }
    store_dev = {
        et: (jnp.asarray(store_src[et], jnp.int32),
             jnp.asarray(store_dst[et], jnp.int32))
        for et in train_etypes
    }
    counts = {et: len(store_src[et]) for et in train_etypes}
    total = sum(counts.values())
    per_et = {
        et: max(1, cfg.edge_batch_size * counts[et] // total)
        for et in train_etypes
    }
    batch_size = sum(per_et.values())

    def slice_batch(sb):
        batch = {}
        for et in train_etypes:
            start = jax.random.randint(
                sb, (), 0, counts[et] - per_et[et], jnp.int32
            )
            eids = start + jnp.arange(per_et[et], dtype=jnp.int32)
            batch[et] = {
                "u": jnp.take(store_dev[et][0], eids),
                "i": jnp.take(store_dev[et][1], eids),
                "recency": jnp.ones((per_et[et],), jnp.float32),
                "eids": eids,
            }
        return batch

    results = {}
    for variant in args.variants.split(","):
        m = model.clone(leaf_kernel=(variant == "on"), leaf_block=args.block)
        state = TrainState.create(
            apply_fn=m.apply, params=params, tx=optax.adam(1e-3)
        )
        step_raw = make_minibatch_step(
            m, cfg, train_etypes, with_update=True, with_exclusion=True,
            has_reverse={et: True for et in train_etypes}, jit=False,
        )

        @jax.jit
        def chain(state, rng, n):
            def body(_, carry):
                state, rng, acc = carry
                rng, sub, sb = jax.random.split(rng, 3)
                state, loss = step_raw(
                    state, g, feats, slice_batch(sb), edge_tables, sub
                )
                return (state, rng, acc + loss)

            state, _, acc = jax.lax.fori_loop(
                0, n, body, (state, rng, jnp.float32(0))
            )
            return acc, acc / jnp.maximum(n, 1).astype(jnp.float32)

        rng = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        _, mean_loss = chain(state, rng, 1)
        loss_val = float(mean_loss)
        print(f"[{variant}] compile+warmup {time.perf_counter() - t0:.1f}s "
              f"loss={loss_val:.4f}", flush=True)
        step_s = chain_time_per_call(
            None, lambda n: chain(state, rng, n)[0], n1=4, n2=24, reps=3,
        )
        results[variant] = (step_s, loss_val)
        print(f"[{variant}] step={step_s * 1e3:.2f} ms  "
              f"edges/s={batch_size / step_s:,.0f}", flush=True)

    if len(results) == 2:
        off, on = results["off"][0], results["on"][0]
        print(f"speedup off->on: {off / on:.3f}x  "
              f"loss off={results['off'][1]:.4f} on={results['on'][1]:.4f}")


if __name__ == "__main__":
    main()
