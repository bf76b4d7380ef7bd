"""Stage-ablation profile of the minibatch training step on TPU.

Answers ROADMAP "profile the minibatch step (tree vs scoring vs update)"
with HONEST timing (utils/timing.py: block_until_ready under-waits on
tunneled devices; per-dispatch RPC latency dominates un-chunked loops).
Each variant runs n chained steps inside ONE jit'd lax.scan dispatch with
a carried reduction (so iterations cannot overlap), ends with a scalar
D2H pull, and the per-step figure is the (T(n2)-T(n1))/(n2-n1) slope —
dispatch and pull overhead cancel.

Variants at the bench.py config (edge batch 2048, 2500 negatives from a
4096 shared pool, Medium dims hidden 256/out 128, bf16, fanouts (8,4)):

  mask   false-negative membership test alone  (pair_set_contains)
  fwd    neg sampling + sampled-tree forward + pos/neg scoring
  step   the full production step: fwd + mask + loss + grad + Adam

Usage: python benchmarks/profile_step.py [--n1 2] [--n2 12]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=44)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import bench
    from gnn_recsys_tpu.models.loss import max_margin_loss
    from gnn_recsys_tpu.ops.membership import (
        build_padded_pair_set,
        pair_set_contains,
    )
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )
    from gnn_recsys_tpu.utils.timing import chain_time_per_call, hard_sync

    t0 = time.perf_counter()
    model, data, g, feats = bench.build()
    cfg = MinibatchConfig(
        edge_batch_size=2048, fanouts=(8, 4), neg_sample_size=2500,
        neg_mode="dense_pool", neg_pool_size=4096,
    )
    params = init_model(model, g, feats, seed=0)
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
        et: max(1, cfg.edge_batch_size * counts[et] // total)
        for et in train_etypes
    }
    b_total = sum(per_et.values())
    step = make_minibatch_step(
        model, cfg, train_etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in train_etypes}, jit=False,
    )
    print(f"build+init: {time.perf_counter() - t0:.1f}s "
          f"device={jax.devices()[0]} batch={b_total} "
          f"negs={cfg.neg_sample_size} pool={cfg.neg_pool_size}",
          file=sys.stderr)

    def slice_batch(sb):
        batch = {}
        for et in train_etypes:
            start = jax.random.randint(
                sb, (), 0, counts[et] - per_et[et], jnp.int32
            )
            eids = start + jnp.arange(per_et[et], dtype=jnp.int32)
            batch[et] = {
                "u": jnp.take(store[et][0], eids),
                "i": jnp.take(store[et][1], eids),
                "recency": jnp.ones((per_et[et],), jnp.float32),
                "eids": eids,
            }
        return batch

    def neg_draws(r_pool, r_idx):
        pool = jax.random.randint(
            r_pool, (cfg.neg_pool_size,), 0, g.num_nodes("item"), jnp.int32
        )
        if cfg.neg_mode == "dense_pool":
            return pool, {et: None for et in train_etypes}
        keys = jax.random.split(r_idx, len(train_etypes))
        neg_idx = {
            et: jax.random.randint(
                keys[j], (per_et[et], cfg.neg_sample_size), 0,
                cfg.neg_pool_size, jnp.int32,
            )
            for j, et in enumerate(train_etypes)
        }
        return pool, neg_idx

    # --- scan-chained variants (carried reduction forbids overlap) ---

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_step(state, rng, n):
        def body(carry, _):
            state, rng, acc = carry
            rng, sub, sb = jax.random.split(rng, 3)
            state, loss = step(
                state, g, feats, slice_batch(sb), edge_tables, sub
            )
            return (state, rng, acc + loss), ()
        (state, _, acc), _ = jax.lax.scan(
            body, (state, rng, jnp.float32(0)), None, length=n
        )
        return acc

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_fwd(params, rng, n):
        def body(carry, _):
            rng, acc = carry
            rng, sb, r_pool, r_idx, r_tree = jax.random.split(rng, 5)
            batch = slice_batch(sb)
            pairs = {et: (batch[et]["u"], batch[et]["i"])
                     for et in train_etypes}
            pool, neg_idx = neg_draws(r_pool, r_idx)
            pos_s, neg_s, _ = model.apply(
                params, g, feats, pairs, pool, neg_idx, cfg.fanouts, r_tree,
                deterministic=True, dedup=cfg.dedup,
                method="minibatch_forward",
            )
            red = sum(jnp.sum(v) for v in pos_s.values()) + sum(
                jnp.sum(v) for v in neg_s.values()
            )
            return (rng, acc + red.astype(jnp.float32)), ()
        (_, acc), _ = jax.lax.scan(
            body, (rng, jnp.float32(0)), None, length=n
        )
        return acc

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_mask(rng, n):
        def body(carry, _):
            rng, acc = carry
            rng, sb, r_neg = jax.random.split(rng, 3)
            batch = slice_batch(sb)
            red = jnp.float32(0)
            for et in train_etypes:
                neg_dst = jax.random.randint(
                    r_neg, (per_et[et], cfg.neg_sample_size), 0,
                    g.num_nodes("item"), jnp.int32,
                )
                m = pair_set_contains(
                    edge_tables[et], batch[et]["u"], neg_dst
                )
                red = red + jnp.sum(m.astype(jnp.float32))
            return (rng, acc + red), ()
        (_, acc), _ = jax.lax.scan(
            body, (rng, jnp.float32(0)), None, length=n
        )
        return acc

    rng = jax.random.PRNGKey(0)
    results = {}
    for name, chain in (
        ("mask", lambda n: chain_mask(rng, n)),
        ("fwd", lambda n: chain_fwd(state.params, rng, n)),
        ("step", lambda n: chain_step(state, rng, n)),
    ):
        t0 = time.perf_counter()
        per = chain_time_per_call(
            None, chain, n1=args.n1, n2=args.n2, reps=args.reps
        )
        results[name] = per
        print(f"{name:<6}{per*1e3:>9.2f} ms/step   "
              f"(measured in {time.perf_counter()-t0:.0f}s)")

    print(f"\nbatch={b_total}: fwd {results['fwd']*1e3:.1f}ms | "
          f"mask {results['mask']*1e3:.1f}ms | "
          f"bwd+loss+update {(results['step']-results['fwd'])*1e3:.1f}ms | "
          f"edges/s {b_total/results['step']:,.0f}")


if __name__ == "__main__":
    main()
