"""Finer ablations of the minibatch step (companion to profile_step.py).

Variants (same bench.py config; honest chained-scan timing):
  step            full production step (baseline from profile_step.py)
  step-noexcl     without batch-edge exclusion (searchsorted per level)
  step-nomask     without the false-negative membership mask
  step-rbg        full step under the 'rbg' PRNG (threefry ablation)
  fwd-rbg         forward only under 'rbg'

Usage: python benchmarks/profile_ablate.py [--prng rbg]
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
    ap.add_argument("--n1", type=int, default=2)
    ap.add_argument("--n2", type=int, default=12)
    ap.add_argument("--prng", default=None, choices=(None, "rbg",
                                                     "unsafe_rbg"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    import jax

    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

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
    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    t0 = time.perf_counter()
    model, data, g, feats = bench.build()

    def make_cfg(**kw):
        base = dict(
            edge_batch_size=2048, fanouts=(8, 4), neg_sample_size=2500,
            neg_mode="shared_pool", neg_pool_size=4096,
        )
        base.update(kw)
        return MinibatchConfig(**base)

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
        et: max(1, 2048 * counts[et] // total) for et in train_etypes
    }
    b_total = sum(per_et.values())
    print(f"build+init: {time.perf_counter()-t0:.1f}s "
          f"device={jax.devices()[0]} batch={b_total} "
          f"prng={args.prng or 'threefry'}", file=sys.stderr)

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

    def chain_for(step, state):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(state, rng, n):
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
        return chain

    rng = jax.random.PRNGKey(0)
    variants = [
        ("step", make_cfg(), True),
        ("step-noexcl", make_cfg(), False),
        ("step-nomask", make_cfg(remove_false_negative=False), True),
        ("step-dense", make_cfg(neg_mode="dense_pool"), True),
        ("step-dense-lean", make_cfg(neg_mode="dense_pool",
                                     remove_false_negative=False), False),
        ("step-dense-dedup", make_cfg(neg_mode="dense_pool", dedup=True),
         True),
    ]
    if args.only:
        variants = [v for v in variants if v[0] in args.only]
    for name, cfg, excl in variants:
        step = make_minibatch_step(
            model, cfg, train_etypes, with_update=True, with_exclusion=excl,
            has_reverse={et: True for et in train_etypes}, jit=False,
        )
        chain = chain_for(step, state)
        t0 = time.perf_counter()
        per = chain_time_per_call(
            None, lambda n: chain(state, rng, n), n1=args.n1, n2=args.n2
        )
        print(f"{name:<14}{per*1e3:>9.2f} ms/step   "
              f"({time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
