"""Micro-benchmark: negative-score gather strategies on TPU.

The minibatch step scores a shared negative pool with one [B, P] matmul
and then picks per-positive sampled scores by index.  Three ways to pick
(plus the tree forward alone, to complete the fwd attribution):

  tree        sampled_repr alone on the bench seeds (no scoring)
  along       take_along_axis(sm [B,P], idx [B,S])  — per-row scalar gather
  flat        sm.reshape(-1)[b*P + idx]             — 1D scalar gather
  rowgather   einsum('bd,bsd->bs', u, pool[idx])    — row gather + dot
                (materializes [B,S,D] but every gather is a lane-aligned
                 128-wide row — the TPU-fast path)

Each is timed forward-only and value_and_grad, honest chained-scan.

Usage: python benchmarks/profile_gather.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    B, P, S, D = 1024, 4096, 2500, 128

    key = jax.random.PRNGKey(0)
    ku, kp, ki = jax.random.split(key, 3)
    u = jax.random.normal(ku, (B, D), jnp.float32)
    pool = jax.random.normal(kp, (P, D), jnp.float32)
    idx = jax.random.randint(ki, (B, S), 0, P, jnp.int32)

    def score_along(u, pool):
        sm = (u @ pool.T)
        return jnp.take_along_axis(sm, idx, axis=1)

    def score_flat(u, pool):
        sm = (u @ pool.T).reshape(-1)
        flat = jnp.arange(B, dtype=jnp.int32)[:, None] * P + idx
        return jnp.take(sm, flat.reshape(-1)).reshape(B, S)

    def score_rowgather(u, pool):
        pe = jnp.take(pool, idx.reshape(-1), axis=0).reshape(B, S, D)
        return jnp.einsum("bd,bsd->bs", u, pe)

    def chain_of(fn, grad):
        if grad:
            def one(u, pool):
                return jax.grad(
                    lambda p: jnp.sum(jax.nn.relu(fn(u, p)))
                )(pool).sum()
        else:
            def one(u, pool):
                return jnp.sum(fn(u, pool))

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(u, pool, n):
            def body(carry, _):
                acc = carry
                # perturb input by acc to chain iterations (forbid overlap)
                out = one(u + acc * 1e-20, pool)
                return acc + out, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return chain

    print(f"device={jax.devices()[0]} B={B} P={P} S={S} D={D}")
    for name, fn in (("along", score_along), ("flat", score_flat),
                     ("rowgather", score_rowgather)):
        for grad in (False, True):
            chain = chain_of(fn, grad)
            t0 = time.perf_counter()
            per = chain_time_per_call(
                None, lambda n: chain(u, pool, n), n1=2, n2=12
            )
            tag = "fwd+bwd" if grad else "fwd"
            print(f"{name:<10}{tag:<8}{per*1e3:>9.2f} ms   "
                  f"({time.perf_counter()-t0:.0f}s)")

    # Tree forward alone at bench shapes.
    import numpy as np
    import optax
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model

    model, data, g, feats = bench.build()
    params = init_model(model, g, feats, seed=0)
    ids_u = jnp.asarray(np.arange(2048) % data.num_users, jnp.int32)
    ids_i = jnp.asarray(np.arange(2048 + P) % data.num_items, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_tree(params, rng, n):
        def body(carry, _):
            rng, acc = carry
            rng, sub = jax.random.split(rng)
            reprs = model.apply(
                params, g, feats, {"user": ids_u, "item": ids_i},
                (8, 4), sub, deterministic=True, method="sampled_repr",
            )
            red = jnp.sum(reprs["user"]) + jnp.sum(reprs["item"])
            return (rng, acc + red.astype(jnp.float32)), ()
        (_, acc), _ = jax.lax.scan(
            body, (rng, jnp.float32(0)), None, length=n
        )
        return acc

    t0 = time.perf_counter()
    per = chain_time_per_call(
        None, lambda n: chain_tree(params, jax.random.PRNGKey(0), n),
        n1=2, n2=12,
    )
    print(f"{'tree':<10}{'fwd':<8}{per*1e3:>9.2f} ms   "
          f"({time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
