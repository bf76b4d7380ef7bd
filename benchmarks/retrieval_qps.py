"""Retrieval benchmark: full-catalog top-k queries/s.

North-star serving metric (BASELINE.md): full-catalog MIPS top-k QPS with
already-bought masking.  Compares the XLA chunked path against the fused
Pallas kernel.

Usage: python benchmarks/retrieval_qps.py [--users 8192 --items 100000 --d 128]
Prints one JSON line per backend.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=8192)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--bought-per-user", type=int, default=20)
    ap.add_argument("--popularity", action="store_true",
                    help="popularity-boosted scoring (softmax + w*pop, "
                         "reference src/metrics.py:69-72)")
    ap.add_argument("--weight-popularity", type=float, default=2.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.retrieval.recs import get_recs

    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(args.users, args.d)).astype(np.float32))
    ie = jnp.asarray(rng.normal(size=(args.items, args.d)).astype(np.float32))
    ab_u = np.repeat(np.arange(args.users, dtype=np.int32),
                     args.bought_per_user)
    ab_i = rng.integers(0, args.items, len(ab_u)).astype(np.int32)
    ps = build_padded_pair_set(ab_u, ab_i, num_src=args.users)
    uids = jnp.arange(args.users, dtype=jnp.int32)
    pop = (
        jnp.asarray(rng.uniform(0, 0.05, args.items).astype(np.float32))
        if args.popularity else None
    )

    import functools

    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    for backend in ("xla", "pallas"):
        # Honest chained-scan slope timing (utils/timing.py):
        # block_until_ready under-waits on tunneled devices and
        # per-dispatch RPC latency swamps single-call timing.  The query
        # table is perturbed by the carried reduction so XLA cannot hoist
        # the loop-invariant body.
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(n, backend=backend):
            def body(acc, _):
                recs = get_recs(
                    ue + acc * jnp.float32(1e-30), ie, uids, args.k,
                    already_bought=ps, backend=backend,
                    popularity=pop,
                    weight_popularity=args.weight_popularity,
                )
                return acc + jnp.sum(recs).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        dt = chain_time_per_call(None, chain, n1=1, n2=5, reps=2)
        qps = args.users / dt
        print(json.dumps({
            "metric": f"retrieval_qps_{backend}"
                      + ("_boosted" if args.popularity else ""),
            "value": round(qps, 1),
            "unit": "users/s",
            "catalog": args.items,
            "k": args.k,
            "batch_ms": round(dt * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
