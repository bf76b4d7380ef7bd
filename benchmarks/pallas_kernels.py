"""Real-TPU validation + micro-benchmark of the Pallas kernels.

Compiles (not interpret-mode) the fused MIPS top-k kernel
(:mod:`gnn_recsys_tpu.ops.pallas.topk_mips`) and the fused gather+mean
kernel (:mod:`gnn_recsys_tpu.ops.pallas.gather_mean`) on the attached
device, checks them against their XLA reference paths, and times both
sides at serving/training shapes.

Usage: python benchmarks/pallas_kernels.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    """Honest per-call time + one output (utils/timing.py rationale:
    block_until_ready under-waits on tunneled devices, and per-dispatch
    RPC latency swamps un-chunked loops).  Runs n chained calls in one
    jit'd lax.scan — each iteration's first float input is perturbed by
    the carried reduction so XLA cannot hoist the loop-invariant body —
    and reports the (T(n2)-T(n1))/(n2-n1) slope with hard D2H syncs.
    ``iters`` sets the long chain length."""
    import functools

    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    del warmup  # chain_time_per_call compiles/warms each length itself
    out = fn(*args)

    first_float = next(
        i for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n, *a):  # args as jit params, not captured 2GB constants
        def body(acc, _):
            call_args = list(a)
            call_args[first_float] = call_args[first_float] + (
                acc * jnp.asarray(1e-30, call_args[first_float].dtype)
            )
            o = fn(*call_args)
            leaves = [x for x in jax.tree_util.tree_leaves(o)
                      if jnp.issubdtype(x.dtype, jnp.floating)]
            red = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
            return acc + red, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    n2 = max(iters, 6)
    per = chain_time_per_call(
        None, lambda n: chain(n, *args), n1=2, n2=n2, reps=2
    )
    return per, out


def bench_mips(num_users, num_items, d, k, quick=False, sweep=False):
    from gnn_recsys_tpu.models.layers import l2_normalize
    from gnn_recsys_tpu.ops.pallas.topk_mips import mips_topk

    key = jax.random.PRNGKey(0)
    ku, ki = jax.random.split(key)
    ue = l2_normalize(jax.random.normal(ku, (num_users, d), jnp.float32))
    ie = l2_normalize(jax.random.normal(ki, (num_items, d), jnp.float32))

    @jax.jit
    def xla_topk(u, i):
        scores = jnp.matmul(u, i.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(scores, k)

    iters = 3 if quick else 20
    t_xla, (xv, xi) = timeit(xla_topk, ue, ie, iters=iters)
    t_pl, (pv, pi) = timeit(
        lambda u, i: mips_topk(u, i, k), ue, ie, iters=iters
    )
    t_pl_bf16, (bv, bi) = timeit(
        lambda u, i: mips_topk(u, i, k, bf16=True), ue, ie, iters=iters
    )
    # Values must match exactly where both used f32 accumulation on the
    # same-precision matmul; allow tiny drift (different contraction tiling).
    verr = float(jnp.max(jnp.abs(xv - pv)))
    idx_match = float(jnp.mean((xi == pi).astype(jnp.float32)))
    qps_xla = num_users / t_xla
    qps_pl = num_users / t_pl
    print(
        f"MIPS top-{k}  U={num_users} I={num_items} D={d}: "
        f"XLA {t_xla * 1e3:.2f}ms ({qps_xla:,.0f} QPS) | "
        f"pallas f32 {t_pl * 1e3:.2f}ms ({qps_pl:,.0f} QPS) | "
        f"pallas bf16 {t_pl_bf16 * 1e3:.2f}ms "
        f"({num_users / t_pl_bf16:,.0f} QPS) | "
        f"max|dv|={verr:.2e} idx-match={idx_match:.4f}"
    )
    assert verr < 1e-5, f"value mismatch {verr}"
    assert idx_match > 0.999, f"index mismatch {idx_match}"
    if sweep:
        for tu in (128, 256, 512, 1024):
            if tu > num_users:
                continue
            line = f"  sweep tu={tu}:"
            for ti in (512, 1024, 2048):
                for bf16 in (False, True):
                    try:
                        t, _ = timeit(
                            lambda u, i: mips_topk(
                                u, i, k, tile_users=tu, tile_items=ti,
                                bf16=bf16,
                            ),
                            ue, ie, iters=iters,
                        )
                        line += (
                            f" ti={ti}{'/bf16' if bf16 else ''}"
                            f" {t * 1e3:.2f}ms"
                        )
                    except Exception as e:
                        line += f" ti={ti}{'/bf16' if bf16 else ''} FAIL"
            print(line)
    return {"xla_ms": t_xla * 1e3, "pallas_ms": t_pl * 1e3,
            "pallas_bf16_ms": t_pl_bf16 * 1e3}


def bench_gather_mean(n_src, batch, fanout, d, quick=False):
    from gnn_recsys_tpu.ops.pallas.gather_mean import gather_mean_pallas

    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    h = jax.random.normal(k1, (n_src, d), jnp.float32)
    nbr = jax.random.randint(k2, (batch, fanout), 0, n_src, jnp.int32)
    mask = jax.random.bernoulli(k3, 0.8, (batch, fanout))

    @jax.jit
    def xla_mean(h, nbr, mask):
        msgs = jnp.take(h, nbr, axis=0)  # [B, K, D]
        m = mask.astype(h.dtype)
        tot = jnp.sum(msgs * m[..., None], axis=1)
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return tot / cnt[:, None]

    iters = 3 if quick else 20
    t_xla, ref = timeit(xla_mean, h, nbr, mask, iters=iters)
    results = {"xla_ms": t_xla * 1e3}
    line = (
        f"gather+mean  N={n_src} B={batch} K={fanout} D={d}: "
        f"XLA {t_xla * 1e3:.2f}ms"
    )
    for tile in (8, 16, 32):
        if tile * fanout > 256:
            # Per-core DMA-semaphore budget: the kernel issues one DMA per
            # (row, neighbor) slot per tile (see gather_mean.py docstring).
            line += f" | pallas(t={tile}) skipped(sem budget)"
            continue
        try:
            t_pl, out = timeit(
                lambda h, n, m: gather_mean_pallas(h, n, m, tile_rows=tile),
                h, nbr, mask, iters=iters,
            )
        except Exception as e:  # compile failure on this config
            line += f" | pallas(t={tile}) FAIL({type(e).__name__})"
            continue
        err = float(jnp.max(jnp.abs(ref - out)))
        assert err < 1e-4, f"gather_mean mismatch {err} (tile {tile})"
        results[f"pallas_t{tile}_ms"] = t_pl * 1e3
        line += f" | pallas(t={tile}) {t_pl * 1e3:.2f}ms"
    print(line)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    # Serving shapes: catalog sizes spanning the synthetic bench (30k) up.
    bench_mips(1024, 30_000, 128, 10, quick=args.quick)
    # Tile sweeps are opt-in: each tile config costs two chained-scan
    # compiles, which is ~an hour over a tunneled device.
    if not args.quick:
        bench_mips(4096, 100_000, 128, 10, sweep=args.sweep)
        bench_mips(4096, 500_000, 128, 10, sweep=args.sweep)

    # Training shapes: level-1 frontier of a (8,4)-fanout tree at B=2048
    # positive edges is ~2048*2 dsts with fanout 8 -> B=4096, K=8; the
    # level-0 aggregation is B=2048, K=8 over hidden dim 256.
    bench_gather_mean(100_000, 4096, 8, 256, quick=args.quick)
    if not args.quick:
        bench_gather_mean(100_000, 16384, 32, 256)
        bench_gather_mean(1_000_000, 8192, 16, 512)


if __name__ == "__main__":
    main()
