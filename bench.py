"""Benchmark: minibatch training throughput (positive edges/s) in the
reference's own regime — edge_batch_size 2048, 2500 negatives per positive
(``/root/reference/main.py:498-511``), hetero click+purchase graph,
2 conv layers, Medium dims (hidden 256 / out 128) — on the TPU-native
sampled-tree step (bf16 MXU compute, on-device sampling/masking).

Timing is the chained-scan slope method (``utils/timing.py``): n steps in
one dispatch, hard D2H sync, (T(n2)-T(n1))/(n2-n1) — block_until_ready
under-waits on tunneled devices and per-dispatch RPC latency would
otherwise dominate.

Prints ONE JSON line:
  {"metric": "train_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": N}

``vs_baseline`` is the speedup over the reference's own stack running the
same step: a faithful PyTorch re-implementation including DGL-style
deduplicated block construction (``benchmarks/torch_reference.py``),
measured on the host CPU — the reference's non-CUDA execution mode
(``main.py:34-39``).  The baseline emulation is deliberately generous
(no H2D copies, fused MKL matmuls, all cores), so the ratio is a lower
bound.
"""

from __future__ import annotations

import json
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def ensure_responsive_device(
    probe_timeout_s: float = 75.0, attempts: int = 3, retry_sleep_s: float = 45.0
) -> bool:
    """Fall back to CPU if the accelerator hangs.

    The axon TPU tunnel can wedge (ops hang indefinitely rather than
    erroring), and a hung op poisons the whole process — so probe in a
    SUBPROCESS.  A recently-exited claimant also blocks new claims for
    ~1-2 minutes (ops hang until the stale claim expires), so retry the
    probe across that window before giving up.  On failure, force the CPU
    platform in this process before any jax op runs, so the benchmark
    still reports a line.
    """
    import subprocess

    for attempt in range(attempts):
        if attempt:
            print(
                f"device probe attempt {attempt} failed; retrying in "
                f"{retry_sleep_s:.0f}s (stale-claim cooldown)",
                file=sys.stderr,
            )
            time.sleep(retry_sleep_s)
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, jax.numpy as jnp;"
                    "jax.block_until_ready("
                    "jnp.ones((64,64)) @ jnp.ones((64,64)))",
                ],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    print(
        f"device probe hung/failed ({attempts}x {probe_timeout_s}s); "
        "CPU fallback",
        file=sys.stderr,
    )
    jax.config.update("jax_platforms", "cpu")
    return False


def build(small_graph: bool = False, small_dims: bool = False):
    from gnn_recsys_tpu.models.conv_model import ConvModel
    from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

    data = make_synthetic_data(
        num_users=10_000 if small_graph else 100_000,
        num_items=4_000 if small_graph else 30_000,
        num_groups=64,
        interactions_per_user=10,
        test_per_user=2,
        feat_dim=8,
        with_clicks=True,
        seed=0,
        max_fanout=32,
    )
    g = data.graph
    # Reference default "Medium" dims: hidden 256 / out 128 (main.py:86-89).
    hidden, out = (64, 32) if small_dims else (256, 128)
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", hidden), ("out", out)),
        n_layers=3,
        aggregator_type="mean_nn",
        pred="cos",
        aggregator_hetero="sum",
        dtype=None if small_dims else jnp.bfloat16,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    return model, data, g, feats


def main():
    import optax

    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )
    from gnn_recsys_tpu.utils.timing import chain_time_per_call, hard_sync

    on_accel = ensure_responsive_device()
    t_build = time.perf_counter()
    # Degraded CPU-fallback config keeps the bench reporting when the
    # accelerator tunnel is wedged; the value is then NOT comparable.
    model, data, g, feats = build(
        small_graph=not on_accel, small_dims=not on_accel
    )
    cfg = MinibatchConfig(
        edge_batch_size=2048 if on_accel else 512,
        fanouts=(8, 4),
        neg_sample_size=2500,  # reference default (main.py:511)
        # dense_pool ranks EVERY pool item per positive (4096 > the
        # reference's 2500 negatives, same uniform marginal) as one
        # [B, P] matmul — measured 42.7 vs 170.8 ms/step for the
        # index-sampled shared_pool at this config on v5e.
        neg_mode="dense_pool",
        neg_pool_size=4096 if on_accel else 512,
    )
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3)
    )
    train_etypes = tuple(data.train_pairs.keys())
    train_eids = {
        et: np.arange(g.num_edges(et)) for et in train_etypes
    }
    # Host-side COO copies come straight from the generator (no D2H pull).
    store_src = {et: u for et, (u, i) in data.train_pairs.items()}
    store_dst = {et: i for et, (u, i) in data.train_pairs.items()}
    edge_tables = {
        et: build_padded_pair_set(
            store_src[et], store_dst[et], num_src=data.num_users
        )
        for et in train_etypes
    }
    # HONEST timing (utils/timing.py): block_until_ready under-waits on
    # tunneled transports (an earlier revision of this bench "measured"
    # 0.7 ms/step that way — ~400x off), and per-dispatch RPC latency
    # dominates un-chunked loops.  Run n chained steps inside ONE jit'd
    # lax.scan dispatch (on-device batch slicing, exactly the
    # production device-epoch path), end with a scalar D2H pull, and take
    # the (T(n2)-T(n1))/(n2-n1) slope so dispatch+pull overhead cancels.
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

    import functools

    step_raw = make_minibatch_step(
        model, cfg, train_etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in train_etypes}, jit=False,
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(state, rng, n):
        def body(carry, _):
            state, rng, acc = carry
            rng, sub, sb = jax.random.split(rng, 3)
            state, loss = step_raw(
                state, g, feats, slice_batch(sb), edge_tables, sub
            )
            return (state, rng, acc + loss), ()
        (state, _, acc), _ = jax.lax.scan(
            body, (state, rng, jnp.float32(0)), None, length=n
        )
        return acc, acc / n

    rng = jax.random.PRNGKey(0)
    print(f"build+init: {time.perf_counter() - t_build:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    _, mean_loss = chain(state, rng, 2)
    loss_val = float(mean_loss)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    n1, n2 = (4, 24) if on_accel else (2, 6)
    step_s = chain_time_per_call(
        None, lambda n: chain(state, rng, n)[0], n1=n1, n2=n2, reps=3,
    )
    edges_per_s = batch_size / step_s
    print(
        f"devices={jax.devices()} batch={batch_size} "
        f"step={step_s * 1e3:.1f}ms loss={loss_val:.4f}",
        file=sys.stderr,
    )

    # Roofline context (so "fast" is verifiable, not asserted): XLA's own
    # post-optimization FLOP / bytes-accessed counts for the measured
    # program, divided by the measured step time, as a % of the chip's
    # peak MXU rate and HBM bandwidth.  "bytes accessed" counts each
    # fused op's operands+outputs, so it over-states true HBM traffic
    # where buffers stay resident — treat the % as an upper bound.
    mxu_pct = hbm_pct = None
    try:
        ca = chain.lower(state, rng, n1).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / n1
        byts = float(ca.get("bytes accessed", 0.0)) / n1
        kind = jax.devices()[0].device_kind.lower()
        # (peak bf16 FLOP/s, HBM bytes/s) per chip, public specs.
        peaks = None
        if "v5 lite" in kind or "v5e" in kind:
            peaks = (197e12, 819e9)
        elif "v5p" in kind or "v5" in kind:
            peaks = (459e12, 2765e9)
        elif "v4" in kind:
            peaks = (275e12, 1228e9)
        if peaks and step_s > 0:
            mxu_pct = 100.0 * (flops / step_s) / peaks[0]
            hbm_pct = 100.0 * (byts / step_s) / peaks[1]
            print(
                f"roofline: {flops / 1e9:.1f} GFLOP/step "
                f"({mxu_pct:.1f}% of bf16 MXU peak), "
                f"{byts / 1e6:.0f} MB accessed/step "
                f"({hbm_pct:.1f}% of HBM bandwidth; upper bound)",
                file=sys.stderr,
            )
    except Exception as e:  # cost_analysis is best-effort over the tunnel
        print(f"roofline unavailable: {e!r}", file=sys.stderr)

    # Reference-stack baseline: the same step in PyTorch with DGL-style
    # dedup'd blocks on the host CPU (benchmarks/torch_reference.py).  The
    # baseline world is built directly on the CPU device (pulling the
    # big-graph tables back through a remote-TPU tunnel would dominate);
    # throughput is per positive edge at the same batch/negatives/dims.
    from benchmarks.torch_reference import run_torch_baseline

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _, e_data, e_g, _ = build(small_graph=True, small_dims=False)
        e_feats_np = {
            nt: np.array(e_g.ndata[nt]["features"]) for nt in e_g.ntypes
        }
        e_nbr = {
            et: np.array(e_g.rels[et].nbr) for et in e_g.canonical_etypes
        }
        e_mask = {
            et: np.array(e_g.rels[et].nbr_mask)
            for et in e_g.canonical_etypes
        }
    t0 = time.perf_counter()
    bl_hidden, bl_out = (256, 128) if on_accel else (64, 32)
    eager_edges_per_s = run_torch_baseline(
        e_feats_np, e_nbr, e_mask, e_data.train_pairs,
        fanouts=cfg.fanouts, hidden=bl_hidden, out_dim=bl_out,
        batch_per_etype=cfg.edge_batch_size // 2,
        neg_sample_size=cfg.neg_sample_size,
        neg_pool_size=cfg.neg_pool_size, steps=2,
    )
    # The live measurement swings ~4x with concurrent host load
    # (observed 197-887 edges/s for the same work).  Keep vs_baseline a
    # conservative LOWER bound by crediting the baseline with the best
    # rate ever measured on an idle host (2026-08, 16-vCPU runner).
    BASELINE_FLOOR = 887.0 if on_accel else 0.0
    eager_edges_per_s = max(eager_edges_per_s, BASELINE_FLOOR)
    print(
        f"torch-CPU baseline: {eager_edges_per_s:,.0f} edges/s "
        f"(measured in {time.perf_counter() - t0:.1f}s; floor "
        f"{BASELINE_FLOOR:,.0f})",
        file=sys.stderr,
    )
    out = {
        "metric": "train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / eager_edges_per_s, 2),
    }
    if mxu_pct is not None:
        out["mxu_pct"] = round(mxu_pct, 1)
        out["hbm_pct"] = round(hbm_pct, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
