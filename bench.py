"""Benchmark: minibatch training throughput (positive edges/s) in the
reference's own regime — edge_batch_size 2048, 2500 negatives per positive
(``/root/reference/main.py:498-511``), hetero click+purchase graph,
3 conv layers, Medium dims (hidden 256 / out 128) — on the TPU-native
sampled-tree step (bf16 MXU compute, on-device sampling/masking).

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

Reliability architecture (round-2 postmortem: the TPU tunnel wedged AFTER
the device probe passed, the process hung in compile, and the driver's
timeout produced rc=124 with no JSON line):

* ``python bench.py`` runs a light ORCHESTRATOR: it probes the device in a
  subprocess, then runs the actual measurement in a CHILD subprocess with
  a hard timeout, falling back to a CPU child if the TPU child hangs or
  dies.  A wedged chip can no longer take the JSON line down with it.
* The child appends milestone records (built / measured / final) to a
  progress file as it goes; if it is killed mid-run the orchestrator
  recovers any already-measured throughput from the file and still emits
  a valid line (with the conservative frozen baseline).
* A persistent XLA compilation cache (``.jax_cache/``) makes repeat runs
  skip the ~75 s compile observed cold in round 1.
* A global wall-clock deadline (``BENCH_DEADLINE_S``, default 330 s)
  budgets every phase so the final line is printed before any plausible
  driver timeout.

Timing is the chained-slope method (``utils/timing.py``): n steps in ONE
dispatch via ``lax.fori_loop`` (dynamic trip count → a single compile
serves every n), hard D2H sync, (T(n2)-T(n1))/(n2-n1) —
``block_until_ready`` under-waits on tunneled devices and per-dispatch
RPC latency would otherwise dominate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(REPO, ".jax_cache")
PROGRESS = os.path.join(REPO, ".bench_progress.jsonl")
METRIC = "train_edges_per_s"
# PINNED torch-CPU baseline rate: the best rate ever measured for the
# reference-stack step on an idle runner (1,309 edges/s, 2026-08-22,
# benchmarks/torch_reference.py, 2-step measurement, 16 vCPUs).  The live
# measurement swings ~4x with concurrent host load (observed 197-1258
# edges/s for identical work), which made vs_baseline drift ±25% between
# rounds (VERDICT r4); vs_baseline therefore divides by
# max(BASELINE_FLOOR, live) — pinned, moving only in the conservative
# direction if torch ever measures faster.  The live rate still prints to
# stderr each run as a drift check.
BASELINE_FLOOR = 1309.0


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


# --------------------------------------------------------------------------
# Orchestrator
# --------------------------------------------------------------------------

def probe_device(timeout_s: float = 45.0, attempts: int = 2,
                 retry_sleep_s: float = 25.0) -> bool:
    """True iff a small matmul completes on the default jax backend.

    Runs in a SUBPROCESS: the axon TPU tunnel can wedge (ops hang rather
    than erroring) and a hung op poisons the whole process.  A
    recently-exited claimant blocks new claims for ~1-2 min, so retry
    once across that window.
    """
    for attempt in range(attempts):
        if attempt:
            log(f"device probe failed; retrying in {retry_sleep_s:.0f}s "
                "(stale-claim cooldown)")
            time.sleep(retry_sleep_s)
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "jax.block_until_ready("
                 "jnp.ones((64,64)) @ jnp.ones((64,64)));"
                 "assert jax.devices()[0].platform != 'cpu'"],
                timeout=timeout_s, capture_output=True,
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def read_progress() -> dict:
    merged: dict = {}
    try:
        with open(PROGRESS) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        merged.update(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    return merged


def note(record: dict) -> None:
    with open(PROGRESS, "a") as f:
        f.write(json.dumps(record) + "\n")


def run_child(mode: str, budget_s: float) -> None:
    """Run the measurement child; results land in the progress file."""
    env = dict(os.environ)
    if mode == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    log(f"launching {mode} child (budget {budget_s:.0f}s)")
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", mode, "--budget", str(budget_s)],
            timeout=budget_s, env=env, stdout=sys.stderr,
        )
    except subprocess.TimeoutExpired:
        log(f"{mode} child hit its {budget_s:.0f}s budget; killed")


def orchestrate() -> None:
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "330"))
    try:
        os.remove(PROGRESS)
    except OSError:
        pass

    def remaining() -> float:
        return deadline - (time.time() - T0)

    def final_or_partial() -> dict | None:
        p = read_progress()
        if "final" in p:
            return p["final"]
        if p.get("edges_per_s"):
            # Measured throughput but the baseline phase didn't finish:
            # credit the frozen conservative baseline.
            base = BASELINE_FLOOR if p.get("on_accel") else 0.0
            out = {"metric": METRIC, "value": round(p["edges_per_s"], 1),
                   "unit": "edges/s",
                   "vs_baseline": round(p["edges_per_s"] / base, 2)
                   if base else 0.0}
            if not p.get("on_accel"):
                out["note"] = "cpu-fallback; value not comparable"
            return out
        return None

    on_accel = probe_device()
    if on_accel:
        # Reserve time for a CPU-fallback child + final bookkeeping (the
        # CPU child completes in ~60 s warm; the partial-result recovery
        # below covers a TPU child killed after measuring but before its
        # baseline, so the TPU child gets the lion's share — a COLD
        # compile needs ~195 s before the first measurement lands).
        budget = remaining() - 75.0
        if budget > 60:
            run_child("tpu", budget)
    final = final_or_partial()
    if final is None:
        log("no TPU result; CPU fallback (value will NOT be comparable)")
        budget = remaining() - 10.0
        if budget > 30:
            run_child("cpu", budget)
        final = final_or_partial()
    if final is None:
        final = {"metric": METRIC, "value": 0.0, "unit": "edges/s",
                 "vs_baseline": 0.0, "note": "all measurement paths failed"}
    print(json.dumps(final), flush=True)


# --------------------------------------------------------------------------
# Child: the actual measurement
# --------------------------------------------------------------------------

def build(small_graph: bool = False, small_dims: bool = False):
    import jax.numpy as jnp

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
        # Fused Pallas leaf kernel (ops/pallas/leaf_agg.py): 6.70 ->
        # 6.47 ms/step measured on v5e.  Off on the CPU fallback path
        # (interpret mode is a per-block Python loop — correctness tool,
        # not a fallback-budget-safe hot path).
        leaf_kernel=not small_dims,
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    return model, data, g, feats


def child(mode: str, budget_s: float) -> None:
    os.makedirs(CACHE_DIR, exist_ok=True)
    import jax

    if mode == "cpu":
        # The ambient sitecustomize force-registers the TPU platform and
        # overrides JAX_PLATFORMS; override back through jax.config.
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is best-effort on experimental platforms
        log(f"compilation cache unavailable: {e!r}")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from gnn_recsys_tpu.ops.membership import build_padded_pair_set
    from gnn_recsys_tpu.train.full_batch import TrainState, init_model
    from gnn_recsys_tpu.train.minibatch import (
        MinibatchConfig,
        make_minibatch_step,
    )
    from gnn_recsys_tpu.utils.timing import chain_time_per_call

    on_accel = mode == "tpu"
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
        # dense_pool ranks EVERY pool item per positive as one [B, P]
        # matmul — measured 42.7 vs 170.8 ms/step for the index-sampled
        # shared_pool at this config on v5e.  Pool 2560 = the reference's
        # 2500 negatives per positive rounded up to a 128-lane multiple
        # (4096 was pure padding: 1536 extra pool-item trees per step).
        neg_mode="dense_pool",
        neg_pool_size=2560 if on_accel else 512,
        # Fused false-negative compare (ops/pallas/pool_mask.py):
        # 6.5 -> 6.35 ms/step measured on v5e.  Off on the CPU fallback
        # (interpret mode).
        pool_mask_kernel=on_accel,
    )
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-3)
    )
    train_etypes = tuple(data.train_pairs.keys())
    # Host-side COO copies come straight from the generator (no D2H pull).
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

    step_raw = make_minibatch_step(
        model, cfg, train_etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in train_etypes}, jit=False,
    )

    # HONEST timing (utils/timing.py): n chained steps inside ONE
    # dispatch (on-device batch slicing, exactly the production
    # device-epoch path), ended by a scalar D2H pull; slope between two
    # lengths cancels dispatch+pull overhead.  fori_loop with a DYNAMIC
    # trip count → one compile covers warmup and both measured lengths.
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
    log(f"build+init: {time.perf_counter() - t_build:.1f}s")
    note({"built_s": round(time.perf_counter() - t_build, 1)})

    t0 = time.perf_counter()
    _, mean_loss = chain(state, rng, 1)
    loss_val = float(mean_loss)
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s")

    n1, n2 = (4, 24) if on_accel else (2, 6)
    step_s = chain_time_per_call(
        None, lambda n: chain(state, rng, n)[0], n1=n1, n2=n2, reps=3,
    )
    edges_per_s = batch_size / step_s
    log(f"devices={jax.devices()} batch={batch_size} "
        f"step={step_s * 1e3:.1f}ms loss={loss_val:.4f}")
    note({"edges_per_s": edges_per_s, "step_ms": round(step_s * 1e3, 2),
          "on_accel": on_accel, "loss": round(loss_val, 4)})

    # Roofline context (on by default for accelerator runs, VERDICT r4
    # #6 — BENCH_NO_ROOFLINE=1 skips the extra fixed-length compile):
    # XLA's post-optimization FLOP / bytes-accessed counts divided by the
    # measured step time, as a % of chip peaks.  "bytes accessed" counts
    # each fused op's operands+outputs, so it over-states true HBM
    # traffic — treat the % as an upper bound.
    mxu_pct = hbm_pct = None
    if on_accel and not os.environ.get("BENCH_NO_ROOFLINE"):
        try:
            @jax.jit
            def chain_fixed(state, rng):
                def body(carry, _):
                    state, rng, acc = carry
                    rng, sub, sb = jax.random.split(rng, 3)
                    state, loss = step_raw(
                        state, g, feats, slice_batch(sb), edge_tables, sub
                    )
                    return (state, rng, acc + loss), ()
                (s, _, acc), _ = jax.lax.scan(
                    body, (state, rng, jnp.float32(0)), None, length=n1
                )
                return acc

            ca = chain_fixed.lower(state, rng).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) / n1
            byts = float(ca.get("bytes accessed", 0.0)) / n1
            kind = jax.devices()[0].device_kind.lower()
            peaks = None  # (peak bf16 FLOP/s, HBM bytes/s), public specs
            if "v5 lite" in kind or "v5e" in kind:
                peaks = (197e12, 819e9)
            elif "v5p" in kind or "v5" in kind:
                peaks = (459e12, 2765e9)
            elif "v4" in kind:
                peaks = (275e12, 1228e9)
            if peaks and step_s > 0:
                mxu_pct = 100.0 * (flops / step_s) / peaks[0]
                hbm_pct = 100.0 * (byts / step_s) / peaks[1]
                log(f"roofline: {flops / 1e9:.1f} GFLOP/step "
                    f"({mxu_pct:.1f}% of bf16 MXU peak), "
                    f"{byts / 1e6:.0f} MB accessed/step "
                    f"({hbm_pct:.1f}% of HBM bandwidth; upper bound)")
        except Exception as e:
            log(f"roofline unavailable: {e!r}")

    # Reference-stack baseline: the same step in PyTorch with DGL-style
    # dedup'd blocks on the host CPU (benchmarks/torch_reference.py).
    # Skip the live measurement when the budget is nearly spent and
    # credit the frozen best-ever baseline instead (conservative).
    elapsed = time.time() - T0
    eager_edges_per_s = BASELINE_FLOOR if on_accel else 0.0
    if budget_s - elapsed > 45:
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
        measured = run_torch_baseline(
            e_feats_np, e_nbr, e_mask, e_data.train_pairs,
            fanouts=cfg.fanouts, hidden=bl_hidden, out_dim=bl_out,
            batch_per_etype=cfg.edge_batch_size // 2,
            neg_sample_size=cfg.neg_sample_size,
            neg_pool_size=cfg.neg_pool_size, steps=2,
        )
        # The live measurement swings ~4x with concurrent host load
        # (observed 197-887 edges/s for the same work): credit the
        # baseline with the best rate ever measured on an idle host.
        eager_edges_per_s = max(measured, eager_edges_per_s)
        log(f"torch-CPU baseline: {eager_edges_per_s:,.0f} edges/s "
            f"(measured in {time.perf_counter() - t0:.1f}s)")
    else:
        log(f"baseline skipped (budget); frozen floor "
            f"{eager_edges_per_s:,.0f} edges/s")

    out = {
        "metric": METRIC,
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / eager_edges_per_s, 2)
        if eager_edges_per_s else 0.0,
    }
    if not on_accel:
        out["note"] = "cpu-fallback; value not comparable"
    if mxu_pct is not None:
        out["mxu_pct"] = round(mxu_pct, 1)
        out["hbm_pct"] = round(hbm_pct, 1)
    note({"final": out})


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        mode = sys.argv[i + 1]
        budget = float(sys.argv[sys.argv.index("--budget") + 1]) \
            if "--budget" in sys.argv else 300.0
        child(mode, budget)
    else:
        orchestrate()
