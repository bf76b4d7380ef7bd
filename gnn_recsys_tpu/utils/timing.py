"""Honest device timing under unreliable async transports.

Measured failure mode (v5e behind the axon tunnel, 2026-08):
``jax.block_until_ready`` can return without waiting for queued work — a
chain of ~700-GFLOP train steps "measured" 0.4 ms/step by block-on-last-
output, while XLA cost analysis and hard-sync timing put the true figure
3 orders of magnitude higher.  The only reliable synchronization barrier
is a device-to-host transfer of data that depends on the computation.

``chain_time_per_call`` therefore times two chained runs of different
lengths, each ended by a SCALAR D2H pull derived from the last output,
and reports the slope ``(T2 - T1) / (n2 - n1)`` — the constant pull /
dispatch overhead cancels.  Use it for every benchmark number; never
report block_until_ready-based timings from a tunneled device.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def hard_sync(out) -> float:
    """Force completion of everything ``out`` depends on.

    Reduces the first array leaf to a scalar ON DEVICE and pulls it —
    cheap even for large outputs, and a true barrier (the transfer cannot
    start before the producing computation finishes).
    """
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    x = leaves[0]
    if jnp.issubdtype(x.dtype, jnp.bool_):
        x = x.astype(jnp.int32)
    return float(jnp.sum(x))


def chain_time_per_call(
    fn: Callable,
    chain: Callable,
    n1: int = 2,
    n2: int = 12,
    reps: int = 2,
    warmup: Optional[Callable] = None,
) -> float:
    """Seconds per call of ``fn``, measured by the chained-delta method.

    fn: () -> out — one call whose output depends on all its work.
    chain: (n) -> out — run n CHAINED calls (each consuming the previous
        call's output or state) and return the last output.  Chaining is
        the caller's job: independent calls could overlap and understate.
    Returns min over ``reps`` of (T(n2) - T(n1)) / (n2 - n1), where each
    T ends in :func:`hard_sync`.
    """
    del fn  # documentational: chain(1) must invoke it once
    if warmup is not None:
        hard_sync(warmup())
    else:
        hard_sync(chain(1))
    # Per-dispatch wall time on tunneled transports has multi-second
    # positive noise (RPC queueing).  Take the MIN of each chain length's
    # repeats separately before the slope — min is robust against
    # positive outliers, while per-rep slopes let one slow T(n1) turn the
    # estimate negative.
    t_min = {}
    for n in (n1, n2):
        hard_sync(chain(n))  # compile this length outside the timing
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            hard_sync(chain(n))
            best = min(best, time.perf_counter() - t0)
        t_min[n] = best
    return (t_min[n2] - t_min[n1]) / (n2 - n1)
