"""Fused full-catalog MIPS top-k Pallas kernel.

The serving hot op (reference retrieval loop, ``src/metrics.py:31-78``,
re-designed in ``gnn_recsys_tpu/retrieval/recs.py``): score every user
against every catalog item and keep the top-k.  The XLA path materializes a
``[C, I]`` score block per user chunk in HBM; this kernel instead tiles the
catalog, runs each ``[C, T]`` score tile on the MXU, and maintains a
running top-k (values + indices) in VMEM scratch — the full score matrix
never exists, so HBM traffic is ``O(C*D + I*D + C*k)`` instead of
``O(C*I)``.

Top-k maintenance is k rounds of vectorized max-extraction over the
``[C, k+T]`` candidate row (VPU-only, no gathers, no sort).  Ties pick the
lowest candidate position, matching ``jax.lax.top_k`` within a tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")  # python scalar: jnp constants get captured as tracers


def _extract_topk(cand_vals, cand_idx, k):
    """k rounds of (max, first-argmax, knock-out) over rows.

    cand_vals: [C, M] f32; cand_idx: [C, M] i32. Returns ([C,k], [C,k]).
    """
    c, m = cand_vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (c, m), 1)
    vals_out = []
    idx_out = []
    for _ in range(k):
        row_max = jnp.max(cand_vals, axis=1, keepdims=True)  # [C,1]
        hit = cand_vals == row_max
        # first (lowest-position) column achieving the max
        sel_col = jnp.min(jnp.where(hit, col, m), axis=1, keepdims=True)
        chosen = col == sel_col
        vals_out.append(row_max[:, 0])
        idx_out.append(
            jnp.sum(jnp.where(chosen, cand_idx, 0), axis=1).astype(jnp.int32)
        )
        cand_vals = jnp.where(chosen, NEG_INF, cand_vals)
    return jnp.stack(vals_out, axis=1), jnp.stack(idx_out, axis=1)


def _mips_kernel(u_ref, i_ref, vals_ref, idx_ref, acc_vals, acc_idx, *,
                 k: int, tile_items: int, num_items: int):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_vals[:] = jnp.full_like(acc_vals, NEG_INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # f32 inputs keep full precision (TPU default would truncate the MXU
    # operands to bf16, visibly reordering near-tied catalog rankings —
    # same rationale as retrieval.recs.cosine_score_fn); bf16 inputs are
    # the caller's explicit half-traffic mode.
    scores = jax.lax.dot_general(
        u_ref[:],
        i_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            None if u_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        ),
    )  # [C, T]
    c = scores.shape[0]
    base = j * tile_items
    gcol = base + jax.lax.broadcasted_iota(jnp.int32, (c, tile_items), 1)
    # Mask catalog padding (last tile may run past num_items).
    scores = jnp.where(gcol < num_items, scores, NEG_INF)

    cand_vals = jnp.concatenate([acc_vals[:], scores], axis=1)
    cand_idx = jnp.concatenate([acc_idx[:], gcol], axis=1)
    top_vals, top_pos = _extract_topk(cand_vals, cand_idx, k)
    acc_vals[:] = top_vals
    acc_idx[:] = top_pos

    @pl.when(j == n_j - 1)
    def _():
        vals_ref[:] = acc_vals[:]
        idx_ref[:] = acc_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_users", "tile_items", "interpret", "bf16"),
)
def mips_topk(
    user_emb: jax.Array,
    item_emb: jax.Array,
    k: int,
    tile_users: int = 128,
    tile_items: int = 2048,
    interpret: bool = False,
    bf16: bool = False,
):
    """Top-k inner-product search: returns (values [U,k], indices [U,k]).

    user_emb: [U, D]; item_emb: [I, D].  ``bf16=True`` feeds the MXU
    bfloat16 inputs (half the HBM traffic for the catalog; accumulation
    stays f32 via ``preferred_element_type``); otherwise inputs are cast to
    f32.  For cosine similarity, L2-normalize both inputs first.

    Tile defaults come from a v5e sweep (benchmarks/pallas_kernels.py,
    U=4096, D=128, catalog 100k-500k): (tu=128, ti=2048) beats the XLA
    materialize-scores+top_k path 1.5x in f32 (exact same ranking) and
    1.9x in bf16; larger user tiles lose to top-k extraction cost and
    tu=1024 exhausts VMEM.
    """
    u, d = user_emb.shape
    num_items = item_emb.shape[0]
    dt = jnp.bfloat16 if bf16 else jnp.float32
    user_emb = user_emb.astype(dt)
    item_emb = item_emb.astype(dt)

    pad_u = (-u) % tile_users
    if pad_u:
        user_emb = jnp.pad(user_emb, ((0, pad_u), (0, 0)))
    pad_i = (-num_items) % tile_items
    if pad_i:
        item_emb = jnp.pad(item_emb, ((0, pad_i), (0, 0)))
    up = user_emb.shape[0]
    ip = item_emb.shape[0]

    grid = (up // tile_users, ip // tile_items)
    kernel = functools.partial(
        _mips_kernel, k=k, tile_items=tile_items, num_items=num_items
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_users, d), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_items, d), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_users, k), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_users, k), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((up, k), jnp.float32),
            jax.ShapeDtypeStruct((up, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_users, k), jnp.float32),
            pltpu.VMEM((tile_users, k), jnp.int32),
        ],
        interpret=interpret,
    )(user_emb, item_emb)
    return vals[:u], idx[:u]
