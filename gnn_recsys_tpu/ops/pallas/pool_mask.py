"""Fused dense-pool membership mask: ``mask[b, p] = pool[p] in rows[b]``.

The false-negative mask of the dense-pool training step
(reference ``src/train/run.py:92-103`` — DGL ``has_edges_between`` over
every (positive-user, pool-item) pair) is a [B, P, K] broadcast compare
in XLA (``ops/membership.pair_set_contains``): 0.28 ms of the 6.5 ms
production step at B=1024x2, P=2560, K=32 — ~1.6x the VPU compare
roofline, paid per etype per step.

Every positive in a dense-pool step scores the SAME pool, so the probe
matrix is rank-1: this kernel takes the pool ONCE ([1, P] block, no
[B, P] neg_dst materialization), streams the per-user padded neighbor
rows, and unrolls the K compares in VMEM.  Output f32 (what the loss
subtracts).  The mask depends only on graph structure — no gradient
path (callers wrap in stop_gradient).

Padding: row slots are -1; pool ids are valid (>= 0) by construction,
and a trailing ``valid`` AND guards any -2-padded pool columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, pool_ref, out_ref, *, k: int):
    pool = pool_ref[:]  # [1, P]
    m = rows_ref[:, 0:1] == pool
    for j in range(1, k):
        m = m | (rows_ref[:, j : j + 1] == pool)
    out_ref[:] = (m & (pool >= 0)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pool_membership_mask(
    rows: jax.Array,
    pool: jax.Array,
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """rows: [B, K] int32 (-1 padded); pool: [P] int32 (valid ids).

    Returns [B, P] f32 — 1.0 where ``pool[p]`` is among ``rows[b]``.
    """
    b, k = rows.shape
    p = pool.shape[0]
    bb = min(block_b, max(8, -(-b // 8) * 8))
    pad_b = (-b) % bb
    if pad_b:
        rows = jnp.pad(rows, ((0, pad_b), (0, 0)), constant_values=-1)
    pad_p = (-p) % 128
    pool2 = jnp.pad(pool, (0, pad_p), constant_values=-2).reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, p + pad_p), jnp.float32),
        grid=((b + pad_b) // bb,),
        in_specs=[
            pl.BlockSpec((bb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p + pad_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, p + pad_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, pool2)
    return out[:b, :p]
