"""Fused leaf aggregation kernel: masked-mean of ``relu(x @ W + b)``.

The single hottest stage of the production minibatch step is the sampled
tree's LEAF level for ``*_nn`` aggregators (the reference's per-message
pre-MLP, ``/root/reference/src/model.py:174-221``, folded with the
embedding Linear into one effective ``[F -> H]`` affine map — see
:meth:`ConvModel._leaf_transform_composed`):

    agg[p] = (1 / c_p) * sum_k mask[p, k] * relu(x[p, k] @ W + b)

XLA computes this as a conv-style matmul producing the full per-message
activation tensor ``[P, K, H]`` in HBM (75 MB per branch at the bench
shape), reads it back for the masked mean, SAVES it as a residual for the
backward relu mask, and re-gathers ``x`` into separate conv-formulated
``dW`` fusions (plus layout copies) — measured ~2.3 ms of the 6.2 ms
device step across the 8 leaf branches (benchmarks/profile_trace.py).

This kernel keeps the per-message activations in VMEM:

  forward   reads ``x`` ([K, P, F], k-major so each k-slice is a clean
            2-D block), accumulates the masked mean in an f32 scratch,
            writes only ``agg`` [P, H].
  backward  recomputes ``relu'`` blockwise from ``x`` (no 75 MB
            activation residual), folds the mask/count scaling into the
            cotangent, and computes ``dW`` as ONE ``[F, bp] @ [bp, H]``
            contraction per block accumulated across the sequential TPU
            grid — no re-gather, no conv relayout copies.

Measured on v5e at the bench config (B=2048, fanouts (8,4), hidden 256
bf16): 6.70 -> 6.47 ms/step, with the leaf stage's XLA conv/reduce/copy
ops (~1.5 ms) replaced by ~1.2 ms of kernel time.  Both kernels are
bandwidth-bound on the PHYSICAL bytes of ``x``: TPU HBM layouts pad the
minor dimension to 128 lanes, so the [K*P, 8] gather output occupies 16x
its logical bytes and the forward kernel streams it at ~630 GB/s —
near roofline for that layout.

Negative result, measured (2026-08, v5e): a lane-packed variant — x
reshaped ``[K, P/16, 128]`` (16 parents per row), block-diagonal
``kron(I_16, W)`` weights for full-MXU contraction-128 matmuls, mask
broadcast via a selection matmul — ran 7.74 ms/step vs 6.70 off/6.47
unpacked.  In a microbenchmark the packed gather IS 3.1x faster (XLA
fuses a contiguous ``reshape(M/16, 128)`` into the gather emitter,
writing dense rows: 0.129 vs 0.403 ms for 147k rows), but inside the
full step XLA materializes the padded ``[M, 8]`` gather output first and
inserts a separate relayout copy per branch (+0.6 ms "data formatting"),
and the block-diagonal matmuls with their 16x-wider [128, 4096] operands
ran the backward at 0.234 vs 0.146 ms/branch.  The unpacked layout
below is the winner end-to-end.

``mask_scaled`` folds the mean denominator: ``mask[p, k] / max(c_p, 1)``.
Gradients flow to ``W`` and ``b`` only (``x`` is raw input features; the
returned ``dx`` is zeros and DCE'd by XLA).  Numerics: accumulation in
f32 (XLA's bf16 conv path also accumulates f32 on the MXU); outputs cast
to ``x.dtype``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def leaf_kernel_supported(f: int) -> bool:
    """The kernel has no intrinsic F constraint; bound it to one VMEM
    lane-tile so tiny-F configs (every production config: 2-8 features)
    stay on the measured path."""
    return 1 <= f <= 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fwd_kernel(x_ref, m_ref, w_ref, b_ref, out_ref, acc_ref, *, k: int):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    w = w_ref[:]
    b = b_ref[:]  # [1, H]
    for j in range(k):
        # precision pinned to DEFAULT: an ambient
        # jax_default_matmul_precision='highest' (the test suites set it
        # for their oracles) otherwise reaches this dot and Mosaic
        # rejects fp32-precision matmul on bf16 vectors ("Bad lhs type").
        z = jnp.dot(x_ref[j], w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + b
        z = jnp.maximum(z, 0.0)
        acc_ref[:] += z * m_ref[:, j : j + 1]
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _bwd_kernel(x_ref, m_ref, w_ref, b_ref, g_ref, dw_ref, db_ref, *, k: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    w = w_ref[:]
    b = b_ref[:]
    g = g_ref[:].astype(jnp.float32)  # [bp, H]
    for j in range(k):
        xj = x_ref[j]  # [bp, F]
        z = jnp.dot(xj, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + b
        gj = jnp.where(z > 0.0, g * m_ref[:, j : j + 1], 0.0)  # [bp, H]
        # dW += x^T @ gj: contraction over the bp rows — MXU-efficient.
        dw_ref[:] += jax.lax.dot_general(
            xj,
            gj,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        db_ref[:] += jnp.sum(gj, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def leaf_mean_nn(x_km, mask_scaled, w, b, block_p: int = 512,
                 interpret: bool = False):
    """``agg[p] = sum_k mask_scaled[p,k] * relu(x_km[k,p] @ w + b)``.

    x_km: [K, P, F] (k-major; any P — padded internally to ``block_p``).
    mask_scaled: [P, K] f32 — validity mask with 1/count folded in.
    w: [F, H]; b: [H].  Returns [P, H] in ``x_km.dtype``.
    """
    return _leaf_fwd_call(x_km, mask_scaled, w, b, block_p, interpret)


def _pad_p(x_km, mask_scaled, block_p):
    p = x_km.shape[1]
    bp = block_p if p >= block_p else max(16, _cdiv(p, 16) * 16)
    pad = (-p) % bp
    if pad:
        x_km = jnp.pad(x_km, ((0, 0), (0, pad), (0, 0)))
        mask_scaled = jnp.pad(mask_scaled, ((0, pad), (0, 0)))
    return x_km, mask_scaled, bp


def _leaf_fwd_call(x_km, mask_scaled, w, b, block_p, interpret):
    p0 = x_km.shape[1]
    x_km, mask_scaled, bp = _pad_p(x_km, mask_scaled, block_p)
    k, p, f = x_km.shape
    h = w.shape[1]
    grid = (p // bp,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((p, h), x_km.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bp, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bp, h), jnp.float32)],
        interpret=interpret,
    )(
        x_km,
        mask_scaled.astype(jnp.float32),
        w,
        b.reshape(1, h),
    )
    return out[:p0]


def _leaf_fwd(x_km, mask_scaled, w, b, block_p, interpret):
    out = _leaf_fwd_call(x_km, mask_scaled, w, b, block_p, interpret)
    return out, (x_km, mask_scaled, w, b)


def _leaf_bwd(block_p, interpret, res, g):
    x_km, mask_scaled, w, b = res
    p0 = x_km.shape[1]
    x_km, mask_scaled, bp = _pad_p(x_km, mask_scaled, block_p)
    k, p, f = x_km.shape
    h = w.shape[1]
    if p != p0:
        g = jnp.pad(g, ((0, p - p0), (0, 0)))
    grid = (p // bp,)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((f, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bp, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((f, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        x_km,
        mask_scaled.astype(jnp.float32),
        w,
        b.reshape(1, h),
        g,
    )
    # x and mask carry no gradient (raw features / boolean structure);
    # zeros are DCE'd by XLA because nothing consumes them.
    return (
        jnp.zeros((k, p0, f), x_km.dtype),
        jnp.zeros((p0, k), mask_scaled.dtype),
        dw.astype(w.dtype),
        db.reshape(h).astype(b.dtype),
    )


leaf_mean_nn.defvjp(_leaf_fwd, _leaf_bwd)


def leaf_mean_nn_reference(x_km, mask_scaled, w, b):
    """jnp oracle with identical semantics (f32 accumulation)."""
    z = jnp.maximum(
        jnp.einsum(
            "kpf,fh->kph", x_km, w, preferred_element_type=jnp.float32
        )
        + b.astype(jnp.float32),
        0.0,
    )
    out = jnp.einsum("kph,pk->ph", z, mask_scaled.astype(jnp.float32))
    return out.astype(x_km.dtype)
