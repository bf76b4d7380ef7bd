"""Message-passing aggregation primitives (XLA backends).

TPU-native replacements for DGL's C++/CUDA SpMM kernels invoked by the
reference's ``graph.update_all(copy_src|u_mul_e, mean|max)``
(``/root/reference/src/model.py:143-221``).  Two layouts, same semantics:

* ``coo_segment_*`` — scatter-reduce over the COO edge list via
  ``jax.ops.segment_*``.  Preferred for full-graph layer-wise passes where
  every destination node is updated (no padding waste).
* ``csc_gather_*`` — gather + masked reduce over the padded by-destination
  neighbor table.  Preferred for sampled minibatch trees and as the
  signature behind the Pallas kernels.

Semantics matched to DGL:
  * ``mean`` divides by the number of incoming messages (not weight sum);
    zero-degree destinations produce zeros.
  * ``max`` over no messages produces zeros (DGL leaves dstdata zeroed).
  * edge-weighted variants multiply each message by a scalar edge value
    before reduction (``fn.u_mul_e``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def coo_segment_mean(
    h_src: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    num_dst: int,
    edge_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean of incoming messages per destination node, COO layout.

    h_src: [N_src, D]; src/dst: [E] int32; edge_weight: [E] or None.
    Returns [num_dst, D].
    """
    msgs = jnp.take(h_src, src, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    total = jax.ops.segment_sum(msgs, dst, num_segments=num_dst)
    count = jax.ops.segment_sum(
        jnp.ones((src.shape[0],), dtype=h_src.dtype), dst, num_segments=num_dst
    )
    return total / jnp.maximum(count, 1.0)[:, None]


def coo_segment_max(
    h_src: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    num_dst: int,
    edge_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Max of incoming messages per destination node, COO layout."""
    msgs = jnp.take(h_src, src, axis=0)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    out = jax.ops.segment_max(msgs, dst, num_segments=num_dst)
    # segment_max over an empty segment yields -inf; DGL leaves zeros.
    return jnp.where(jnp.isfinite(out), out, 0.0)


def _gather_msgs(
    h_src: jax.Array,
    nbr: jax.Array,
    nbr_eid: Optional[jax.Array],
    edge_weight: Optional[jax.Array],
) -> jax.Array:
    # Padding slots may hold -1 sentinels (the Relation.nbr invariant);
    # under jit an out-of-range take fill-produces NaN rows, and 0*NaN
    # would poison the masked reduction — clamp before gathering.  The
    # clamped garbage rows are zeroed/ignored by the caller's mask.
    msgs = jnp.take(h_src, jnp.maximum(nbr, 0), axis=0,
                    mode="clip")  # [N_dst, K, D]
    if edge_weight is not None:
        if nbr_eid is None:
            raise ValueError("edge weighting requires nbr_eid")
        w = jnp.take(edge_weight, jnp.maximum(nbr_eid, 0), axis=0,
                     mode="clip")
        msgs = msgs * w[..., None]  # [N_dst, K]
    return msgs


def csc_gather_mean(
    h_src: jax.Array,
    nbr: jax.Array,
    nbr_mask: jax.Array,
    nbr_eid: Optional[jax.Array] = None,
    edge_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked mean over the padded neighbor axis.

    h_src: [N_src, D]; nbr/nbr_mask: [N_dst, K]. Returns [N_dst, D].
    The denominator is the TRUE number of valid slots, not K.
    """
    msgs = _gather_msgs(h_src, nbr, nbr_eid, edge_weight)
    mask = nbr_mask[..., None].astype(h_src.dtype)
    total = jnp.sum(msgs * mask, axis=1)
    count = jnp.sum(nbr_mask.astype(h_src.dtype), axis=1)
    return total / jnp.maximum(count, 1.0)[:, None]


def csc_gather_max(
    h_src: jax.Array,
    nbr: jax.Array,
    nbr_mask: jax.Array,
    nbr_eid: Optional[jax.Array] = None,
    edge_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked max over the padded neighbor axis (zeros where no neighbors)."""
    msgs = _gather_msgs(h_src, nbr, nbr_eid, edge_weight)
    neg = jnp.asarray(-jnp.inf, dtype=msgs.dtype)
    masked = jnp.where(nbr_mask[..., None], msgs, neg)
    out = jnp.max(masked, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def edge_dot(
    h_u: jax.Array,
    h_v: jax.Array,
    src: jax.Array,
    dst: jax.Array,
) -> jax.Array:
    """Per-edge dot product of endpoint representations.

    TPU-native equivalent of DGL ``apply_edges(fn.u_dot_v)`` used by the
    cosine predictor (``/root/reference/src/model.py:323``).
    Returns [E].
    """
    eu = jnp.take(h_u, src, axis=0)
    ev = jnp.take(h_v, dst, axis=0)
    return jnp.sum(eu * ev, axis=-1)
