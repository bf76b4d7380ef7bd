"""On-device neighbor sampling over padded CSC relations.

TPU-native replacement for DGL's CPU-worker block samplers
(``MultiLayerFullNeighborSampler`` / ``MultiLayerNeighborSampler``,
``/root/reference/src/sampling.py:156-161``): sampling runs inside the
jit'd step with ``jax.random``, produces static-shape padded frontiers with
validity masks, and supports excluding the minibatch edges (and, by builder
invariant, their reverses — reverse relations share edge ids) from the
sampled neighborhood, matching ``exclude='reverse_types'``
(``src/sampling.py:181-194``).

Design notes vs DGL:
  * sampling is WITH replacement into ``fanout`` static slots (uniform over
    the true neighbor list); DGL's default is without replacement.  For
    fanout >= degree use ``mode='full'`` which takes the whole padded row.
  * exclusion masks matched edges *after* sampling instead of removing them
    from the graph first — an excluded draw becomes an invalid slot.  Both
    keep excluded edges out of the receptive field; ours can slightly lower
    the realized fanout (negligible at the reference's fanouts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_recsys_tpu.graph.hetero import Relation


def sample_neighbors(
    rel: Relation,
    ids: jax.Array,
    fanout: int,
    rng: Optional[jax.Array] = None,
    mode: str = "uniform",
    exclude_sorted_eids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample incoming neighbors of ``ids`` under relation ``rel``.

    ids: int32 of any shape [*s].
    Returns ``(nbr, eid, mask)``:
      * mode='uniform': shapes [*s, fanout]; uniform WITH replacement over
        each node's true neighbor list.
      * mode='full': shapes [*s, K] where K is the relation's padded width;
        every valid neighbor slot (the reference's full-neighbor sampler).
    """
    kmax = rel.max_fanout
    deg = jnp.take(rel.deg, ids, axis=0)  # [*s]

    if mode == "full":
        nbr = jnp.take(rel.nbr, ids, axis=0)  # [*s, K]
        eid = jnp.take(rel.nbr_eid, ids, axis=0)
        mask = jnp.take(rel.nbr_mask, ids, axis=0)
    elif mode == "uniform":
        if rng is None:
            raise ValueError("uniform sampling requires an rng key")
        u = jax.random.uniform(rng, (*ids.shape, fanout))
        slot = jnp.minimum(
            (u * jnp.maximum(deg, 1)[..., None]).astype(jnp.int32),
            jnp.maximum(deg - 1, 0)[..., None],
        )
        flat = ids[..., None].astype(jnp.int32) * kmax + slot
        nbr = jnp.take(rel.nbr.reshape(-1), flat, axis=0)
        eid = jnp.take(rel.nbr_eid.reshape(-1), flat, axis=0)
        mask = jnp.broadcast_to((deg > 0)[..., None], nbr.shape)
    else:
        raise KeyError(f"sampling mode {mode} not recognized.")

    if exclude_sorted_eids is not None and exclude_sorted_eids.shape[0] > 0:
        pos = jnp.clip(
            jnp.searchsorted(exclude_sorted_eids, eid),
            0,
            exclude_sorted_eids.shape[0] - 1,
        )
        excluded = exclude_sorted_eids[pos] == eid
        mask = mask & ~excluded
    return nbr, eid, mask
