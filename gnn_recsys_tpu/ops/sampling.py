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

# Widest padded row for which uniform sampling uses the row-gather +
# one-hot-select fast path.  That path does O(kmax) work per sampled slot
# (it was measured faster than scalar gathers at capped fanouts <= 32 on
# v5e), so on relations built WITHOUT max_fanout — where kmax equals the
# hub in-degree, possibly thousands — it would regress quadratically;
# beyond the threshold we fall back to O(1)-per-slot flat scalar gathers.
ROW_GATHER_KMAX = 64


def sample_neighbors(
    rel: Relation,
    ids: jax.Array,
    fanout: int,
    rng: Optional[jax.Array] = None,
    mode: str = "uniform",
    exclude_sorted_eids: Optional[jax.Array] = None,
    exclude_flags: Optional[jax.Array] = None,
    nbr_table: Optional[jax.Array] = None,
    with_eids: bool = True,
) -> Tuple[Optional[jax.Array], Optional[jax.Array], jax.Array]:
    """Sample incoming neighbors of ``ids`` under relation ``rel``.

    ids: int32 of any shape [*s].
    Returns ``(nbr, eid, mask)``:
      * mode='uniform': shapes [*s, fanout]; uniform WITH replacement over
        each node's true neighbor list.
      * mode='full': shapes [*s, K] where K is the relation's padded width;
        every valid neighbor slot (the reference's full-neighbor sampler).

    Exclusion (every form masks the same edges), fastest first:
      * nbr_table: [N_dst, K] sign-marked copy of ``rel.nbr``
        (:func:`exclusion_table`) — exclusion rides the existing neighbor
        gather, zero extra per-level cost.
      * exclude_flags: [N_dst*K] bool (:func:`exclusion_flags`) — one
        extra bool gather per level.
      * exclude_sorted_eids: [B] SORTED edge ids (legacy; a searchsorted
        per level, ~11 sequential scalar-gather iterations — measured
        ~115 ms/step slower than flags at the bench config on v5e; forces
        the eid gather even when ``with_eids=False``).

    ``with_eids=False`` skips the edge-id gather (one of the three table
    gathers) when the caller needs no per-edge features.
    """
    kmax = rel.max_fanout
    need_eids = with_eids or (
        exclude_sorted_eids is not None and exclude_sorted_eids.shape[0] > 0
    )
    table = rel.nbr if nbr_table is None else nbr_table

    eid = None
    if mode == "full":
        nbr = jnp.take(table, ids, axis=0, mode="clip")  # [*s, K]
        if need_eids:
            eid = jnp.take(rel.nbr_eid, ids, axis=0, mode="clip")
        mask = jnp.take(rel.nbr_mask, ids, axis=0, mode="clip")
        if nbr_table is not None:
            mask = mask & (nbr >= 0)
            nbr = nbr & jnp.int32(2**31 - 1)
        if exclude_flags is not None:
            excluded = jnp.take(
                exclude_flags.reshape(-1, kmax), ids, axis=0, mode="clip"
            )
            mask = mask & ~excluded
    elif mode == "uniform" and kmax <= ROW_GATHER_KMAX:
        if rng is None:
            raise ValueError("uniform sampling requires an rng key")
        # Pick sampled slots via ONE row gather per frontier node + a fused
        # one-hot select, NOT `fanout` scalar gathers per node: XLA lowers
        # 1-D scalar gathers at ~7 ns/element on v5e while row gathers run
        # ~5x faster, and the select fuses into the reduction (never
        # materialized).  Measured: the four [196608]-element leaf-level
        # scalar gathers alone cost 5.6 ms/step at the bench config —
        # ~36% of the whole forward.  Only a win at capped fanout: the
        # select is O(kmax) per slot, hence the ROW_GATHER_KMAX gate.
        row = jnp.take(table, ids.reshape(-1), axis=0, mode="clip").reshape(
            *ids.shape, kmax
        )  # [*s, K]
        # Degree rides the SAME row gather (padding is -1 by Relation
        # invariant; sign-marked EXCLUDED slots are negative-but-not--1,
        # so they still count toward degree — an excluded draw becomes an
        # invalid slot below, identical to the separate-deg semantics).
        deg = jnp.sum((row != -1).astype(jnp.int32), axis=-1)
        u = jax.random.uniform(rng, (*ids.shape, fanout))
        slot = jnp.minimum(
            (u * jnp.maximum(deg, 1)[..., None]).astype(jnp.int32),
            jnp.maximum(deg - 1, 0)[..., None],
        )
        sel = slot[..., None] == jnp.arange(kmax, dtype=jnp.int32)
        nbr = jnp.sum(row[..., None, :] * sel, axis=-1)  # [*s, fanout]
        if need_eids:
            erow = jnp.take(
                rel.nbr_eid, ids.reshape(-1), axis=0, mode="clip"
            ).reshape(*ids.shape, kmax)
            eid = jnp.sum(erow[..., None, :] * sel, axis=-1)
        mask = jnp.broadcast_to((deg > 0)[..., None], nbr.shape)
        if nbr_table is not None:
            mask = mask & (nbr >= 0)
            nbr = nbr & jnp.int32(2**31 - 1)
        if exclude_flags is not None:
            frow = jnp.take(
                exclude_flags.reshape(-1, kmax), ids.reshape(-1), axis=0,
                mode="clip",
            ).reshape(*ids.shape, kmax)
            mask = mask & ~jnp.any(sel & frow[..., None, :], axis=-1)
    elif mode == "uniform":
        if rng is None:
            raise ValueError("uniform sampling requires an rng key")
        # Wide-row (uncapped, power-law) fallback: O(1) flat scalar
        # gathers per sampled slot; degree from the precomputed
        # Relation.deg (one scalar gather per frontier node) instead of
        # an O(kmax) row scan.
        deg = jnp.take(rel.deg, ids.reshape(-1), axis=0,
                       mode="clip").reshape(ids.shape)
        u = jax.random.uniform(rng, (*ids.shape, fanout))
        slot = jnp.minimum(
            (u * jnp.maximum(deg, 1)[..., None]).astype(jnp.int32),
            jnp.maximum(deg - 1, 0)[..., None],
        )
        idx = (ids[..., None].astype(jnp.int32) * kmax + slot).reshape(-1)
        nbr = jnp.take(table.reshape(-1), idx,
                       mode="clip").reshape(*ids.shape, fanout)
        if need_eids:
            eid = jnp.take(rel.nbr_eid.reshape(-1), idx, mode="clip").reshape(
                *ids.shape, fanout
            )
        mask = jnp.broadcast_to((deg > 0)[..., None], nbr.shape)
        if nbr_table is not None:
            mask = mask & (nbr >= 0)
            nbr = nbr & jnp.int32(2**31 - 1)
        if exclude_flags is not None:
            mask = mask & ~jnp.take(exclude_flags, idx, mode="clip").reshape(
                *ids.shape, fanout
            )
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
    # Invalid slots can carry the -1 padding (or 2^31-1 after sign
    # unmasking); downstream feature gathers use jnp.take's default FILL
    # mode, which turns out-of-bounds ids into NaN — and NaN poisons even
    # masked slots (0 * NaN = NaN in the mean reduce).  Return a real
    # (node-0) id for every invalid slot, exactly the old 0-padding
    # behavior.
    nbr = jnp.where(mask, nbr, 0)
    return nbr, eid, mask


def full_neighbors_packed(
    rel: Relation,
    ids: jax.Array,
    nbr_table: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full-neighbor RAW FEATURES from the lane-packed leaf cache
    (``rel.nbr_feat``, :func:`attach_leaf_features`) — no per-slot random
    feature gathers.

    The deepest level of a FULL-fanout tree (the reference's default
    ``MultiLayerFullNeighborSampler``) needs every neighbor's feature row:
    gather the parent's packed ``[K*F]`` feature row (one contiguous
    read) plus its neighbor-id row (validity/exclusion — the row the
    unpacked sampler reads anyway), replacing K random 16-byte gathers
    per parent, each of which pulls a full 128-lane HBM tile.

    SAMPLED (uniform) leaves intentionally have no packed path: selecting
    ``fanout`` of K slots from the gathered rows costs more in one-hot
    reduce + relayout than the random gathers it avoids (measured on v5e
    at the bench config: 13.8 vs 8.9 ms/step) — the win only exists when
    ALL slots are consumed.

    Returns ``(raw [*s, K, F], mask [*s, K])``.
    ``nbr_table``: optional sign-marked copy of ``rel.nbr``
    (:func:`exclusion_table`); excluded slots are masked exactly like the
    unpacked path.  Callers needing per-edge features (edge-weighted
    aggregators) must use :func:`sample_neighbors`.
    """
    if rel.nbr_feat is None:
        raise ValueError(
            "relation has no nbr_feat cache; call attach_leaf_features"
        )
    kmax = rel.max_fanout
    table = rel.nbr if nbr_table is None else nbr_table
    row = jnp.take(table, ids.reshape(-1), axis=0,
                   mode="clip").reshape(*ids.shape, kmax)
    # nbr_feat is stored [N, K*F] (row-major — a 3-D constant tempts XLA
    # into a transposed layout that scatters the row reads); reshape the
    # gathered rows back to [*, K, F].
    feat_row = jnp.take(
        rel.nbr_feat, ids.reshape(-1), axis=0, mode="clip"
    ).reshape(*ids.shape, kmax, rel.nbr_feat.shape[-1] // kmax)
    return feat_row, row >= 0  # valid and not sign-marked excluded


def exclusion_table(rel: Relation, eids: jax.Array) -> jax.Array:
    """[N_dst, K] copy of ``rel.nbr`` with excluded slots sign-marked.

    The sampler's existing neighbor gather then carries the exclusion bit
    for free (node ids are non-negative, so the sign bit is spare):
    ZERO extra per-level gathers, vs one [frontier]-sized bool gather per
    level for :func:`exclusion_flags` (~1 cycle/element on TPU — ~12 ms
    per step at the bench config's ~12 sampler calls).  Build cost is one
    [N*K] int32 copy + a tiny scatter, once per step.
    """
    if rel.eid_pos is None:
        raise ValueError(
            "relation has no eid_pos (built by an old writer); "
            "use exclude_sorted_eids instead"
        )
    pos = jnp.take(rel.eid_pos, eids.reshape(-1).astype(jnp.int32), axis=0)
    flat = rel.nbr.reshape(-1)
    vals = jnp.take(flat, jnp.minimum(pos, flat.shape[0] - 1), axis=0)
    marked = flat.at[pos].set(
        vals | jnp.int32(-(2**31)), mode="drop"
    )
    return marked.reshape(rel.nbr.shape)


def exclusion_flags(rel: Relation, eids: jax.Array) -> jax.Array:
    """[N_dst*K] bool positional exclusion table for ``eids`` of ``rel``.

    Scatters True at each edge's padded-table position (``rel.eid_pos``);
    edges dropped by the fanout cap carry an out-of-bounds sentinel and
    are dropped by the scatter (they cannot be sampled anyway).  Build
    ONCE per step/forward and pass to :func:`sample_neighbors` at every
    level — the tables are read by every level's single-gather test.
    """
    if rel.eid_pos is None:
        raise ValueError(
            "relation has no eid_pos (built by an old writer); "
            "use exclude_sorted_eids instead"
        )
    pos = jnp.take(rel.eid_pos, eids.reshape(-1).astype(jnp.int32), axis=0)
    nk = rel.nbr.size
    return (
        jnp.zeros((nk,), jnp.bool_).at[pos].set(True, mode="drop")
    )
