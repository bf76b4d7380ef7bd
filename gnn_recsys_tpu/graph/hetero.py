"""Device-resident heterogeneous graph container.

TPU-native replacement for the reference's DGL heterograph (built at
/root/reference/src/builder.py:377-383 and queried throughout): instead of a
mutable C++ object with COO/CSR/CSC indices, the graph is an immutable JAX
pytree of statically-shaped arrays living in HBM:

  * per canonical edge type, a COO edge list (``src``, ``dst``, edge feature
    columns) plus a padded CSC view (``nbr``/``nbr_eid``/``nbr_mask``/``deg``)
    keyed by destination node — the layout message-passing aggregations and
    on-device neighbor sampling read directly;
  * per node type, dense feature matrices (``ndata``).

All shapes are static so every consumer can be ``jit``-compiled once.  Graph
edits (e.g. removing validation edges, reference ``src/sampling.py:63-70``)
produce a *new* graph on the host rather than mutating in place.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# A canonical edge type, e.g. ("user", "buys", "item").
CanonicalEtype = Tuple[str, str, str]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class Relation:
    """One canonical edge type: COO edges + padded CSC (by destination).

    Replaces DGL's per-etype index structures. ``nbr[d, k]`` is the source
    node id of the k-th incoming edge of destination node ``d`` (padded
    with -1 where ``nbr_mask`` is False — an invariant the sampler relies
    on to derive degrees from gathered rows; see build_relation), and
    ``nbr_eid[d, k]`` indexes into the COO arrays
    (``src``/``dst``/``edata``) for edge features.
    """

    src: jax.Array  # [E] int32 source node ids
    dst: jax.Array  # [E] int32 destination node ids
    nbr: jax.Array  # [N_dst, K] int32 padded incoming-neighbor src ids
    nbr_eid: jax.Array  # [N_dst, K] int32 edge index per slot (0-padded)
    nbr_mask: jax.Array  # [N_dst, K] bool validity of each slot
    deg: jax.Array  # [N_dst] int32 true in-degree (clipped at K)
    edata: Dict[str, jax.Array]  # per-edge features, each [E] or [E, F]
    # [E] int32: flat position (row*K + slot) of each edge in the padded
    # table; N_dst*K (out of bounds) for edges dropped by the fanout cap.
    # Lets batch-edge exclusion scatter a per-step positional flag table
    # and test membership with ONE gather that reuses the sampler's flat
    # index — measured ~115 ms/step cheaper than per-level searchsorted
    # (11 sequential binary-search iterations, each a scalar gather) on
    # v5e at the bench config.  None on relations built by old writers.
    eid_pos: Optional[jax.Array] = None
    # Optional LANE-PACKED leaf feature cache, [N_dst, K, F]:
    # ``nbr_feat[d, k] = src_features[nbr[d, k]]`` (zeros at padding).
    # Node features are constant during training, so the deepest (leaf)
    # tree level can replace its per-draw random feature gathers — each a
    # ~16-byte row that still pulls a full 128-lane tile from HBM — with
    # ONE contiguous row read per parent plus an in-register slot select.
    # Built by :func:`attach_leaf_features`; never serialized (derived).
    nbr_feat: Optional[jax.Array] = None

    @property
    def num_edges(self) -> int:
        return self.src.shape[0]

    @property
    def max_fanout(self) -> int:
        return self.nbr.shape[1]


@struct.dataclass
class HeteroGraph:
    """Immutable heterogeneous graph pytree.

    ``rels`` maps canonical etype tuples to :class:`Relation`;
    ``ndata`` maps node type -> feature name -> dense [N, F] array.
    ``num_nodes_dict`` is static metadata (hashable under jit).
    """

    rels: Dict[CanonicalEtype, Relation]
    ndata: Dict[str, Dict[str, jax.Array]]
    # Static metadata must be hashable under jit -> tuple of (ntype, count).
    num_nodes_tuple: Tuple[Tuple[str, int], ...] = struct.field(pytree_node=False)

    # ------------------------------------------------------------------
    # DGL-metagraph-style conveniences
    # ------------------------------------------------------------------
    @property
    def num_nodes_dict(self) -> Dict[str, int]:
        return dict(self.num_nodes_tuple)

    @property
    def canonical_etypes(self) -> Tuple[CanonicalEtype, ...]:
        return tuple(self.rels.keys())

    @property
    def ntypes(self) -> Tuple[str, ...]:
        return tuple(n for n, _ in self.num_nodes_tuple)

    def num_nodes(self, ntype: str) -> int:
        return self.num_nodes_dict[ntype]

    def num_edges(self, etype: CanonicalEtype) -> int:
        return self.rels[etype].num_edges

    def etypes_into(self, ntype: str) -> Tuple[CanonicalEtype, ...]:
        """All canonical etypes whose destination is ``ntype``."""
        return tuple(et for et in self.rels if et[2] == ntype)

    def etypes_from(self, ntype: str) -> Tuple[CanonicalEtype, ...]:
        return tuple(et for et in self.rels if et[0] == ntype)


# ----------------------------------------------------------------------
# Host-side construction (numpy)
# ----------------------------------------------------------------------

def coo_to_padded_csc(
    src: np.ndarray,
    dst: np.ndarray,
    num_dst: int,
    max_fanout: Optional[int] = None,
    fanout_multiple: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack a COO edge list into a padded by-destination neighbor table.

    Returns ``(nbr, nbr_eid, nbr_mask, deg)`` with shapes ``[num_dst, K]``
    (x3) and ``[num_dst]``.  ``K`` is the max in-degree rounded up to a
    multiple of ``fanout_multiple`` (for TPU tiling), or ``max_fanout`` if
    given — in which case each destination keeps its *last* ``K`` incoming
    edges (edges are time-ordered by the builder, so this keeps the most
    recent interactions, mirroring the reference's recency bias in
    ``src/sampling.py:72-82``).

    Slot order within a destination row follows edge-id order, matching
    DGL's mailbox ordering semantics.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    num_edges = src.shape[0]
    counts = np.bincount(dst, minlength=num_dst).astype(np.int32)
    natural_k = int(counts.max()) if num_edges else 0
    if max_fanout is not None and natural_k > max_fanout:
        k = max_fanout
    else:
        k = natural_k
    k = max(_round_up(max(k, 1), fanout_multiple), fanout_multiple)

    # Native C++ single-pass packer (gnn_recsys_tpu/native); same semantics.
    from gnn_recsys_tpu import native

    packed = native.csc_pack(src, dst, num_dst, k)
    if packed is not None:
        return packed

    # numpy fallback: stable sort by dst keeps edge-id order within rows.
    order = np.argsort(dst, kind="stable")
    sorted_dst = dst[order]
    # Position of each edge within its destination's row.
    row_start = np.zeros(num_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=row_start[1:])
    pos_in_row = np.arange(num_edges, dtype=np.int64) - row_start[sorted_dst]

    # Keep the LAST k edges per row when capped.
    keep = pos_in_row >= (counts[sorted_dst] - k)
    slot = np.where(
        counts[sorted_dst] > k, pos_in_row - (counts[sorted_dst] - k), pos_in_row
    )

    nbr = np.zeros((num_dst, k), dtype=np.int32)
    nbr_eid = np.zeros((num_dst, k), dtype=np.int32)
    nbr_mask = np.zeros((num_dst, k), dtype=bool)
    kept_rows = sorted_dst[keep]
    kept_slots = slot[keep]
    kept_eids = order[keep].astype(np.int32)
    nbr[kept_rows, kept_slots] = src[kept_eids]
    nbr_eid[kept_rows, kept_slots] = kept_eids
    nbr_mask[kept_rows, kept_slots] = True
    deg = np.minimum(counts, k).astype(np.int32)
    return nbr, nbr_eid, nbr_mask, deg


def compute_eid_pos(
    nbr_eid: np.ndarray, nbr_mask: np.ndarray, num_edges: int
) -> np.ndarray:
    """[E] flat padded-table position per edge id (see Relation.eid_pos)."""
    pos = np.full(num_edges, nbr_eid.size, dtype=np.int32)
    flat_valid = np.flatnonzero(np.asarray(nbr_mask).reshape(-1))
    pos[np.asarray(nbr_eid).reshape(-1)[flat_valid]] = flat_valid
    return pos


def build_relation(
    src: np.ndarray,
    dst: np.ndarray,
    num_dst: int,
    edata: Optional[Mapping[str, np.ndarray]] = None,
    max_fanout: Optional[int] = None,
    fanout_multiple: int = 8,
) -> Relation:
    """Build a :class:`Relation` (host numpy -> device arrays).

    Padding slots of ``nbr`` are stored as -1 (an INVARIANT all Relations
    share — load_graph normalizes old files): the sampler then derives
    each node's degree from the neighbor row it already gathers
    (``count(row != -1)``) instead of a separate [frontier]-sized scalar
    gather from ``deg`` per level, which XLA lowers pathologically
    (~7 ns/element on v5e).  Consumers clamp or mask padded slots, so the
    -1 never reaches arithmetic.
    """
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(
        src, dst, num_dst, max_fanout=max_fanout, fanout_multiple=fanout_multiple
    )
    nbr = np.where(nbr_mask, nbr, -1).astype(np.int32)
    edata = dict(edata or {})
    return Relation(
        src=jnp.asarray(src, dtype=jnp.int32),
        dst=jnp.asarray(dst, dtype=jnp.int32),
        nbr=jnp.asarray(nbr),
        nbr_eid=jnp.asarray(nbr_eid),
        nbr_mask=jnp.asarray(nbr_mask),
        deg=jnp.asarray(deg),
        edata={k: jnp.asarray(np.asarray(v), dtype=jnp.float32) for k, v in edata.items()},
        eid_pos=jnp.asarray(compute_eid_pos(nbr_eid, nbr_mask, len(src))),
    )


def build_hetero_graph(
    schema: Mapping[CanonicalEtype, Tuple[np.ndarray, np.ndarray]],
    num_nodes_dict: Mapping[str, int],
    edata: Optional[Mapping[CanonicalEtype, Mapping[str, np.ndarray]]] = None,
    ndata: Optional[Mapping[str, Mapping[str, np.ndarray]]] = None,
    max_fanout: Optional[int] = None,
    fanout_multiple: int = 8,
) -> HeteroGraph:
    """Build a :class:`HeteroGraph` from a schema of COO edge lists.

    ``schema`` mirrors the dict assembled by the reference's
    ``DataLoader.graph_schema`` (``src/utils_data.py:204-238``):
    canonical etype -> (src ids, dst ids).
    """
    edata = edata or {}
    rels = {}
    for etype, (src, dst) in schema.items():
        rels[etype] = build_relation(
            np.asarray(src),
            np.asarray(dst),
            num_dst=num_nodes_dict[etype[2]],
            edata=(edata.get(etype) or {}),
            max_fanout=max_fanout,
            fanout_multiple=fanout_multiple,
        )
    nd: Dict[str, Dict[str, jax.Array]] = {}
    for ntype, feats in (ndata or {}).items():
        nd[ntype] = {
            name: jnp.asarray(np.asarray(arr), dtype=jnp.float32)
            for name, arr in feats.items()
        }
    for ntype in num_nodes_dict:
        nd.setdefault(ntype, {})
    return HeteroGraph(
        rels=rels,
        ndata=nd,
        num_nodes_tuple=tuple(sorted(num_nodes_dict.items())),
    )


def attach_leaf_features(
    graph: HeteroGraph,
    features: Mapping[str, jax.Array],
    dtype=None,
    max_width: int = 64,
) -> HeteroGraph:
    """Return a graph whose relations carry the lane-packed leaf cache.

    ``nbr_feat[d, k] = features[src_ntype][nbr[d, k]]`` (zeros at padding),
    shape ``[N_dst, K, F]`` per relation.  Node features are CONSTANT
    during training, so this is built once; the sampled-tree forward's
    deepest level then reads one contiguous ``K*F``-lane row per parent
    node instead of ``fanout`` random 16-byte rows (each of which pulls a
    full 128-lane HBM tile — measured ~28% of the production step on v5e,
    benchmarks/profile_trace.py).

    dtype: storage dtype; pass the model compute dtype (e.g. bf16) to
        halve the cache's HBM footprint and row-read bytes — bit-identical
        to the unpacked path when the model casts gathered features to the
        same dtype before use.  Default: the feature array's dtype.
    max_width: skip relations whose padded width K exceeds this (the
        cache is O(N_dst * K * F) HBM; power-law uncapped rows would blow
        it up, and the flat-gather sampler path already serves them).
    """
    new_rels = {}
    for etype, rel in graph.rels.items():
        feats = features.get(etype[0])
        if feats is None or rel.max_fanout > max_width:
            new_rels[etype] = rel
            continue
        f = jnp.asarray(feats)
        if dtype is not None:
            f = f.astype(dtype)
        packed = jnp.take(f, jnp.maximum(rel.nbr, 0), axis=0)
        packed = packed * rel.nbr_mask[..., None].astype(packed.dtype)
        # Stored 2-D [N, K*F]: a 3-D [N, K, F] constant tempts XLA into a
        # transposed {0,2,1} layout (N minor) that turns the row gather
        # into fully-scattered reads — measured 2.8 ms per gather at the
        # bench config vs ~0.2 ms for the row-major 2-D form.
        packed = packed.reshape(packed.shape[0], -1)
        new_rels[etype] = rel.replace(nbr_feat=packed)
    return graph.replace(rels=new_rels)


def remove_edges(
    graph: HeteroGraph,
    eids_to_remove: Mapping[CanonicalEtype, np.ndarray],
    max_fanout: Optional[int] = None,
    fanout_multiple: int = 8,
) -> HeteroGraph:
    """Return a new graph with the given edge ids removed per etype.

    Host-side rebuild — the TPU-native analog of DGL's ``remove_edges``
    used to carve the train graph out of the full graph
    (``src/sampling.py:63-70``).  Edge ids are positions in the COO arrays.
    """
    new_rels = {}
    for etype, rel in graph.rels.items():
        src = np.asarray(rel.src)
        dst = np.asarray(rel.dst)
        keep = np.ones(src.shape[0], dtype=bool)
        if etype in eids_to_remove:
            keep[np.asarray(eids_to_remove[etype], dtype=np.int64)] = False
        ed = {k: np.asarray(v)[keep] for k, v in rel.edata.items()}
        new_rels[etype] = build_relation(
            src[keep],
            dst[keep],
            num_dst=graph.num_nodes(etype[2]),
            edata=ed,
            max_fanout=max_fanout,
            fanout_multiple=fanout_multiple,
        )
    return dataclasses.replace(graph, rels=new_rels)
