"""Static edge-set cuckoo hash table for on-device membership queries.

TPU-native replacement for DGL's ``has_edges_between`` C++ query (used by the
reference per batch for false-negative masking,
``/root/reference/src/train/run.py:92-103``) and for the Python
already-bought filter in retrieval (``src/metrics.py:74-76``).

Design: two-table cuckoo hashing of (u, v) int32 pairs, built once on the
host (vectorized round-based insertion with eviction), queried on device
with EXACTLY two probe positions — four gathers total per query batch, no
loops, no 64-bit keys (TPU has no fast int64), fused into the jit'd step
with zero host sync.  Total capacity ~3x the pair count (load <= 1/3), at
which random-walk cuckoo insertion converges with high probability; the
builder re-seeds and rebuilds on the rare failure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_EMPTY = np.int32(-1)

# Distinct odd mixing constants per (table, seed attempt).
_MIX_A = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F,
          0x165667B1, 0xD3A2646D, 0xFD7046C5, 0xB55A4F09)
_MIX_B = (0x68E31DA5, 0xB2914249, 0x71FEB7C5, 0x3C6EF372,
          0x14292967, 0x5F356495, 0x2545F491, 0x9E297A2B)


def _mix(u, v, a: int, b: int, xp):
    """32-bit avalanche hash of a pair; identical math in numpy and jnp."""
    u = u.astype(xp.uint32)
    v = v.astype(xp.uint32)
    h = u * xp.uint32(a) ^ (v * xp.uint32(b) + xp.uint32(0x9E3779B9))
    h = h ^ (h >> xp.uint32(16))
    h = h * xp.uint32(0x7FEB352D)
    h = h ^ (h >> xp.uint32(15))
    h = h * xp.uint32(0x846CA68B)
    h = h ^ (h >> xp.uint32(16))
    return h


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


@struct.dataclass
class EdgeHashTable:
    """Immutable device-resident edge set. Two cuckoo tables, empty = -1."""

    slot_u: jax.Array  # [2, capacity] int32
    slot_v: jax.Array  # [2, capacity] int32
    seed: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.slot_u.shape[1]


def build_edge_hash(src, dst, min_capacity: int = 4) -> EdgeHashTable:
    """Host-side cuckoo build.

    Fast path: the C++ core (:mod:`gnn_recsys_tpu.native`) streams the RAW
    pair list through sequential insert-with-eviction — duplicate pairs are
    skipped for free (a stored pair always sits at one of its two home
    slots), so no ``np.unique`` pre-pass is needed.  Fallback: vectorized
    numpy round-based insertion.  Both produce tables the device-side
    :func:`edge_hash_lookup` reads identically.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    native_table = _build_edge_hash_native(src, dst, min_capacity)
    if native_table is not None:
        return native_table
    if src.size:
        pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    else:
        pairs = np.zeros((0, 2), dtype=np.int32)
    e = pairs.shape[0]
    capacity = max(_next_pow2(int(e * 1.5) + 1), min_capacity)

    for seed in range(4):
        mask = np.uint32(capacity - 1)
        a1, b1 = _MIX_A[2 * seed % 8], _MIX_B[2 * seed % 8]
        a2, b2 = _MIX_A[(2 * seed + 1) % 8], _MIX_B[(2 * seed + 1) % 8]
        slot_u = np.full((2, capacity), _EMPTY, dtype=np.int32)
        slot_v = np.full((2, capacity), _EMPTY, dtype=np.int32)
        slot_idx = np.full((2, capacity), -1, dtype=np.int64)  # payload: pair index
        if e:
            h1 = (_mix(pairs[:, 0], pairs[:, 1], a1, b1, np) & mask).astype(np.int64)
            h2 = (_mix(pairs[:, 0], pairs[:, 1], a2, b2, np) & mask).astype(np.int64)
            hashes = np.stack([h1, h2], axis=1)  # [E, 2]
            pending = np.arange(e, dtype=np.int64)
            choice = np.zeros(e, dtype=np.int64)
            ok = False
            for _ in range(400):
                if pending.size == 0:
                    ok = True
                    break
                tab = choice[pending]
                pos = hashes[pending, tab]
                key = tab * capacity + pos
                _, first = np.unique(key, return_index=True)
                winners = pending[first]
                wtab = tab[first]
                wpos = pos[first]
                evicted = slot_idx[wtab, wpos]
                evicted = evicted[evicted >= 0]
                slot_u[wtab, wpos] = pairs[winners, 0]
                slot_v[wtab, wpos] = pairs[winners, 1]
                slot_idx[wtab, wpos] = winners
                placed = np.zeros(e, dtype=bool)
                placed[winners] = True
                losers = pending[~placed[pending]]
                # Losers retry their other table; evicted items flip too.
                choice[losers] = 1 - choice[losers]
                choice[evicted] = 1 - choice[evicted]
                pending = np.concatenate([losers, evicted])
            if not ok:
                capacity *= 2
                continue
        return EdgeHashTable(
            slot_u=jnp.asarray(slot_u),
            slot_v=jnp.asarray(slot_v),
            seed=seed,
        )
    raise RuntimeError("cuckoo edge hash build failed")


def _build_edge_hash_native(
    src: np.ndarray, dst: np.ndarray, min_capacity: int
) -> "EdgeHashTable | None":
    """C++ build; returns None when the native lib is unavailable."""
    from gnn_recsys_tpu import native

    if not native.native_available():
        return None

    def attempt(capacity: int):
        for seed in range(4):
            a1, b1 = _MIX_A[2 * seed % 8], _MIX_B[2 * seed % 8]
            a2, b2 = _MIX_A[(2 * seed + 1) % 8], _MIX_B[(2 * seed + 1) % 8]
            out = native.cuckoo_build(src, dst, capacity, a1, b1, a2, b2)
            if out is not None:
                return out[0], out[1], out[2], seed
        return None

    # The raw pair count bounds the distinct count, so this capacity always
    # keeps per-table load <= ~1/3; shrink afterwards if duplicates made it
    # oversized (matches the numpy builder's unique-count sizing).
    capacity = max(_next_pow2(int(src.size * 1.5) + 1), min_capacity)
    built = None
    while built is None:
        built = attempt(capacity)
        if built is None:
            capacity *= 2  # pathological hash collisions; grow like numpy
    slot_u, slot_v, n_distinct, seed = built
    tight = max(_next_pow2(int(n_distinct * 1.5) + 1), min_capacity)
    if tight < capacity:
        compact = attempt(tight)
        if compact is not None:
            slot_u, slot_v, _, seed = compact
    return EdgeHashTable(
        slot_u=jnp.asarray(slot_u), slot_v=jnp.asarray(slot_v), seed=seed
    )


def edge_hash_lookup(table: EdgeHashTable, u: jax.Array, v: jax.Array) -> jax.Array:
    """Vectorized membership test: is (u[i], v[i]) in the edge set?

    u, v: int32 arrays of any (matching) shape. Returns bool of same shape.
    Exactly two probe positions (four gathers), loop-free.
    """
    cap_mask = jnp.uint32(table.capacity - 1)
    s = table.seed
    a1, b1 = _MIX_A[2 * s % 8], _MIX_B[2 * s % 8]
    a2, b2 = _MIX_A[(2 * s + 1) % 8], _MIX_B[(2 * s + 1) % 8]
    u32 = u.astype(jnp.int32)
    v32 = v.astype(jnp.int32)
    p1 = (_mix(u32, v32, a1, b1, jnp) & cap_mask).astype(jnp.int32)
    p2 = (_mix(u32, v32, a2, b2, jnp) & cap_mask).astype(jnp.int32)
    m1 = (jnp.take(table.slot_u[0], p1, axis=0) == u32) & (
        jnp.take(table.slot_v[0], p1, axis=0) == v32
    )
    m2 = (jnp.take(table.slot_u[1], p2, axis=0) == u32) & (
        jnp.take(table.slot_v[1], p2, axis=0) == v32
    )
    return m1 | m2
