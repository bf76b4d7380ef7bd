"""Static edge-set hash table for on-device membership queries.

TPU-native replacement for DGL's ``has_edges_between`` C++ query (used by the
reference per batch for false-negative masking,
``/root/reference/src/train/run.py:92-103``) and for the Python
already-bought filter in retrieval (``src/metrics.py:74-76``).

Design: an open-addressing (linear probing) table of (u, v) int32 pairs,
built once on the host at load factor <= 0.5, queried on device with a fixed
``max_probes``-step ``fori_loop`` of gathers — all int32/uint32, no 64-bit
keys (TPU has no fast int64), no host sync, fuses into the jit'd train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_EMPTY = np.int32(-1)


def _mix(u, v, xp):
    """32-bit avalanche hash of a pair; identical math in numpy and jnp."""
    u = u.astype(xp.uint32)
    v = v.astype(xp.uint32)
    h = u * xp.uint32(0x9E3779B1) ^ (v * xp.uint32(0x85EBCA77) + xp.uint32(0x9E3779B9))
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
    """Immutable device-resident edge set. Empty slots hold -1."""

    slot_u: jax.Array  # [capacity] int32
    slot_v: jax.Array  # [capacity] int32
    max_probes: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.slot_u.shape[0]


def build_edge_hash(src, dst, min_capacity: int = 8) -> EdgeHashTable:
    """Host-side vectorized build (insertion in collision-resolution rounds)."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0) if src.size else (
        np.zeros((0, 2), dtype=np.int32)
    )
    e = pairs.shape[0]
    capacity = max(_next_pow2(2 * max(e, 1)), min_capacity)
    mask = np.uint32(capacity - 1)
    slot_u = np.full(capacity, _EMPTY, dtype=np.int32)
    slot_v = np.full(capacity, _EMPTY, dtype=np.int32)
    if e:
        base = (_mix(pairs[:, 0], pairs[:, 1], np) & mask).astype(np.int64)
        remaining = np.arange(e, dtype=np.int64)
        offset = 0
        while remaining.size:
            pos = (base[remaining] + offset) & int(mask)
            empty = slot_u[pos] == _EMPTY
            cand = remaining[empty]
            cand_pos = pos[empty]
            # One winner per distinct empty slot this round.
            uniq_pos, first = np.unique(cand_pos, return_index=True)
            winners = cand[first]
            slot_u[uniq_pos] = pairs[winners, 0]
            slot_v[uniq_pos] = pairs[winners, 1]
            placed = np.zeros(e, dtype=bool)
            placed[winners] = True
            remaining = remaining[~placed[remaining]]
            offset += 1
            if offset > capacity:
                raise RuntimeError("edge hash table insertion failed")
        max_probes = offset
    else:
        max_probes = 1
    return EdgeHashTable(
        slot_u=jnp.asarray(slot_u),
        slot_v=jnp.asarray(slot_v),
        max_probes=int(max_probes),
    )


def edge_hash_lookup(table: EdgeHashTable, u: jax.Array, v: jax.Array) -> jax.Array:
    """Vectorized membership test: is (u[i], v[i]) in the edge set?

    u, v: int32 arrays of any (matching) shape. Returns bool of same shape.
    """
    cap_mask = jnp.uint32(table.capacity - 1)
    h = (_mix(u, v, jnp) & cap_mask).astype(jnp.int32)

    def body(p, found):
        pos = (h + p) & table.capacity - 1
        tu = jnp.take(table.slot_u, pos, axis=0)
        tv = jnp.take(table.slot_v, pos, axis=0)
        return found | ((tu == u) & (tv == v))

    init = jnp.zeros(u.shape, dtype=bool)
    return jax.lax.fori_loop(0, table.max_probes, body, init)
