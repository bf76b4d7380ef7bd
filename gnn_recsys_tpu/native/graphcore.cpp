// Native graph-packing core.
//
// TPU-native equivalent of the graph-construction work the reference
// delegates to DGL's C++ heterograph builder (dgl.heterograph at
// /root/reference/src/builder.py:377-383 and its COO/CSR index machinery):
// packing COO edge lists into the padded by-destination neighbor tables the
// device kernels consume. The Python/numpy implementation in
// gnn_recsys_tpu/graph/hetero.py is the semantic reference; this module is
// the O(E) single-pass fast path for production-size edge lists (the numpy
// path needs a stable sort plus several full-array passes).
//
// Build: g++ -O3 -march=native -shared -fPIC graphcore.cpp -o graphcore.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Count in-degrees. counts must be zero-initialized, length num_dst.
void csc_degrees(const int32_t* dst, int64_t num_edges, int64_t num_dst,
                 int32_t* counts) {
  for (int64_t e = 0; e < num_edges; ++e) {
    ++counts[dst[e]];
  }
}

// Pack COO (src, dst) into padded per-destination tables of width k.
// Semantics match gnn_recsys_tpu.graph.hetero.coo_to_padded_csc: slot order
// follows edge-id order within each destination row; when a row has more
// than k edges only the LAST k (most recent) are kept.
//
// Outputs (caller-allocated):
//   nbr, nbr_eid : [num_dst * k] int32, zero-filled by this function
//   nbr_mask     : [num_dst * k] uint8, zero-filled
//   deg          : [num_dst] int32 (min(count, k))
void csc_pack(const int32_t* src, const int32_t* dst, int64_t num_edges,
              int64_t num_dst, int64_t k, int32_t* nbr, int32_t* nbr_eid,
              uint8_t* nbr_mask, int32_t* deg) {
  std::vector<int32_t> counts(num_dst, 0);
  csc_degrees(dst, num_edges, num_dst, counts.data());

  std::memset(nbr, 0, sizeof(int32_t) * num_dst * k);
  std::memset(nbr_eid, 0, sizeof(int32_t) * num_dst * k);
  std::memset(nbr_mask, 0, sizeof(uint8_t) * num_dst * k);
  for (int64_t d = 0; d < num_dst; ++d) {
    deg[d] = counts[d] < k ? counts[d] : static_cast<int32_t>(k);
  }

  // seen[d] = how many edges of destination d we have passed so far.
  std::vector<int32_t> seen(num_dst, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t d = dst[e];
    const int32_t pos = seen[d]++;
    const int32_t drop = counts[d] > k ? counts[d] - static_cast<int32_t>(k) : 0;
    if (pos < drop) continue;  // keep only the last k edges of the row
    const int64_t slot = static_cast<int64_t>(d) * k + (pos - drop);
    nbr[slot] = src[e];
    nbr_eid[slot] = static_cast<int32_t>(e);
    nbr_mask[slot] = 1;
  }
}

// Cuckoo edge-hash build (host side of gnn_recsys_tpu/ops/edge_hash.py).
//
// Classic sequential insertion with eviction over two tables. The hash is
// bit-identical to edge_hash._mix so the device-side lookup (two probes,
// four gathers) works unchanged. Duplicate pairs are skipped for free: a
// stored item always sits at one of its two home slots, so probing both
// homes is a complete membership test.
//
// slot_u / slot_v are caller-allocated [2 * capacity] int32, filled with -1
// here. capacity must be a power of two. Returns the number of distinct
// pairs inserted, or -1 if an insertion chain exceeded the kick budget
// (caller re-seeds or grows, same protocol as the numpy builder).
static inline uint32_t mix32(uint32_t u, uint32_t v, uint32_t a, uint32_t b) {
  uint32_t h = u * a ^ (v * b + 0x9E3779B9u);
  h ^= h >> 16;
  h *= 0x7FEB352Du;
  h ^= h >> 15;
  h *= 0x846CA68Bu;
  h ^= h >> 16;
  return h;
}

int64_t cuckoo_build(const int32_t* u, const int32_t* v, int64_t num_pairs,
                     int64_t capacity, uint32_t a1, uint32_t b1, uint32_t a2,
                     uint32_t b2, int32_t* slot_u, int32_t* slot_v) {
  for (int64_t i = 0; i < 2 * capacity; ++i) {
    slot_u[i] = -1;
    slot_v[i] = -1;
  }
  const uint32_t mask = static_cast<uint32_t>(capacity - 1);
  int log2cap = 0;
  while ((int64_t{1} << log2cap) < capacity) ++log2cap;
  const int max_kicks = 8 * log2cap + 32;
  int64_t inserted = 0;
  for (int64_t i = 0; i < num_pairs; ++i) {
    int32_t cu = u[i], cv = v[i];
    const uint32_t p1 = mix32(cu, cv, a1, b1) & mask;
    const uint32_t p2 = mix32(cu, cv, a2, b2) & mask;
    if ((slot_u[p1] == cu && slot_v[p1] == cv) ||
        (slot_u[capacity + p2] == cu && slot_v[capacity + p2] == cv)) {
      continue;  // already present
    }
    int tab = 0;
    bool placed = false;
    for (int kick = 0; kick < max_kicks; ++kick) {
      const uint32_t p =
          (tab == 0 ? mix32(cu, cv, a1, b1) : mix32(cu, cv, a2, b2)) & mask;
      const int64_t s = static_cast<int64_t>(tab) * capacity + p;
      if (slot_u[s] < 0) {
        slot_u[s] = cu;
        slot_v[s] = cv;
        placed = true;
        break;
      }
      const int32_t eu = slot_u[s], ev = slot_v[s];
      slot_u[s] = cu;
      slot_v[s] = cv;
      cu = eu;  // evicted item retries in its other table
      cv = ev;
      tab = 1 - tab;
    }
    if (!placed) return -1;
    ++inserted;
  }
  return inserted;
}

// Max in-degree (to size k when uncapped).
int32_t csc_max_degree(const int32_t* dst, int64_t num_edges,
                       int64_t num_dst) {
  std::vector<int32_t> counts(num_dst, 0);
  csc_degrees(dst, num_edges, num_dst, counts.data());
  int32_t m = 0;
  for (int64_t d = 0; d < num_dst; ++d) {
    if (counts[d] > m) m = counts[d];
  }
  return m;
}

}  // extern "C"
