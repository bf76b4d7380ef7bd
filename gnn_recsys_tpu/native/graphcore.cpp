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
