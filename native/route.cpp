// Bipartite regular edge coloring via recursive Euler splitting.
//
// Plan-time core of the routed-permutation engine (sblas_tpu/ops/route.py):
// decomposing an arbitrary device-side permutation into TPU-executable
// stages (per-row 128-lane shuffles + transposes) reduces, via the
// Birkhoff/Clos routing theorem, to coloring a d-regular bipartite
// multigraph with exactly d colors so that every node sees each color
// once.  For d a power of two the classical construction is Euler
// splitting: walk Eulerian circuits, alternate edges into two halves
// (every node's degree halves exactly), recurse log2(d) times.
//
// O(E log d), inherently pointer-chasing — hence C++ (the python fallback
// in route.py is only viable for test-sized inputs).  All working arrays
// are int32 and k-indexed (k = position within the current group), so the
// walk stays cache-local: endpoints are copied into group order once per
// level instead of chasing original edge ids.
//
// No analog in the reference (its gather/scatter problems are cuSPARSE's,
// e.g. spmm.h:146-149); this is TPU-native infrastructure.

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

// Split the k-indexed edge group (lsrc[k], ldst[k]), k in [0, ne), into two
// halves such that every node's degree halves exactly (all degrees even).
// Writes bit (0/1) into bit_k[k].
void euler_halve(const int32_t* lsrc, const int32_t* ldst, int32_t n_left,
                 int64_t n_nodes, int64_t ne, uint8_t* bit_k,
                 std::vector<int32_t>& head, std::vector<int32_t>& inc,
                 std::vector<int32_t>& ptr, std::vector<uint8_t>& used) {
  head.assign(n_nodes + 1, 0);
  for (int64_t k = 0; k < ne; ++k) {
    ++head[lsrc[k] + 1];
    ++head[(int64_t)n_left + ldst[k] + 1];
  }
  for (int64_t v = 0; v < n_nodes; ++v) head[v + 1] += head[v];
  inc.resize(2 * ne);
  ptr.assign(head.begin(), head.end() - 1);
  for (int64_t k = 0; k < ne; ++k) {
    inc[ptr[lsrc[k]]++] = (int32_t)k;
    inc[ptr[(int64_t)n_left + ldst[k]]++] = (int32_t)k;
  }
  ptr.assign(head.begin(), head.end() - 1);  // rewind to list starts
  used.assign(ne, 0);

  // walk closed circuits; alternate bit along each circuit.  In an
  // all-even-degree multigraph a greedy walk can only get stuck back at
  // the start node, closing a circuit; bipartite circuits have even
  // length so alternation is consistent and pairs each node visit's
  // in/out edges into opposite halves.
  for (int64_t k0 = 0; k0 < ne; ++k0) {
    if (used[k0]) continue;
    int64_t v = lsrc[k0];
    uint8_t parity = 0;
    int64_t k = k0;
    for (;;) {
      used[k] = 1;
      bit_k[k] = parity;
      parity ^= 1;
      // move to the endpoint of k's edge that is not v
      v = (v == lsrc[k]) ? (int64_t)n_left + ldst[k] : (int64_t)lsrc[k];
      // next unused incident edge at v
      int32_t p = ptr[v];
      const int32_t end = head[v + 1];
      while (p < end && used[inc[p]]) ++p;
      ptr[v] = p;
      if (p == end) break;  // circuit closed (v is the start node)
      k = inc[p];
    }
  }
}

}  // namespace

extern "C" {

// Color a d-regular bipartite multigraph with exactly d colors (each node
// sees every color once).  d must be a power of two; every left node must
// have exactly d incident edges and every right node exactly d (pad with
// dummy edges first).  Returns 0 on success, nonzero on bad input.
int sblas_edge_color(int32_t n_left, int32_t n_right, int64_t ne, int32_t d,
                     const int32_t* src, const int32_t* dst,
                     int32_t* color_out) {
  if (d <= 0 || (d & (d - 1)) != 0) return 1;
  if (ne != (int64_t)n_left * d || ne != (int64_t)n_right * d) return 2;
  if (ne >= (int64_t)1 << 31) return 5;  // int32-indexed internals
  for (int64_t e = 0; e < ne; ++e) {
    if (src[e] < 0 || src[e] >= n_left || dst[e] < 0 || dst[e] >= n_right)
      return 3;
    color_out[e] = 0;
  }
  if (d == 1) return 0;

  std::vector<int32_t> head, inc, ptr;
  std::vector<uint8_t> used, bit_k(ne);
  // group-ordered working copies: edge id, endpoints, accumulated color
  std::vector<int32_t> eid(ne), lsrc(src, src + ne), ldst(dst, dst + ne);
  std::vector<int32_t> lcol(ne, 0);
  std::vector<int32_t> t_eid(ne), t_src(ne), t_dst(ne), t_col(ne);
  for (int64_t e = 0; e < ne; ++e) eid[e] = (int32_t)e;

  const int64_t n_nodes = (int64_t)n_left + n_right;
  const int32_t max_depth = [] (int32_t dd) {
    int32_t b = 0; while ((1 << b) < dd) ++b; return b; } (d);

  // breadth-first over depth levels: at each level every group splits in
  // two via a stable partition of the parallel arrays
  std::vector<int64_t> offs{0, ne};
  for (int32_t depth = 0; depth < max_depth; ++depth) {
    std::vector<int64_t> next_offs{0};
    for (size_t g = 0; g + 1 < offs.size(); ++g) {
      const int64_t off = offs[g], len = offs[g + 1] - offs[g];
      if (len > 0) {
        euler_halve(lsrc.data() + off, ldst.data() + off, n_left, n_nodes,
                    len, bit_k.data(), head, inc, ptr, used);
        int64_t n1 = 0;
        for (int64_t k = 0; k < len; ++k) n1 += bit_k[k];
        if (n1 * 2 != len) return 4;  // degrees were odd
        const int64_t len0 = len - n1;
        int64_t p0 = 0, p1 = len0;
        for (int64_t k = 0; k < len; ++k) {
          const int64_t e = off + k;
          const int64_t t = bit_k[k] ? p1++ : p0++;
          t_eid[t] = eid[e];
          t_src[t] = lsrc[e];
          t_dst[t] = ldst[e];
          t_col[t] = lcol[e] | ((int32_t)bit_k[k] << depth);
        }
        for (int64_t k = 0; k < len; ++k) {
          eid[off + k] = t_eid[k];
          lsrc[off + k] = t_src[k];
          ldst[off + k] = t_dst[k];
          lcol[off + k] = t_col[k];
        }
        next_offs.push_back(off + len0);
      } else {
        next_offs.push_back(off);
      }
      next_offs.push_back(off + len);
    }
    offs = std::move(next_offs);
  }

  for (int64_t k = 0; k < ne; ++k) color_out[eid[k]] = lcol[k];
  return 0;
}

}  // extern "C"
