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
// This is O(E log d) with tiny constants — ~0.5 s for the 4M-edge graphs a
// webbase-1M SpMV plan produces — but inherently pointer-chasing, hence
// C++ rather than numpy (the python fallback in route.py is only viable
// for test-sized inputs).
//
// No analog in the reference (its gather/scatter problems are cuSPARSE's,
// e.g. spmm.h:146-149); this is TPU-native infrastructure.

#include <cstdint>
#include <vector>

namespace {

// Split the edge subset [edges, edges+ne) of the bipartite multigraph
// (src -> dst, right nodes offset by n_left) into two halves such that
// every node's degree halves exactly.  All degrees in the subset must be
// even.  Writes bit (0/1) into bit_out[edge_id].
void euler_halve(const int32_t* src, const int32_t* dst, int32_t n_left,
                 int32_t n_right, const int32_t* edges, int64_t ne,
                 uint8_t* bit_out,
                 // scratch, reused across calls; int32 throughout — TPU
                 // hosts pay a large penalty for 64-bit random access
                 std::vector<int32_t>& head, std::vector<int32_t>& inc,
                 std::vector<int32_t>& ptr, std::vector<uint8_t>& used) {
  const int64_t n_nodes = (int64_t)n_left + n_right;
  head.assign(n_nodes + 1, 0);
  // each edge appears in both endpoints' incidence lists
  for (int64_t k = 0; k < ne; ++k) {
    const int32_t e = edges[k];
    ++head[src[e] + 1];
    ++head[(int64_t)n_left + dst[e] + 1];
  }
  for (int64_t v = 0; v < n_nodes; ++v) head[v + 1] += head[v];
  inc.resize(2 * ne);
  ptr.assign(head.begin(), head.end() - 1);
  for (int64_t k = 0; k < ne; ++k) {
    const int32_t e = edges[k];
    inc[ptr[src[e]]++] = (int32_t)k;
    inc[ptr[(int64_t)n_left + dst[e]]++] = (int32_t)k;
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
    int64_t v = src[edges[k0]];
    uint8_t parity = 0;
    int64_t k = k0;
    for (;;) {
      used[k] = 1;
      const int32_t e = edges[k];
      bit_out[e] = parity;
      parity ^= 1;
      // move to the endpoint of e that is not v
      v = (v == src[e]) ? (int64_t)n_left + dst[e] : src[e];
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
  for (int64_t e = 0; e < ne; ++e) {
    if (src[e] < 0 || src[e] >= n_left || dst[e] < 0 || dst[e] >= n_right)
      return 3;
    color_out[e] = 0;
  }
  if (d == 1) return 0;

  if (ne >= (int64_t)1 << 31) return 5;  // int32-indexed internals
  std::vector<int32_t> head, inc, ptr;
  std::vector<uint8_t> used;
  std::vector<uint8_t> bit(ne);
  std::vector<int32_t> edges(ne), half0, half1;
  for (int64_t e = 0; e < ne; ++e) edges[e] = (int32_t)e;

  // iterative recursion over color-prefix groups: groups[i] = contiguous
  // run of `edges`; each level splits every group in two.
  struct Group { int64_t off, len; int32_t depth; };
  std::vector<Group> stack{{0, ne, 0}};
  const int32_t max_depth = [] (int32_t dd) {
    int32_t b = 0; while ((1 << b) < dd) ++b; return b; } (d);

  while (!stack.empty()) {
    Group g = stack.back();
    stack.pop_back();
    if (g.depth == max_depth || g.len <= 1) continue;
    euler_halve(src, dst, n_left, n_right, edges.data() + g.off, g.len,
                bit.data(), head, inc, ptr, used);
    half0.clear(); half1.clear();
    for (int64_t k = 0; k < g.len; ++k) {
      const int32_t e = edges[g.off + k];
      if (bit[e]) {
        color_out[e] |= (1 << g.depth);
        half1.push_back(e);
      } else {
        half0.push_back(e);
      }
    }
    if ((int64_t)half0.size() != g.len / 2) return 4;  // degrees were odd
    int64_t w = g.off;
    for (int32_t e : half0) edges[w++] = e;
    for (int32_t e : half1) edges[w++] = e;
    stack.push_back({g.off, (int64_t)half0.size(), g.depth + 1});
    stack.push_back({g.off + (int64_t)half0.size(), (int64_t)half1.size(),
                     g.depth + 1});
  }
  return 0;
}

}  // extern "C"
