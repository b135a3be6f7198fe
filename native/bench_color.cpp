// Standalone benchmark driver for the edge-coloring core (route.cpp).
// Builds the worst-case top-level instance the route builder produces —
// a fully random permutation of N = 128^3*7 elements viewed as a
// (R, 128) grid — and times sblas_edge_color on it.  Host-side tool
// only; not part of libsblasio.so.
//
//   g++ -O3 -march=native -std=c++17 -o bench_color bench_color.cpp route.cpp
//   ./bench_color [n_scale]

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" int sblas_edge_color(int32_t n_left, int32_t n_right, int64_t ne,
                                int32_t d, const int32_t* src,
                                const int32_t* dst, int32_t* color_out);

int main(int argc, char** argv) {
  const int64_t scale = argc > 1 ? atoll(argv[1]) : 7;
  const int64_t N = 128LL * 128 * 128 * scale;
  const int32_t R = (int32_t)(N / 128);

  std::vector<int32_t> perm(N);
  for (int64_t i = 0; i < N; ++i) perm[i] = (int32_t)i;
  std::mt19937_64 rng(0);
  std::shuffle(perm.begin(), perm.end(), rng);

  std::vector<int32_t> src(N), dst(N), color(N);
  for (int64_t i = 0; i < N; ++i) {
    src[i] = perm[i] >> 7;
    dst[i] = (int32_t)(i >> 7);
  }

  const auto t0 = std::chrono::steady_clock::now();
  const int rc = sblas_edge_color(R, R, N, 128, src.data(), dst.data(),
                                  color.data());
  const auto t1 = std::chrono::steady_clock::now();
  const double s = std::chrono::duration<double>(t1 - t0).count();
  printf("edge_color ne=%lld rc=%d: %.2f s\n", (long long)N, rc, s);
  if (rc != 0) return rc;

  // validity: each dst row and each src row sees every color exactly once
  std::vector<uint8_t> seen(R * 128ULL, 0);
  for (int64_t i = 0; i < N; ++i) {
    const int64_t cell = (int64_t)dst[i] * 128 + color[i];
    if (seen[cell]++) { printf("INVALID dst row %d\n", dst[i]); return 10; }
  }
  std::fill(seen.begin(), seen.end(), 0);
  for (int64_t i = 0; i < N; ++i) {
    const int64_t cell = (int64_t)src[i] * 128 + color[i];
    if (seen[cell]++) { printf("INVALID src row %d\n", src[i]); return 11; }
  }
  printf("valid\n");
  return 0;
}
