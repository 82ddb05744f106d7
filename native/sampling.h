// Shared sampling core for the native graph builder and the async pipeline.
//
// Batched connected Erdos-Renyi adjacency sampling with the reference's
// connectivity-repair semantics (bridge consecutive components via their smallest
// vertex; gnn_dlasso_progressive.py:181-191 in the reference repo). Header-only so
// graph_builder.cc (synchronous API) and pipeline.cc (threaded prefetcher) compile
// into one shared library with identical per-seed output.

#ifndef DADMM_NATIVE_SAMPLING_H_
#define DADMM_NATIVE_SAMPLING_H_

#include <cstdint>
#include <cstring>
#include <vector>

namespace dadmm {

// splitmix64: tiny, seedable, no libstdc++ RNG state costs.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * (1.0 / 9007199254740992.0);
  }
};

// Union-find over P vertices for the connectivity repair.
struct DSU {
  std::vector<int32_t> parent, rank_;
  explicit DSU(int32_t n) : parent(n), rank_(n, 0) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  bool unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return false;
    if (rank_[a] < rank_[b]) { int32_t t = a; a = b; b = t; }
    parent[b] = a;
    if (rank_[a] == rank_[b]) ++rank_[a];
    return true;
  }
};

inline void sample_one(SplitMix64& rng, int32_t P, double prob, float* adj) {
  std::memset(adj, 0, sizeof(float) * P * P);
  DSU dsu(P);
  for (int32_t i = 0; i < P; ++i) {
    for (int32_t j = i + 1; j < P; ++j) {
      if (rng.uniform() < prob) {
        adj[i * P + j] = 1.0f;
        adj[j * P + i] = 1.0f;
        dsu.unite(i, j);
      }
    }
  }
  // Connectivity repair: bridge consecutive components via their smallest vertex
  // (matches ops/graphs.py:repair_connectivity — components ordered by smallest
  // member, representative = that smallest member).
  std::vector<int32_t> reps;  // smallest vertex of each component, ascending
  std::vector<char> seen_root(P, 0);
  for (int32_t v = 0; v < P; ++v) {
    int32_t r = dsu.find(v);
    if (!seen_root[r]) {
      seen_root[r] = 1;
      reps.push_back(v);  // v is the smallest vertex of its component
    }
  }
  for (size_t c = 1; c < reps.size(); ++c) {
    int32_t a = reps[c - 1], b = reps[c];
    adj[a * P + b] = 1.0f;
    adj[b * P + a] = 1.0f;
    dsu.unite(a, b);
  }
}

// One full batch from one seed — the unit of work for both the synchronous API and
// the pipeline. Pure function of (seed, batch, P, prob), so the threaded producer is
// bitwise-deterministic regardless of scheduling.
inline void sample_batch(uint64_t seed, int32_t batch, int32_t P, double prob,
                         float* out) {
  SplitMix64 rng(seed ^ 0xa5a5a5a5deadbeefULL);
  for (int32_t b = 0; b < batch; ++b) {
    sample_one(rng, P, prob, out + static_cast<size_t>(b) * P * P);
  }
}

}  // namespace dadmm

#endif  // DADMM_NATIVE_SAMPLING_H_
