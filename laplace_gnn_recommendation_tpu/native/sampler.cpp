// Native host-side graph samplers.
//
// The reference's sampling hot path is per-user Python in DataLoader worker
// processes (data/dataset.py:39-182) dispatching into PyG/DGL C++ kernels;
// this library is the TPU build's native equivalent: the N-hop BFS
// (fetch_n_hop_neighbourhood, data/dataset.py:258-293) and the PinSAGE
// random-walk importance frontier (dgl.sampling.PinSAGESampler semantics,
// pinsage/sampler.py:60-71) as C++ over CSR arrays, OpenMP-parallel across
// the seeds of a batch. Python binds via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp sampler.cpp -o libsampler.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// splitmix64 — deterministic, seedable, fast.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // unbiased bounded draw (Lemire)
  uint64_t bounded(uint64_t n) {
    if (n == 0) return 0;
    __uint128_t m = (__uint128_t)next() * (__uint128_t)n;
    return (uint64_t)(m >> 64);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// sample min(n, k) distinct elements from arr[0..n) without replacement
// (partial Fisher-Yates on a scratch copy).
void sample_cut(const int32_t* arr, int64_t n, int64_t k, Rng& rng,
                std::vector<int32_t>& out) {
  out.clear();
  if (n <= k) {
    out.assign(arr, arr + n);
    return;
  }
  std::vector<int32_t> scratch(arr, arr + n);
  for (int64_t i = 0; i < k; ++i) {
    int64_t j = i + (int64_t)rng.bounded((uint64_t)(n - i));
    std::swap(scratch[i], scratch[j]);
    out.push_back(scratch[i]);
  }
}

}  // namespace

extern "C" {

// N-hop BFS neighborhoods for a batch of seed users.
//
// Per seed: hop edges (excluding the seed's own direct edges, which the
// caller adds as positive edges), frontier capped at num_neighbors articles
// and num_neighbors users per hop, users explored at most once — exactly the
// semantics of fetch_n_hop_neighbourhood (data/dataset.py:258-293).
//
// Outputs: flat (src, dst) arrays; out_offsets[i]..out_offsets[i+1] is seed
// i's slice. Returns 0 on success, -1 if max_edges was exceeded (callers
// should retry with a larger buffer; counts are still valid up to the
// failing seed).
int64_t nhop_sample(
    const int64_t* user_row_ptr, const int32_t* user_cols,
    const int64_t* item_row_ptr, const int32_t* item_cols,
    int64_t num_users, int64_t /*num_items*/,
    const int32_t* seeds, int64_t num_seeds,
    int32_t n_hops, int32_t num_neighbors,
    uint64_t rng_seed,
    int32_t* out_src, int32_t* out_dst, int64_t max_edges,
    int64_t* out_offsets) {
  std::vector<std::vector<int32_t>> srcs(num_seeds), dsts(num_seeds);

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    // generation-stamped membership arrays: O(1) dedup with no hashing
    // (the per-hop user unions touch O(articles · item_degree) entries)
    std::vector<int64_t> explored_stamp(num_users, -1);
    std::vector<int64_t> seen_stamp(num_users, -1);
    std::vector<int32_t> new_articles, articles_queue, cut_buf, queue, new_users;

#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int64_t s = 0; s < num_seeds; ++s) {
      Rng rng(rng_seed * 0x9e3779b97f4a7c15ULL + (uint64_t)s * 0xda942042e4dd58b5ULL);
      const int64_t gen = s;  // one generation per seed
      queue.assign(1, seeds[s]);
      explored_stamp[seeds[s]] = gen;

      for (int32_t hop = 0; hop < n_hops; ++hop) {
        if (queue.empty()) break;
        new_articles.clear();
        for (int32_t u : queue) {
          const int64_t lo = user_row_ptr[u], hi = user_row_ptr[u + 1];
          for (int64_t e = lo; e < hi; ++e) {
            const int32_t a = user_cols[e];
            new_articles.push_back(a);
            if (hop != 0) {
              srcs[s].push_back(u);
              dsts[s].push_back(a);
            }
          }
        }
        sample_cut(new_articles.data(), (int64_t)new_articles.size(),
                   num_neighbors, rng, articles_queue);
        new_users.clear();
        for (int32_t a : articles_queue) {
          const int64_t lo = item_row_ptr[a], hi = item_row_ptr[a + 1];
          for (int64_t e = lo; e < hi; ++e) {
            const int32_t u2 = item_cols[e];
            if (explored_stamp[u2] != gen && seen_stamp[u2] != gen) {
              seen_stamp[u2] = gen;
              new_users.push_back(u2);
            }
          }
        }
        std::sort(new_users.begin(), new_users.end());  // determinism
        sample_cut(new_users.data(), (int64_t)new_users.size(), num_neighbors,
                   rng, cut_buf);
        for (int32_t u2 : cut_buf) explored_stamp[u2] = gen;
        queue = cut_buf;
      }
    }
  }

  int64_t total = 0;
  out_offsets[0] = 0;
  for (int64_t s = 0; s < num_seeds; ++s) {
    const int64_t n = (int64_t)srcs[s].size();
    if (total + n > max_edges) return -1;
    std::memcpy(out_src + total, srcs[s].data(), n * sizeof(int32_t));
    std::memcpy(out_dst + total, dsts[s].data(), n * sizeof(int32_t));
    total += n;
    out_offsets[s + 1] = total;
  }
  return total;
}

// PinSAGE random-walk importance frontier.
//
// Per seed item: num_walks walks, each walk_length item→user→item
// traversals with restart probability; visit counts of reached items
// (excluding the seed) are ranked, top num_neighbors become the frontier
// with counts as weights — dgl.sampling.PinSAGESampler semantics.
//
// Outputs per seed i occupy slots [i*num_neighbors, (i+1)*num_neighbors);
// unused slots have weight 0.
void pinsage_frontier(
    const int64_t* user_row_ptr, const int32_t* user_cols,   // user→items
    const int64_t* item_row_ptr, const int32_t* item_cols,   // item→users
    const int32_t* seeds, int64_t num_seeds,
    int32_t walk_length, double restart_prob,
    int32_t num_walks, int32_t num_neighbors,
    uint64_t rng_seed,
    int32_t* out_src, float* out_w) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t s = 0; s < num_seeds; ++s) {
    Rng rng(rng_seed * 0xda942042e4dd58b5ULL + (uint64_t)s * 0x9e3779b97f4a7c15ULL);
    const int32_t seed_item = seeds[s];
    std::unordered_map<int32_t, int32_t> counts;
    for (int32_t w = 0; w < num_walks; ++w) {
      int32_t cur = seed_item;
      for (int32_t step = 0; step < walk_length; ++step) {
        // item → user
        const int64_t ulo = item_row_ptr[cur], uhi = item_row_ptr[cur + 1];
        if (uhi == ulo) break;
        const int32_t u = item_cols[ulo + (int64_t)rng.bounded((uint64_t)(uhi - ulo))];
        // user → item
        const int64_t ilo = user_row_ptr[u], ihi = user_row_ptr[u + 1];
        if (ihi == ilo) break;
        const int32_t it = user_cols[ilo + (int64_t)rng.bounded((uint64_t)(ihi - ilo))];
        counts[it] += 1;
        cur = (rng.uniform() < restart_prob) ? seed_item : it;
      }
    }
    counts.erase(seed_item);
    std::vector<std::pair<int32_t, int32_t>> top(counts.begin(), counts.end());
    std::sort(top.begin(), top.end(), [](const auto& a, const auto& b) {
      return a.second != b.second ? a.second > b.second : a.first < b.first;
    });
    const int64_t base = s * num_neighbors;
    for (int32_t j = 0; j < num_neighbors; ++j) {
      if ((size_t)j < top.size()) {
        out_src[base + j] = top[j].first;
        out_w[base + j] = (float)top[j].second;
      } else {
        out_src[base + j] = 0;
        out_w[base + j] = 0.0f;
      }
    }
  }
}

// One item→user→item metapath step for a batch of items (the tail draw of
// ItemToItemBatchSampler, pinsage/sampler.py:30-34). Dead ends → -1.
void walk_step(
    const int64_t* user_row_ptr, const int32_t* user_cols,
    const int64_t* item_row_ptr, const int32_t* item_cols,
    const int32_t* items, int64_t n, uint64_t rng_seed, int32_t* out) {
  Rng rng(rng_seed);
  for (int64_t i = 0; i < n; ++i) {
    out[i] = -1;
    const int32_t it = items[i];
    if (it < 0) continue;
    const int64_t ulo = item_row_ptr[it], uhi = item_row_ptr[it + 1];
    if (uhi == ulo) continue;
    const int32_t u = item_cols[ulo + (int64_t)rng.bounded((uint64_t)(uhi - ulo))];
    const int64_t ilo = user_row_ptr[u], ihi = user_row_ptr[u + 1];
    if (ihi == ilo) continue;
    out[i] = user_cols[ilo + (int64_t)rng.bounded((uint64_t)(ihi - ilo))];
  }
}

}  // extern "C"
