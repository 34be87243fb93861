// Native BVH build core: Morton codes + radix sort + Karras 2012 radix tree.
//
// The runtime role nvvk::AccelerationStructureBuilder plays in the reference
// (BLAS/TLAS construction, gltf_scene_rtx.cpp) — here as a host-side C++
// library the Python layer calls through ctypes. The Python/numpy
// implementation (ops/bvh.py) remains the reference oracle and fallback;
// this exists because scene (re)builds sit on the interactive path (load,
// geometry edits) and million-triangle scenes want native speed + threads.
//
// Exported C ABI:
//   vkgr_build_radix_tree(n, tlo, thi, cen,          // [n,3] f32 each
//                         order,                      // out [n]   i32
//                         left, right, leaf_l, leaf_r)// out [n-1] i32/u8
// Children index leaves (sorted positions) when the flag is set, else
// internal nodes. Returns 0 on success.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint64_t expand_bits_10(uint64_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

inline uint64_t morton3d(float x, float y, float z) {
  auto q = [](float f) {
    float c = f * 1024.0f;
    if (c < 0) c = 0;
    if (c > 1023.0f) c = 1023.0f;
    return (uint64_t)c;
  };
  return (expand_bits_10(q(x)) << 2) | (expand_bits_10(q(y)) << 1) | expand_bits_10(q(z));
}

inline int clz64(uint64_t x) { return x ? __builtin_clzll(x) : 64; }

struct Tree {
  const uint64_t* keys;
  int64_t n;
  int delta(int64_t i, int64_t j) const {
    if (j < 0 || j >= n) return -1;
    return clz64(keys[i] ^ keys[j]);
  }
};

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  unsigned nt = (n < 4096) ? 1 : std::min<unsigned>(hw, 16);
  if (nt == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t a = t * chunk, b = std::min<int64_t>(n, a + chunk);
    if (a >= b) break;
    ts.emplace_back([&, a, b] { fn(a, b); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" int vkgr_build_radix_tree(
    int64_t n,
    const float* tlo, const float* thi, const float* cen,
    int32_t* order_out,
    int32_t* left, int32_t* right,
    uint8_t* leaf_l, uint8_t* leaf_r) {
  if (n <= 0) return 1;

  // scene bounds over centroids (for morton quantization)
  float lo[3] = {cen[0], cen[1], cen[2]};
  float hi[3] = {cen[0], cen[1], cen[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      float v = cen[i * 3 + k];
      if (v < lo[k]) lo[k] = v;
      if (v > hi[k]) hi[k] = v;
    }
  float ext[3];
  for (int k = 0; k < 3; ++k) {
    ext[k] = hi[k] - lo[k];
    if (ext[k] < 1e-12f) ext[k] = 1e-12f;
  }

  // morton keys (parallel)
  std::vector<std::pair<uint64_t, int32_t>> tagged(n);
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      float x = (cen[i * 3 + 0] - lo[0]) / ext[0];
      float y = (cen[i * 3 + 1] - lo[1]) / ext[1];
      float z = (cen[i * 3 + 2] - lo[2]) / ext[2];
      tagged[i] = {morton3d(x, y, z), (int32_t)i};
    }
  });
  std::sort(tagged.begin(), tagged.end());

  std::vector<uint64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    order_out[i] = tagged[i].second;
    keys[i] = (tagged[i].first << 32) | (uint64_t)i;  // unique keys
  }
  if (n == 1) return 0;

  Tree tr{keys.data(), n};

  // Karras: one pass per internal node, fully parallel
  parallel_for(n - 1, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      int d = (tr.delta(i, i + 1) - tr.delta(i, i - 1)) >= 0 ? 1 : -1;
      int dmin = tr.delta(i, i - d);
      int64_t lmax = 2;
      while (tr.delta(i, i + lmax * d) > dmin) lmax <<= 1;
      int64_t l = 0;
      for (int64_t t = lmax >> 1; t >= 1; t >>= 1)
        if (tr.delta(i, i + (l + t) * d) > dmin) l += t;
      int64_t j = i + l * d;
      int dnode = tr.delta(i, j);
      int64_t s = 0;
      int64_t div = 2;
      for (int64_t t = (l + 1) / 2;; t = (l + div - 1) / div) {
        if (t > 0 && tr.delta(i, i + (s + t) * d) > dnode) s += t;
        if (t <= 1) break;
        div <<= 1;
      }
      int64_t gamma = i + s * d + std::min<int64_t>(d, 0);
      int64_t lo_ij = std::min(i, j), hi_ij = std::max(i, j);
      left[i] = (int32_t)gamma;
      right[i] = (int32_t)(gamma + 1);
      leaf_l[i] = lo_ij == gamma;
      leaf_r[i] = hi_ij == gamma + 1;
    }
  });
  return 0;
}

extern "C" const char* vkgr_version() { return "vkgr-native-bvh 1.0"; }
