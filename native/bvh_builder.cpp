// Native binned-SAH threaded-BVH builder.
//
// Counterpart of the reference's host-side builders (binned SAH
// src/libaten/accelerator/bvh.cpp:213-371 and the spatial-split SBVH
// sbvh.cpp:130-324), which are C++ for the same reason this is: tree
// construction is irregular pointer-chasing host work that Python/NumPy
// handles poorly at 100k+ primitives.  Emits the same flat hit/miss-link
// arrays as aten_tpu/accel/build.py (the oracle for parity tests); the
// Python loader falls back to the NumPy builder when the shared library
// is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbvh.so bvh_builder.cpp
// ABI: plain C arrays, caller allocates 2*P node slots.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Node {
  float bmin[3], bmax[3];
  int32_t left = -1, right = -1;
  int64_t prim_start = -1;  // into the order array
  int32_t prim_count = 0;
};

constexpr int kNumBins = 16;

struct Builder {
  const float* bmin;
  const float* bmax;
  std::vector<float> cent;
  std::vector<int64_t> order;   // permuted primitive ids (build scratch)
  std::vector<Node> nodes;
  int leaf_max;

  float area(const float lo[3], const float hi[3]) const {
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }

  int32_t build(int64_t lo, int64_t hi) {  // [lo, hi) into order
    int32_t nid = (int32_t)nodes.size();
    nodes.emplace_back();
    {
      Node& n = nodes.back();
      for (int a = 0; a < 3; ++a) { n.bmin[a] = 1e30f; n.bmax[a] = -1e30f; }
      for (int64_t i = lo; i < hi; ++i) {
        int64_t p = order[i];
        for (int a = 0; a < 3; ++a) {
          n.bmin[a] = std::min(n.bmin[a], bmin[3 * p + a]);
          n.bmax[a] = std::max(n.bmax[a], bmax[3 * p + a]);
        }
      }
    }
    int64_t count = hi - lo;
    if (count <= leaf_max) {
      Node& n = nodes[nid];
      n.prim_start = lo;
      n.prim_count = (int32_t)count;
      return nid;
    }

    // centroid bounds
    float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = lo; i < hi; ++i) {
      const float* c = &cent[3 * order[i]];
      for (int a = 0; a < 3; ++a) {
        cmin[a] = std::min(cmin[a], c[a]);
        cmax[a] = std::max(cmax[a], c[a]);
      }
    }
    int axis = 0;
    float ext = cmax[0] - cmin[0];
    for (int a = 1; a < 3; ++a)
      if (cmax[a] - cmin[a] > ext) { ext = cmax[a] - cmin[a]; axis = a; }

    int64_t mid;
    if (ext <= 1e-12f) {
      mid = lo + count / 2;  // degenerate: median split
    } else {
      // binned SAH
      float scale = kNumBins * (1.0f - 1e-6f) / ext;
      int64_t cnt[kNumBins] = {0};
      float bb_lo[kNumBins][3], bb_hi[kNumBins][3];
      for (int b = 0; b < kNumBins; ++b)
        for (int a = 0; a < 3; ++a) { bb_lo[b][a] = 1e30f; bb_hi[b][a] = -1e30f; }
      for (int64_t i = lo; i < hi; ++i) {
        int64_t p = order[i];
        int b = (int)((cent[3 * p + axis] - cmin[axis]) * scale);
        b = std::min(std::max(b, 0), kNumBins - 1);
        ++cnt[b];
        for (int a = 0; a < 3; ++a) {
          bb_lo[b][a] = std::min(bb_lo[b][a], bmin[3 * p + a]);
          bb_hi[b][a] = std::max(bb_hi[b][a], bmax[3 * p + a]);
        }
      }
      // sweeps
      float lArea[kNumBins], rArea[kNumBins];
      int64_t lCnt[kNumBins], rCnt[kNumBins];
      {
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        int64_t c = 0;
        for (int b = 0; b < kNumBins; ++b) {
          for (int a = 0; a < 3; ++a) {
            lo3[a] = std::min(lo3[a], bb_lo[b][a]);
            hi3[a] = std::max(hi3[a], bb_hi[b][a]);
          }
          c += cnt[b];
          lArea[b] = area(lo3, hi3);
          lCnt[b] = c;
        }
      }
      {
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        int64_t c = 0;
        for (int b = kNumBins - 1; b >= 0; --b) {
          for (int a = 0; a < 3; ++a) {
            lo3[a] = std::min(lo3[a], bb_lo[b][a]);
            hi3[a] = std::max(hi3[a], bb_hi[b][a]);
          }
          c += cnt[b];
          rArea[b] = area(lo3, hi3);
          rCnt[b] = c;
        }
      }
      int best = -1;
      float bestCost = 1e30f;
      for (int b = 0; b < kNumBins - 1; ++b) {
        if (lCnt[b] == 0 || rCnt[b + 1] == 0) continue;
        float cost = lArea[b] * lCnt[b] + rArea[b + 1] * rCnt[b + 1];
        if (cost < bestCost) { bestCost = cost; best = b; }
      }
      if (best < 0) {
        mid = lo + count / 2;
      } else {
        // partition by bin
        auto it = std::partition(
            order.begin() + lo, order.begin() + hi, [&](int64_t p) {
              int b = (int)((cent[3 * p + axis] - cmin[axis]) * scale);
              b = std::min(std::max(b, 0), kNumBins - 1);
              return b <= best;
            });
        mid = it - order.begin();
        if (mid == lo || mid == hi) mid = lo + count / 2;
      }
    }
    int32_t l = build(lo, mid);
    int32_t r = build(mid, hi);
    nodes[nid].left = l;
    nodes[nid].right = r;
    return nid;
  }
};

}  // namespace

extern "C" {

// Returns node count K (<= 2*P). Output arrays must hold 2*P entries
// (3 floats each for the box arrays); prim_order holds P int32.
int64_t aten_build_bvh(
    const float* bmin, const float* bmax, int64_t P, int32_t leaf_max,
    float* out_nbmin, float* out_nbmax, int32_t* out_hit, int32_t* out_miss,
    int32_t* out_pstart, int32_t* out_pcount, int32_t* out_prim_order) {
  Builder b;
  b.bmin = bmin;
  b.bmax = bmax;
  b.leaf_max = leaf_max;
  b.cent.resize(3 * P);
  for (int64_t p = 0; p < P; ++p)
    for (int a = 0; a < 3; ++a)
      b.cent[3 * p + a] = 0.5f * (bmin[3 * p + a] + bmax[3 * p + a]);
  b.order.resize(P);
  for (int64_t p = 0; p < P; ++p) b.order[p] = p;
  b.nodes.reserve(2 * P);
  b.build(0, P);

  // Pre-order flatten with hit/miss (skip) links; leaves emit contiguous
  // prim ranges so the traversers' [start, count) contract holds.
  const int64_t K = (int64_t)b.nodes.size();
  std::vector<int32_t> flat_of(K, -1);
  struct Item { int32_t tree; int32_t skip; };
  std::vector<Item> stack;
  stack.push_back({0, -1});
  std::vector<int32_t> order_pos(K), skip_tree(K);
  int32_t pos = 0;
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    order_pos[pos] = it.tree;
    flat_of[it.tree] = pos;
    skip_tree[pos] = it.skip;
    ++pos;
    const Node& n = b.nodes[it.tree];
    if (n.prim_start < 0) {
      stack.push_back({n.right, it.skip});
      stack.push_back({n.left, n.right});
    }
  }

  int64_t pcur = 0;
  for (int32_t i = 0; i < K; ++i) {
    const Node& n = b.nodes[order_pos[i]];
    std::memcpy(out_nbmin + 3 * i, n.bmin, 12);
    std::memcpy(out_nbmax + 3 * i, n.bmax, 12);
    int32_t skip = skip_tree[i];
    int32_t skip_pos = skip < 0 ? -1 : flat_of[skip];
    if (n.prim_start < 0) {
      out_hit[i] = i + 1;
      out_miss[i] = skip_pos;
      out_pstart[i] = -1;
      out_pcount[i] = 0;
    } else {
      for (int32_t k = 0; k < n.prim_count; ++k)
        out_prim_order[pcur + k] = (int32_t)b.order[n.prim_start + k];
      out_pstart[i] = (int32_t)pcur;
      out_pcount[i] = n.prim_count;
      pcur += n.prim_count;
      out_hit[i] = skip_pos;
      out_miss[i] = skip_pos;
    }
  }
  return K;
}

}  // extern "C"
