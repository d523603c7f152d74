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

// ---------------------------------------------------------------------------
// SBVH: binned SAH with SPATIAL splits (reference sbvh.cpp:278-324).
// References (prim id + clipped box) can be duplicated into both
// children when a primitive straddles the split plane; spatial splits
// are attempted when the object split's child overlap is a significant
// fraction of the root surface (the alpha test of Stich et al. 2009).
// ---------------------------------------------------------------------------

struct Ref {
  int64_t prim;
  float lo[3], hi[3];
};

struct SBuilder {
  std::vector<Node> nodes;
  std::vector<int64_t> leaf_prims;  // emitted leaf refs, in leaf order
  int leaf_max;
  float root_area = 1.f;
  float alpha = 1e-5f;
  int64_t max_refs = 0;  // duplication budget
  int64_t ref_budget_used = 0;

  float area(const float lo[3], const float hi[3]) const {
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }

  static void grow(float lo[3], float hi[3], const Ref& r) {
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], r.lo[a]);
      hi[a] = std::max(hi[a], r.hi[a]);
    }
  }

  int32_t build(std::vector<Ref>& refs) {
    int32_t nid = (int32_t)nodes.size();
    nodes.emplace_back();
    {
      Node& n = nodes.back();
      for (int a = 0; a < 3; ++a) { n.bmin[a] = 1e30f; n.bmax[a] = -1e30f; }
      for (const Ref& r : refs) grow(n.bmin, n.bmax, r);
    }
    const int64_t count = (int64_t)refs.size();
    if (count <= leaf_max) {
      Node& n = nodes[nid];
      n.prim_start = (int64_t)leaf_prims.size();
      n.prim_count = (int32_t)count;
      for (const Ref& r : refs) leaf_prims.push_back(r.prim);
      return nid;
    }

    // ---- object split candidate (binned SAH over ref centroids)
    float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (const Ref& r : refs)
      for (int a = 0; a < 3; ++a) {
        float c = 0.5f * (r.lo[a] + r.hi[a]);
        cmin[a] = std::min(cmin[a], c);
        cmax[a] = std::max(cmax[a], c);
      }
    int axis = 0;
    float ext = cmax[0] - cmin[0];
    for (int a = 1; a < 3; ++a)
      if (cmax[a] - cmin[a] > ext) { ext = cmax[a] - cmin[a]; axis = a; }

    float objCost = 1e30f;
    int objBest = -1;
    float objScale = 0.f;
    float objOverlapArea = 1e30f;
    if (ext > 1e-12f) {
      objScale = kNumBins * (1.0f - 1e-6f) / ext;
      int64_t cnt[kNumBins] = {0};
      float bb_lo[kNumBins][3], bb_hi[kNumBins][3];
      for (int b = 0; b < kNumBins; ++b)
        for (int a = 0; a < 3; ++a) { bb_lo[b][a] = 1e30f; bb_hi[b][a] = -1e30f; }
      for (const Ref& r : refs) {
        float c = 0.5f * (r.lo[axis] + r.hi[axis]);
        int b = (int)((c - cmin[axis]) * objScale);
        b = std::min(std::max(b, 0), kNumBins - 1);
        ++cnt[b];
        for (int a = 0; a < 3; ++a) {
          bb_lo[b][a] = std::min(bb_lo[b][a], r.lo[a]);
          bb_hi[b][a] = std::max(bb_hi[b][a], r.hi[a]);
        }
      }
      float lA[kNumBins], rA[kNumBins];
      int64_t lC[kNumBins], rC[kNumBins];
      float lLo[kNumBins][3], lHi[kNumBins][3], rLo[kNumBins][3], rHi[kNumBins][3];
      {
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        int64_t c = 0;
        for (int b = 0; b < kNumBins; ++b) {
          for (int a = 0; a < 3; ++a) {
            lo3[a] = std::min(lo3[a], bb_lo[b][a]);
            hi3[a] = std::max(hi3[a], bb_hi[b][a]);
            lLo[b][a] = lo3[a]; lHi[b][a] = hi3[a];
          }
          c += cnt[b];
          lA[b] = area(lo3, hi3);
          lC[b] = c;
        }
      }
      {
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        int64_t c = 0;
        for (int b = kNumBins - 1; b >= 0; --b) {
          for (int a = 0; a < 3; ++a) {
            lo3[a] = std::min(lo3[a], bb_lo[b][a]);
            hi3[a] = std::max(hi3[a], bb_hi[b][a]);
            rLo[b][a] = lo3[a]; rHi[b][a] = hi3[a];
          }
          c += cnt[b];
          rA[b] = area(lo3, hi3);
          rC[b] = c;
        }
      }
      for (int b = 0; b < kNumBins - 1; ++b) {
        if (lC[b] == 0 || rC[b + 1] == 0) continue;
        float cost = lA[b] * lC[b] + rA[b + 1] * rC[b + 1];
        if (cost < objCost) {
          objCost = cost;
          objBest = b;
          // child overlap box area (spatial-split trigger)
          float oLo[3], oHi[3];
          for (int a = 0; a < 3; ++a) {
            oLo[a] = std::max(lLo[b][a], rLo[b + 1][a]);
            oHi[a] = std::min(lHi[b][a], rHi[b + 1][a]);
          }
          objOverlapArea = area(oLo, oHi);
        }
      }
    }

    // ---- spatial split candidate (only when children overlap enough
    //      and the duplication budget allows it)
    float spCost = 1e30f;
    int spBest = -1;
    float spScale = 0.f;
    const Node& self = nodes[nid];
    bool try_spatial =
        objBest >= 0 && objOverlapArea > alpha * root_area &&
        ref_budget_used < max_refs;
    if (try_spatial) {
      float nlo = self.bmin[axis], nhi_ = self.bmax[axis];
      float next = nhi_ - nlo;
      if (next > 1e-12f) {
        spScale = kNumBins / next;
        // chopped bins: a ref lands in every bin its box spans
        int64_t entry[kNumBins] = {0}, exit_[kNumBins] = {0};
        float bb_lo[kNumBins][3], bb_hi[kNumBins][3];
        for (int b = 0; b < kNumBins; ++b)
          for (int a = 0; a < 3; ++a) { bb_lo[b][a] = 1e30f; bb_hi[b][a] = -1e30f; }
        for (const Ref& r : refs) {
          int b0 = (int)((r.lo[axis] - nlo) * spScale);
          int b1 = (int)((r.hi[axis] - nlo) * spScale);
          b0 = std::min(std::max(b0, 0), kNumBins - 1);
          b1 = std::min(std::max(b1, 0), kNumBins - 1);
          ++entry[b0];
          ++exit_[b1];
          for (int b = b0; b <= b1; ++b) {
            // clip ref box to the bin slab
            Ref c = r;
            float s0 = nlo + b / spScale, s1 = nlo + (b + 1) / spScale;
            c.lo[axis] = std::max(r.lo[axis], s0);
            c.hi[axis] = std::min(r.hi[axis], s1);
            grow_bin(bb_lo[b], bb_hi[b], c);
          }
        }
        float lA[kNumBins];
        int64_t lC[kNumBins];
        {
          float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
          int64_t c = 0;
          for (int b = 0; b < kNumBins; ++b) {
            for (int a = 0; a < 3; ++a) {
              lo3[a] = std::min(lo3[a], bb_lo[b][a]);
              hi3[a] = std::max(hi3[a], bb_hi[b][a]);
            }
            c += entry[b];
            lA[b] = area(lo3, hi3);
            lC[b] = c;
          }
        }
        {
          float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
          int64_t c = 0;
          float rA;
          for (int b = kNumBins - 1; b >= 1; --b) {
            for (int a = 0; a < 3; ++a) {
              lo3[a] = std::min(lo3[a], bb_lo[b][a]);
              hi3[a] = std::max(hi3[a], bb_hi[b][a]);
            }
            c += exit_[b];
            rA = area(lo3, hi3);
            if (lC[b - 1] == 0 || c == 0) continue;
            float cost = lA[b - 1] * lC[b - 1] + rA * c;
            if (cost < spCost) { spCost = cost; spBest = b; }
          }
        }
      }
    }

    std::vector<Ref> lrefs, rrefs;
    if (spBest > 0 && spCost < objCost) {
      // spatial split at plane spBest: straddlers clipped into both
      const float nlo = self.bmin[axis];
      const float plane = nlo + spBest / spScale;
      for (const Ref& r : refs) {
        if (r.hi[axis] <= plane) {
          lrefs.push_back(r);
        } else if (r.lo[axis] >= plane) {
          rrefs.push_back(r);
        } else {
          Ref a = r, b = r;
          a.hi[axis] = plane;
          b.lo[axis] = plane;
          lrefs.push_back(a);
          rrefs.push_back(b);
        }
      }
      // reject degenerate spatial splits: a child as large as the
      // parent (all refs straddle) would recurse forever, and blowing
      // the duplication budget would overflow the caller's arrays
      int64_t dup = (int64_t)(lrefs.size() + rrefs.size()) - count;
      if (lrefs.empty() || rrefs.empty() ||
          (int64_t)lrefs.size() >= count || (int64_t)rrefs.size() >= count ||
          ref_budget_used + dup > max_refs) {
        lrefs.clear();
        rrefs.clear();
      } else {
        ref_budget_used += dup;
      }
    }
    if (lrefs.empty() && rrefs.empty()) {
      if (objBest >= 0) {
        for (const Ref& r : refs) {
          float c = 0.5f * (r.lo[axis] + r.hi[axis]);
          int b = (int)((c - cmin[axis]) * objScale);
          b = std::min(std::max(b, 0), kNumBins - 1);
          (b <= objBest ? lrefs : rrefs).push_back(r);
        }
      }
      if (lrefs.empty() || rrefs.empty()) {  // degenerate: median split
        lrefs.clear(); rrefs.clear();
        for (size_t i = 0; i < refs.size(); ++i)
          (i < refs.size() / 2 ? lrefs : rrefs).push_back(refs[i]);
      }
    }
    refs.clear();
    refs.shrink_to_fit();
    int32_t l = build(lrefs);
    { std::vector<Ref>().swap(lrefs); }
    int32_t r = build(rrefs);
    nodes[nid].left = l;
    nodes[nid].right = r;
    return nid;
  }

  static void grow_bin(float lo[3], float hi[3], const Ref& r) {
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], r.lo[a]);
      hi[a] = std::max(hi[a], r.hi[a]);
    }
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

// SBVH build with spatial splits.  Output arrays must hold cap_nodes
// node slots and cap_prims prim slots (duplicated references!); returns
// node count K and writes the emitted reference count to *out_num_refs.
// Fails (returns -1) if capacities would be exceeded.
int64_t aten_build_sbvh(
    const float* bmin, const float* bmax, int64_t P, int32_t leaf_max,
    float alpha, int64_t cap_nodes, int64_t cap_prims,
    float* out_nbmin, float* out_nbmax, int32_t* out_hit, int32_t* out_miss,
    int32_t* out_pstart, int32_t* out_pcount, int32_t* out_prim_order,
    int64_t* out_num_refs) {
  SBuilder b;
  b.leaf_max = leaf_max;
  b.alpha = alpha;
  b.max_refs = cap_prims - P;  // duplication budget
  std::vector<Ref> refs(P);
  float rlo[3] = {1e30f, 1e30f, 1e30f}, rhi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t p = 0; p < P; ++p) {
    refs[p].prim = p;
    for (int a = 0; a < 3; ++a) {
      refs[p].lo[a] = bmin[3 * p + a];
      refs[p].hi[a] = bmax[3 * p + a];
      rlo[a] = std::min(rlo[a], refs[p].lo[a]);
      rhi[a] = std::max(rhi[a], refs[p].hi[a]);
    }
  }
  b.root_area = b.area(rlo, rhi);
  b.nodes.reserve(2 * P);
  b.leaf_prims.reserve(P + P / 4);
  b.build(refs);

  const int64_t K = (int64_t)b.nodes.size();
  const int64_t R = (int64_t)b.leaf_prims.size();
  if (K > cap_nodes || R > cap_prims) return -1;

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
        out_prim_order[pcur + k] = (int32_t)b.leaf_prims[n.prim_start + k];
      out_pstart[i] = (int32_t)pcur;
      out_pcount[i] = n.prim_count;
      pcur += n.prim_count;
      out_hit[i] = skip_pos;
      out_miss[i] = skip_pos;
    }
  }
  *out_num_refs = R;
  return K;
}

}  // extern "C"
