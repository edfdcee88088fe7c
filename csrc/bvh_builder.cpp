// Native BVH builder: binned-SAH BVH2 + greedy 4-wide collapse.
//
// The reference builds its BVH in Rust on the CPU on every scene
// (re)build (``/root/reference/src/graphics/bvh.rs`` binned SAH,
// ``bvh4.rs`` 2->4 collapse).  This is the framework's native-runtime
// analog: scene builds are host-side latency, so the builder is C++
// with a C ABI consumed via ctypes (``ops/bvh_native.py``); the pure
// NumPy builder in ``ops/bvh.py`` remains the portable fallback and
// the reference for tests.
//
// Layout contract (must match ops/bvh.py):
//   bounds4: (M, 4, 6) float32 child AABBs [lo, hi]
//   child4 : (M, 4) int32; >=0 internal node index,
//            <0 leaf: -(first*64 + count + 1); -1 == empty slot
//   order  : (N,) int64 permutation of input primitive ids,
//            leaf-contiguous
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbvh.so bvh_builder.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int LEAF_MAX = 4;
constexpr int COUNT_BITS = 64;
constexpr int EMPTY = -1;

struct Node2 {
  float lo[3], hi[3];
  int left = -1;    // internal: child index (children adjacent)
  int64_t first = -1;  // leaf: primitive range in `order`
  int count = 0;
  bool leaf() const { return count > 0; }
};

inline float surface(const float lo[3], const float hi[3]) {
  float dx = std::max(hi[0] - lo[0], 0.f);
  float dy = std::max(hi[1] - lo[1], 0.f);
  float dz = std::max(hi[2] - lo[2], 0.f);
  return 2.f * (dx * dy + dy * dz + dz * dx);
}

struct Builder {
  const float* lo;
  const float* hi;
  int64_t n;
  int num_bins;
  std::vector<float> cent;        // (n, 3)
  std::vector<Node2> nodes;
  std::vector<int64_t> order_out;

  void node_bounds(Node2& nd, const int64_t* ids, int64_t m) {
    for (int k = 0; k < 3; ++k) {
      nd.lo[k] = std::numeric_limits<float>::infinity();
      nd.hi[k] = -std::numeric_limits<float>::infinity();
    }
    for (int64_t i = 0; i < m; ++i) {
      const float* l = lo + 3 * ids[i];
      const float* h = hi + 3 * ids[i];
      for (int k = 0; k < 3; ++k) {
        nd.lo[k] = std::min(nd.lo[k], l[k]);
        nd.hi[k] = std::max(nd.hi[k], h[k]);
      }
    }
  }

  // Binned SAH over the longest centroid axis (bvh.rs:254-370 algorithm).
  // Returns the partition point, or -1 to make a leaf.
  int64_t split(int64_t* ids, int64_t m, const Node2& nd) {
    float cmin[3], cmax[3];
    for (int k = 0; k < 3; ++k) {
      cmin[k] = std::numeric_limits<float>::infinity();
      cmax[k] = -std::numeric_limits<float>::infinity();
    }
    for (int64_t i = 0; i < m; ++i) {
      const float* c = cent.data() + 3 * ids[i];
      for (int k = 0; k < 3; ++k) {
        cmin[k] = std::min(cmin[k], c[k]);
        cmax[k] = std::max(cmax[k], c[k]);
      }
    }
    int axis = 0;
    float ext = cmax[0] - cmin[0];
    for (int k = 1; k < 3; ++k) {
      if (cmax[k] - cmin[k] > ext) { ext = cmax[k] - cmin[k]; axis = k; }
    }

    if (ext > 1e-12f) {
      const int B = num_bins;
      std::vector<int64_t> counts(B, 0);
      std::vector<float> blo(B * 3, std::numeric_limits<float>::infinity());
      std::vector<float> bhi(B * 3, -std::numeric_limits<float>::infinity());
      const float scale = B / ext;
      for (int64_t i = 0; i < m; ++i) {
        const float* c = cent.data() + 3 * ids[i];
        int b = std::min<int>((int)((c[axis] - cmin[axis]) * scale), B - 1);
        counts[b]++;
        const float* l = lo + 3 * ids[i];
        const float* h = hi + 3 * ids[i];
        for (int k = 0; k < 3; ++k) {
          blo[b * 3 + k] = std::min(blo[b * 3 + k], l[k]);
          bhi[b * 3 + k] = std::max(bhi[b * 3 + k], h[k]);
        }
      }
      // suffix sweep
      std::vector<float> rlo(B * 3), rhi(B * 3);
      std::vector<int64_t> rn(B, 0);
      float curl[3], curh[3];
      int64_t curn = 0;
      for (int k = 0; k < 3; ++k) {
        curl[k] = std::numeric_limits<float>::infinity();
        curh[k] = -std::numeric_limits<float>::infinity();
      }
      for (int b = B - 1; b >= 0; --b) {
        curn += counts[b];
        for (int k = 0; k < 3; ++k) {
          curl[k] = std::min(curl[k], blo[b * 3 + k]);
          curh[k] = std::max(curh[k], bhi[b * 3 + k]);
        }
        rn[b] = curn;
        std::memcpy(rlo.data() + b * 3, curl, sizeof curl);
        std::memcpy(rhi.data() + b * 3, curh, sizeof curh);
      }
      // prefix sweep + cost minimization (SA_L*n_L + SA_R*n_R)
      float best_cost = std::numeric_limits<float>::infinity();
      int best_k = -1;
      int64_t curn_l = 0;
      for (int k2 = 0; k2 < 3; ++k2) {
        curl[k2] = std::numeric_limits<float>::infinity();
        curh[k2] = -std::numeric_limits<float>::infinity();
      }
      for (int b = 0; b < B - 1; ++b) {
        curn_l += counts[b];
        for (int k2 = 0; k2 < 3; ++k2) {
          curl[k2] = std::min(curl[k2], blo[b * 3 + k2]);
          curh[k2] = std::max(curh[k2], bhi[b * 3 + k2]);
        }
        int64_t n_r = rn[b + 1];
        if (curn_l == 0 || n_r == 0) continue;
        float cost = surface(curl, curh) * curn_l +
                     surface(rlo.data() + (b + 1) * 3,
                             rhi.data() + (b + 1) * 3) * n_r;
        if (cost < best_cost) { best_cost = cost; best_k = b; }
      }
      float leaf_cost = surface(nd.lo, nd.hi) * m;
      if (best_k >= 0 && (best_cost < leaf_cost || m > LEAF_MAX)) {
        // partition ids by bin <= best_k
        int64_t* mid = std::partition(
            ids, ids + m, [&](int64_t id) {
              const float* c = cent.data() + 3 * id;
              int b = std::min<int>((int)((c[axis] - cmin[axis]) * scale),
                                    B - 1);
              return b <= best_k;
            });
        int64_t nl = mid - ids;
        if (nl > 0 && nl < m) return nl;
      }
    }
    // degenerate: median split on the chosen axis
    std::nth_element(ids, ids + m / 2, ids + m, [&](int64_t a, int64_t b) {
      return cent[3 * a + axis] < cent[3 * b + axis];
    });
    return m / 2;
  }

  void build(int64_t* ids) {
    cent.resize(3 * n);
    for (int64_t i = 0; i < n; ++i)
      for (int k = 0; k < 3; ++k)
        cent[3 * i + k] = 0.5f * (lo[3 * i + k] + hi[3 * i + k]);

    nodes.emplace_back();
    node_bounds(nodes[0], ids, n);
    order_out.reserve(n);

    struct Item { int node; int64_t* ids; int64_t m; };
    std::vector<Item> stack;
    stack.push_back({0, ids, n});
    while (!stack.empty()) {
      Item it = stack.back();
      stack.pop_back();
      Node2& nd = nodes[it.node];
      if (it.m <= LEAF_MAX) {
        nd.first = (int64_t)order_out.size();
        nd.count = (int)it.m;
        for (int64_t i = 0; i < it.m; ++i) order_out.push_back(it.ids[i]);
        continue;
      }
      int64_t nl = split(it.ids, it.m, nd);
      int li = (int)nodes.size();
      nodes[it.node].left = li;
      nodes.emplace_back();
      nodes.emplace_back();
      node_bounds(nodes[li], it.ids, nl);
      node_bounds(nodes[li + 1], it.ids + nl, it.m - nl);
      stack.push_back({li + 1, it.ids + nl, it.m - nl});
      stack.push_back({li, it.ids, nl});
    }
  }
};

// Greedy 2->4 collapse (the DP-optimal variant of bvh4.rs:244-281 is
// within a few percent of this greedy expansion by surface area).
struct Collapser {
  const std::vector<Node2>& nodes;
  float* bounds4;
  int32_t* child4;
  int max_nodes;
  int count = 0;

  int emit(int ni) {
    int slot = count++;
    if (count > max_nodes) return -2;
    float* b = bounds4 + slot * 24;
    int32_t* ch = child4 + slot * 4;
    for (int i = 0; i < 4; ++i) ch[i] = EMPTY;
    std::memset(b, 0, 24 * sizeof(float));

    int kids[4];
    int nk = 0;
    kids[nk++] = nodes[ni].left;
    kids[nk++] = nodes[ni].left + 1;
    while (nk < 4) {
      int best = -1;
      float best_sa = -1.f;
      for (int i = 0; i < nk; ++i) {
        const Node2& k = nodes[kids[i]];
        if (!k.leaf()) {
          float sa = surface(k.lo, k.hi);
          if (sa > best_sa) { best_sa = sa; best = i; }
        }
      }
      if (best < 0) break;
      int expand = kids[best];
      kids[best] = nodes[expand].left;
      kids[nk++] = nodes[expand].left + 1;
    }

    for (int i = 0; i < nk; ++i) {
      const Node2& k = nodes[kids[i]];
      std::memcpy(b + i * 6, k.lo, 3 * sizeof(float));
      std::memcpy(b + i * 6 + 3, k.hi, 3 * sizeof(float));
      if (k.leaf()) {
        ch[i] = (int32_t)(-(k.first * COUNT_BITS + k.count + 1));
      } else {
        int sub = emit(kids[i]);
        if (sub < 0) return sub;
        ch[i] = sub;
      }
    }
    return slot;
  }
};

}  // namespace

extern "C" {

// Returns the BVH4 node count, or -1 on error / -2 if max_nodes too small.
int64_t bvh_build(const float* lo, const float* hi, int64_t n, int num_bins,
                  float* bounds4, int32_t* child4, int64_t* order,
                  int64_t max_nodes) {
  if (n <= 0) return -1;
  Builder b{lo, hi, n, num_bins};
  std::vector<int64_t> ids(n);
  for (int64_t i = 0; i < n; ++i) ids[i] = i;
  b.build(ids.data());
  std::memcpy(order, b.order_out.data(), n * sizeof(int64_t));

  if (b.nodes[0].leaf()) {
    // single pseudo-root
    if (max_nodes < 1) return -2;
    for (int i = 0; i < 4; ++i) child4[i] = EMPTY;
    std::memset(bounds4, 0, 24 * sizeof(float));
    std::memcpy(bounds4, b.nodes[0].lo, 3 * sizeof(float));
    std::memcpy(bounds4 + 3, b.nodes[0].hi, 3 * sizeof(float));
    child4[0] = (int32_t)(-(b.nodes[0].first * COUNT_BITS +
                            b.nodes[0].count + 1));
    return 1;
  }

  Collapser c{b.nodes, bounds4, child4, (int)max_nodes};
  int root = c.emit(0);
  if (root < 0) return root;
  return c.count;
}

}  // extern "C"
