// Native BVH builder: binned-SAH BVH2 + DP-optimal 4-wide collapse.
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
#include <array>
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

// DP-optimal 2->4 collapse: Pinto's "Adaptive Collapsing" as the
// reference implements it (bvh4.rs:244-281 cost DP + :127-185
// backtracking).  memo[n][t-1] is the minimal traversal cost of
// replacing node n's subtree with a tree-cut of exactly t roots
// (t = 2..4); memo[n][0] keeps n as one 4-wide node (one AABB test +
// its best <=4-cut).  F[n][c-1] = min(memo[n][:c]) is node_flat_cost.
struct Collapser {
  const std::vector<Node2>& nodes;
  float* bounds4;
  int32_t* child4;
  int max_nodes;
  int count = 0;
  std::vector<std::array<float, 4>> memo, F;

  struct Cut {  // one cut entry: child AABB + encoded child index
    float lo[3], hi[3];
    int32_t entry;
  };

  void fill_memo() {
    const float INF = std::numeric_limits<float>::infinity();
    memo.assign(nodes.size(), {INF, INF, INF, INF});
    F.assign(nodes.size(), {1.f, 1.f, 1.f, 1.f});  // leaves: cost 1 any cut
    // iterative post-order (meshes can be deep)
    std::vector<std::pair<int, bool>> stack;
    stack.push_back({0, false});
    while (!stack.empty()) {
      auto [n, ready] = stack.back();
      stack.pop_back();
      if (nodes[n].leaf()) continue;
      int l = nodes[n].left, r = nodes[n].left + 1;
      if (!ready) {
        stack.push_back({n, true});
        stack.push_back({l, false});
        stack.push_back({r, false});
        continue;
      }
      auto& m = memo[n];
      for (int t = 2; t <= 4; ++t) {
        float best = INF;
        for (int i = 1; i < t; ++i)
          best = std::min(best, F[l][i - 1] + F[r][t - i - 1]);
        m[t - 1] = best;
      }
      m[0] = 1.f + std::min({m[1], m[2], m[3]});
      float run = INF;
      for (int c = 0; c < 4; ++c) {
        run = std::min(run, m[c]);
        F[n][c] = run;
      }
    }
  }

  int find_t(int n, int cutsize) const {  // bvh4.rs:189-204
    if (nodes[n].leaf()) return 1;
    int best_t = 1;
    float best = memo[n][0];
    for (int t = 2; t <= cutsize; ++t)
      if (memo[n][t - 1] < best) { best = memo[n][t - 1]; best_t = t; }
    return best_t;
  }

  float flat_cost(int n, int c) const {
    return nodes[n].leaf() ? 1.f : F[n][c - 1];
  }

  int find_i(int l, int r, int t) const {  // bvh4.rs:207-224
    int best_i = 1;
    float best = flat_cost(l, 1) + flat_cost(r, t - 1);
    for (int i = 2; i < t; ++i) {
      float v = flat_cost(l, i) + flat_cost(r, t - i);
      if (v < best) { best = v; best_i = i; }
    }
    return best_i;
  }

  // Write `kids` into slot; returns false when out of node budget.
  void fill_slot(int slot, const std::vector<Cut>& kids) {
    float* b = bounds4 + slot * 24;
    int32_t* ch = child4 + slot * 4;
    for (int i = 0; i < 4; ++i) ch[i] = EMPTY;
    std::memset(b, 0, 24 * sizeof(float));
    for (size_t i = 0; i < kids.size(); ++i) {
      std::memcpy(b + i * 6, kids[i].lo, 3 * sizeof(float));
      std::memcpy(b + i * 6 + 3, kids[i].hi, 3 * sizeof(float));
      ch[i] = kids[i].entry;
    }
  }

  static void hull(const std::vector<Cut>& kids, float* lo, float* hi) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::numeric_limits<float>::infinity();
      hi[k] = -std::numeric_limits<float>::infinity();
    }
    for (const Cut& c : kids)
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], c.lo[k]);
        hi[k] = std::max(hi[k], c.hi[k]);
      }
  }

  // The BVH4 replacement of BVH2 node n (bvh4.rs:127-185).
  bool collapse(int n, int cutsize, std::vector<Cut>& out) {
    const Node2& nd = nodes[n];
    if (nd.leaf()) {
      Cut c;
      std::memcpy(c.lo, nd.lo, 3 * sizeof(float));
      std::memcpy(c.hi, nd.hi, 3 * sizeof(float));
      c.entry = (int32_t)(-(nd.first * COUNT_BITS + nd.count + 1));
      out.push_back(c);
      return true;
    }
    int l = nd.left, r = nd.left + 1;
    int t = find_t(n, cutsize);
    if (t == 1) {  // keep the node
      int slot = count++;
      if (count > max_nodes) return false;
      int i = find_i(l, r, 4);
      std::vector<Cut> kids;
      if (!collapse(l, i, kids) || !collapse(r, 4 - i, kids)) return false;
      fill_slot(slot, kids);
      Cut c;
      hull(kids, c.lo, c.hi);
      c.entry = slot;
      out.push_back(c);
      return true;
    }
    int i = find_i(l, r, t);
    return collapse(l, i, out) && collapse(r, t - i, out);
  }

  // Slot 0 is always the root; a dissolving root's cut becomes the
  // root's children (the reference's placeholder rebuild, bvh4.rs:48-66).
  int run() {
    fill_memo();
    if (max_nodes < 1) return -2;
    count = 1;
    int l = nodes[0].left, r = nodes[0].left + 1;
    int t = find_t(0, 4);
    int tt = (t == 1) ? 4 : t;
    int i = find_i(l, r, tt);
    std::vector<Cut> kids;
    if (!collapse(l, i, kids) || !collapse(r, tt - i, kids)) return -2;
    fill_slot(0, kids);
    return count;
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
  int res = c.run();
  if (res < 0) return res;
  return c.count;
}

}  // extern "C"
