// Native host-side builders for the TPU ray tracer.
//
// Plays the role the reference's C++ infra/ layer plays on the CPU: the
// scene "compile" path (acceleration-structure construction) runs in native
// code for speed; the result is flat SoA arrays consumed by the device
// kernels.  Build semantics mirror infra/bvh.cpp:63-178 (binned SAH, vertex
// -grown bounds, centroid*0.3333, no-gain stop) and accel/bvh_builder.py's
// extensions (median fallback under force_split_cap, leaf_target).
//
// Exposed as a plain C ABI for ctypes; all buffers are caller-allocated
// numpy arrays.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float half_area(const V3 &lo, const V3 &hi) {
  float ex = std::max(hi.x - lo.x, 0.0f);
  float ey = std::max(hi.y - lo.y, 0.0f);
  float ez = std::max(hi.z - lo.z, 0.0f);
  return ex * ey + ey * ez + ez * ex;
}
static inline float getc(const V3 &v, int a) { return a == 0 ? v.x : (a == 1 ? v.y : v.z); }

struct BuildCtx {
  const float *tri_v;  // N*9
  int n;
  std::vector<V3> cent, tmin, tmax;
  float *node_min;
  float *node_max;
  int32_t *left_first, *tri_count, *left, *right, *axis, *tri_indices;
  int nodes_used = 1;
  int max_depth = 0;
  bool sah;
  int bins, force_split_cap, leaf_target;
};

static void update_bounds(BuildCtx &c, int node) {
  V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  int first = c.left_first[node], count = c.tri_count[node];
  for (int i = 0; i < count; i++) {
    int t = c.tri_indices[first + i];
    lo = vmin(lo, c.tmin[t]);
    hi = vmax(hi, c.tmax[t]);
  }
  c.node_min[node * 3 + 0] = lo.x;
  c.node_min[node * 3 + 1] = lo.y;
  c.node_min[node * 3 + 2] = lo.z;
  c.node_max[node * 3 + 0] = hi.x;
  c.node_max[node * 3 + 1] = hi.y;
  c.node_max[node * 3 + 2] = hi.z;
}

struct Bin {
  V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  int count = 0;
};

static void subdivide(BuildCtx &c, int node, int depth) {
  update_bounds(c, node);
  if (depth > c.max_depth) c.max_depth = depth;
  int first = c.left_first[node], count = c.tri_count[node];
  int leaf_stop = c.leaf_target > 0 ? c.leaf_target : 2;
  if (count <= leaf_stop) return;

  int best_axis = -1;
  float split_pos = 0.0f;
  bool do_median = false;

  if (c.sah) {
    float best_cost = 1e30f;
    for (int a = 0; a < 3; a++) {
      float cmin = 1e30f, cmax = -1e30f;
      for (int i = 0; i < count; i++) {
        float v = getc(c.cent[c.tri_indices[first + i]], a);
        cmin = std::min(cmin, v);
        cmax = std::max(cmax, v);
      }
      if (cmin == cmax) continue;
      std::vector<Bin> bins((size_t)c.bins);
      float scale = c.bins / (cmax - cmin);
      for (int i = 0; i < count; i++) {
        int t = c.tri_indices[first + i];
        int b = std::min(c.bins - 1, (int)((getc(c.cent[t], a) - cmin) * scale));
        bins[b].count++;
        bins[b].lo = vmin(bins[b].lo, c.tmin[t]);
        bins[b].hi = vmax(bins[b].hi, c.tmax[t]);
      }
      // prefix/suffix sweeps over the planes (reference FindBestSplitPlane)
      std::vector<float> larea(c.bins), rarea(c.bins);
      std::vector<int> lcount(c.bins), rcount(c.bins);
      {
        V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
        int s = 0;
        for (int i = 0; i < c.bins; i++) {
          s += bins[i].count;
          lcount[i] = s;
          if (bins[i].count) {
            lo = vmin(lo, bins[i].lo);
            hi = vmax(hi, bins[i].hi);
          }
          larea[i] = s ? half_area(lo, hi) : 0.0f;
        }
      }
      {
        V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
        int s = 0;
        for (int i = c.bins - 1; i >= 0; i--) {
          s += bins[i].count;
          rcount[i] = s;
          if (bins[i].count) {
            lo = vmin(lo, bins[i].lo);
            hi = vmax(hi, bins[i].hi);
          }
          rarea[i] = s ? half_area(lo, hi) : 0.0f;
        }
      }
      for (int i = 0; i < c.bins - 1; i++) {
        float cost = lcount[i] * larea[i] + rcount[i + 1] * rarea[i + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = a;
          split_pos = cmin + (cmax - cmin) / c.bins * (i + 1);
        }
      }
    }
    V3 nlo{c.node_min[node * 3], c.node_min[node * 3 + 1], c.node_min[node * 3 + 2]};
    V3 nhi{c.node_max[node * 3], c.node_max[node * 3 + 1], c.node_max[node * 3 + 2]};
    float no_split = count * half_area(nlo, nhi);
    if (best_axis < 0 || best_cost >= no_split) {
      if (c.force_split_cap > 0 && count > c.force_split_cap) {
        do_median = true;
      } else {
        return;  // leaf (reference SAH no-gain stop)
      }
    }
  } else {
    V3 nlo{c.node_min[node * 3], c.node_min[node * 3 + 1], c.node_min[node * 3 + 2]};
    V3 nhi{c.node_max[node * 3], c.node_max[node * 3 + 1], c.node_max[node * 3 + 2]};
    V3 ext{nhi.x - nlo.x, nhi.y - nlo.y, nhi.z - nlo.z};
    best_axis = 0;
    if (ext.y > ext.x) best_axis = 1;
    if (getc(ext, 2) > getc(ext, best_axis)) best_axis = 2;
    split_pos = getc(nlo, best_axis) + getc(ext, best_axis) * 0.5f;
  }

  int left_count;
  int32_t *ids = c.tri_indices + first;
  if (do_median) {
    V3 nlo{c.node_min[node * 3], c.node_min[node * 3 + 1], c.node_min[node * 3 + 2]};
    V3 nhi{c.node_max[node * 3], c.node_max[node * 3 + 1], c.node_max[node * 3 + 2]};
    V3 ext{nhi.x - nlo.x, nhi.y - nlo.y, nhi.z - nlo.z};
    int a = 0;
    if (ext.y > ext.x) a = 1;
    if (getc(ext, 2) > getc(ext, a)) a = 2;
    std::stable_sort(ids, ids + count, [&](int32_t p, int32_t q) {
      return getc(c.cent[p], a) < getc(c.cent[q], a);
    });
    left_count = count / 2;
  } else {
    // in-place partition by centroid < split (stable variant)
    std::stable_partition(ids, ids + count, [&](int32_t p) {
      return getc(c.cent[p], best_axis) < split_pos;
    });
    left_count = 0;
    for (int i = 0; i < count; i++)
      if (getc(c.cent[ids[i]], best_axis) < split_pos) left_count++;
    if (left_count == 0 || left_count == count) {
      if (c.force_split_cap > 0 && count > c.force_split_cap) {
        std::stable_sort(ids, ids + count, [&](int32_t p, int32_t q) {
          return getc(c.cent[p], best_axis) < getc(c.cent[q], best_axis);
        });
        left_count = count / 2;
      } else {
        return;  // leaf (degenerate partition)
      }
    }
  }

  int li = c.nodes_used++;
  int ri = c.nodes_used++;
  c.left_first[li] = first;
  c.tri_count[li] = left_count;
  c.left_first[ri] = first + left_count;
  c.tri_count[ri] = count - left_count;
  c.left[node] = li;
  c.right[node] = ri;
  c.axis[node] = best_axis < 0 ? 0 : best_axis;
  c.left_first[node] = li;
  c.tri_count[node] = 0;
  subdivide(c, li, depth + 1);
  subdivide(c, ri, depth + 1);
}

}  // namespace

extern "C" {

// Returns nodes_used. Buffers sized for 2N-1 nodes.
int crt_build_bvh(const float *tri_v, int n_tris, int sah, int bins,
                  int force_split_cap, int leaf_target, float *node_min,
                  float *node_max, int32_t *left_first, int32_t *tri_count,
                  int32_t *left, int32_t *right, int32_t *axis,
                  int32_t *tri_indices, int32_t *out_max_depth) {
  BuildCtx c;
  c.tri_v = tri_v;
  c.n = n_tris;
  c.node_min = node_min;
  c.node_max = node_max;
  c.left_first = left_first;
  c.tri_count = tri_count;
  c.left = left;
  c.right = right;
  c.axis = axis;
  c.tri_indices = tri_indices;
  c.sah = sah != 0;
  c.bins = bins;
  c.force_split_cap = force_split_cap;
  c.leaf_target = leaf_target;

  c.cent.resize(n_tris);
  c.tmin.resize(n_tris);
  c.tmax.resize(n_tris);
  for (int i = 0; i < n_tris; i++) {
    V3 a{tri_v[i * 9 + 0], tri_v[i * 9 + 1], tri_v[i * 9 + 2]};
    V3 b{tri_v[i * 9 + 3], tri_v[i * 9 + 4], tri_v[i * 9 + 5]};
    V3 d{tri_v[i * 9 + 6], tri_v[i * 9 + 7], tri_v[i * 9 + 8]};
    // centroid * 0.3333 exactly as the reference (model.cpp:78)
    c.cent[i] = {(a.x + b.x + d.x) * 0.3333f, (a.y + b.y + d.y) * 0.3333f,
                 (a.z + b.z + d.z) * 0.3333f};
    c.tmin[i] = vmin(vmin(a, b), d);
    c.tmax[i] = vmax(vmax(a, b), d);
    tri_indices[i] = i;
  }
  int cap = n_tris * 2 - 1;
  if (cap < 1) cap = 1;
  std::memset(left, 0xFF, sizeof(int32_t) * cap);
  std::memset(right, 0xFF, sizeof(int32_t) * cap);
  std::memset(axis, 0, sizeof(int32_t) * cap);
  c.left_first[0] = 0;
  c.tri_count[0] = n_tris;
  subdivide(c, 0, 0);
  *out_max_depth = c.max_depth;
  return c.nodes_used;
}

// Per-octant threaded hit/miss links (accel/bvh_builder.thread_links).
void crt_thread_links(const int32_t *left, const int32_t *right,
                      const int32_t *tri_count, const int32_t *axis, int m,
                      const int32_t *roots, int n_roots, int32_t *hit,
                      int32_t *miss) {
  std::vector<std::pair<int32_t, int32_t>> stack;
  for (int o = 0; o < 8; o++) {
    int neg[3] = {(o >> 0) & 1, (o >> 1) & 1, (o >> 2) & 1};
    int32_t *ho = hit + (size_t)o * m;
    int32_t *mo = miss + (size_t)o * m;
    stack.clear();
    for (int i = n_roots - 1; i >= 0; i--) {
      int32_t nxt = (i + 1 < n_roots) ? roots[i + 1] : -1;
      stack.push_back({roots[i], nxt});
    }
    while (!stack.empty()) {
      auto [node, ex] = stack.back();
      stack.pop_back();
      mo[node] = ex;
      if (tri_count[node] > 0) {
        ho[node] = ex;
        continue;
      }
      int a = axis[node];
      int32_t nearc = neg[a] ? right[node] : left[node];
      int32_t farc = neg[a] ? left[node] : right[node];
      ho[node] = nearc;
      stack.push_back({nearc, farc});
      stack.push_back({farc, ex});
    }
  }
}

// Uniform grid cell insertion (accel/grid_builder semantics): counts pass +
// fill pass into CSR arrays.  Returns total pair count on the counts pass
// (cell_tris == nullptr).
long long crt_grid_insert(const float *tri_v, int n_tris, const float *bmin,
                          const float *cell_size, const int32_t *res,
                          int32_t *cell_counts, int32_t *cell_tris,
                          const int32_t *cell_start) {
  long long total = 0;
  int rx = res[0], ry = res[1], rz = res[2];
  std::vector<int32_t> cursor;
  if (cell_tris) cursor.assign((size_t)rx * ry * rz, 0);
  for (int i = 0; i < n_tris; i++) {
    V3 a{tri_v[i * 9 + 0], tri_v[i * 9 + 1], tri_v[i * 9 + 2]};
    V3 b{tri_v[i * 9 + 3], tri_v[i * 9 + 4], tri_v[i * 9 + 5]};
    V3 d{tri_v[i * 9 + 6], tri_v[i * 9 + 7], tri_v[i * 9 + 8]};
    V3 lo = vmin(vmin(a, b), d), hi = vmax(vmax(a, b), d);
    int l[3], h[3];
    for (int k = 0; k < 3; k++) {
      l[k] = std::clamp((int)((getc(lo, k) - bmin[k]) / cell_size[k]), 0, res[k] - 1);
      h[k] = std::clamp((int)((getc(hi, k) - bmin[k]) / cell_size[k]), 0, res[k] - 1);
    }
    for (int z = l[2]; z <= h[2]; z++)
      for (int y = l[1]; y <= h[1]; y++)
        for (int x = l[0]; x <= h[0]; x++) {
          int cell = x + y * rx + z * rx * ry;
          if (cell_tris) {
            cell_tris[cell_start[cell] + cursor[cell]++] = i;
          } else {
            cell_counts[cell]++;
          }
          total++;
        }
  }
  return total;
}

}  // extern "C"
