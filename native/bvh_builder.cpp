// Native binned-SAH BVH builder (the scene-build-time hot path).
//
// The reference builds its BVH in native C++ (cpu/aggregates.cpp); the
// Python/numpy builder in ops/bvh.py is the reference implementation and
// fallback, but recurses per node in the interpreter — too slow past ~100k
// primitives. This library produces the identical flattened layout
// (bmin/bmax/right/start/count + permuted prim ids) and is loaded through
// ctypes (no pybind11 in this environment).
//
// Build: native/build.sh  ->  native/libvspg_native.so
//
// Layout contract (must match ops/bvh.py):
//   interior: count == 0, first child = node+1, second child = right[node]
//   leaf:     count > 0, prims = prim_ids[start .. start+count)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int N_BINS = 16;

struct B3 {
    float lo[3], hi[3];
    void init() {
        for (int k = 0; k < 3; ++k) {
            lo[k] = std::numeric_limits<float>::infinity();
            hi[k] = -std::numeric_limits<float>::infinity();
        }
    }
    void grow(const B3 &o) {
        for (int k = 0; k < 3; ++k) {
            lo[k] = std::min(lo[k], o.lo[k]);
            hi[k] = std::max(hi[k], o.hi[k]);
        }
    }
    float area() const {
        float d[3];
        for (int k = 0; k < 3; ++k) d[k] = std::max(hi[k] - lo[k], 0.f);
        return 2.f * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]);
    }
};

struct Builder {
    const float *pmin, *pmax;
    std::vector<float> cent;
    int max_leaf;
    // output
    std::vector<float> bmin, bmax;
    std::vector<int32_t> right, start, count, order;

    int new_node() {
        bmin.insert(bmin.end(), {0, 0, 0});
        bmax.insert(bmax.end(), {0, 0, 0});
        right.push_back(0);
        start.push_back(0);
        count.push_back(0);
        return (int)right.size() - 1;
    }

    B3 prim_bounds(int id) const {
        B3 b;
        for (int k = 0; k < 3; ++k) {
            b.lo[k] = pmin[3 * id + k];
            b.hi[k] = pmax[3 * id + k];
        }
        return b;
    }

    int build(int32_t *ids, int n) {
        int ni = new_node();
        B3 bb;
        bb.init();
        for (int i = 0; i < n; ++i) bb.grow(prim_bounds(ids[i]));
        std::memcpy(&bmin[3 * ni], bb.lo, 12);
        std::memcpy(&bmax[3 * ni], bb.hi, 12);

        auto make_leaf = [&]() {
            start[ni] = (int)order.size();
            count[ni] = n;
            order.insert(order.end(), ids, ids + n);
            return ni;
        };
        if (n <= max_leaf) return make_leaf();

        // centroid bounds + split axis
        float c0[3], c1[3];
        for (int k = 0; k < 3; ++k) {
            c0[k] = std::numeric_limits<float>::infinity();
            c1[k] = -std::numeric_limits<float>::infinity();
        }
        for (int i = 0; i < n; ++i)
            for (int k = 0; k < 3; ++k) {
                float c = cent[3 * ids[i] + k];
                c0[k] = std::min(c0[k], c);
                c1[k] = std::max(c1[k], c);
            }
        int axis = 0;
        float ext = -1;
        for (int k = 0; k < 3; ++k)
            if (c1[k] - c0[k] > ext) { ext = c1[k] - c0[k]; axis = k; }
        if (ext < 1e-12f) return make_leaf();

        // binned SAH
        int bin_n[N_BINS] = {0};
        B3 bin_b[N_BINS];
        for (auto &b : bin_b) b.init();
        float inv = N_BINS / ext;
        auto bin_of = [&](int id) {
            int b = (int)((cent[3 * id + axis] - c0[axis]) * inv);
            return std::min(b, N_BINS - 1);
        };
        for (int i = 0; i < n; ++i) {
            int b = bin_of(ids[i]);
            bin_n[b]++;
            bin_b[b].grow(prim_bounds(ids[i]));
        }
        // sweeps
        float cost[N_BINS - 1];
        {
            B3 acc;
            acc.init();
            int cnt = 0;
            for (int s = 0; s < N_BINS - 1; ++s) {
                acc.grow(bin_b[s]);
                cnt += bin_n[s];
                cost[s] = cnt ? cnt * acc.area() : INFINITY;
            }
            acc.init();
            cnt = 0;
            for (int s = N_BINS - 2; s >= 0; --s) {
                acc.grow(bin_b[s + 1]);
                cnt += bin_n[s + 1];
                cost[s] = (cnt && std::isfinite(cost[s]))
                              ? cost[s] + cnt * acc.area()
                              : INFINITY;
            }
        }
        int s_best = 0;
        for (int s = 1; s < N_BINS - 1; ++s)
            if (cost[s] < cost[s_best]) s_best = s;

        int mid;
        if (!std::isfinite(cost[s_best])) {
            mid = n / 2;  // median fallback
            std::nth_element(ids, ids + mid, ids + n, [&](int a, int b) {
                return cent[3 * a + axis] < cent[3 * b + axis];
            });
        } else {
            int32_t *p = std::partition(ids, ids + n, [&](int id) {
                return bin_of(id) <= s_best;
            });
            mid = (int)(p - ids);
            if (mid == 0 || mid == n) mid = n / 2;  // degenerate partition
        }
        build(ids, mid);
        right[ni] = build(ids + mid, n - mid);
        return ni;
    }
};

}  // namespace

extern "C" {

// Returns node count; fills caller-allocated outputs sized for the worst
// case (2*n-1 nodes, n prim ids).
int32_t vspg_build_bvh(const float *prim_bmin, const float *prim_bmax,
                       int32_t n, int32_t max_leaf, float *out_bmin,
                       float *out_bmax, int32_t *out_right,
                       int32_t *out_start, int32_t *out_count,
                       int32_t *out_order) {
    Builder b;
    b.pmin = prim_bmin;
    b.pmax = prim_bmax;
    b.max_leaf = max_leaf;
    b.cent.resize(3 * (size_t)n);
    for (int i = 0; i < n; ++i)
        for (int k = 0; k < 3; ++k)
            b.cent[3 * i + k] = 0.5f * (prim_bmin[3 * i + k] + prim_bmax[3 * i + k]);
    std::vector<int32_t> ids(n);
    for (int i = 0; i < n; ++i) ids[i] = i;
    if (n > 0)
        b.build(ids.data(), n);
    else {
        b.new_node();
        b.order.push_back(0);
    }
    int32_t n_nodes = (int32_t)b.right.size();
    std::memcpy(out_bmin, b.bmin.data(), b.bmin.size() * 4);
    std::memcpy(out_bmax, b.bmax.data(), b.bmax.size() * 4);
    std::memcpy(out_right, b.right.data(), b.right.size() * 4);
    std::memcpy(out_start, b.start.data(), b.start.size() * 4);
    std::memcpy(out_count, b.count.data(), b.count.size() * 4);
    std::memcpy(out_order, b.order.data(), b.order.size() * 4);
    return n_nodes;
}
}
