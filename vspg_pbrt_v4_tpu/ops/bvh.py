"""BVH: host-side binned-SAH build + vectorized lockstep traversal.

Analog of the reference's BVHAggregate (cpu/aggregates.h:28, SAH build +
flattened nodes + stack traversal). The build runs host-side in numpy at
scene-construction time (like the reference's single-threaded recursive
build); the traversal is a branchless jnp ``while_loop`` over per-lane node
cursors + fixed-depth stacks — every wavefront lane walks its own path in
lockstep, the TPU stand-in for per-thread traversal. Brute force
(shapes.Geometry.intersect) doubles as the correctness oracle in tests.

Flattened layout (aggregates.cpp LinearBVHNode analog):
  bmin/bmax (N,3); for interior nodes `right` = second-child index and
  `count` = 0 (first child is node+1); for leaves `start`,`count` index the
  permuted primitive-id array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_STACK = 48
N_BINS = 16


class BVH(NamedTuple):
    bmin: jnp.ndarray  # (N,3)
    bmax: jnp.ndarray  # (N,3)
    right: jnp.ndarray  # (N,) second child (interior) / unused
    start: jnp.ndarray  # (N,) first prim (leaf)
    count: jnp.ndarray  # (N,) prim count (0 = interior)
    prim_ids: jnp.ndarray  # (P,) permuted primitive indices

    @property
    def n_nodes(self):
        return self.bmin.shape[0]


def build_bvh(prim_bmin, prim_bmax, max_leaf=4):
    """Binned SAH build over primitive bounds (numpy, host-side)."""
    prim_bmin = np.asarray(prim_bmin, np.float32)
    prim_bmax = np.asarray(prim_bmax, np.float32)
    P = prim_bmin.shape[0]
    centroids = 0.5 * (prim_bmin + prim_bmax)
    prim_ids = np.arange(P, dtype=np.int32)

    bmins, bmaxs, rights, starts, counts = [], [], [], [], []
    order = []

    def new_node():
        bmins.append(np.zeros(3, np.float32))
        bmaxs.append(np.zeros(3, np.float32))
        rights.append(0)
        starts.append(0)
        counts.append(0)
        return len(bmins) - 1

    def build(ids):
        ni = new_node()
        bb0 = prim_bmin[ids].min(0)
        bb1 = prim_bmax[ids].max(0)
        bmins[ni], bmaxs[ni] = bb0, bb1
        if len(ids) <= max_leaf:
            starts[ni] = len(order)
            counts[ni] = len(ids)
            order.extend(ids.tolist())
            return ni
        # binned SAH over the largest centroid axis
        c = centroids[ids]
        c0, c1 = c.min(0), c.max(0)
        ext = c1 - c0
        axis = int(np.argmax(ext))
        if ext[axis] < 1e-12:
            starts[ni] = len(order)
            counts[ni] = len(ids)
            order.extend(ids.tolist())
            return ni
        bins = np.minimum(
            ((c[:, axis] - c0[axis]) / ext[axis] * N_BINS).astype(int), N_BINS - 1)
        # bin bounds + counts
        bin_n = np.zeros(N_BINS, int)
        bin_lo = np.full((N_BINS, 3), np.inf, np.float32)
        bin_hi = np.full((N_BINS, 3), -np.inf, np.float32)
        for b in range(N_BINS):
            m = bins == b
            bin_n[b] = m.sum()
            if bin_n[b]:
                bin_lo[b] = prim_bmin[ids[m]].min(0)
                bin_hi[b] = prim_bmax[ids[m]].max(0)

        def area(lo, hi):
            dxyz = np.maximum(hi - lo, 0)
            return 2 * (dxyz[..., 0] * dxyz[..., 1] + dxyz[..., 1] * dxyz[..., 2]
                        + dxyz[..., 2] * dxyz[..., 0])

        # prefix/suffix sweeps
        lo_l = np.minimum.accumulate(bin_lo, 0)
        hi_l = np.maximum.accumulate(bin_hi, 0)
        n_l = np.cumsum(bin_n)
        lo_r = np.minimum.accumulate(bin_lo[::-1], 0)[::-1]
        hi_r = np.maximum.accumulate(bin_hi[::-1], 0)[::-1]
        n_r = np.cumsum(bin_n[::-1])[::-1]
        cost = np.full(N_BINS - 1, np.inf)
        for s in range(N_BINS - 1):
            if n_l[s] and n_r[s + 1]:
                cost[s] = (n_l[s] * area(lo_l[s], hi_l[s])
                           + n_r[s + 1] * area(lo_r[s + 1], hi_r[s + 1]))
        s_best = int(np.argmin(cost))
        if not np.isfinite(cost[s_best]):
            half = len(ids) // 2
            ord_ax = np.argsort(c[:, axis])
            left_ids, right_ids = ids[ord_ax[:half]], ids[ord_ax[half:]]
        else:
            m = bins <= s_best
            left_ids, right_ids = ids[m], ids[~m]
        build(left_ids)
        rights[ni] = build(right_ids)
        return ni

    if P > 0:
        build(prim_ids)
    else:
        ni = new_node()
        counts[ni] = 0
        starts[ni] = 0
    return BVH(
        jnp.asarray(np.stack(bmins)), jnp.asarray(np.stack(bmaxs)),
        jnp.asarray(rights, jnp.int32), jnp.asarray(starts, jnp.int32),
        jnp.asarray(counts, jnp.int32),
        jnp.asarray(order if order else [0], jnp.int32),
    )


def bvh_traverse(bvh: BVH, o, d, t_max, leaf_fn, payload0, max_leaf=4):
    """Closest-hit traversal: for each lane, walks the tree and calls
    ``leaf_fn(prim_id (R,), mask (R,), t_best, payload) -> (t_best, payload)``
    for up to max_leaf primitives per visited leaf (masked).

    Returns (t_best, payload). payload is any pytree the caller threads.
    """
    R = o.shape[0]
    inv_d = 1.0 / d
    lanes = jnp.arange(R)

    stack = jnp.zeros((R, MAX_STACK), jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)  # stack pointer
    node = jnp.zeros((R,), jnp.int32)
    active = jnp.ones((R,), bool) & (t_max > 0)
    t_best = t_max

    def slab(bmin, bmax, t_far):
        t_lo = (bmin - o) * inv_d
        t_hi = (bmax - o) * inv_d
        t_near = jnp.nanmax(jnp.minimum(t_lo, t_hi), -1)
        t_f = jnp.nanmin(jnp.maximum(t_lo, t_hi), -1) * 1.0000007
        return (t_near <= t_f) & (t_f > 0) & (t_near < t_far)

    def cond(c):
        return jnp.any(c[4])

    def body(c):
        stack, sp, node, t_best, active, payload = c
        bmin = bvh.bmin[node]
        bmax = bvh.bmax[node]
        cnt = bvh.count[node]
        hit_box = slab(bmin, bmax, t_best) & active
        is_leaf = cnt > 0

        # leaf: test up to max_leaf prims (static unroll)
        start = bvh.start[node]
        for j in range(max_leaf):
            pid = bvh.prim_ids[jnp.clip(start + j, 0, bvh.prim_ids.shape[0] - 1)]
            m = hit_box & is_leaf & (j < cnt)
            t_best, payload = leaf_fn(pid, m, t_best, payload)

        # interior & hit: push right child, descend to left (node+1)
        push = hit_box & ~is_leaf & (sp < MAX_STACK)
        stack = stack.at[lanes, jnp.minimum(sp, MAX_STACK - 1)].set(
            jnp.where(push, bvh.right[node], stack[lanes, jnp.minimum(sp, MAX_STACK - 1)]))
        sp = jnp.where(push, sp + 1, sp)
        node = jnp.where(push, node + 1, node)

        # otherwise pop (leaf processed or box missed)
        need_pop = active & ~push
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        node = jnp.where(can_pop, stack[lanes, jnp.minimum(sp, MAX_STACK - 1)], node)
        active = active & ~(need_pop & ~can_pop)
        return stack, sp, node, t_best, active, payload

    stack, sp, node, t_best, active, payload = jax.lax.while_loop(
        cond, body, (stack, sp, node, t_best, active, payload0))
    return t_best, payload


# ---------------------------------------------------------------------------
# HLBVH build (aggregates.cpp buildHLBVH: Morton-code radix sort + LBVH
# treelets + SAH over treelet roots). Host-side numpy variant: sort
# primitives by 30-bit Morton codes of their centroids, then build the
# hierarchy by splitting at the highest differing Morton bit (the LBVH
# rule); degenerate all-equal ranges fall back to median splits. Produces
# the same flattened node layout as build_bvh, so bvh_traverse is shared.
# ---------------------------------------------------------------------------


def _morton3(x, y, z):
    """Interleave 10-bit x/y/z into 30-bit Morton codes (numpy)."""
    def part(v):
        v = v.astype(np.uint32) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return part(x) | (part(y) << 1) | (part(z) << 2)


def build_hlbvh(prim_bmin, prim_bmax, max_leaf=4):
    """Morton-ordered build; same BVH output type as build_bvh."""
    prim_bmin = np.asarray(prim_bmin, np.float32)
    prim_bmax = np.asarray(prim_bmax, np.float32)
    P = prim_bmin.shape[0]
    centroids = 0.5 * (prim_bmin + prim_bmax)
    lo = centroids.min(0)
    ext = np.maximum(centroids.max(0) - lo, 1e-12)
    q = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    codes = _morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int32)
    codes = codes[order]

    bmins, bmaxs, rights, starts, counts = [], [], [], [], []
    prim_out = []

    def new_node():
        bmins.append(np.zeros(3, np.float32))
        bmaxs.append(np.zeros(3, np.float32))
        rights.append(0)
        starts.append(0)
        counts.append(0)
        return len(bmins) - 1

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000 + 4 * P)

    def build(ni, s0, s1, bit):
        ids = order[s0:s1]
        bmins[ni] = prim_bmin[ids].min(0) - 1e-6
        bmaxs[ni] = prim_bmax[ids].max(0) + 1e-6
        n = s1 - s0
        if n <= max_leaf:
            starts[ni] = len(prim_out)
            counts[ni] = n
            prim_out.extend(int(i) for i in ids)
            return
        if bit < 0:
            # Morton bits exhausted with n > max_leaf (co-located centroids):
            # median-split so leaf size never exceeds bvh_traverse's static
            # unroll — mirrors build_bvh's fallback (aggregates.cpp
            # emitLBVH makes a leaf here only because its traversal loops
            # over arbitrary leaf sizes; ours does not).
            split = s0 + n // 2
            left = new_node()
            assert left == ni + 1
            build(left, s0, split, bit)
            right = new_node()
            rights[ni] = right
            build(right, split, s1, bit)
            return
        mask = np.uint32(1 << bit)
        # first index whose code has the bit set (codes sorted)
        seg = (codes[s0:s1] & mask) != 0
        split = s0 + int(np.searchsorted(seg, True))
        if split == s0 or split == s1:
            build(ni, s0, s1, bit - 1)  # bit doesn't discriminate: descend
            return
        left = new_node()
        assert left == ni + 1
        build(left, s0, split, bit - 1)
        right = new_node()
        rights[ni] = right
        build(right, split, s1, bit - 1)

    root = new_node()
    build(root, 0, P, 29)
    sys.setrecursionlimit(old)
    return BVH(
        jnp.asarray(np.stack(bmins)), jnp.asarray(np.stack(bmaxs)),
        jnp.asarray(rights, jnp.int32), jnp.asarray(starts, jnp.int32),
        jnp.asarray(counts, jnp.int32),
        jnp.asarray(prim_out or [0], jnp.int32),
    )
