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
# Two-level (TLAS/BLAS) instanced BVH — the TransformedPrimitive analog
# (cpu/primitive.h:83): geometry is stored ONCE in object space with one
# BLAS per object; instances carry a world-to-object transform and a BLAS
# root. A TLAS over instance world bounds dispatches rays into per-instance
# BLAS traversal by pushing (blas_root, instance_id) stack entries; rays are
# re-derived in the current instance's object space each iteration (the ray
# direction is NOT renormalized, so the t parameterization is shared between
# world and object space — pbrt's TransformedPrimitive::Intersect trick).
# ---------------------------------------------------------------------------


class TwoLevelBVH(NamedTuple):
    """TLAS nodes [0, tlas_n) followed by all BLAS nodes, one shared
    flattened layout (BVH-node fields). ``ids`` is the shared permuted
    id array: TLAS leaves index instance ids, BLAS leaves triangle ids
    (global into the caller's instanced-primitive arrays)."""

    bmin: jnp.ndarray  # (N,3)
    bmax: jnp.ndarray  # (N,3)
    right: jnp.ndarray  # (N,)
    start: jnp.ndarray  # (N,)
    count: jnp.ndarray  # (N,) prim count (0 = interior)
    ids: jnp.ndarray  # (P,)
    tlas_n: jnp.ndarray  # () int32: first BLAS node index
    blas_root: jnp.ndarray  # (I,) global root node per instance
    w2o: jnp.ndarray  # (I,3,4) world-to-object (rows of the 3x4 affine)
    # motion blur (cpu/primitive.h:103 AnimatedPrimitive): per-instance
    # TRS keyframes; None = all static. (T0 (I,3), q0 (I,4) wxyz,
    # S0 (I,3,3), T1, q1, S1, animated (I,) bool)
    anim: object = None


def build_two_level(obj_bmin_list, obj_bmax_list, obj_tri_base,
                    inst_obj, inst_o2w, max_leaf=4, inst_o2w_end=None):
    """Host-side build. obj_bmin_list/obj_bmax_list: per-object arrays of
    object-space triangle bounds; obj_tri_base[j] = offset of object j's
    triangles in the global instanced-triangle arrays; inst_obj[i] = object
    index of instance i; inst_o2w[i] = 4x4 object-to-world.

    inst_o2w_end: optional per-instance END-keyframe 4x4 (None entries =
    static) — AnimatedPrimitive motion blur (cpu/primitive.h:103):
    instance world bounds then cover the whole shutter (union over
    sampled times, the conservative MotionBounds analog) and the
    traversal interpolates TRS per lane time (transform.h
    AnimatedTransform semantics)."""
    from ..utils.transform import decompose

    n_obj = len(obj_bmin_list)
    blas = [build_bvh(obj_bmin_list[j], obj_bmax_list[j], max_leaf=max_leaf)
            for j in range(n_obj)]

    inst_obj = np.asarray(inst_obj, np.int32)
    n_inst = inst_obj.shape[0]
    any_anim = inst_o2w_end is not None and any(
        e is not None for e in inst_o2w_end)
    # instance world bounds: transform the object bbox corners
    iw_lo = np.zeros((n_inst, 3), np.float32)
    iw_hi = np.zeros((n_inst, 3), np.float32)
    w2o = np.zeros((n_inst, 3, 4), np.float32)
    aT0 = np.zeros((n_inst, 3), np.float32)
    aT1 = np.zeros((n_inst, 3), np.float32)
    aq0 = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n_inst, 1))
    aq1 = aq0.copy()
    aS0 = np.tile(np.eye(3, dtype=np.float32), (n_inst, 1, 1))
    aS1 = aS0.copy()
    a_on = np.zeros((n_inst,), bool)
    for i in range(n_inst):
        j = int(inst_obj[i])
        m = np.asarray(inst_o2w[i], np.float64).reshape(4, 4)
        m_end = None
        if inst_o2w_end is not None and inst_o2w_end[i] is not None:
            m_end = np.asarray(inst_o2w_end[i], np.float64).reshape(4, 4)
            if np.allclose(m_end, m):
                m_end = None
        lo = np.asarray(blas[j].bmin[0])
        hi = np.asarray(blas[j].bmax[0])
        cs = np.array([[x, y, z] for x in (lo[0], hi[0])
                       for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
        if m_end is None:
            cw = cs @ m[:3, :3].T + m[:3, 3]
            iw_lo[i] = cw.min(0) - 1e-5
            iw_hi[i] = cw.max(0) + 1e-5
        else:
            # shutter-covering bounds: union over sampled times of the
            # interpolated transform applied to the object bbox corners
            T0, q0, S0 = decompose(m)
            T1, q1, S1 = decompose(m_end)
            if float(np.dot(q0, q1)) < 0:
                q1 = -q1
            aT0[i], aT1[i] = T0, T1
            aq0[i], aq1[i] = q0, q1
            aS0[i], aS1[i] = S0, S1
            a_on[i] = True
            los, his = [], []
            for tt in np.linspace(0.0, 1.0, 9):
                mt = _trs_matrix(T0 * (1 - tt) + T1 * tt,
                                 _slerp_np(q0, q1, tt),
                                 S0 * (1 - tt) + S1 * tt)
                cw = cs @ mt[:3, :3].T + mt[:3, 3]
                los.append(cw.min(0))
                his.append(cw.max(0))
            pad = 0.05 * (np.max(his, 0) - np.min(los, 0) + 1e-3)
            iw_lo[i] = np.min(los, 0) - 1e-5 - pad
            iw_hi[i] = np.max(his, 0) + 1e-5 + pad
        w2o[i] = np.linalg.inv(m)[:3, :4]
    tlas = build_bvh(iw_lo, iw_hi, max_leaf=max_leaf)

    # concatenate: TLAS nodes first, then each object's BLAS with fixups
    tlas_n = int(tlas.n_nodes)
    node_off = [0] * n_obj
    id_off = [0] * n_obj
    bmins = [np.asarray(tlas.bmin)]
    bmaxs = [np.asarray(tlas.bmax)]
    rights = [np.asarray(tlas.right)]
    starts = [np.asarray(tlas.start)]
    counts = [np.asarray(tlas.count)]
    ids = [np.asarray(tlas.prim_ids)]  # instance ids
    cur_node = tlas_n
    cur_id = int(np.asarray(tlas.prim_ids).shape[0])
    for j in range(n_obj):
        b = blas[j]
        node_off[j] = cur_node
        id_off[j] = cur_id
        bmins.append(np.asarray(b.bmin))
        bmaxs.append(np.asarray(b.bmax))
        rights.append(np.asarray(b.right) + cur_node)
        starts.append(np.asarray(b.start) + cur_id)
        counts.append(np.asarray(b.count))
        ids.append(np.asarray(b.prim_ids) + int(obj_tri_base[j]))
        cur_node += int(b.n_nodes)
        cur_id += int(np.asarray(b.prim_ids).shape[0])
    blas_root = np.asarray([node_off[int(inst_obj[i])]
                            for i in range(n_inst)], np.int32)
    return TwoLevelBVH(
        jnp.asarray(np.concatenate(bmins)), jnp.asarray(np.concatenate(bmaxs)),
        jnp.asarray(np.concatenate(rights), jnp.int32),
        jnp.asarray(np.concatenate(starts), jnp.int32),
        jnp.asarray(np.concatenate(counts), jnp.int32),
        jnp.asarray(np.concatenate(ids), jnp.int32),
        jnp.asarray(tlas_n, jnp.int32),
        jnp.asarray(blas_root, jnp.int32),
        jnp.asarray(w2o),
        ((jnp.asarray(aT0), jnp.asarray(aq0), jnp.asarray(aS0),
          jnp.asarray(aT1), jnp.asarray(aq1), jnp.asarray(aS1),
          jnp.asarray(a_on)) if any_anim else None),
    )


def _slerp_np(q0, q1, t):
    c = float(np.clip(np.dot(q0, q1), -1.0, 1.0))
    th = np.arccos(c)
    if np.sin(th) < 1e-6:
        q = q0 * (1 - t) + q1 * t
    else:
        q = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
    return q / np.linalg.norm(q)


def _trs_matrix(T, q, S):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]])
    m = np.eye(4)
    m[:3, :3] = R @ S
    m[:3, 3] = T
    return m


def interp_w2o(tl: TwoLevelBVH, inst_idx, time):
    """Per-lane world-to-object (R,3,4) at the lanes' ray times.
    Static instances (or anim None / time None) return the prebuilt
    w2o. Animated: TRS-interpolate o2w (transform.h AnimatedTransform)
    and invert analytically (A = R S -> A^-1 via batched 3x3 inverse;
    translation -A^-1 T)."""
    base = tl.w2o[jnp.maximum(inst_idx, 0)]
    if tl.anim is None or time is None:
        return base
    T0, q0, S0, T1, q1, S1, a_on = tl.anim
    ii = jnp.maximum(inst_idx, 0)
    on = a_on[ii]
    t = jnp.clip(time, 0.0, 1.0)[..., None]
    T = T0[ii] * (1 - t) + T1[ii] * t
    ca = jnp.sum(q0[ii] * q1[ii], -1, keepdims=True)
    th = jnp.arccos(jnp.clip(ca, -1.0, 1.0))
    sth = jnp.sin(th)
    w0 = jnp.where(sth > 1e-6, jnp.sin((1 - t) * th) / sth, 1 - t)
    w1 = jnp.where(sth > 1e-6, jnp.sin(t * th) / sth, t)
    q = w0 * q0[ii] + w1 * q1[ii]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    S = S0[ii] * (1 - t)[..., None] + S1[ii] * t[..., None]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                   2 * (qx * qz + qy * qw)], -1),
        jnp.stack([2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qx * qw)], -1),
        jnp.stack([2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                   1 - 2 * (qx * qx + qy * qy)], -1)], -2)
    A = jnp.einsum("...ij,...jk->...ik", R, S)
    Ainv = jnp.linalg.inv(A)
    tr = -jnp.einsum("...ij,...j->...i", Ainv, T)
    m_anim = jnp.concatenate([Ainv, tr[..., None]], -1)
    return jnp.where(on[..., None, None], m_anim, base)


def two_level_traverse(tl: TwoLevelBVH, o, d, t_max, leaf_fn, payload0,
                       max_leaf=4, time=None):
    """Instanced closest-hit traversal. ``leaf_fn(pid, inst, m, co, cd,
    t_best, payload) -> (t_best, payload)`` receives the OBJECT-SPACE ray
    (co, cd — cd unnormalized so t matches world t) of the owning instance.
    """
    R = o.shape[0]
    lanes = jnp.arange(R)

    stack_n = jnp.zeros((R, MAX_STACK), jnp.int32)
    stack_i = jnp.full((R, MAX_STACK), -1, jnp.int32)
    sp = jnp.zeros((R,), jnp.int32)
    node = jnp.zeros((R,), jnp.int32)
    inst = jnp.full((R,), -1, jnp.int32)
    active = jnp.ones((R,), bool) & (t_max > 0)
    t_best = t_max

    def cur_ray(inst):
        m = interp_w2o(tl, inst, time)  # (R,3,4); per-lane time (motion)
        in_i = (inst >= 0)[:, None]
        co = jnp.where(
            in_i, jnp.einsum("rij,rj->ri", m[..., :3], o) + m[..., 3], o)
        cd = jnp.where(in_i, jnp.einsum("rij,rj->ri", m[..., :3], d), d)
        return co, cd

    def slab(bmin, bmax, co, inv_d, t_far):
        t_lo = (bmin - co) * inv_d
        t_hi = (bmax - co) * inv_d
        t_near = jnp.nanmax(jnp.minimum(t_lo, t_hi), -1)
        t_f = jnp.nanmin(jnp.maximum(t_lo, t_hi), -1) * 1.0000007
        return (t_near <= t_f) & (t_f > 0) & (t_near < t_far)

    def cond(c):
        return jnp.any(c[6])

    def body(c):
        stack_n, stack_i, sp, node, inst, t_best, active, payload = c
        co, cd = cur_ray(inst)
        inv_d = 1.0 / cd
        bmin = tl.bmin[node]
        bmax = tl.bmax[node]
        cnt = tl.count[node]
        hit_box = slab(bmin, bmax, co, inv_d, t_best) & active
        is_leaf = cnt > 0
        is_blas = node >= tl.tlas_n

        start = tl.start[node]
        # BLAS leaf: test triangles in object space
        for j in range(max_leaf):
            pid = tl.ids[jnp.clip(start + j, 0, tl.ids.shape[0] - 1)]
            m = hit_box & is_leaf & is_blas & (j < cnt)
            t_best, payload = leaf_fn(pid, inst, m, co, cd, t_best, payload)
        # TLAS leaf: push each instance's BLAS root (tagged with the id)
        for j in range(max_leaf):
            iid = tl.ids[jnp.clip(start + j, 0, tl.ids.shape[0] - 1)]
            m = hit_box & is_leaf & ~is_blas & (j < cnt) & (sp < MAX_STACK)
            sl = jnp.minimum(sp, MAX_STACK - 1)
            stack_n = stack_n.at[lanes, sl].set(
                jnp.where(m, tl.blas_root[iid], stack_n[lanes, sl]))
            stack_i = stack_i.at[lanes, sl].set(
                jnp.where(m, iid, stack_i[lanes, sl]))
            sp = jnp.where(m, sp + 1, sp)

        # interior & hit: push right sibling (same space as current node),
        # descend to left (node+1)
        push = hit_box & ~is_leaf & (sp < MAX_STACK)
        sl = jnp.minimum(sp, MAX_STACK - 1)
        stack_n = stack_n.at[lanes, sl].set(
            jnp.where(push, tl.right[node], stack_n[lanes, sl]))
        stack_i = stack_i.at[lanes, sl].set(
            jnp.where(push, inst, stack_i[lanes, sl]))
        sp = jnp.where(push, sp + 1, sp)
        node = jnp.where(push, node + 1, node)

        # otherwise pop (leaf processed or box missed)
        need_pop = active & ~push
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        sl = jnp.minimum(sp, MAX_STACK - 1)
        node = jnp.where(can_pop, stack_n[lanes, sl], node)
        inst = jnp.where(can_pop, stack_i[lanes, sl], inst)
        active = active & ~(need_pop & ~can_pop)
        return stack_n, stack_i, sp, node, inst, t_best, active, payload

    out = jax.lax.while_loop(
        cond, body,
        (stack_n, stack_i, sp, node, inst, t_best, active, payload0))
    return out[5], out[7]


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
