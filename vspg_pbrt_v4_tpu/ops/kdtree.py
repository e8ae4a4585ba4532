"""Kd-tree aggregate: host-side SAH build + lockstep traversal.

Analog of the reference's ``KdTreeAggregate`` (cpu/aggregates.h:76,
aggregates.cpp BuildTree/Intersect): axis-aligned BSP with SAH splits at
primitive-bound edges, leaves holding primitive lists, and the classic
(node, tMin, tMax) stack traversal. The build runs in numpy at scene
construction; traversal is a branchless ``lax.while_loop`` with per-lane
fixed-depth stacks, mirroring ops/bvh.py's wavefront traversal so the two
aggregates are drop-in interchangeable (and cross-check each other).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_STACK = 48


class KdTree(NamedTuple):
    axis: jnp.ndarray  # (N,) split axis 0/1/2, 3 = leaf
    split: jnp.ndarray  # (N,) split position
    above: jnp.ndarray  # (N,) index of the above child (below = node+1)
    start: jnp.ndarray  # (N,) leaf prim start
    count: jnp.ndarray  # (N,) leaf prim count
    prim_ids: jnp.ndarray  # (P',) leaf primitive lists (prims may repeat)
    bmin: jnp.ndarray  # (3,) world bounds of the whole tree
    bmax: jnp.ndarray

    @property
    def max_leaf(self):
        return 8


def build_kdtree(prim_bmin, prim_bmax, max_leaf=8, isect_cost=5.0,
                 trav_cost=1.0, empty_bonus=0.5):
    """SAH kd-tree over primitive bounds (aggregates.cpp:~BuildTree)."""
    prim_bmin = np.asarray(prim_bmin, np.float64)
    prim_bmax = np.asarray(prim_bmax, np.float64)
    P = prim_bmin.shape[0]
    world_min = prim_bmin.min(0) - 1e-5
    world_max = prim_bmax.max(0) + 1e-5
    max_depth = int(8 + 1.3 * np.log2(max(P, 2)))

    axis_l, split_l, above_l, start_l, count_l = [], [], [], [], []
    prim_list = []

    def new_node():
        axis_l.append(3)
        split_l.append(0.0)
        above_l.append(0)
        start_l.append(0)
        count_l.append(0)
        return len(axis_l) - 1

    def make_leaf(ni, ids):
        axis_l[ni] = 3
        start_l[ni] = len(prim_list)
        count_l[ni] = len(ids)
        prim_list.extend(int(i) for i in ids)

    def build(ni, ids, nb_min, nb_max, depth):
        if len(ids) <= max_leaf or depth >= max_depth:
            make_leaf(ni, ids)
            return
        # SAH sweep over bound edges on each axis
        ext = nb_max - nb_min
        total_sa = 2 * (ext[0] * ext[1] + ext[1] * ext[2] + ext[2] * ext[0])
        inv_sa = 1.0 / max(total_sa, 1e-20)
        old_cost = isect_cost * len(ids)
        best = (np.inf, -1, 0.0)  # cost, axis, pos
        for ax in np.argsort(-ext):  # try largest extent first
            lo = prim_bmin[ids, ax]
            hi = prim_bmax[ids, ax]
            edges = np.concatenate([lo, hi])
            kinds = np.concatenate([np.zeros(len(ids)), np.ones(len(ids))])
            order = np.lexsort((kinds, edges))
            edges = edges[order]
            kinds = kinds[order]
            n_below = np.cumsum(kinds == 0)  # starts below after passing
            n_above = len(ids) - np.cumsum(kinds == 1)
            # candidate split at each edge strictly inside the node
            inside = (edges > nb_min[ax]) & (edges < nb_max[ax])
            if not inside.any():
                continue
            o_ax = [a for a in range(3) if a != ax]
            d0, d1 = ext[o_ax[0]], ext[o_ax[1]]
            below_sa = 2 * (d0 * d1 + (edges - nb_min[ax]) * (d0 + d1))
            above_sa = 2 * (d0 * d1 + (nb_max[ax] - edges) * (d0 + d1))
            # counts AT the edge: below includes starts before-or-at for
            # end edges; use pbrt convention: process end edges before
            # counting below (lexsort puts starts (kind 0) first at ties)
            nb = np.where(kinds == 1, n_below, n_below - (kinds == 0))
            na = n_above
            pb = below_sa * inv_sa
            pa = above_sa * inv_sa
            eb = np.where((nb == 0) | (na == 0), empty_bonus, 0.0)
            cost = trav_cost + isect_cost * (1 - eb) * (pb * nb + pa * na)
            cost = np.where(inside, cost, np.inf)
            k = int(np.argmin(cost))
            if cost[k] < best[0]:
                best = (float(cost[k]), int(ax), float(edges[k]))
            if best[0] < old_cost:
                break  # good split on the widest axis: take it
        if best[1] < 0 or best[0] > 4.0 * old_cost:
            make_leaf(ni, ids)
            return
        _, ax, pos = best
        # Inclusive classification: a prim goes below if any part of it is
        # below the plane OR it ends exactly at the plane; above if any part
        # is above OR it starts exactly at the plane. Zero-extent prims lying
        # exactly on the plane (bmin==bmax==pos) land in BOTH children, never
        # in neither — matching the guarantee of the reference's edge-index
        # classification (aggregates.cpp prims0/prims1 around bestOffset).
        lo_ax = prim_bmin[ids, ax]
        hi_ax = prim_bmax[ids, ax]
        left_ids = ids[(lo_ax < pos) | (hi_ax <= pos)]
        right_ids = ids[(hi_ax > pos) | (lo_ax >= pos)]
        if len(left_ids) == len(ids) and len(right_ids) == len(ids):
            make_leaf(ni, ids)
            return
        axis_l[ni] = ax
        split_l[ni] = pos
        below = new_node()
        assert below == ni + 1
        lb_max = nb_max.copy()
        lb_max[ax] = pos
        build(below, left_ids, nb_min, lb_max, depth + 1)
        above = new_node()
        above_l[ni] = above
        rb_min = nb_min.copy()
        rb_min[ax] = pos
        build(above, right_ids, rb_min, nb_max, depth + 1)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(10000 + 16 * max_depth)
    root = new_node()
    build(root, np.arange(P), world_min.copy(), world_max.copy(), 0)
    sys.setrecursionlimit(old_limit)

    return KdTree(
        jnp.asarray(axis_l, jnp.int32), jnp.asarray(split_l, jnp.float32),
        jnp.asarray(above_l, jnp.int32), jnp.asarray(start_l, jnp.int32),
        jnp.asarray(count_l, jnp.int32),
        jnp.asarray(prim_list or [0], jnp.int32),
        jnp.asarray(world_min, jnp.float32),
        jnp.asarray(world_max, jnp.float32),
    )


def kdtree_traverse(kd: KdTree, o, d, t_max, leaf_fn, payload0, max_leaf=8):
    """Closest-hit traversal (aggregates.cpp KdTreeAggregate::Intersect).

    leaf_fn(prim_id (R,), mask (R,), t_best, payload) -> (t_best, payload).
    Early exit per lane once t_best < the node interval's tMin.
    """
    R = o.shape[0]
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / safe_d
    lanes = jnp.arange(R)

    # clip to world bounds
    t_lo = (kd.bmin - o) * inv_d
    t_hi = (kd.bmax - o) * inv_d
    t0 = jnp.maximum(jnp.nanmax(jnp.minimum(t_lo, t_hi), -1), 0.0)
    t1 = jnp.minimum(jnp.nanmin(jnp.maximum(t_lo, t_hi), -1), t_max)

    stack_node = jnp.zeros((R, MAX_STACK), jnp.int32)
    stack_t0 = jnp.zeros((R, MAX_STACK))
    stack_t1 = jnp.zeros((R, MAX_STACK))
    sp = jnp.zeros((R,), jnp.int32)
    node = jnp.zeros((R,), jnp.int32)
    leaf_off = jnp.zeros((R,), jnp.int32)
    active = (t0 <= t1) & (t_max > 0)
    t_best = t_max

    def cond(c):
        return jnp.any(c[0][3])

    def body(c):
        (node, t0, t1, active, t_best, sp, leaf_off), stacks, payload = c
        stack_node, stack_t0, stack_t1 = stacks
        ax = kd.axis[node]
        # an interval that starts beyond the best hit cannot contain a
        # closer one: treat the node as an empty leaf (early exit ala
        # aggregates.cpp "if (tHit < tMin) break" pruning)
        pruned = t0 > t_best * (1.0 + 1e-6)
        start = kd.start[node]
        cnt = kd.count[node]
        # leaves may hold more than max_leaf prims (depth cutoff / cost-based
        # leaves): iterate the leaf in max_leaf-sized chunks, carrying
        # leaf_off across loop iterations so every prim is tested.
        is_leaf = ax == 3
        leaf_done = leaf_off + max_leaf >= cnt
        done_node = (is_leaf & leaf_done) | pruned

        # real leaf: test the current chunk of prims
        for j in range(max_leaf):
            idx = start + leaf_off + j
            pid = kd.prim_ids[jnp.clip(idx, 0, kd.prim_ids.shape[0] - 1)]
            m = active & is_leaf & ~pruned & (leaf_off + j < cnt)
            t_best, payload = leaf_fn(pid, m, t_best, payload)
        cont_leaf = active & is_leaf & ~pruned & ~leaf_done
        leaf_off = jnp.where(cont_leaf, leaf_off + max_leaf, 0)

        # interior: order children, maybe push far
        axc = jnp.clip(ax, 0, 2)
        o_ax = jnp.take_along_axis(o, axc[:, None], 1)[:, 0]
        inv_ax = jnp.take_along_axis(inv_d, axc[:, None], 1)[:, 0]
        t_split = (kd.split[node] - o_ax) * inv_ax
        below_first = (o_ax < kd.split[node]) | (
            (o_ax == kd.split[node]) & (inv_ax <= 0))
        first = jnp.where(below_first, node + 1, kd.above[node])
        second = jnp.where(below_first, kd.above[node], node + 1)
        # precedence per aggregates.cpp: the behind-origin / beyond-tMax
        # case wins (the ray stays on the origin's side for t > 0)
        only_first = (t_split > t1) | (t_split <= 0)
        only_second = (t_split < t0) & ~only_first
        both = ~only_first & ~only_second
        interior = active & ~is_leaf & ~pruned

        push = interior & both & (sp < MAX_STACK)
        spc = jnp.minimum(sp, MAX_STACK - 1)
        stack_node = stack_node.at[lanes, spc].set(
            jnp.where(push, second, stack_node[lanes, spc]))
        stack_t0 = stack_t0.at[lanes, spc].set(
            jnp.where(push, t_split, stack_t0[lanes, spc]))
        stack_t1 = stack_t1.at[lanes, spc].set(
            jnp.where(push, t1, stack_t1[lanes, spc]))
        sp = jnp.where(push, sp + 1, sp)
        node = jnp.where(interior,
                         jnp.where(only_second, second, first), node)
        t1 = jnp.where(interior & both, t_split, t1)
        t0 = jnp.where(interior & only_second,
                       jnp.maximum(t0, t_split), t0)

        # done with this node (leaf or pruned): pop or die
        need_pop = active & done_node
        can_pop = need_pop & (sp > 0)
        sp = jnp.where(can_pop, sp - 1, sp)
        spc2 = jnp.minimum(sp, MAX_STACK - 1)
        node = jnp.where(can_pop, stack_node[lanes, spc2], node)
        t0 = jnp.where(can_pop, stack_t0[lanes, spc2], t0)
        t1 = jnp.where(can_pop, stack_t1[lanes, spc2], t1)
        active = active & ~(need_pop & ~can_pop)
        return ((node, t0, t1, active, t_best, sp, leaf_off),
                (stack_node, stack_t0, stack_t1), payload)

    state0 = ((node, t0, t1, active, t_best, sp, leaf_off),
              (stack_node, stack_t0, stack_t1), payload0)
    (node, t0, t1, active, t_best, sp, leaf_off), _, payload = \
        jax.lax.while_loop(cond, body, state0)
    return t_best, payload
