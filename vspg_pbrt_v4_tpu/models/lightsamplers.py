"""BVH light sampler — adaptive many-light selection.

TPU re-design of the reference's ``BVHLightSampler``
(src/pbrt/lightsamplers.h:260-464, lightsamplers.cpp:73-318): finite lights
(point/spot/area) are organized in a host-built bounding-volume hierarchy
whose nodes carry a *light cone* (axis, emission spread theta_o, falloff
spread theta_e) and total power phi; selection walks the tree choosing a
child proportionally to a conservative importance estimate from the shading
point, remapping the selection uniform at each level.

Differences from the reference, by design:
- Nodes live in flat SoA arrays, the walk is a fixed-trip-count
  ``lax.fori_loop`` over lanes (no recursion/stack), so the whole wavefront
  selects lights in lockstep.
- PMF queries (needed for MIS at emissive hits) replay the root-to-leaf
  path from a precomputed per-light bit trail
  (lightsamplers.h:341-366 ``lightToBitTrail`` semantics).
- The importance function never uses the shading normal (the cosTheta_i
  factor of lightsamplers.h:190-196): sample() and PMF() are evaluated at
  different path vertices in the wavefront integrators, and MIS requires
  both to agree exactly. Dropping the normal term keeps them consistent
  (and valid at volume vertices) at slightly higher variance.
- Build uses a median split on the largest centroid axis instead of the
  cone-measure SAH sweep (lightsamplers.cpp:147-236) — a correctness-first
  choice: any topology is unbiased, only the variance differs.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np


@struct.dataclass
class LightBVH:
    """Flat light-BVH arrays. N nodes (2L-1 for L lights, preorder)."""

    bmin: jnp.ndarray  # (N,3)
    bmax: jnp.ndarray  # (N,3)
    axis: jnp.ndarray  # (N,3) cone axis
    phi: jnp.ndarray  # (N,) power
    cos_o: jnp.ndarray  # (N,) emission-spread cosine
    cos_e: jnp.ndarray  # (N,) falloff-spread cosine
    two_sided: jnp.ndarray  # (N,) bool
    child1: jnp.ndarray  # (N,) int32 right child (left is i+1); -1 at leaves
    leaf_light: jnp.ndarray  # (N,) int32 global light index; -1 internal
    trail: jnp.ndarray  # (L,) uint32 root-to-leaf branch bits per light
    trail_node: jnp.ndarray  # (Lg,) int32 leaf node per *global* light (-1)
    max_depth: int = struct.field(pytree_node=False)


class _BuildLight(NamedTuple):
    bmin: np.ndarray
    bmax: np.ndarray
    axis: np.ndarray
    phi: float
    cos_o: float
    cos_e: float
    two_sided: bool
    global_idx: int


def _cone_union(a_axis, a_cos, b_axis, b_cos):
    """Union of two direction cones (DirectionCone::Union semantics,
    util/vecmath.h) — conservative: returns (axis, cos_spread)."""
    ta = math.acos(max(-1.0, min(1.0, a_cos)))
    tb = math.acos(max(-1.0, min(1.0, b_cos)))
    d = float(np.dot(a_axis, b_axis))
    td = math.acos(max(-1.0, min(1.0, d)))
    if min(td + tb, math.pi) <= ta:
        return a_axis, a_cos
    if min(td + ta, math.pi) <= tb:
        return b_axis, b_cos
    to = (ta + td + tb) / 2
    if to >= math.pi:
        return a_axis, -1.0
    # rotate a_axis toward b_axis by (to - ta)
    rot = to - ta
    axis = np.cross(a_axis, b_axis)
    n = np.linalg.norm(axis)
    if n < 1e-9:
        return a_axis, -1.0
    axis = axis / n
    c, s = math.cos(rot), math.sin(rot)
    w = (a_axis * c + np.cross(axis, a_axis) * s
         + axis * np.dot(axis, a_axis) * (1 - c))
    return w / max(np.linalg.norm(w), 1e-12), math.cos(to)


def build_light_bvh(lights) -> LightBVH | None:
    """Host-side build over the finite lights of a Lights pytree.

    Returns None when there are no finite lights (BVH unused)."""
    import numpy as np

    bl: list[_BuildLight] = []
    n_pt = lights.point_p.shape[0]
    n_sp = lights.spot_p.shape[0]
    n_di = lights.distant_dir.shape[0]
    pp = np.asarray(lights.point_p)
    pI = np.asarray(lights.point_I)
    for i in range(n_pt):
        # PointLight::Bounds (lights.cpp): isotropic, theta_o=pi, theta_e=pi/2
        bl.append(_BuildLight(pp[i], pp[i], np.array([0.0, 0.0, 1.0]),
                              4 * np.pi * float(pI[i].mean()), -1.0, 0.0,
                              False, i))
    sp = np.asarray(lights.spot_p)
    sI = np.asarray(lights.spot_I)
    sd = np.asarray(lights.spot_dir)
    sct = np.asarray(lights.spot_cos_total)
    scs = np.asarray(lights.spot_cos_start)
    for i in range(n_sp):
        phi = (2 * np.pi * float(sI[i].mean())
               * ((1 - scs[i]) + (scs[i] - sct[i]) / 2))
        bl.append(_BuildLight(sp[i], sp[i], sd[i], max(phi, 1e-9),
                              float(sct[i]), 0.0, False, n_pt + i))
    # goniometric / projection lights: conservative isotropic cones
    gp = np.asarray(lights.gonio_p)
    gI = np.asarray(lights.gonio_I)
    g_mean = (np.asarray(lights.gonio_img).mean(axis=(1, 2, 3))
              if lights.n_gonio else np.zeros(0))
    for i in range(lights.n_gonio):
        bl.append(_BuildLight(gp[i], gp[i], np.array([0.0, 0.0, 1.0]),
                              max(4 * np.pi * float(gI[i].mean())
                                  * float(g_mean[i]), 1e-9),
                              -1.0, 0.0, False, lights.base_gonio + i))
    pp2 = np.asarray(lights.proj_p)
    pI2 = np.asarray(lights.proj_I)
    p_mean = (np.asarray(lights.proj_img).mean(axis=(1, 2, 3))
              if lights.n_proj else np.zeros(0))
    for i in range(lights.n_proj):
        bl.append(_BuildLight(pp2[i], pp2[i], np.array([0.0, 0.0, 1.0]),
                              max(4 * np.pi * float(pI2[i].mean())
                                  * float(p_mean[i]), 1e-9),
                              -1.0, 0.0, False, lights.base_proj + i))
    p0 = np.asarray(lights.area_p0)
    p1 = np.asarray(lights.area_p1)
    p2 = np.asarray(lights.area_p2)
    aL = np.asarray(lights.area_L)
    two = np.asarray(lights.area_twosided)
    base_a = lights.base_area
    for i in range(p0.shape[0]):
        nrm = np.cross(p1[i] - p0[i], p2[i] - p0[i])
        area = 0.5 * np.linalg.norm(nrm)
        axis = nrm / max(np.linalg.norm(nrm), 1e-12)
        phi = float(aL[i].mean()) * area * np.pi * (2.0 if two[i] else 1.0)
        bmin = np.minimum(np.minimum(p0[i], p1[i]), p2[i])
        bmax = np.maximum(np.maximum(p0[i], p1[i]), p2[i])
        bl.append(_BuildLight(bmin, bmax, axis, max(phi, 1e-9), 1.0, 0.0,
                              bool(two[i]), base_a + i))
    L = len(bl)
    if L == 0:
        return None

    N = 2 * L - 1
    bmin = np.zeros((N, 3), np.float32)
    bmax = np.zeros((N, 3), np.float32)
    axis = np.zeros((N, 3), np.float32)
    phi = np.zeros(N, np.float32)
    cos_o = np.zeros(N, np.float32)
    cos_e = np.zeros(N, np.float32)
    two_s = np.zeros(N, bool)
    child1 = np.full(N, -1, np.int32)
    leaf_light = np.full(N, -1, np.int32)
    n_global = int(lights.n_lights)
    trail = np.zeros(L, np.uint32)
    trail_node = np.full(n_global, -1, np.int32)
    cursor = [0]
    max_depth = [0]

    def emit(items, bits, depth):
        me = cursor[0]
        cursor[0] += 1
        max_depth[0] = max(max_depth[0], depth)
        if len(items) == 1:
            it = items[0]
            bmin[me], bmax[me] = it.bmin, it.bmax
            axis[me], phi[me] = it.axis, it.phi
            cos_o[me], cos_e[me] = it.cos_o, it.cos_e
            two_s[me] = it.two_sided
            leaf_light[me] = it.global_idx
            trail_node[it.global_idx] = me
            trail_by_node[me] = bits
            return me
        cents = np.stack([(i.bmin + i.bmax) * 0.5 for i in items])
        dim = int(np.argmax(cents.max(0) - cents.min(0)))
        order = np.argsort(cents[:, dim], kind="stable")
        items = [items[k] for k in order]
        half = len(items) // 2
        emit(items[:half], bits, depth + 1)  # left child = me+1 (preorder)
        right = emit(items[half:], bits | (1 << depth), depth + 1)
        child1[me] = right
        lo = np.minimum.reduce([i.bmin for i in items]).astype(np.float32)
        hi = np.maximum.reduce([i.bmax for i in items]).astype(np.float32)
        bmin[me], bmax[me] = lo, hi
        phi[me] = sum(i.phi for i in items)
        ax, co = items[0].axis, items[0].cos_o
        for it in items[1:]:
            ax, co = _cone_union(ax, co, it.axis, it.cos_o)
        axis[me], cos_o[me] = ax, co
        cos_e[me] = min(i.cos_e for i in items)
        two_s[me] = any(i.two_sided for i in items)
        return me

    trail_by_node: dict[int, int] = {}
    emit(bl, 0, 0)
    # per-GLOBAL-light trail (uint32, consumed LSB-first during descent)
    trail_global = np.zeros(n_global, np.uint32)
    for node, bits in trail_by_node.items():
        trail_global[leaf_light[node]] = bits
    return LightBVH(
        jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(axis),
        jnp.asarray(phi), jnp.asarray(cos_o), jnp.asarray(cos_e),
        jnp.asarray(two_s), jnp.asarray(child1), jnp.asarray(leaf_light),
        jnp.asarray(trail_global), jnp.asarray(trail_node),
        max(max_depth[0], 1),
    )


def _importance(bvh: LightBVH, node, p):
    """Conservative importance of `node` seen from points p: (R,).

    CompactLightBounds::Importance (lightsamplers.h:140-201) without the
    shading-normal factor (see module docstring)."""
    bmin = bvh.bmin[node]
    bmax = bvh.bmax[node]
    pc = 0.5 * (bmin + bmax)
    diag = bmax - bmin
    r2 = 0.25 * jnp.sum(diag * diag, -1)
    d2 = jnp.sum((p - pc) ** 2, -1)
    d2c = jnp.maximum(d2, r2)
    wi = (p - pc) / jnp.sqrt(jnp.maximum(d2, 1e-20))[..., None]
    cos_w = jnp.sum(bvh.axis[node] * wi, -1)
    cos_w = jnp.where(bvh.two_sided[node], jnp.abs(cos_w), cos_w)
    th_w = jnp.arccos(jnp.clip(cos_w, -1.0, 1.0))
    th_o = jnp.arccos(jnp.clip(bvh.cos_o[node], -1.0, 1.0))
    th_e = jnp.arccos(jnp.clip(bvh.cos_e[node], -1.0, 1.0))
    sin_u = jnp.sqrt(jnp.clip(r2 / jnp.maximum(d2, 1e-20), 0.0, 1.0))
    th_u = jnp.arcsin(sin_u)
    th_p = jnp.maximum(th_w - th_o - th_u, 0.0)
    ok = th_p < th_e
    imp = bvh.phi[node] * jnp.cos(th_p) / jnp.maximum(d2c, 1e-20)
    return jnp.where(ok, jnp.maximum(imp, 0.0), 0.0)


def bvh_select(bvh: LightBVH, p, u):
    """Descend the light BVH from points p with uniforms u.

    Returns (global_light_idx (R,) int32, pmf (R,), u_remaining (R,)).
    Lanes that hit a zero-importance subtree get pmf=0 / idx=-1."""
    R = p.shape[:-1]
    node = jnp.zeros(R, jnp.int32)
    pmf = jnp.ones(R)
    dead = jnp.zeros(R, bool)
    u = jnp.asarray(u)

    def body(_, c):
        node, pmf, u, dead = c
        is_leaf = bvh.leaf_light[node] >= 0
        c0 = node + 1
        c1 = bvh.child1[node]
        i0 = _importance(bvh, jnp.where(is_leaf, node, c0), p)
        i1 = _importance(bvh, jnp.where(is_leaf, node, c1), p)
        tot = i0 + i1
        live = ~is_leaf & ~dead
        dead = dead | (live & (tot <= 0))
        p0 = jnp.where(tot > 0, i0 / jnp.maximum(tot, 1e-30), 0.5)
        go0 = u < p0
        u_new = jnp.where(go0, u / jnp.maximum(p0, 1e-12),
                          (u - p0) / jnp.maximum(1 - p0, 1e-12))
        u_new = jnp.clip(u_new, 0.0, 0.9999999)
        upd = live & ~dead
        u = jnp.where(upd, u_new, u)
        pmf = jnp.where(upd, pmf * jnp.where(go0, p0, 1 - p0), pmf)
        node = jnp.where(upd, jnp.where(go0, c0, c1), node)
        return node, pmf, u, dead

    node, pmf, u, dead = jax.lax.fori_loop(
        0, bvh.max_depth + 1, body, (node, pmf, u, dead))
    light = jnp.where(dead, -1, bvh.leaf_light[node])
    pmf = jnp.where(dead, 0.0, pmf)
    return light, pmf, u


def bvh_pmf(bvh: LightBVH, p, global_light):
    """PMF of bvh_select(p) returning `global_light` — replays the stored
    bit trail (lightsamplers.h:341-366)."""
    R = p.shape[:-1]
    gl = jnp.clip(global_light, 0, bvh.trail_node.shape[0] - 1)
    # trail is indexed by global light id at build time
    trail = bvh.trail[jnp.clip(gl, 0, bvh.trail.shape[0] - 1)]
    node = jnp.zeros(R, jnp.int32)
    pmf = jnp.ones(R)
    bad = bvh.trail_node[gl] < 0

    def body(d, c):
        node, pmf = c
        is_leaf = bvh.leaf_light[node] >= 0
        c0 = node + 1
        c1 = bvh.child1[node]
        i0 = _importance(bvh, jnp.where(is_leaf, node, c0), p)
        i1 = _importance(bvh, jnp.where(is_leaf, node, c1), p)
        tot = i0 + i1
        bit = (trail >> d) & 1
        pr = jnp.where(bit == 0, i0, i1) / jnp.maximum(tot, 1e-30)
        upd = ~is_leaf
        pmf = jnp.where(upd, pmf * jnp.where(tot > 0, pr, 0.0), pmf)
        node = jnp.where(upd, jnp.where(bit == 0, c0, c1), node)
        return node, pmf

    node, pmf = jax.lax.fori_loop(0, bvh.max_depth + 1, body, (node, pmf))
    return jnp.where(bad | (global_light < 0), 0.0, pmf)
