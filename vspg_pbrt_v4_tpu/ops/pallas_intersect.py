"""Pallas TPU kernel: fused ray x triangle closest-hit (brute force).

The wavefront's small-scene intersection path as a single fused kernel:
each grid step owns a tile of rays in VMEM, sweeps all triangles in
TILE_T-column chunks (also VMEM-resident), evaluates Moller-Trumbore for the
(TILE_R x TILE_T) pair block on the VPU, and keeps a running arg-min of hit
distances — no HBM round-trips between chunks, unlike the XLA while_loop
formulation whose per-iteration state spills to HBM.

Memory layout is transposed SoA: rays as (8, R) component rows and triangles
as (16, T) component rows, so every in-kernel access is a contiguous row
slice (Mosaic lowers row vectors cleanly; strided column gathers don't).

Interpret-mode execution doubles as the cross-backend correctness test
against models/shapes.py brute force (SURVEY.md §4's pallas-vs-jnp idiom).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256  # rays per grid step
TILE_T = 256  # triangle chunk


def _kernel(rays_ref, tris_ref, n_tri_ref, t_ref, idx_ref, b0_ref, b1_ref):
    # rays: (8, TILE_R) rows [ox oy oz dx dy dz _ _]
    ox = rays_ref[0, :][:, None]  # (TILE_R, 1)
    oy = rays_ref[1, :][:, None]
    oz = rays_ref[2, :][:, None]
    dx = rays_ref[3, :][:, None]
    dy = rays_ref[4, :][:, None]
    dz = rays_ref[5, :][:, None]
    n_tri = n_tri_ref[0]
    T_pad = tris_ref.shape[1]

    t_best = jnp.full((TILE_R, 1), jnp.inf, jnp.float32)
    idx_best = jnp.full((TILE_R, 1), -1, jnp.int32)
    b0_best = jnp.zeros((TILE_R, 1), jnp.float32)
    b1_best = jnp.zeros((TILE_R, 1), jnp.float32)

    def chunk(ci, carry):
        t_best, idx_best, b0_best, b1_best = carry
        base = ci * TILE_T
        # tris: (16, T) rows [p0x p0y p0z e1x e1y e1z e2x e2y e2z ...]
        p0x = tris_ref[0, pl.ds(base, TILE_T)][None, :]  # (1, TILE_T)
        p0y = tris_ref[1, pl.ds(base, TILE_T)][None, :]
        p0z = tris_ref[2, pl.ds(base, TILE_T)][None, :]
        e1x = tris_ref[3, pl.ds(base, TILE_T)][None, :]
        e1y = tris_ref[4, pl.ds(base, TILE_T)][None, :]
        e1z = tris_ref[5, pl.ds(base, TILE_T)][None, :]
        e2x = tris_ref[6, pl.ds(base, TILE_T)][None, :]
        e2y = tris_ref[7, pl.ds(base, TILE_T)][None, :]
        e2z = tris_ref[8, pl.ds(base, TILE_T)][None, :]

        # pvec = d x e2  -> (TILE_R, TILE_T) per component
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        b1v = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        b2v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_T), 1)
        valid = (
            (jnp.abs(det) > 1e-12)
            & (b1v >= 0.0) & (b2v >= 0.0) & (b1v + b2v <= 1.0)
            & (tt > 1e-5) & (tt < t_best)
            & (tri_ids < n_tri)
        )
        tt = jnp.where(valid, tt, jnp.inf)
        t_new = jnp.min(tt, axis=1, keepdims=True)
        closer = t_new < t_best
        # gather-free arg-min: select the minimal column by id (reductions
        # only — Mosaic has no gather lowering)
        is_min = valid & (tt == t_new)
        big = jnp.int32(2**31 - 1)
        idx_new = jnp.min(jnp.where(is_min, tri_ids, big), axis=1,
                          keepdims=True)
        is_sel = is_min & (tri_ids == idx_new)
        b1_new = jnp.sum(jnp.where(is_sel, b1v, 0.0), axis=1, keepdims=True)
        b2_new = jnp.sum(jnp.where(is_sel, b2v, 0.0), axis=1, keepdims=True)
        t_best = jnp.where(closer, t_new, t_best)
        idx_best = jnp.where(closer, idx_new, idx_best)
        b0_best = jnp.where(closer, 1.0 - b1_new - b2_new, b0_best)
        b1_best = jnp.where(closer, b1_new, b1_best)
        return t_best, idx_best, b0_best, b1_best

    n_chunks = T_pad // TILE_T
    t_best, idx_best, b0_best, b1_best = jax.lax.fori_loop(
        0, n_chunks, chunk, (t_best, idx_best, b0_best, b1_best))
    t_ref[:] = t_best
    idx_ref[:] = idx_best
    b0_ref[:] = b0_best
    b1_ref[:] = b1_best


@partial(jax.jit, static_argnames=("interpret",))
def intersect_tris_pallas(o, d, p0, p1, p2, interpret=False):
    """Closest hit of R rays against T triangles.

    Returns (t (R,), tri_idx (R,), b0 (R,), b1 (R,)) with t=inf, idx=-1 on
    miss. Pads rays to TILE_R and triangles to TILE_T internally.
    """
    R = o.shape[0]
    T = p0.shape[0]
    R_pad = max((R + TILE_R - 1) // TILE_R * TILE_R, TILE_R)
    T_pad = max((T + TILE_T - 1) // TILE_T * TILE_T, TILE_T)

    # transposed SoA ray rows (8, R_pad); padded rays get d=(0,0,1)
    rays = jnp.zeros((8, R_pad), jnp.float32)
    rays = rays.at[0:3, :R].set(o.T)
    rays = rays.at[3:6, :R].set(d.T)
    rays = rays.at[5, R:].set(1.0)
    # transposed tri rows (16, T_pad): p0, e1, e2
    tris = jnp.zeros((16, T_pad), jnp.float32)
    tris = tris.at[0:3, :T].set(p0.T)
    tris = tris.at[3:6, :T].set((p1 - p0).T)
    tris = tris.at[6:9, :T].set((p2 - p0).T)

    grid = (R_pad // TILE_R,)
    t, idx, b0, b1 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((R_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rays, tris, jnp.asarray([T], jnp.int32))
    return t[:R, 0], idx[:R, 0], b0[:R, 0], b1[:R, 0]
