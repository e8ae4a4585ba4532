"""Pallas TPU kernel: fused ray x triangle closest-hit (brute force).

The wavefront's small-scene intersection path as a single fused kernel:
each grid step owns a tile of rays in VMEM, sweeps all triangles in
TILE_T-column chunks (also VMEM-resident), evaluates Moller-Trumbore for the
(TILE_R x TILE_T) pair block on the VPU, and keeps a running arg-min of hit
distances — no HBM round-trips between chunks, unlike the XLA while_loop
formulation whose per-iteration state spills to HBM.

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

TILE_R = 128  # rays per grid step
TILE_T = 128  # triangle chunk


def _kernel(o_ref, d_ref, p0_ref, p1_ref, p2_ref, n_tri_ref, t_ref,
            idx_ref, b0_ref, b1_ref):
    o = o_ref[:]  # (TILE_R, 3)
    d = d_ref[:]
    n_tri = n_tri_ref[0]
    T_pad = p0_ref.shape[0]

    t_best = jnp.full((TILE_R,), jnp.inf, jnp.float32)
    idx_best = jnp.full((TILE_R,), -1, jnp.int32)
    b0_best = jnp.zeros((TILE_R,), jnp.float32)
    b1_best = jnp.zeros((TILE_R,), jnp.float32)

    def chunk(ci, carry):
        t_best, idx_best, b0_best, b1_best = carry
        base = ci * TILE_T
        p0 = p0_ref[pl.ds(base, TILE_T), :]  # (TILE_T, 3)
        p1 = p1_ref[pl.ds(base, TILE_T), :]
        p2 = p2_ref[pl.ds(base, TILE_T), :]
        e1 = p1 - p0  # (TILE_T,3)
        e2 = p2 - p0

        def cross_rt(a, b):
            # a: (R,1,3) x b: (1,T,3) -> (R,T,3) via components
            ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
            bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
            return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

        dR = d[:, None, :]  # (R,1,3)
        e2T = e2[None, :, :]  # (1,T,3)
        pvx, pvy, pvz = cross_rt(dR, e2T)  # (R,T)
        det = e1[None, :, 0] * pvx + e1[None, :, 1] * pvy + e1[None, :, 2] * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = o[:, None, :] - p0[None, :, :]  # (R,T,3)
        b1v = (tv[..., 0] * pvx + tv[..., 1] * pvy + tv[..., 2] * pvz) * inv_det
        qvx, qvy, qvz = cross_rt(tv, jnp.broadcast_to(e1[None, :, :], tv.shape))
        b2v = (d[:, None, 0] * qvx + d[:, None, 1] * qvy + d[:, None, 2] * qvz) * inv_det
        tt = (e2[None, :, 0] * qvx + e2[None, :, 1] * qvy + e2[None, :, 2] * qvz) * inv_det

        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_T), 1)
        valid = (
            (jnp.abs(det) > 1e-12)
            & (b1v >= 0.0) & (b2v >= 0.0) & (b1v + b2v <= 1.0)
            & (tt > 1e-5) & (tt < t_best[:, None])
            & (tri_ids < n_tri)
        )
        tt = jnp.where(valid, tt, jnp.inf)
        k = jnp.argmin(tt, axis=1)  # (R,)
        t_new = jnp.min(tt, axis=1)
        closer = t_new < t_best
        take = jnp.take_along_axis
        idx_new = take(tri_ids, k[:, None], 1)[:, 0]
        b0_new = 1.0 - take(b1v, k[:, None], 1)[:, 0] - take(b2v, k[:, None], 1)[:, 0]
        b1_new = take(b1v, k[:, None], 1)[:, 0]
        t_best = jnp.where(closer, t_new, t_best)
        idx_best = jnp.where(closer, idx_new, idx_best)
        b0_best = jnp.where(closer, b0_new, b0_best)
        b1_best = jnp.where(closer, b1_new, b1_best)
        return t_best, idx_best, b0_best, b1_best

    n_chunks = T_pad // TILE_T
    t_best, idx_best, b0_best, b1_best = jax.lax.fori_loop(
        0, n_chunks, chunk, (t_best, idx_best, b0_best, b1_best))
    t_ref[:, 0] = t_best
    idx_ref[:, 0] = idx_best
    b0_ref[:, 0] = b0_best
    b1_ref[:, 0] = b1_best


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

    def padr(x, n):
        return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))

    o_p, d_p = padr(o, R_pad), padr(d, R_pad)
    # pad direction with a safe non-zero axis to avoid 0-division noise
    d_p = jnp.where(jnp.arange(R_pad)[:, None] < R, d_p,
                    jnp.asarray([0.0, 0.0, 1.0]))
    p0_p, p1_p, p2_p = padr(p0, T_pad), padr(p1, T_pad), padr(p2, T_pad)

    grid = (R_pad // TILE_R,)
    t, idx, b0, b1 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(o_p, d_p, p0_p, p1_p, p2_p, jnp.asarray([T], jnp.int32))
    return t[:R, 0], idx[:R, 0], b0[:R, 0], b1[:R, 0]
