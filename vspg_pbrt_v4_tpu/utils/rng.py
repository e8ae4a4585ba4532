"""Stateless counter-based RNG for wavefront Monte Carlo on TPU.

The reference threads a mutable PCG32 through each recursive path
(``src/pbrt/util/rng.h``; seeded by ``Hash(pPixel, sampleIndex, ...)``,
e.g. ``cpu/guidedvolpathvspgintegrator.cpp:323-325``). A wavefront TPU
renderer wants no carried RNG state at all: every random number is a pure
function of (seed, pixel_id, sample_index, depth, dimension). We use the
pcg4d hash (Jarzynski & Olano, JCGT 2020) — 4 parallel 32-bit LCG+shuffle
lanes, high quality for MC integration, a handful of VPU int ops per draw,
and trivially vectorized over millions of rays.

All functions take uint32/int32 arrays of any (broadcastable) shape and
return float32 in [0, 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
# float in [0,1): use top 24 bits to stay exact in f32 and strictly < 1.
# numpy scalar on purpose: jnp.float32(...) at module level would commit a
# device op at import time, breaking the driver's CPU-pinned multichip dryrun.
_INV_2_24 = np.float32(1.0 / (1 << 24))


def _pcg4d(a, b, c, d):
    """pcg4d mix of four uint32 lanes -> four uint32 lanes."""
    a = a.astype(_U32)
    b = b.astype(_U32)
    c = c.astype(_U32)
    d = d.astype(_U32)
    mult = _U32(1664525)
    inc = _U32(1013904223)
    a = a * mult + inc
    b = b * mult + inc
    c = c * mult + inc
    d = d * mult + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def hash_u32(*words):
    """Mix arbitrary integer words into one uint32 (pbrt Hash() analog)."""
    ws = [jnp.asarray(w).astype(_U32) for w in words]
    while len(ws) < 4:
        ws.append(jnp.zeros_like(ws[0]))
    a, b, c, d = ws[0], ws[1], ws[2], ws[3]
    for w in ws[4:]:
        a, b, c, d = _pcg4d(a ^ w, b, c, d)
    a, b, c, d = _pcg4d(a, b, c, d)
    return d


def _to_unit_float(u):
    return (u >> _U32(8)).astype(jnp.float32) * _INV_2_24


def uniform4(seed, pixel_id, sample_index, dim):
    """Four independent U[0,1) floats for each counter tuple."""
    a, b, c, d = _pcg4d(pixel_id, sample_index, dim, seed)
    return (
        _to_unit_float(a),
        _to_unit_float(b),
        _to_unit_float(c),
        _to_unit_float(d),
    )


def uniform1(seed, pixel_id, sample_index, dim):
    return uniform4(seed, pixel_id, sample_index, dim)[0]


def uniform2(seed, pixel_id, sample_index, dim):
    """Two U[0,1) floats stacked on a trailing axis (for 2D warps)."""
    a, b, _, _ = uniform4(seed, pixel_id, sample_index, dim)
    return jnp.stack([a, b], axis=-1)


def uniform3(seed, pixel_id, sample_index, dim):
    a, b, c, _ = uniform4(seed, pixel_id, sample_index, dim)
    return jnp.stack([a, b, c], axis=-1)


def uniform_u32(seed, pixel_id, sample_index, dim):
    """Raw uint32 draw (for index/permutation uses)."""
    return _pcg4d(pixel_id, sample_index, dim, seed)[0]
