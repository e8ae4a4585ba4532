"""Perlin gradient noise + fBm/turbulence (util/noise analog).

The reference evaluates Ken Perlin's gradient noise through a fixed
permutation table (util/math.cpp NoisePerm + Noise/FBm/Turbulence,
pbrt book 10.6). Here the lattice hash is computed arithmetically
(pcg-style integer mixing) instead of a table: identical statistical
properties, no gathers — friendlier to the TPU vector unit.
"""

from __future__ import annotations

import jax.numpy as jnp


def _hash3(ix, iy, iz):
    h = (ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ iz.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h ^= h >> 15
    h *= jnp.uint32(0x2C1B3C6D)
    h ^= h >> 12
    h *= jnp.uint32(0x297A2D39)
    h ^= h >> 15
    return h


def _grad(h, x, y, z):
    """Perlin's 12-edge gradient set selected by the low hash bits."""
    h = (h & 15).astype(jnp.int32)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return (jnp.where(h & 1 == 0, u, -u)
            + jnp.where(h & 2 == 0, v, -v))


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin(p):
    """Gradient noise in [-1, 1] for points p: (..., 3)."""
    pf = jnp.floor(p)
    ix = pf[..., 0].astype(jnp.int32)
    iy = pf[..., 1].astype(jnp.int32)
    iz = pf[..., 2].astype(jnp.int32)
    x = p[..., 0] - pf[..., 0]
    y = p[..., 1] - pf[..., 1]
    z = p[..., 2] - pf[..., 2]
    u, v, w = _fade(x), _fade(y), _fade(z)

    def corner(dx, dy, dz):
        h = _hash3(ix + dx, iy + dy, iz + dz)
        return _grad(h, x - dx, y - dy, z - dz)

    c000 = corner(0, 0, 0)
    c100 = corner(1, 0, 0)
    c010 = corner(0, 1, 0)
    c110 = corner(1, 1, 0)
    c001 = corner(0, 0, 1)
    c101 = corner(1, 0, 1)
    c011 = corner(0, 1, 1)
    c111 = corner(1, 1, 1)
    x00 = c000 + u * (c100 - c000)
    x10 = c010 + u * (c110 - c010)
    x01 = c001 + u * (c101 - c001)
    x11 = c011 + u * (c111 - c011)
    y0 = x00 + v * (x10 - x00)
    y1 = x01 + v * (x11 - x01)
    return y0 + w * (y1 - y0)


def fbm(p, omega=0.5, octaves=6):
    """Fractional Brownian motion (util FBm semantics, fixed octave count)."""
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, 1.0
    for _ in range(int(octaves)):
        total = total + o * perlin(p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, omega=0.5, octaves=6):
    """Sum of |noise| octaves (util Turbulence semantics)."""
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, 1.0
    for _ in range(int(octaves)):
        total = total + o * jnp.abs(perlin(p * lam))
        lam *= 1.99
        o *= omega
    return total
