"""Texture bank: procedural kinds + noise statistics.

Noise tests follow the reference's property-style checks: Perlin noise is
zero-mean, bounded, lattice-smooth; fBm/turbulence octave ladders scale as
expected. Texture kinds checked against closed forms.
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models import textures as T
from vspg_pbrt_v4_tpu.utils.noise import fbm, perlin, turbulence


def test_perlin_statistics():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-50, 50, (200_000, 3)).astype(np.float32))
    n = np.asarray(perlin(p))
    assert np.isfinite(n).all()
    assert abs(n.mean()) < 0.01
    assert np.abs(n).max() <= 1.2  # classic Perlin bound ~1
    # zero at lattice points (gradient noise property)
    lat = jnp.asarray(rng.integers(-10, 10, (1000, 3)).astype(np.float32))
    assert np.abs(np.asarray(perlin(lat))).max() < 1e-5


def test_fbm_turbulence():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-20, 20, (50_000, 3)).astype(np.float32))
    f = np.asarray(fbm(p, 0.5, 6))
    t = np.asarray(turbulence(p, 0.5, 6))
    assert np.isfinite(f).all() and np.isfinite(t).all()
    assert (t >= 0).all()
    assert abs(f.mean()) < 0.02
    assert t.mean() > 0.2  # |noise| has positive mean


def test_texture_kinds():
    bank = T.Textures.build([
        dict(kind=T.CONSTANT, c0=(0.25, 0.5, 0.75)),
        dict(kind=T.CHECKER, c0=(1, 1, 1), c1=(0, 0, 0), uvscale=(2, 2)),
        dict(kind=T.UV),
        dict(kind=T.MIX, c0=(0.25, 0.25, 0.25), inner=0, inner2=1),
        dict(kind=T.FBM, octaves=4, omega=0.5, scale=2.0),
        dict(kind=T.MARBLE, octaves=4, omega=0.5, scale=1.0, variation=0.3),
        dict(kind=T.SCALE, c0=(2, 2, 2), inner=0),
    ])
    n = 64
    rng = np.random.default_rng(2)
    uv = jnp.asarray(rng.random((n, 2), np.float32))
    p = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))

    v = np.asarray(T.eval_texture(bank, jnp.zeros(n, jnp.int32), uv, p))
    assert np.allclose(v, [0.25, 0.5, 0.75])
    # checker at quadrant centers
    uv2 = jnp.asarray([[0.2, 0.2], [0.7, 0.2]], jnp.float32)
    v2 = np.asarray(T.eval_texture(bank, jnp.ones(2, jnp.int32), uv2,
                                   jnp.zeros((2, 3))))
    assert np.allclose(v2[0], 1.0) and np.allclose(v2[1], 0.0)
    # uv kind returns the fractional uv
    v3 = np.asarray(T.eval_texture(bank, jnp.full((n,), 2, jnp.int32), uv, p))
    assert np.allclose(v3[:, :2], np.asarray(uv), atol=1e-6)
    # mix: 0.75*tex0 + 0.25*tex1(white where par==0)
    v4 = np.asarray(T.eval_texture(bank, jnp.full((2,), 3, jnp.int32), uv2,
                                   jnp.zeros((2, 3))))
    assert np.allclose(v4[0], 0.75 * np.asarray([0.25, 0.5, 0.75]) + 0.25)
    # fbm/marble finite + marble within plausible albedo range
    v5 = np.asarray(T.eval_texture(bank, jnp.full((n,), 4, jnp.int32), uv, p))
    v6 = np.asarray(T.eval_texture(bank, jnp.full((n,), 5, jnp.int32), uv, p))
    assert np.isfinite(v5).all() and np.isfinite(v6).all()
    assert (v6 >= 0).all() and (v6 <= 1.5).all()
    assert v6.std() > 0.01  # marble actually varies
    # scale
    v7 = np.asarray(T.eval_texture(bank, jnp.full((1,), 6, jnp.int32),
                                   uv2[:1], jnp.zeros((1, 3))))
    assert np.allclose(v7, [0.5, 1.0, 1.5])


def test_mipmap_pyramid():
    """MIPMap: constant image invariant across levels; checker averages to
    grey at coarse levels; energy preserved per level."""
    from vspg_pbrt_v4_tpu.utils.mipmap import (build_pyramid,
                                               lookup_trilinear, n_levels,
                                               width_to_lod)

    c = np.full((32, 32, 3), 0.7, np.float32)
    pc = build_pyramid(c)
    uv = jnp.asarray(np.random.default_rng(4).random((64, 2), np.float32))
    for lod in (0.0, 1.3, 4.0):
        v = np.asarray(lookup_trilinear(pc, uv, jnp.full((64,), lod)))
        assert np.allclose(v, 0.7, atol=1e-5)

    x = np.indices((32, 32)).sum(0) % 2
    chk = np.repeat(x[..., None], 3, -1).astype(np.float32)
    p = build_pyramid(chk)
    assert n_levels(p) == 6
    # level means all equal the image mean (box filter preserves energy)
    means = np.asarray(p).mean((1, 2, 3))
    assert np.allclose(means, 0.5, atol=1e-6), means
    # coarse lookup is flat grey, fine lookup varies
    v_fine = np.asarray(lookup_trilinear(p, uv, jnp.zeros(64)))
    v_coarse = np.asarray(lookup_trilinear(p, uv, jnp.full((64,), 5.0)))
    assert v_fine.std() > 0.1
    assert np.allclose(v_coarse, 0.5, atol=1e-3)
    # footprint mapping: one-texel width -> level 0, full-image -> top
    assert float(width_to_lod(jnp.asarray(1 / 32), 32)) == 0.0
    assert float(width_to_lod(jnp.asarray(1.0), 32)) == 5.0


def test_bilerp_texture_corners():
    """BilerpTexture: exact corner values + midpoint blend."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.textures import BILERP, Textures, eval_texture

    bank = Textures.build([dict(kind=BILERP, c0=(1, 0, 0), c1=(0, 1, 0),
                                c2=(0, 0, 1), c3=(1, 1, 1))])
    uv = jnp.asarray([[0.001, 0.001], [0.001, 0.999], [0.999, 0.001],
                      [0.5, 0.5]], jnp.float32)
    tid = jnp.zeros(4, jnp.int32)
    out = np.asarray(eval_texture(bank, tid, uv))
    assert np.allclose(out[0], [1, 0, 0], atol=5e-3)
    assert np.allclose(out[1], [0, 1, 0], atol=5e-3)
    assert np.allclose(out[2], [0, 0, 1], atol=5e-3)
    assert np.allclose(out[3], [0.5, 0.5, 0.5], atol=1e-5)
