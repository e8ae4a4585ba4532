"""Vecmath tests (analog of reference util/vecmath_test.cpp)."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.utils import rng, sampling, transform, vecmath as vm
from vspg_pbrt_v4_tpu.utils.math import quadratic


def _dirs(n=4096, seed=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return sampling.sample_uniform_sphere(
        rng.uniform2(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(0))
    )


def test_coordinate_system_orthonormal():
    v = _dirs()
    t1, t2 = vm.coordinate_system(v)
    for pair in [(t1, t2), (t1, v), (t2, v)]:
        assert np.abs(np.asarray(vm.dot(*pair))).max() < 1e-5
    assert np.abs(np.asarray(vm.length(t1)) - 1).max() < 1e-5
    assert np.abs(np.asarray(vm.length(t2)) - 1).max() < 1e-5
    # right-handed: cross(t1, t2) == v
    assert np.abs(np.asarray(vm.cross(t1, t2) - v)).max() < 1e-5


def test_normalize_face_forward():
    v = jnp.asarray([[3.0, 0.0, 0.0], [0.0, 0.0, -2.0]])
    n = vm.normalize(v)
    assert np.allclose(np.asarray(vm.length(n)), 1.0)
    f = vm.face_forward(jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    assert np.allclose(np.asarray(f), [[0, 0, -1]])


def test_spherical_roundtrip():
    d = _dirs(seed=1)
    theta, phi = vm.spherical_theta(d), vm.spherical_phi(d)
    d2 = vm.spherical_direction(jnp.sin(theta), jnp.cos(theta), phi)
    assert np.abs(np.asarray(d - d2)).max() < 1e-5


def test_octahedral_roundtrip():
    d = _dirs(seed=2)
    d2 = vm.oct_decode(vm.oct_encode(d))
    assert np.abs(np.asarray(d - d2)).max() < 1e-4


def test_equal_area_roundtrip():
    d = _dirs(seed=3)
    p = vm.equal_area_sphere_to_square(d)
    pn = np.asarray(p)
    assert pn.min() >= 0 and pn.max() <= 1
    d2 = vm.equal_area_square_to_sphere(p)
    assert np.abs(np.asarray(d - d2)).max() < 1e-3


def test_equal_area_is_equal_area():
    # uniform square -> uniform sphere
    n = 1 << 16
    pid = jnp.arange(n, dtype=jnp.uint32)
    u2 = rng.uniform2(jnp.uint32(9), pid, jnp.uint32(0), jnp.uint32(0))
    d = np.asarray(vm.equal_area_square_to_sphere(u2))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert np.abs(d.mean(0)).max() < 0.01
    # z uniform in [-1,1]
    counts, _ = np.histogram(d[:, 2], bins=16, range=(-1, 1))
    assert (np.abs(counts / (n / 16) - 1.0) < 0.1).all()


def test_angle_between():
    a = jnp.asarray([[1.0, 0.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0]])
    assert abs(float(vm.angle_between(a, b)[0]) - np.pi / 2) < 1e-6
    # tiny angles stay accurate
    eps = 1e-4
    c = vm.normalize(jnp.asarray([[1.0, eps, 0.0]]))
    assert abs(float(vm.angle_between(a, c)[0]) - eps) < 1e-6


def test_bounds():
    b = (jnp.asarray([0.0, 0, 0]), jnp.asarray([2.0, 4, 6]))
    assert float(vm.bounds_surface_area(b)) == 2 * (8 + 24 + 12)
    assert np.allclose(np.asarray(vm.bounds_centroid(b)), [1, 2, 3])
    assert bool(vm.bounds_contains(b, jnp.asarray([1.0, 1, 1])))
    assert not bool(vm.bounds_contains(b, jnp.asarray([3.0, 1, 1])))
    off = vm.bounds_offset(b, jnp.asarray([1.0, 1.0, 3.0]))
    assert np.allclose(np.asarray(off), [0.5, 0.25, 0.5])


def test_quadratic():
    has, t0, t1 = quadratic(jnp.asarray(1.0), jnp.asarray(-3.0), jnp.asarray(2.0))
    assert bool(has) and abs(float(t0) - 1) < 1e-6 and abs(float(t1) - 2) < 1e-6
    has, _, _ = quadratic(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0))
    assert not bool(has)
    # linear
    has, t0, t1 = quadratic(jnp.asarray(0.0), jnp.asarray(2.0), jnp.asarray(-4.0))
    assert bool(has) and abs(float(t0) - 2) < 1e-6


def test_transforms():
    t = transform.translate(1, 2, 3)
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    assert np.allclose(np.asarray(transform.apply_point(t, p)), [[2, 3, 4]])
    assert np.allclose(np.asarray(transform.apply_vector(t, p)), [[1, 1, 1]])
    r = transform.rotate_z(90)
    assert np.allclose(
        np.asarray(transform.apply_point(r, jnp.asarray([[1.0, 0, 0]]))),
        [[0, 1, 0]],
        atol=1e-6,
    )
    # inverse roundtrip
    s = transform.scale(2, 3, 4) @ transform.rotate_x(30) @ transform.translate(5, 6, 7)
    pts = _dirs(seed=4) * 3.0
    rt = transform.apply_point(s.inverse(), transform.apply_point(s, pts))
    assert np.abs(np.asarray(rt - pts)).max() < 1e-4


def test_look_at():
    t = transform.look_at((0, 0, -5), (0, 0, 0), (0, 1, 0))
    # camera-space +z maps to world view direction
    d = transform.apply_vector(t, jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.allclose(np.asarray(d), [[0, 0, 1]], atol=1e-6)
    o = transform.apply_point(t, jnp.asarray([[0.0, 0.0, 0.0]]))
    assert np.allclose(np.asarray(o), [[0, 0, -5]], atol=1e-6)


def test_animated_transform_interpolation():
    """TRS decomposition + slerp: endpoints exact, midpoint rotates by the
    half angle (transform.h AnimatedTransform semantics)."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils import transform as tr

    a = tr.translate(1.0, 0.0, 0.0)
    b = tr.translate(3.0, 2.0, 0.0) @ tr.rotate(90.0, (0, 0, 1))
    at = tr.AnimatedTransform.make(a, b)
    p = jnp.asarray([1.0, 0.0, 0.0])
    p0 = np.asarray(at.apply_point(p, jnp.asarray(0.0)))
    p1 = np.asarray(at.apply_point(p, jnp.asarray(1.0)))
    assert np.allclose(p0, tr.apply_point(a, p), atol=1e-5)
    assert np.allclose(p1, np.asarray(tr.apply_point(b, p)), atol=1e-5)
    # midpoint: rotation by 45deg, translation lerped
    pm = np.asarray(at.apply_point(p, jnp.asarray(0.5)))
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    expect = np.asarray([2.0 + c, 1.0 + s, 0.0])
    assert np.allclose(pm, expect, atol=1e-4), (pm, expect)


def test_colorspaces():
    """Primary-matrix solve: each space's white maps from/to sRGB white;
    sRGB matrices match the published ones."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils import colorspace as cs

    w = jnp.asarray([1.0, 1.0, 1.0])
    for name in cs.COLOR_SPACES:
        v = np.asarray(cs.convert_rgb(cs.convert_rgb(w, "srgb", name),
                                      name, "srgb"))
        assert np.allclose(v, 1.0, atol=1e-4), (name, v)
    assert np.allclose(cs.COLOR_SPACES["srgb"][1], cs.XYZ_TO_SRGB, atol=2e-3)
    # wide gamuts contain sRGB: saturated sRGB red stays positive in Rec2020
    red = np.asarray(cs.convert_rgb(jnp.asarray([1.0, 0.0, 0.0]),
                                    "srgb", "rec2020"))
    assert (red > -1e-4).all() and red[0] > red[1]
