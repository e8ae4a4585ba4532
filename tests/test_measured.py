"""Measured (tabulated) BRDF: Rusinkiewicz-grid tables with trilinear
lookup (the role of materials.h MeasuredMaterial / RGL tensors; data format
here is the MERL layout via load_merl_brdf or synthetic tables)."""

import io
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models import materials as M
from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


@pytest.mark.slow
def test_lambertian_table_matches_diffuse_render():
    """A measured table filled with albedo/pi must render exactly like the
    analytic diffuse material (furnace: rho * L0)."""
    rho = 0.55
    table = M.make_lambertian_table((rho, rho, rho))[None]  # (1,Nh,Nd,Np,3)
    mats = M.Materials.build(
        [dict(type=M.MEASURED, meas_id=0)], measured_tables=table)
    geom = Geometry.build(spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1,
                                        med_in=-1, med_out=-1)])
    lights = Lights.make(env_L=[1.0, 1.0, 1.0], world_radius=100.0)
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    scene = volpath.Scene(geom, mats, media, lights)
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    cam = PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(32, 32))
    img = np.asarray(volpath.render(scene, cam, RGBFilm.make((32, 32)),
                                    spp=96, seed=1))
    center = img[13:19, 13:19].mean()
    assert abs(center - rho) / rho < 0.05, center


def test_measured_f_reciprocal():
    table = np.random.default_rng(0).uniform(
        0, 1, (1, 16, 8, 8, 3)).astype(np.float32)
    lanes = M.BSDFLanes(
        mat_type=jnp.full(64, M.MEASURED, jnp.int32),
        albedo=jnp.zeros((64, 3)), albedo2=jnp.zeros((64, 3)),
        eta=jnp.ones(64), roughness=jnp.zeros(64), roughness2=jnp.zeros(64),
        alpha=jnp.zeros(64), h=jnp.zeros(64),
        meas_id=jnp.zeros(64, jnp.int32), meas_bank=jnp.asarray(table))
    rng = np.random.default_rng(1)

    def hemi(n):
        z = rng.uniform(0.05, 1, n)
        ph = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(1 - z * z)
        return jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1),
                           jnp.float32)

    wo, wi = hemi(64), hemi(64)
    f1 = np.asarray(M.measured_f(lanes, wo, wi))
    f2 = np.asarray(M.measured_f(lanes, wi, wo))
    assert np.allclose(f1, f2, rtol=1e-4, atol=1e-5)  # reciprocity


def test_merl_loader_roundtrip(tmp_path):
    """Write a synthetic MERL .binary and read it back."""
    th_n, td_n, pd_n = 9, 9, 18
    rng = np.random.default_rng(2)
    vals = rng.uniform(0, 1, (3, th_n, td_n, pd_n))
    path = tmp_path / "synthetic.binary"
    with open(path, "wb") as f:
        f.write(np.asarray([th_n, td_n, pd_n], np.int32).tobytes())
        f.write(vals.astype(np.float64).tobytes())
    table = M.load_merl_brdf(str(path), out_res=(9, 9, 18))
    assert table.shape == (9, 9, 18, 3)
    expect = np.moveaxis(vals, 0, -1) * np.asarray(
        [1 / 1500, 1.15 / 1500, 1.66 / 1500])
    assert np.allclose(table, expect, rtol=1e-5)


@pytest.mark.slow
def test_parser_measured_material(tmp_path):
    """Material "measured" from a .pbrt file: the MERL table loads into the
    Materials bank and the scene renders with non-trivial reflectance
    (materials.h Measured:909 reachable from the scene description)."""
    from vspg_pbrt_v4_tpu.scene import builder, parse_pbrt_string

    # Lambertian albedo 0.6 stored in MERL encoding (value / channel scale)
    th_n, td_n, pd_n = 9, 9, 18
    scales = np.asarray([1 / 1500, 1.15 / 1500, 1.66 / 1500])
    vals = np.empty((3, th_n, td_n, pd_n), np.float64)
    for c in range(3):
        vals[c] = (0.6 / np.pi) / scales[c]
    path = tmp_path / "lambert.binary"
    with open(path, "wb") as f:
        f.write(np.asarray([th_n, td_n, pd_n], np.int32).tobytes())
        f.write(vals.tobytes())
    txt = f"""
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "measured" "string filename" ["{path}"]
Shape "trianglemesh"
  "point3 P" [-5 -5 0  5 -5 0  5 5 0  -5 5 0]
  "integer indices" [0 1 2  0 2 3]
"""
    setup = builder.build_render_setup(parse_pbrt_string(txt))
    mats = setup.scene.materials
    assert mats.meas_bank is not None and mats.meas_bank.shape[0] == 1
    # material row 1 (row 0 is the default) is MEASURED with table 0
    assert int(mats.mat_type[1]) == M.MEASURED
    assert int(mats.meas_id[1]) == 0
    # a furnace-ish check: render and expect reflected radiance > 0.2
    from vspg_pbrt_v4_tpu.models.integrators import volpath as vp

    img = vp.render(setup.scene, setup.camera, setup.film, spp=16,
                    cfg=vp.VolPathConfig(max_depth=3), seed=0)
    assert float(np.asarray(img).mean()) > 0.2
