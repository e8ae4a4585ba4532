"""Volume-grid import tool (nanovdb2pbrt role) + scene gridfile path."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.tools.nanovdb2grid import convert, load_volume


def test_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.uniform(0, 1, (16, 12, 8)).astype(np.float32)
    np.save(tmp_path / "d.npy", d)
    shape, bmin, bmax = convert(str(tmp_path / "d.npy"),
                                str(tmp_path / "out.npz"),
                                bmin=(-1, -1, -1), bmax=(1, 1, 1))
    z = np.load(tmp_path / "out.npz")
    assert np.allclose(z["density"], d)
    assert np.allclose(z["bmin"], (-1, -1, -1))


def test_downsample(tmp_path):
    d = np.ones((8, 8, 8), np.float32)
    np.save(tmp_path / "d.npy", d)
    shape, _, _ = convert(str(tmp_path / "d.npy"),
                          str(tmp_path / "out.npz"), downsample=2)
    assert shape == (4, 4, 4)
    assert np.allclose(np.load(tmp_path / "out.npz")["density"], 1.0)


def test_nvdb_clear_error(tmp_path):
    (tmp_path / "x.nvdb").write_bytes(b"\x00" * 64)
    try:
        load_volume(str(tmp_path / "x.nvdb"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "NanoVDB" in str(e)


def test_scene_gridfile(tmp_path):
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    d = np.full((4, 4, 4), 2.0, np.float32)
    np.savez(tmp_path / "g.npz", density=d, bmin=(-1, -1, -1),
             bmax=(1, 1, 1))
    txt = f"""
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    MakeNamedMedium "vol" "string type" "uniformgrid"
        "string gridfile" "{tmp_path / 'g.npz'}"
        "rgb sigma_s" [1 1 1] "rgb sigma_a" [0 0 0]
    AttributeBegin
      MediumInterface "vol" ""
      Material ""
      Shape "sphere" "float radius" [1]
    AttributeEnd
    LightSource "infinite" "rgb L" [1 1 1]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    gm = setup.scene.media.grids[0]
    assert gm.res == (4, 4, 4)
    assert float(gm.density[0, 0, 0]) == 2.0


def test_nvdb_roundtrip(tmp_path):
    """Raw .nvdb writer/reader round-trip (NanoVDB 32.3 layout): dense
    values, negative + unaligned-origin index bboxes, multi-node trees."""
    from vspg_pbrt_v4_tpu.tools import nvdb

    rng = np.random.default_rng(7)
    d = (rng.random((40, 24, 152)) * (rng.random((40, 24, 152)) > 0.3)
         ).astype(np.float32)
    p = str(tmp_path / "cloud.nvdb")
    nvdb.write_nvdb(p, d, index_origin=(-16, 0, 4088), voxel_size=0.25)
    dens, org, vs, wbb = nvdb.read_nvdb(p)
    assert vs == 0.25
    assert np.array_equal(org, [-16, 0, 4088])
    assert np.array_equal(dens[:40, :24, :152], d)
    # and through the converter entry point
    d2, bmin, bmax = load_volume(p)
    assert np.array_equal(d2[:40, :24, :152], d)
    assert np.allclose(bmin, np.asarray([-16, 0, 4088]) * 0.25)


@pytest.mark.slow
def test_rgb_grid_medium_beer_lambert():
    """RGBGridMedium (media.h:392): constant per-channel absorption grid
    must transmit exp(-sigma_k * L) per channel through the volpath
    delta-tracking path."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
    from vspg_pbrt_v4_tpu.models.film import RGBFilm
    from vspg_pbrt_v4_tpu.models.integrators import volpath
    from vspg_pbrt_v4_tpu.models.lights import Lights
    from vspg_pbrt_v4_tpu.models.materials import Materials
    from vspg_pbrt_v4_tpu.models.media import Media, RGBGridMedium
    from vspg_pbrt_v4_tpu.models.shapes import Geometry
    from vspg_pbrt_v4_tpu.utils import transform as tr

    from vspg_pbrt_v4_tpu.models.media import GridMedium

    n = 8
    sig = np.asarray([0.4, 0.8, 1.2], np.float32)
    sa = np.broadcast_to(sig, (n, n, n, 3)).copy()
    ss = np.zeros((n, n, n, 3), np.float32)
    gm_rgb = RGBGridMedium.make(sa, ss, (-1, -1, -1), (1, 1, 1), maj_res=4)
    # the mathematically identical scalar-density medium
    gm_s = GridMedium.make(np.ones((n, n, n), np.float32), sig, [0, 0, 0],
                           (-1, -1, -1), (1, 1, 1), maj_res=4)
    lights = Lights.make(env_L=[1.0, 1.0, 1.0], world_radius=100.0)
    geom = Geometry.build(
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (32, 32))
    imgs = {}
    for name, gm in (("rgb", gm_rgb), ("scalar", gm_s)):
        scene = volpath.Scene(geom, Materials.build([]), Media.make(
            grids=(gm,)), lights)
        imgs[name] = np.asarray(volpath.render(
            scene, cam, RGBFilm.make((32, 32)), spp=128, seed=2,
            spp_per_pass=16))
    # identical coefficients + identical sample streams -> identical images
    assert np.allclose(imgs["rgb"], imgs["scalar"], atol=1e-5)
    # and Beer-Lambert within MC noise (survival Bernoulli, ~1.9% SE)
    center = imgs["rgb"][12:20, 12:20].mean((0, 1))
    expected = np.exp(-sig * 2.0)
    assert np.allclose(center, expected, rtol=0.12), (center, expected)
