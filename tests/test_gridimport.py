"""Volume-grid import tool (nanovdb2pbrt role) + scene gridfile path."""

import numpy as np

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
