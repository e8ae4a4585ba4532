"""plytool subcommand tests (cmd/plytool.cpp analog)."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.tools import plytool


@pytest.fixture
def quad_ply(tmp_path):
    """A 2x2-triangle unit quad in the z=0 plane with normals + uv."""
    P = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    N = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = P[:, :2].copy()
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = tmp_path / "quad.ply"
    plytool.write_ply(str(path), P, idx, N=N, uv=uv)
    return str(path), P, idx


def test_write_read_roundtrip(quad_ply):
    path, P, idx = quad_ply
    m = plytool.load_mesh(path)
    np.testing.assert_allclose(m["P"], P, atol=0)
    np.testing.assert_array_equal(m["indices"], idx)
    assert "N" in m and "uv" in m
    np.testing.assert_allclose(m["N"][:, 2], 1.0)


def test_info_and_cat(quad_ply, capsys):
    path, _, _ = quad_ply
    assert plytool.cmd_info([path]) == 0
    out = capsys.readouterr().out
    assert "4 vertices, 2 triangles" in out
    assert plytool.cmd_cat([path]) == 0
    out = capsys.readouterr().out
    assert out.count("\nf ") == 2


def test_split(quad_ply, tmp_path):
    path, _, _ = quad_ply
    base = str(tmp_path / "part")
    assert plytool.cmd_split(["--maxfaces", "1", "--outbase", base,
                              path]) == 0
    m0 = plytool.load_mesh(base + "0.ply")
    m1 = plytool.load_mesh(base + "1.ply")
    assert m0["indices"].shape[0] == 1 and m1["indices"].shape[0] == 1
    # each part re-indexes only its used vertices
    assert m0["P"].shape[0] == 3 and m1["P"].shape[0] == 3


def test_displace(quad_ply, tmp_path):
    path, _, _ = quad_ply
    # constant 0.5 displacement image
    from vspg_pbrt_v4_tpu.utils.image import write_exr

    img_path = tmp_path / "disp.exr"
    write_exr(str(img_path), np.full((8, 8, 3), 0.5, np.float32))
    out_path = tmp_path / "out.ply"
    assert plytool.cmd_displace([
        "--image", str(img_path), "--scale", "2.0",
        "--edge-length", "0.3", "--outfile", str(out_path), path]) == 0
    m = plytool.load_mesh(str(out_path))
    # subdivision happened (edges capped at 0.3 on a unit quad)
    assert m["P"].shape[0] > 4
    assert m["indices"].shape[0] > 2
    # constant displacement of 0.5 * scale 2.0 along +z
    np.testing.assert_allclose(m["P"][:, 2], 1.0, atol=1e-4)
    # no degenerate triangles
    e1 = m["P"][m["indices"][:, 1]] - m["P"][m["indices"][:, 0]]
    e2 = m["P"][m["indices"][:, 2]] - m["P"][m["indices"][:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    assert (area > 1e-9).all()
