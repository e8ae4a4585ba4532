"""CyHair converter (tools/cyhair2pbrt.py — cmd/cyhair2pbrt.cpp analog)."""

import io
import struct

import numpy as np

from vspg_pbrt_v4_tpu.tools import cyhair2pbrt as ch


def _write_hair(path, strands, thickness=None, default_thickness=0.1):
    """strands: list of (m,3) float32 (file-space, Z-up)."""
    pts = np.concatenate(strands, 0).astype("<f4")
    segs = np.array([len(s) - 1 for s in strands], "<u2")
    flags = ch.HAS_SEGMENTS | ch.HAS_POINTS
    th = None
    if thickness is not None:
        th = np.asarray(thickness, "<f4")
        flags |= ch.HAS_THICKNESS
    hdr = b"HAIR" + struct.pack("<IIII", len(strands), len(pts), flags, 0)
    hdr += struct.pack("<ff", default_thickness, 0.5)
    hdr += struct.pack("<fff", 1, 1, 1) + b"\0" * 88
    assert len(hdr) == 128
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(segs.tobytes())
        f.write(pts.tobytes())
        if th is not None:
            f.write(th.tobytes())


def test_bezier_interpolates_cr_points():
    rng = np.random.default_rng(1)
    cps = rng.normal(size=(6, 3))
    bez = ch.strand_to_beziers(cps)
    assert bez.shape == (5, 4, 3)
    for i in range(5):
        np.testing.assert_allclose(bez[i, 0], cps[i], atol=1e-12)
        np.testing.assert_allclose(bez[i, 3], cps[i + 1], atol=1e-12)
    # C1 at interior joins: outgoing handle mirrors incoming
    for i in range(1, 4):
        d_in = bez[i - 1, 3] - bez[i - 1, 2]
        d_out = bez[i, 1] - bez[i, 0]
        np.testing.assert_allclose(d_in, d_out, atol=1e-12)


def test_two_point_strand_linear():
    bez = ch.strand_to_beziers(np.array([[0, 0, 0], [3, 0, 0]], float))
    np.testing.assert_allclose(bez[0, 1], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(bez[0, 2], [2, 0, 0], atol=1e-12)


def test_roundtrip_to_parser(tmp_path):
    rng = np.random.default_rng(7)
    strands = [np.cumsum(rng.normal(0, 0.1, (5, 3)), 0).astype(np.float32),
               np.cumsum(rng.normal(0, 0.1, (3, 3)), 0).astype(np.float32)]
    th = np.full(sum(len(s) for s in strands), 0.02, np.float32)
    hair = tmp_path / "test.hair"
    _write_hair(str(hair), strands, thickness=th)
    out = io.StringIO()
    n = ch.convert(str(hair), out)
    assert n == 4 + 2  # (5-1) + (3-1) segments
    text = out.getvalue()
    assert text.count('Shape "curve"') == n
    assert '"float width0" [ 0.02 ]' in text
    # the emitted directives parse and build into curve geometry
    from vspg_pbrt_v4_tpu.scene import build_render_setup
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_string

    scene_text = (
        'Camera "perspective" "float fov" [30]\n'
        'Film "rgb" "integer xresolution" [16] "integer yresolution" [16]\n'
        "WorldBegin\n"
        'LightSource "infinite" "rgb L" [1 1 1]\n'
        'Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]\n'
        + text)
    directives = parse_pbrt_string(scene_text)
    setup = build_render_setup(directives)
    assert setup.scene.geometry.n_crv > 0  # curve primitives realized


def test_zup_to_yup_swap(tmp_path):
    s = np.array([[0, 0, 1], [1, 0, 2], [2, 0, 3]], np.float32)
    hair = tmp_path / "z.hair"
    _write_hair(str(hair), [s])
    data = ch.read_cyhair(str(hair))
    np.testing.assert_allclose(data["points"][0][:, 1], [1, 2, 3])
    np.testing.assert_allclose(data["points"][0][:, 2], [0, 0, 0])
