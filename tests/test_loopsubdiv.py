"""Loop subdivision (util/loopsubdiv.cpp analog)."""

import numpy as np

from vspg_pbrt_v4_tpu.utils.loopsubdiv import subdivide


def _octahedron():
    P = np.asarray([(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)], np.float64)
    F = np.asarray([(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
                    (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)], np.int64)
    return P, F


def test_counts_quadruple():
    P, F = _octahedron()
    P1, F1, _ = subdivide(P, F, levels=1, compute_limit=False)
    assert len(F1) == 4 * len(F)
    # V' = V + E (octahedron: 6 + 12 = 18)
    assert len(P1) == 18


def test_limit_positions_subdivision_invariant():
    """The limit position of an even vertex must not change under further
    subdivision (the defining property of the limit-rule weights; original
    vertices keep ids 0..5 across levels)."""
    P, F = _octahedron()
    lim = []
    for lv in (1, 2, 3):
        Pl, _, _ = subdivide(P, F, levels=lv)
        lim.append(Pl[:6])
    assert np.abs(lim[0] - lim[1]).max() < 2e-3
    assert np.abs(lim[1] - lim[2]).max() < 1e-3
    # stays closed: every edge shared by exactly 2 faces
    Pl, Fl, _ = subdivide(P, F, levels=2, compute_limit=False)
    e = np.sort(np.concatenate([Fl[:, [0, 1]], Fl[:, [1, 2]],
                                Fl[:, [2, 0]]], 0), 1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()


def test_flat_patch_stays_flat_with_boundary_rules():
    """A flat triangulated square must remain exactly planar (all rules are
    affine-invariant); its boundary must remain on the square's boundary
    convex hull."""
    P = np.asarray([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                    (0.5, 0.5, 0)], np.float64)
    F = np.asarray([(0, 1, 4), (1, 2, 4), (2, 3, 4), (3, 0, 4)], np.int64)
    Pl, Fl, N = subdivide(P, F, levels=3)
    assert np.abs(Pl[:, 2]).max() < 1e-12
    assert Pl[:, 0].min() >= -1e-9 and Pl[:, 0].max() <= 1 + 1e-9
    # normals all +-z
    assert np.abs(np.abs(N[:, 2]) - 1).max() < 1e-6


def test_parser_loopsubdiv():
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Shape "loopsubdiv" "integer levels" [2]
      "point3 P" [1 0 0  -1 0 0  0 1 0  0 -1 0  0 0 1  0 0 -1]
      "integer indices" [0 2 4  2 1 4  1 3 4  3 0 4  2 0 5  1 2 5  3 1 5  0 3 5]
    LightSource "infinite" "rgb L" [1 1 1]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    assert setup.scene.geometry.n_tri == 8 * 16  # 2 levels: x16
