"""MLT (PSSMLT over BDPT) cross-estimator test.

MCMC renders converge to the same image as the forward path tracer; the
dominant test-time error is the bootstrap estimate of the normalization b
(the reference uses 100k bootstrap samples, integrators.cpp:2646), so the
tolerance here is looser than the BDPT cross-check.
"""

import numpy as np

from test_bdpt import _box_scene, _camera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import mlt, volpath
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def test_mlt_matches_path_area_light():
    scene = _box_scene("area")
    cam = _camera(16)
    film = RGBFilm.make((16, 16))
    img = np.asarray(mlt.render(scene, cam, film, mutations_per_pixel=48,
                                max_depth=2, n_chains=1024,
                                n_bootstrap=4096, seed=3))
    pt = np.asarray(volpath.render(
        scene, cam, film, spp=128, seed=1,
        cfg=volpath.VolPathConfig(max_depth=2, rr_start_depth=99)))
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    m_mlt, m_pt = img.mean(), pt.mean()
    assert abs(m_mlt - m_pt) / m_pt < 0.10, (m_mlt, m_pt)
    # spatial structure: every image quadrant agrees within MCMC tolerance
    for sl in (np.s_[:8, :8], np.s_[:8, 8:], np.s_[8:, :8], np.s_[8:, 8:]):
        a, b = pt[sl].mean(), img[sl].mean()
        assert abs(b - a) / a < 0.15, (sl, a, b)
