"""EXR ZIP codec (OpenEXR ImfZip reorder+predictor+zlib scheme) —
round-trip exactness for FLOAT, half-precision for HALF, and the
raw-fallback rule when zlib does not shrink a block."""

import os

import numpy as np

from vspg_pbrt_v4_tpu.utils.image import read_exr, write_exr


def _rt(tmp_path, img, **kw):
    p = os.path.join(str(tmp_path), "t.exr")
    write_exr(p, img, **kw)
    back, ch = read_exr(p)
    assert ch == ["B", "G", "R"]
    return back[..., [2, 1, 0]], os.path.getsize(p)


def test_zip_float_exact(tmp_path):
    img = np.random.default_rng(0).uniform(0, 8, (37, 53, 3)).astype(
        np.float32)
    back, _ = _rt(tmp_path, img, compression="zip")
    np.testing.assert_array_equal(back, img)


def test_zip_half_and_compression_ratio(tmp_path):
    img = np.full((64, 64, 3), 0.25, np.float32)
    back, sz_zip = _rt(tmp_path, img, half=True, compression="zip")
    np.testing.assert_allclose(back, img, atol=1e-3)
    _, sz_none = _rt(tmp_path, img, half=True, compression="none")
    assert sz_zip < sz_none / 5  # constant image must compress hard


def test_none_still_supported(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)).astype(
        np.float32)
    back, _ = _rt(tmp_path, img, compression="none")
    np.testing.assert_array_equal(back, img)


def test_partial_last_block(tmp_path):
    """ny not a multiple of 16: the final short ZIP chunk round-trips."""
    img = np.random.default_rng(2).uniform(0, 2, (21, 8, 3)).astype(
        np.float32)
    back, _ = _rt(tmp_path, img, compression="zip")
    np.testing.assert_array_equal(back, img)
