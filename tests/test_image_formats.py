"""PFM + QOI codec round-trips and the extension-dispatched writer
(ref: src/pbrt/util/image.cpp:882-1012 ReadImage/Image::Write dispatch,
:1498 qoi encode, :1785 PFM)."""

import numpy as np

from vspg_pbrt_v4_tpu.utils.image import (read_image, read_pfm, read_qoi,
                                          write_image, write_pfm, write_qoi)


def _hdr(ny=7, nx=11, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.random((ny, nx, 3), np.float32) * 4.0  # HDR range
    img[0, 0] = [0, 0, 0]
    img[1, 1] = [3.7, 0.001, 1.0]
    return img


def test_pfm_roundtrip_exact(tmp_path):
    img = _hdr()
    p = tmp_path / "t.pfm"
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)  # float32 lossless


def test_pfm_grayscale_and_scale(tmp_path):
    # grayscale 'Pf' with positive (big-endian) scale 2.0
    ny, nx = 3, 5
    data = np.arange(ny * nx, dtype=">f4").reshape(ny, nx)
    p = tmp_path / "g.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n%d %d\n2.0\n" % (nx, ny))
        f.write(data[::-1].tobytes())
    back = read_pfm(p)
    assert back.shape == (ny, nx, 3)
    np.testing.assert_allclose(back[..., 0],
                               data.astype(np.float32) * 2.0)
    np.testing.assert_array_equal(back[..., 0], back[..., 2])


def test_qoi_roundtrip_8bit(tmp_path):
    # QOI is LDR sRGB: round-trip must be exact at the 8-bit level
    img = _hdr() / 4.0
    p = tmp_path / "t.qoi"
    write_qoi(p, img)
    back = read_qoi(p)
    def to8(x):
        s = np.where(x <= 0.0031308, 12.92 * x,
                     1.055 * np.power(np.clip(x, 1e-8, None), 1 / 2.4)
                     - 0.055)
        return (np.clip(s, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(to8(back), to8(img))


def test_qoi_runs_and_index(tmp_path):
    # long constant runs (RUN op, >62 px) + a repeating palette (INDEX op)
    img = np.zeros((4, 80, 3), np.float32)
    img[1] = 0.5
    img[2, ::2] = [0.1, 0.7, 0.2]
    img[3, 1::3] = [0.9, 0.05, 0.3]
    p = tmp_path / "runs.qoi"
    write_qoi(p, img)
    back = read_qoi(p)
    assert back.shape == img.shape
    assert np.max(np.abs(back - img)) < 5e-3  # 8-bit sRGB quantum in linear


def test_write_image_dispatch(tmp_path):
    img = _hdr(4, 6) / 4.0  # LDR so the 8-bit formats can represent it
    for ext in ("exr", "pfm", "qoi", "png"):
        p = tmp_path / ("d." + ext)
        write_image(p, img)
        back = read_image(p)
        assert back.shape == (4, 6, 3)
        # 8-bit sRGB quantum in linear grows to ~8e-3 near white
        tol = 1e-3 if ext in ("exr", "pfm") else 1e-2
        assert np.max(np.abs(back - img)) <= tol
