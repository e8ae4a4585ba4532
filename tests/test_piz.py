"""PIZ decode vs OpenEXR-written golden files (ImfPizCompressor scheme:
bitmap/LUT + canonical Huffman + 2D wavelet, 32-scanline blocks).

Golden files in tests/data/ were written by the system OpenEXR 3.1
(RgbaOutputFile, PIZ_COMPRESSION) with a deterministic pixel pattern;
the generator source is quoted below so the files can be regenerated.

    r = 0.5 + 0.5*sin(0.3x + 0.17y); g = lcg(seed)/2^24*4
    b = 37.25 if x==y else 0.001x; a = 1
"""

import os

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.utils.image import read_exr

DATA = os.path.join(os.path.dirname(__file__), "data")


def _expected(w, h, seed):
    img = np.zeros((h, w, 4), np.float32)
    s = np.uint64(seed)
    for y in range(h):
        for x in range(w):
            s = np.uint64((int(s) * 1664525 + 1013904223) & 0xFFFFFFFF)
            img[y, x, 0] = 0.5 + 0.5 * np.sin(0.3 * x + 0.17 * y)
            img[y, x, 1] = (int(s) >> 8) * (1.0 / 16777216.0) * 4.0
            img[y, x, 2] = 37.25 if x == y else 0.001 * x
            img[y, x, 3] = 1.0
    # golden files store HALF: quantize expectations the same way
    return img.astype(np.float16).astype(np.float32)


@pytest.mark.parametrize("name,w,h,seed", [
    ("piz_8x8.exr", 8, 8, 1),
    ("piz_17x9.exr", 17, 9, 2),      # odd dims: wavelet edge columns/rows
    ("piz_64x40.exr", 64, 40, 3),    # two 32-line PIZ blocks
])
def test_piz_golden(name, w, h, seed):
    img, names = read_exr(os.path.join(DATA, name))
    assert img.shape == (h, w, 4)
    idx = {n: i for i, n in enumerate(names)}
    exp = _expected(w, h, seed)
    got = np.stack([img[..., idx[c]] for c in "RGBA"], -1)
    # R: sinf in C vs numpy double sin can land on opposite sides of a
    # half-precision rounding boundary — allow one ulp there
    np.testing.assert_allclose(got[..., 0], exp[..., 0], rtol=2e-3)
    np.testing.assert_array_equal(got[..., 1:], exp[..., 1:])
