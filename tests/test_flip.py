"""FLIP metric sanity: identity -> 0; monotone in perturbation; bounded."""

import numpy as np

from vspg_pbrt_v4_tpu.utils.flip import flip, mean_flip


def _img():
    rng = np.random.default_rng(3)
    x = np.linspace(0, 1, 48)
    g = np.clip(np.stack(np.meshgrid(x, x), -1).sum(-1) / 2, 0, 1)
    img = np.stack([g, g**2, np.sqrt(g)], -1)
    img[12:20, 12:20] = [0.9, 0.2, 0.1]  # a feature block
    return img + 0.02 * rng.random((48, 48, 3))


def test_flip_identity_zero():
    img = np.clip(_img(), 0, 1)
    f = flip(img, img)
    assert f.shape == (48, 48)
    assert float(f.max()) < 1e-6


def test_flip_monotone_bounded():
    img = np.clip(_img(), 0, 1)
    vals = []
    for eps in (0.02, 0.08, 0.3):
        pert = np.clip(img + eps, 0, 1)
        f = flip(img, pert)
        assert (f >= 0).all() and (f <= 1).all()
        vals.append(float(f.mean()))
    assert vals[0] < vals[1] < vals[2], vals
    # hdr wrapper runs
    assert 0.0 <= mean_flip(img, np.clip(img + 0.1, 0, 1)) <= 1.0
