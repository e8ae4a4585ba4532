"""RGB -> reflectance-spectrum sigmoid-polynomial table fitting.

TPU-native re-derivation of the reference's spectral upsampling
(``cmd/rgb2spec_opt.cpp`` 915 LoC + ``util/spectrum.cpp``
RGBToSpectrumTable / RGBSigmoidPolynomial, util/color.h:RGBSigmoidPolynomial):
every RGB maps to a smooth reflectance s(p(t)) with

    s(x) = 1/2 + x / (2 sqrt(1 + x^2))          (the sigmoid)
    p(t) = c0 t^2 + c1 t + c2,  t = (lam-360)/470 in [0,1]

whose round trip through the CIE observer reproduces the RGB exactly.
The coefficients are fit per cell of a 3 x res^3 table (slices by max
channel, like color.cpp RGBToSpectrumTable) by vectorized Gauss-Newton
in numpy, warm-started by marching the brightness axis — the same
propagation idea as rgb2spec_opt.cpp's solve ordering. The fit targets
the repository's own sensor convention (flat-illuminant reflectance,
utils/spectrum.spectral_to_sensor_rgb), so uplift -> render -> sensor
round-trips gray exactly.

Run as a script to (re)generate the cached table:
    python -m vspg_pbrt_v4_tpu.tools.rgb2spec [res]
"""

from __future__ import annotations

import os

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
DEFAULT_RES = 32


def _cie_basis(n_lambda=95):
    """Return (t (L,), B (3, L)) with B the flat-illuminant sensor basis:
    rgb = B @ s where s is the reflectance sampled at t."""
    import jax.numpy as jnp

    from ..utils import spectrum as sp
    from ..utils.colorspace import cie_x, cie_y, cie_z

    lam = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, n_lambda)
    t = (lam - sp.LAMBDA_MIN) / (sp.LAMBDA_MAX - sp.LAMBDA_MIN)
    X = np.asarray(cie_x(jnp.asarray(lam)), np.float64)
    Y = np.asarray(cie_y(jnp.asarray(lam)), np.float64)
    Z = np.asarray(cie_z(jnp.asarray(lam)), np.float64)
    w = (lam[-1] - lam[0]) / (n_lambda - 1)
    xyz = np.stack([X, Y, Z], 0) * w / sp.CIE_Y_INTEGRAL  # (3, L)
    M = np.asarray(sp._XYZ2RGB, np.float64)
    # normalize so a flat unit reflectance maps to rgb (1,1,1) — the
    # repo's PixelSensor white-balance convention (spectrum.py
    # spectral_to_sensor_rgb divides by _rgb_of_flat)
    B = M @ xyz
    flat = B @ np.ones(n_lambda)
    B = B / flat[:, None]
    return t, B


def _sigmoid(x):
    return 0.5 + x / (2.0 * np.sqrt(1.0 + x * x))


def _dsigmoid(x):
    return 0.5 / np.power(1.0 + x * x, 1.5)


def _fit_cells(rgb, c_init, t, B, iters=40):
    """Gauss-Newton fit of (N,3) coefficient rows to (N,3) rgb targets."""
    c = c_init.copy()
    T = np.stack([t * t, t, np.ones_like(t)], -1)  # (L, 3)
    lam_damp = 1e-6
    for _ in range(iters):
        p = c @ T.T  # (N, L)
        s = _sigmoid(p)
        rgb_c = s @ B.T  # (N, 3)
        resid = rgb_c - rgb
        ds = _dsigmoid(p)  # (N, L)
        # J[n, i, k] = sum_l B[i, l] ds[n, l] T[l, k]
        J = np.einsum("il,nl,lk->nik", B, ds, T)
        JTJ = np.einsum("nik,nij->nkj", J, J)
        JTr = np.einsum("nik,ni->nk", J, resid)
        JTJ[:, np.arange(3), np.arange(3)] += lam_damp
        try:
            step = np.linalg.solve(JTJ, JTr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            JTJ[:, np.arange(3), np.arange(3)] += 1e-3
            step = np.linalg.solve(JTJ, JTr[..., None])[..., 0]
        c = c - np.clip(step, -50.0, 50.0)
    return c, np.sqrt((resid ** 2).sum(-1))


def fit_table(res=DEFAULT_RES, n_lambda=95, verbose=False):
    """Fit the (3, res, res, res, 3) coefficient table.

    Axis layout mirrors color.cpp RGBToSpectrumTable: slice k holds the
    RGBs whose MAX channel is k; within a slice, z indexes the max value
    and (x, y) the two other channels as fractions of the max."""
    t, B = _cie_basis(n_lambda)
    zs = np.linspace(0.0, 1.0, res)
    fr = np.linspace(0.0, 1.0, res)
    xg, yg = np.meshgrid(fr, fr, indexing="ij")
    xf, yf = xg.reshape(-1), yg.reshape(-1)
    out = np.zeros((3, res, res, res, 3), np.float32)
    max_err = 0.0
    for k in range(3):
        # march from the middle-brightness slice outward (warm starts)
        order = list(range(res))
        mid = res // 2
        order = sorted(order, key=lambda i: abs(i - mid))
        c_prev_up = c_prev_dn = None
        for zi in order:
            z = max(zs[zi], 1e-4)
            rgb = np.zeros((res * res, 3))
            rgb[:, k] = z
            rgb[:, (k + 1) % 3] = xf * z
            rgb[:, (k + 2) % 3] = yf * z
            warm = c_prev_up if zi >= mid else c_prev_dn
            if warm is None:
                c0 = np.zeros((res * res, 3))
                c0[:, 2] = 2.0 * rgb.mean(-1) - 1.0  # flat-ish start
            else:
                c0 = warm
            c, err = _fit_cells(rgb, c0, t, B)
            out[k, zi] = c.reshape(res, res, 3)
            max_err = max(max_err, float(err.max()))
            if zi >= mid:
                c_prev_up = c
            if zi == mid:
                c_prev_dn = c
            if zi < mid:
                c_prev_dn = c
            if verbose:
                print(f"slice max={k} z={zs[zi]:.3f} "
                      f"err max={err.max():.2e} mean={err.mean():.2e}")
    return out, max_err


def table_path(res=DEFAULT_RES):
    return os.path.join(DATA_DIR, f"rgb2spec_srgb_{res}.npz")


def generate(res=DEFAULT_RES, verbose=True):
    os.makedirs(DATA_DIR, exist_ok=True)
    tab, max_err = fit_table(res, verbose=verbose)
    np.savez_compressed(table_path(res), table=tab,
                        res=np.int32(res), max_err=np.float32(max_err))
    if verbose:
        print(f"wrote {table_path(res)}  max round-trip err {max_err:.2e}")
    return tab


def load_table(res=DEFAULT_RES):
    p = table_path(res)
    if not os.path.exists(p):
        return None
    with np.load(p) as z:
        return np.asarray(z["table"], np.float32)


if __name__ == "__main__":
    import sys

    generate(int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_RES)
