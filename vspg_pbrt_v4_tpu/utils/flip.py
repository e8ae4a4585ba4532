"""LDR-FLIP perceptual image difference (stand-in for src/ext/flip).

Implements the published FLIP algorithm (Andersson et al. 2020, "FLIP: A
Difference Evaluator for Alternating Images", HPG; the reference vendors
NVIDIA's implementation and exposes it via ``imgtool diff --metric FLIP``,
cmd/imgtool.cpp:139). Pure numpy, host-side — it is a diagnostic tool, not
a render-path component.

Pipeline: sRGB -> YCxCz opponent space -> per-channel spatial filtering with
CSF-derived Gaussians -> Hunt-adjusted L*a*b* color difference with
exponent remapping, combined with an edge/point feature difference computed
from derivative-of-Gaussian filters on achromatic luminance.
"""

from __future__ import annotations

import numpy as np

_MAX_PPD_DEFAULT = 67.0  # 0.7 m viewing distance, 3840x2160 @ 0.7 m


def _srgb_to_linear(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, 12.92 * c,
                    1.055 * c ** (1.0 / 2.4) - 0.055)


_RGB2XYZ = np.array([
    [0.4124, 0.3576, 0.1805],
    [0.2126, 0.7152, 0.0722],
    [0.0193, 0.1192, 0.9505],
])
_D65 = np.array([0.9505, 1.0, 1.0888])


def _linrgb_to_ycxcz(rgb):
    xyz = rgb @ _RGB2XYZ.T
    xyz_n = xyz / _D65
    y = 116.0 * xyz_n[..., 1] - 16.0
    cx = 500.0 * (xyz_n[..., 0] - xyz_n[..., 1])
    cz = 200.0 * (xyz_n[..., 1] - xyz_n[..., 2])
    return np.stack([y, cx, cz], -1)


def _ycxcz_to_linrgb(ycc):
    yy = (ycc[..., 0] + 16.0) / 116.0
    x = yy + ycc[..., 1] / 500.0
    z = yy - ycc[..., 2] / 200.0
    xyz = np.stack([x, yy, z], -1) * _D65
    return xyz @ np.linalg.inv(_RGB2XYZ).T


def _lab(rgb):
    """Linear RGB -> CIELAB (with the standard f() nonlinearity)."""
    xyz = np.clip(rgb, 0.0, None) @ _RGB2XYZ.T / _D65
    d = 6.0 / 29.0
    f = np.where(xyz > d**3, np.cbrt(np.maximum(xyz, 1e-12)),
                 xyz / (3 * d * d) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], -1)


def _hunt(lab):
    """Hunt adjustment: scale chroma by luminance (FLIP eq. 3)."""
    L = lab[..., 0:1]
    return np.concatenate([lab[..., 0:1], 0.01 * L * lab[..., 1:]], -1)


def _sep_filter(img, kernel):
    """Separable 2D filter with edge clamping; img (H,W[,C])."""
    pad = len(kernel) // 2

    def conv_axis(x, axis):
        xp = np.take(x, np.clip(np.arange(-pad, x.shape[axis] + pad), 0,
                                x.shape[axis] - 1), axis=axis)
        out = np.zeros_like(x)
        for i, kv in enumerate(kernel):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + kv * xp[tuple(sl)]
        return out

    return conv_axis(conv_axis(img, 0), 1)


def _gauss_kernel(sigma, radius=None):
    if radius is None:
        radius = max(int(np.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


# CSF Gaussian parameters per channel (FLIP table 1: a1,b1,a2,b2 of the
# sum-of-Gaussians fits for A (achromatic), RG, BY)
_CSF = {
    "A": ((1.0, 0.0047), (0.0, 1e-5)),
    "RG": ((1.0, 0.0053), (0.0, 1e-5)),
    "BY": ((34.1, 0.04), (13.5, 0.025)),
}


def _spatial_filter(ycc, ppd):
    """Apply the CSF-derived low-pass per opponent channel."""
    out = np.empty_like(ycc)
    chans = ["A", "RG", "BY"]
    for i, ch in enumerate(chans):
        (a1, b1), (a2, b2) = _CSF[ch]
        # FLIP: g(x) = a1 sqrt(pi/b1) exp(-pi^2 x^2 / b1) + ...
        # in the spatial domain with x in degrees; sigma = sqrt(b/(2 pi^2))
        s1 = np.sqrt(b1 / (2.0 * np.pi**2)) * ppd
        k1 = _gauss_kernel(max(s1, 1e-3))
        f1 = _sep_filter(ycc[..., i], k1)
        if a2 > 0:
            s2 = np.sqrt(b2 / (2.0 * np.pi**2)) * ppd
            k2 = _gauss_kernel(max(s2, 1e-3))
            f2 = _sep_filter(ycc[..., i], k2)
            w1 = a1 * np.sqrt(np.pi / b1)
            w2 = a2 * np.sqrt(np.pi / b2)
            f1 = (w1 * f1 + w2 * f2) / (w1 + w2)
        out[..., i] = f1
    return out


def _color_pipeline(img, ppd):
    ycc = _linrgb_to_ycxcz(_srgb_to_linear(img))
    filt = _spatial_filter(ycc, ppd)
    rgb = np.clip(_ycxcz_to_linrgb(filt), 0.0, 1.0)
    return _hunt(_lab(rgb))


def _redistribute(de, cmax, pc=0.4, pt=0.95):
    """FLIP's error redistribution: map [0,cmax] to [0,1] with a knee at
    (pc*cmax -> pt)."""
    knee = pc * cmax
    lo = de < knee
    return np.where(lo, (pt / max(knee, 1e-9)) * de,
                    pt + ((de - knee) / max(cmax - knee, 1e-9)) * (1.0 - pt))


def _feature_difference(y_ref, y_test, ppd):
    """Edge + point feature difference on normalized achromatic luminance."""
    w = 0.082
    sigma = 0.5 * w * ppd
    radius = max(int(np.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    g1 = -x * g  # first derivative (edge)
    g2 = (x * x / (sigma * sigma) - 1.0) * g  # second derivative (point)
    # normalize as in the FLIP reference (positive/negative lobes to 1)
    g = g / g.sum()

    def norm_odd(k):
        pos = k[k > 0].sum()
        return k / max(pos, 1e-9)

    g1 = norm_odd(g1)
    g2 = g2 - g2.mean()
    g2 = g2 / max(g2[g2 > 0].sum(), 1e-9)

    def features(ych):
        yn = (ych + 16.0) / 116.0

        def conv2(kx, ky):
            pad = radius

            def conv_axis(img, kernel, axis):
                xp = np.take(img, np.clip(
                    np.arange(-pad, img.shape[axis] + pad), 0,
                    img.shape[axis] - 1), axis=axis)
                out = np.zeros_like(img)
                for i, kv in enumerate(kernel):
                    sl = [slice(None)] * img.ndim
                    sl[axis] = slice(i, i + img.shape[axis])
                    out = out + kv * xp[tuple(sl)]
                return out

            return conv_axis(conv_axis(yn, kx, 1), ky, 0)

        ex = conv2(g1, g)
        ey = conv2(g, g1)
        px = conv2(g2, g)
        py = conv2(g, g2)
        edge = np.sqrt(ex * ex + ey * ey)
        point = np.sqrt(px * px + py * py)
        return edge, point

    e_r, p_r = features(y_ref)
    e_t, p_t = features(y_test)
    qf = 0.5
    d = np.maximum(np.abs(e_r - e_t), np.abs(p_r - p_t))
    return np.clip((1.0 / np.sqrt(2.0)) * d, 0.0, 1.0) ** qf


def flip(reference, test, ppd=_MAX_PPD_DEFAULT):
    """Per-pixel FLIP error map in [0,1]; inputs are sRGB-encoded (H,W,3)
    in [0,1] (tone-map/clamp HDR first, as the reference's imgtool does)."""
    reference = np.asarray(reference, np.float64)
    test = np.asarray(test, np.float64)
    lab_r = _color_pipeline(reference, ppd)
    lab_t = _color_pipeline(test, ppd)
    de = np.linalg.norm(lab_r - lab_t, axis=-1)
    # max achievable Hunt-adjusted distance (green<->blue, FLIP sec. 4.1)
    g = _hunt(_lab(np.array([[0.0, 1.0, 0.0]])))
    b = _hunt(_lab(np.array([[0.0, 0.0, 1.0]])))
    cmax = float(np.linalg.norm(g - b))
    qc = 0.7
    de_c = _redistribute(de ** qc, cmax ** qc)
    ycc_r = _linrgb_to_ycxcz(_srgb_to_linear(reference))
    ycc_t = _linrgb_to_ycxcz(_srgb_to_linear(test))
    de_f = _feature_difference(ycc_r[..., 0], ycc_t[..., 0], ppd)
    return np.clip(de_c, 0.0, 1.0) ** (1.0 - de_f)


def flip_hdr_ldr(reference, test, exposure=0.0, ppd=_MAX_PPD_DEFAULT):
    """HDR inputs: expose + sRGB-encode both, then LDR FLIP (the simple
    single-exposure path; the full HDR-FLIP exposure sweep is future work)."""
    s = 2.0 ** exposure

    def tonemap(x):
        return _linear_to_srgb(np.clip(np.asarray(x) * s, 0.0, 1.0))

    return flip(tonemap(reference), tonemap(test), ppd)


def mean_flip(reference, test, ppd=_MAX_PPD_DEFAULT, hdr=True):
    f = flip_hdr_ldr(reference, test, ppd=ppd) if hdr else flip(
        reference, test, ppd)
    return float(f.mean())
