"""Learned ISGB denoiser — the OIDN-class replacement (denoiser.h:19-65).

The reference denoises the image-space guiding buffer with OIDN's
pretrained U-Net CNN. No pretrained weights ship here, so this module is
a TPU-native alternative with the same role and interface position: a
compact **kernel-predicting U-Net** (KPCN-style head on a small U-Net
trunk) trained **per scene, self-supervised** (noise2noise, Lehtinen et
al. 2018) on the ISGB's split-buffer halves:

- the ISGB accumulates even-wave samples into an A half; B = total - A;
- at each ISGB update (waves 1,2,4,8,... — PostProcessWave:250-259) the
  net takes A's features (log-tonemapped color, albedo, normal, sample
  count) and is optimized to predict B's color (and symmetrically B->A)
  for a few Adam steps — training accumulates across updates since the
  parameters persist in the ISGB;
- the trained head emits a per-pixel 5x5 softmax kernel applied to the
  FULL-buffer color — the output is a convex combination of observed
  radiance (energy-preserving, robust with few training steps). The same
  predicted kernel jointly filters the scalar VSP map, mirroring OIDN's
  auxiliary-buffer-guided filtering of the VSP estimate
  (guidedvolpathvspgintegrator.cpp:151-196).

The head's final conv initializes to zero weights with Gaussian-log
biases, so the UNTRAINED net is exactly an edge-blind 5x5 Gaussian blur
— a sane wave-1 fallback before B has any samples.

Everything (training included) is jittable: convs hit the MXU, the Adam
loop is a lax.fori_loop, so per-wave training costs milliseconds on a
TPU chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

KSIZE = 5  # predicted-kernel width
_NK = KSIZE * KSIZE
_NFEAT = 10  # log1p color (3) + albedo (3) + normal (3) + log count (1)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _conv_init(key, cin, cout, scale=1.0):
    k1, _ = jax.random.split(key)
    fan = 9 * cin
    w = jax.random.normal(k1, (3, 3, cin, cout)) * np.sqrt(2.0 / fan) * scale
    return {"w": w, "b": jnp.zeros((cout,))}


def init_params(key=None, width=12):
    """3-level U-Net trunk + kernel-predicting head. ~60k params at
    width=12."""
    if key is None:
        key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 12)
    w = int(width)
    p = {
        "enc0a": _conv_init(ks[0], _NFEAT, w),
        "enc0b": _conv_init(ks[1], w, w),
        "enc1a": _conv_init(ks[2], w, 2 * w),
        "enc1b": _conv_init(ks[3], 2 * w, 2 * w),
        "bota": _conv_init(ks[4], 2 * w, 4 * w),
        "botb": _conv_init(ks[5], 4 * w, 4 * w),
        "dec1a": _conv_init(ks[6], 4 * w + 2 * w, 2 * w),
        "dec1b": _conv_init(ks[7], 2 * w, 2 * w),
        "dec0a": _conv_init(ks[8], 2 * w + w, w),
        "dec0b": _conv_init(ks[9], w, w),
        # zero head => output kernel == bias softmax == Gaussian
        "head": {"w": jnp.zeros((3, 3, w, _NK)), "b": _gaussian_log_bias()},
    }
    return p


def _gaussian_log_bias():
    ax = np.arange(KSIZE) - KSIZE // 2
    g = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2.0 * 1.2 ** 2))
    g /= g.sum()
    return jnp.asarray(np.log(g.reshape(-1) + 1e-12), jnp.float32)


# ---------------------------------------------------------------------------
# Net
# ---------------------------------------------------------------------------


def _conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _down(x):
    ny, nx = x.shape[1], x.shape[2]
    return x[:, : ny - ny % 2, : nx - nx % 2].reshape(
        x.shape[0], ny // 2, 2, nx // 2, 2, x.shape[3]).mean((2, 4))


def _up(x, ny, nx):
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, :ny, :nx]


def predict_kernels(params, feats):
    """feats (1,ny,nx,_NFEAT) -> per-pixel softmax kernels (1,ny,nx,_NK)."""
    ny, nx = feats.shape[1], feats.shape[2]
    e0 = _silu(_conv(params["enc0b"], _silu(_conv(params["enc0a"], feats))))
    x = _down(e0)
    e1 = _silu(_conv(params["enc1b"], _silu(_conv(params["enc1a"], x))))
    x = _down(e1)
    x = _silu(_conv(params["botb"], _silu(_conv(params["bota"], x))))
    x = jnp.concatenate([_up(x, e1.shape[1], e1.shape[2]), e1], -1)
    x = _silu(_conv(params["dec1b"], _silu(_conv(params["dec1a"], x))))
    x = jnp.concatenate([_up(x, ny, nx), e0], -1)
    x = _silu(_conv(params["dec0b"], _silu(_conv(params["dec0a"], x))))
    logits = _conv(params["head"], x)
    return jax.nn.softmax(logits, axis=-1)


def _patches(img):
    """(1,ny,nx,C) -> (1,ny,nx,_NK,C) clamp-padded KSIZExKSIZE windows."""
    r = KSIZE // 2
    pad = jnp.pad(img, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    ny, nx = img.shape[1], img.shape[2]
    rows = []
    for dy in range(KSIZE):
        for dx in range(KSIZE):
            rows.append(pad[:, dy:dy + ny, dx:dx + nx, :])
    return jnp.stack(rows, -2)


def apply_kernels(kern, img):
    """Apply per-pixel kernels (1,ny,nx,_NK) to img (1,ny,nx,C)."""
    return jnp.sum(_patches(img) * kern[..., None], axis=-2)


def make_features(color, albedo, normal, count):
    """color/albedo/normal (ny,nx,3), count (ny,nx) -> (1,ny,nx,_NFEAT)."""
    f = jnp.concatenate([
        jnp.log1p(jnp.maximum(color, 0.0)),
        albedo,
        normal,
        (jnp.log1p(count) * 0.25)[..., None],
    ], -1)
    return f[None]


# ---------------------------------------------------------------------------
# Self-supervised training (noise2noise on split halves)
# ---------------------------------------------------------------------------


def _smape(x, y, w):
    """Symmetric relative L1 — robust for HDR radiance."""
    d = jnp.abs(x - y) / (jnp.abs(x) + jnp.abs(y) + 1e-2)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1e-6) / x.shape[-1]


def _loss(params, fa, fb, ca, cb, wa, wb):
    ka = predict_kernels(params, fa)
    kb = predict_kernels(params, fb)
    # cross-prediction: denoise(A) ~ B and denoise(B) ~ A
    la = _smape(apply_kernels(ka, ca)[0], cb[0], wb * wa)
    lb = _smape(apply_kernels(kb, cb)[0], ca[0], wa * wb)
    return la + lb


def train_step_factory(lr=2e-3):
    grad = jax.grad(_loss)

    def step(i, carry):
        params, m, v, fa, fb, ca, cb, wa, wb = carry
        g = grad(params, fa, fb, ca, cb, wa, wb)
        t = i + 1.0
        m = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b * b, v, g)
        mh = jax.tree.map(lambda a: a / (1.0 - 0.9 ** t), m)
        vh = jax.tree.map(lambda a: a / (1.0 - 0.999 ** t), v)
        params = jax.tree.map(
            lambda p, a, b: p - lr * a / (jnp.sqrt(b) + 1e-8), params, mh,
            vh)
        return params, m, v, fa, fb, ca, cb, wa, wb

    return step


def train_and_denoise(params, opt_state, color_a, n_a, color_b, n_b,
                      color_full, n_full, albedo, normal, vsp_raw,
                      steps=48, lr=2e-3):
    """One ISGB update: train on the halves, denoise the full buffer.

    All images (ny,nx,C)/(ny,nx). Returns (params, opt_state,
    denoised_color (ny,nx,3), denoised_vsp (ny,nx)). Training is skipped
    (lax.cond) when either half is empty (first wave)."""
    wa = (n_a > 0).astype(jnp.float32)[..., None]
    wb = (n_b > 0).astype(jnp.float32)[..., None]
    fa = make_features(color_a, albedo, normal, n_a)
    fb = make_features(color_b, albedo, normal, n_b)
    ca, cb = color_a[None], color_b[None]
    if opt_state is None:
        z = jax.tree.map(jnp.zeros_like, params)
        opt_state = (z, jax.tree.map(jnp.zeros_like, params))
    m, v = opt_state
    step = train_step_factory(lr)

    def do_train(_):
        out = jax.lax.fori_loop(
            0, steps, step, (params, m, v, fa, fb, ca, cb, wa, wb))
        return out[0], out[1], out[2]

    trainable = (jnp.sum(wa) > 0) & (jnp.sum(wb) > 0)
    params2, m2, v2 = jax.lax.cond(
        trainable, do_train, lambda _: (params, m, v), None)

    ff = make_features(color_full, albedo, normal, n_full)
    kern = predict_kernels(params2, ff)
    out_c = apply_kernels(kern, color_full[None])[0]
    # joint filtering of the scalar VSP map with the same kernels;
    # invalid (-1) pixels carry zero weight
    vmask = (vsp_raw >= 0.0).astype(jnp.float32)
    vnum = apply_kernels(kern, (vsp_raw * vmask)[None, ..., None])[0, ..., 0]
    vden = apply_kernels(kern, vmask[None, ..., None])[0, ..., 0]
    out_v = jnp.where(vden > 1e-4, vnum / jnp.maximum(vden, 1e-4), -1.0)
    return params2, (m2, v2), out_c, out_v
