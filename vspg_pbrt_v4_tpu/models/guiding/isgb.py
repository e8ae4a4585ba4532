"""Image-space guiding buffer (ISGB) — the OpenPGL util::ImageSpaceGuidingBuffer.

Per-pixel accumulators feeding two denoised estimates
(guidedvolpathvspgintegrator.cpp:151-196, 613-622, 1098-1112):

- *contribution estimate*: denoised full-path radiance, the pixel estimate
  for guided Russian roulette (util::GuidedRussianRoulette);
- *volume scatter probability estimate*: the primary-ray VSP target. Each
  sample's path contribution is classified by its first event (volume scatter
  vs surface hit); the per-pixel VSP follows the paper's contribution
  criterion Cv/(Cv+Cs) or variance criterion (Cv^2+Vv)/(Cv^2+Vv+Cs^2+Vs).

The reference denoises with OIDN; here two on-device denoisers are
available (ISGB.make(denoiser=...)):

- "atrous" (default): edge-aware à-trous cross-bilateral filter guided by
  albedo + normal;
- "unet": the OIDN-class learned denoiser — a kernel-predicting U-Net
  trained per scene, self-supervised on the buffer's even/odd-wave split
  halves (see guiding/denoiser.py). Its parameters live in the buffer and
  keep training across updates.

Updates happen at waves 1,2,4,8,... (PostProcessWave:250-259).
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np


@struct.dataclass
class ISGB:
    # raw accumulators, (P = nx*ny)
    contrib_sum: jnp.ndarray  # (P,3)
    albedo_sum: jnp.ndarray  # (P,3)
    normal_sum: jnp.ndarray  # (P,3)
    n: jnp.ndarray  # (P,)
    c_vol: jnp.ndarray  # (P,) first-event-volume contribution sums
    c_vol2: jnp.ndarray  # (P,)
    c_surf: jnp.ndarray  # (P,)
    c_surf2: jnp.ndarray  # (P,)
    # even-wave (A) split half for noise2noise training; B = total - A
    contrib_a: jnp.ndarray  # (P,3)
    n_a: jnp.ndarray  # (P,)
    # denoised estimates (valid once ready)
    contrib_est: jnp.ndarray  # (P,3)
    vsp_est: jnp.ndarray  # (P,)
    ready: jnp.ndarray  # () bool
    net: object  # unet denoiser state (params, (m, v)) or None for atrous
    resolution: tuple = struct.field(pytree_node=False)
    vsp_criterion: str = struct.field(pytree_node=False)  # "variance"|"contribution"
    denoiser: str = struct.field(pytree_node=False)  # "atrous"|"unet"

    @staticmethod
    def make(resolution, vsp_criterion="variance", denoiser="atrous"):
        P = int(resolution[0] * resolution[1])
        z = jnp.zeros
        net = None
        if denoiser == "unet":
            from . import denoiser as dn

            params = dn.init_params()
            zeros = jax.tree.map(jnp.zeros_like, params)
            net = (params, (zeros, jax.tree.map(jnp.zeros_like, params)))
        return ISGB(z((P, 3)), z((P, 3)), z((P, 3)), z((P,)), z((P,)), z((P,)),
                    z((P,)), z((P,)), z((P, 3)), z((P,)), z((P, 3)),
                    jnp.full((P,), -1.0),
                    jnp.asarray(False), net, tuple(int(r) for r in resolution),
                    vsp_criterion, denoiser)


def isgb_add_samples(buf: ISGB, pixel_id, L, albedo, normal,
                     first_event_volume, valid, half=0):
    """Accumulate one wave of per-pixel samples (AddSample analog).

    half: 0 routes this wave's samples additionally into the A split half
    (pass wave_idx % 2) — the unet denoiser trains on A vs (total - A)."""
    w = jnp.where(valid, 1.0, 0.0)
    wa = w * jnp.where(jnp.asarray(half) == 0, 1.0, 0.0)
    lum = jnp.mean(L, -1)
    lv = jnp.where(first_event_volume, lum, 0.0)
    ls = jnp.where(first_event_volume, 0.0, lum)
    return buf.replace(
        contrib_sum=buf.contrib_sum.at[pixel_id].add(w[..., None] * L),
        albedo_sum=buf.albedo_sum.at[pixel_id].add(w[..., None] * albedo),
        normal_sum=buf.normal_sum.at[pixel_id].add(w[..., None] * normal),
        n=buf.n.at[pixel_id].add(w),
        c_vol=buf.c_vol.at[pixel_id].add(w * lv),
        c_vol2=buf.c_vol2.at[pixel_id].add(w * lv * lv),
        c_surf=buf.c_surf.at[pixel_id].add(w * ls),
        c_surf2=buf.c_surf2.at[pixel_id].add(w * ls * ls),
        contrib_a=buf.contrib_a.at[pixel_id].add(wa[..., None] * L),
        n_a=buf.n_a.at[pixel_id].add(wa),
    )


def _shift_clamp(a, sy, sx):
    """Shift image content by (sy, sx) with clamp-to-edge boundary:
    out[y, x] = a[clip(y - sy), clip(x - sx)] (roll semantics without the
    wrap-around that contaminated edge pixels with the opposite border)."""
    ny, nx = a.shape[:2]
    iy = jnp.clip(jnp.arange(ny) - sy, 0, ny - 1)
    ix = jnp.clip(jnp.arange(nx) - sx, 0, nx - 1)
    return a[iy][:, ix]


def _atrous(img, albedo, normal, steps=3):
    """Edge-aware à-trous wavelet filter (Dammertz et al. 2010 style).

    img: (ny,nx,C); albedo/normal: (ny,nx,3) guides. Returns filtered img.
    """
    ny, nx, C = img.shape
    kernel = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    offsets = [-2, -1, 0, 1, 2]

    out = img
    for step in range(steps):
        stride = 1 << step
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((ny, nx, 1))
        for i, dy in enumerate(offsets):
            for j, dx in enumerate(offsets):
                w_k = kernel[i] * kernel[j]
                sy, sx = dy * stride, dx * stride
                sh = _shift_clamp(out, sy, sx)
                sh_alb = _shift_clamp(albedo, sy, sx)
                sh_nrm = _shift_clamp(normal, sy, sx)
                w_alb = jnp.exp(-jnp.sum((albedo - sh_alb) ** 2, -1, keepdims=True) / 0.05)
                w_nrm = jnp.exp(-jnp.sum((normal - sh_nrm) ** 2, -1, keepdims=True) / 0.2)
                w = w_k * w_alb * w_nrm
                acc = acc + sh * w
                wacc = wacc + w
        out = acc / jnp.maximum(wacc, 1e-8)
    return out


@jax.jit
def isgb_update(buf: ISGB) -> ISGB:
    """Denoise accumulators into estimates (Update analog)."""
    nx, ny = buf.resolution
    n = jnp.maximum(buf.n, 1.0)[..., None]
    contrib = (buf.contrib_sum / n).reshape(ny, nx, 3)
    albedo = (buf.albedo_sum / n).reshape(ny, nx, 3)
    normal = (buf.normal_sum / n).reshape(ny, nx, 3)

    nn = jnp.maximum(buf.n, 1.0)
    cv = buf.c_vol / nn
    cs = buf.c_surf / nn
    if buf.vsp_criterion == "variance":
        vv = jnp.maximum(buf.c_vol2 / nn - cv * cv, 0.0)
        vs = jnp.maximum(buf.c_surf2 / nn - cs * cs, 0.0)
        num = cv * cv + vv
        den = num + cs * cs + vs
    else:
        num = cv
        den = cv + cs
    vsp_raw = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), -1.0)
    vsp_raw = jnp.where(vsp_raw >= 0, jnp.clip(vsp_raw, 0.0, 1.0), -1.0)

    if buf.denoiser == "unet":
        from . import denoiser as dn

        na = buf.n_a.reshape(ny, nx)
        nb = (buf.n - buf.n_a).reshape(ny, nx)
        ca = (buf.contrib_a
              / jnp.maximum(buf.n_a, 1.0)[..., None]).reshape(ny, nx, 3)
        cb = ((buf.contrib_sum - buf.contrib_a)
              / jnp.maximum(buf.n - buf.n_a, 1.0)[..., None]
              ).reshape(ny, nx, 3)
        params, opt_state = buf.net
        params, opt_state, contrib_d, vsp_d2 = dn.train_and_denoise(
            params, opt_state, ca, na, cb, nb, contrib,
            buf.n.reshape(ny, nx), albedo, normal,
            vsp_raw.reshape(ny, nx))
        vsp_est = jnp.where(buf.n > 0, vsp_d2.reshape(-1), -1.0)
        return buf.replace(
            contrib_est=contrib_d.reshape(-1, 3),
            vsp_est=vsp_est,
            ready=jnp.asarray(True),
            net=(params, opt_state),
        )

    contrib_d = _atrous(contrib, albedo, normal)
    # denoise the vsp map too (single channel through the same filter)
    vsp_img = jnp.clip(vsp_raw, 0.0, 1.0).reshape(ny, nx, 1)
    vsp_d = _atrous(vsp_img, albedo, normal).reshape(-1)
    vsp_est = jnp.where(buf.n > 0, vsp_d, -1.0)

    return buf.replace(
        contrib_est=contrib_d.reshape(-1, 3),
        vsp_est=vsp_est,
        ready=jnp.asarray(True),
    )


def isgb_primary_vsp(buf: ISGB, pixel_id):
    """GetVolumeScatterProbabilityEstimate: -1 when not ready."""
    v = buf.vsp_est[pixel_id]
    return jnp.where(buf.ready, v, -1.0)


def isgb_contribution(buf: ISGB, pixel_id):
    """GetContributionEstimate (pixel estimate for guided RR)."""
    c = buf.contrib_est[pixel_id]
    return jnp.where(buf.ready, c, jnp.zeros_like(c))


def save_isgb(buf: ISGB, path):
    flat, _ = jax.tree.flatten(buf)
    np.savez(path, *[np.asarray(x) for x in flat], res=buf.resolution,
             crit=buf.vsp_criterion, dn=buf.denoiser)


def load_isgb(path) -> ISGB:
    data = np.load(path, allow_pickle=True)
    meta = {"res", "crit", "dn"} & set(data.files)
    arrays = [data[f"arr_{i}"] for i in range(len(data.files) - len(meta))]
    dn = str(data["dn"]) if "dn" in data.files else "atrous"
    template = ISGB.make(tuple(data["res"]), str(data["crit"]), dn)
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrays])
