"""Textures (compact analog of ``src/pbrt/textures.h``).

SoA texture bank with masked evaluation: every texture is one row of a
fixed-size parameter table plus an optional image atlas entry. Supported
kinds (textures.h registers 14 float + 13 spectrum types; these cover the
scene-facing surface):

  0 CONSTANT  value rgb
  1 CHECKER   two rgb colors, uscale/vscale (procedural, uv-driven)
  2 IMAGE     bilinear lookup into a stacked image atlas (uv wrap)
  3 SCALE     rgb scale * another texture (one level of nesting)
  4 MIX       lerp(amount, tex1, tex2) (textures.h MixTexture)
  5 FBM       Perlin fractional Brownian motion (world-space, grey)
  6 WRINKLED  Perlin turbulence (textures.h WrinkledTexture)
  7 MARBLE    spline-shaded perturbed sine (textures.h MarbleTexture)
  8 DOTS      procedural polka dots (textures.h DotsTexture)
  9 UV        uv visualization (textures.h UVTexture)
 10 WINDY     two-scale fBm waves (textures.h WindyTexture)
 11 BILERP    bilinear blend of 4 corner values (textures.h BilerpTexture:
              c0=v00, c1=v01, c2=v10, c3=v11 over wrapped scaled uv)

Evaluation is fully vectorized: ``eval_texture(bank, tex_id, uv, p)``
gathers parameters per lane and computes all kinds masked; the noise
kinds are driven by the world-space hit position scaled by params[2].
"""

from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

CONSTANT = 0
CHECKER = 1
IMAGE = 2
SCALE = 3
MIX = 4
FBM = 5
WRINKLED = 6
MARBLE = 7
DOTS = 8
UV = 9
WINDY = 10
BILERP = 11

_NOISE_KINDS = (FBM, WRINKLED, MARBLE, WINDY)

# pbrt's marble color spline control points (textures.cpp MarbleTexture)
_MARBLE_C = np.asarray([
    [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
    [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
    [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6],
], np.float32)


@struct.dataclass
class Textures:
    kind: jnp.ndarray  # (T,)
    c0: jnp.ndarray  # (T,3) value / checker tex1 / scale factor / amount
    c1: jnp.ndarray  # (T,3) checker tex2 / dots inside color
    uvscale: jnp.ndarray  # (T,2)
    image_id: jnp.ndarray  # (T,) index into atlas, -1 none
    inner: jnp.ndarray  # (T,) nested texture (SCALE/MIX tex1), -1 none
    inner2: jnp.ndarray  # (T,) MIX tex2, -1 none
    params: jnp.ndarray  # (T,4) [octaves, omega, scale, variation]
    atlas: jnp.ndarray  # (I, H, W, 3) stacked images (uniform size)
    has_images: bool = struct.field(pytree_node=False, default=False)
    c2: jnp.ndarray = None  # (T,3) bilerp v10
    c3: jnp.ndarray = None  # (T,3) bilerp v11

    @staticmethod
    def build(textures, images=()):
        """textures: list of dicts {kind, c0, c1, uvscale, image_id, inner,
        inner2, octaves, omega, scale, variation};
        images: list of (H,W,3) arrays, resized to the max size."""
        if not textures:
            textures = [dict(kind=CONSTANT, c0=(1.0, 1.0, 1.0))]
        kind = jnp.asarray([t.get("kind", CONSTANT) for t in textures], jnp.int32)
        c0 = jnp.asarray([t.get("c0", (1, 1, 1)) for t in textures], jnp.float32)
        c1 = jnp.asarray([t.get("c1", (0, 0, 0)) for t in textures], jnp.float32)
        uvs = jnp.asarray([t.get("uvscale", (1, 1)) for t in textures], jnp.float32)
        img_id = jnp.asarray([t.get("image_id", -1) for t in textures], jnp.int32)
        inner = jnp.asarray([t.get("inner", -1) for t in textures], jnp.int32)
        inner2 = jnp.asarray([t.get("inner2", -1) for t in textures], jnp.int32)
        params = jnp.asarray(
            [(t.get("octaves", 6), t.get("omega", 0.5), t.get("scale", 1.0),
              t.get("variation", 0.2)) for t in textures], jnp.float32)
        if images:
            hmax = max(im.shape[0] for im in images)
            wmax = max(im.shape[1] for im in images)
            atlas = np.zeros((len(images), hmax, wmax, 3), np.float32)
            for i, im in enumerate(images):
                # nearest resize to uniform atlas tiles
                ys = (np.arange(hmax) * im.shape[0] // hmax)
                xs = (np.arange(wmax) * im.shape[1] // wmax)
                atlas[i] = np.asarray(im, np.float32)[ys][:, xs]
            atlas = jnp.asarray(atlas)
        else:
            atlas = jnp.zeros((1, 1, 1, 3), jnp.float32)
        c2 = jnp.asarray([t.get("c2", (0, 0, 0)) for t in textures],
                         jnp.float32)
        c3 = jnp.asarray([t.get("c3", (0, 0, 0)) for t in textures],
                         jnp.float32)
        return Textures(kind, c0, c1, uvs, img_id, inner, inner2, params,
                        atlas, bool(images), c2, c3)


def _eval_level(bank: Textures, tid, uv, p=None):
    k = bank.kind[tid]
    c0 = bank.c0[tid]
    c1 = bank.c1[tid]
    uvs = bank.uvscale[tid]
    prm = bank.params[tid]
    out = c0  # CONSTANT default
    # checker
    su = uv * uvs
    par = (jnp.floor(su[..., 0]) + jnp.floor(su[..., 1])).astype(jnp.int32) % 2
    out = jnp.where((k == CHECKER)[..., None],
                    jnp.where((par == 0)[..., None], c0, c1), out)
    # image (bilinear, wrap)
    if bank.has_images:
        img_id = jnp.maximum(bank.image_id[tid], 0)
        H, W = bank.atlas.shape[1], bank.atlas.shape[2]
        u = (su[..., 0] % 1.0) * (W - 1)
        v = (1.0 - su[..., 1] % 1.0) * (H - 1)
        x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fu = (u - x0)[..., None]
        fv = (v - y0)[..., None]
        a = bank.atlas[img_id, y0, x0]
        b = bank.atlas[img_id, y0, x1]
        c = bank.atlas[img_id, y1, x0]
        d = bank.atlas[img_id, y1, x1]
        bil = (a * (1 - fu) + b * fu) * (1 - fv) + (c * (1 - fu) + d * fu) * fv
        out = jnp.where((k == IMAGE)[..., None], bil, out)
    # bilerp (textures.h BilerpTexture: corner blend over wrapped uv)
    if bank.c2 is not None:
        bu = su[..., 0] % 1.0
        bv = su[..., 1] % 1.0
        blp = ((1 - bu) * (1 - bv))[..., None] * c0 \
            + ((1 - bu) * bv)[..., None] * c1 \
            + (bu * (1 - bv))[..., None] * bank.c2[tid] \
            + (bu * bv)[..., None] * bank.c3[tid]
        out = jnp.where((k == BILERP)[..., None], blp, out)
    # uv visualization
    out = jnp.where((k == UV)[..., None],
                    jnp.stack([uv[..., 0] % 1.0, uv[..., 1] % 1.0,
                               jnp.zeros_like(uv[..., 0])], -1), out)
    # dots (textures.h DotsTexture: jittered dot per cell via noise)
    from ..utils.noise import fbm, perlin, turbulence

    cell = jnp.floor(su + 0.5)
    cell3 = jnp.concatenate([cell, jnp.zeros_like(cell[..., :1])], -1)
    has_dot = perlin(cell3 + 0.5) > 0.0
    cx = cell[..., 0] + 0.35 * perlin(cell3 + jnp.asarray([1.5, 2.5, 0.0]))
    cy = cell[..., 1] + 0.35 * perlin(cell3 + jnp.asarray([4.5, 9.5, 0.0]))
    in_dot = has_dot & (
        (su[..., 0] - cx) ** 2 + (su[..., 1] - cy) ** 2 < 0.35 * 0.35)
    out = jnp.where((k == DOTS)[..., None],
                    jnp.where(in_dot[..., None], c1, c0), out)
    # world-space noise kinds
    if p is not None:
        octaves = jnp.clip(prm[..., 0], 1, 8)
        omega = prm[..., 1]
        ps = p * prm[..., 2:3]
        # fixed 6-octave ladders with per-lane octave masking
        def ladder(f):
            total = jnp.zeros_like(omega)
            lam, o = 1.0, jnp.ones_like(omega)
            for i in range(8):
                total = total + jnp.where(i < octaves, o * f(ps * lam), 0.0)
                lam *= 1.99
                o = o * omega
            return total

        fbm_v = ladder(perlin)
        turb_v = ladder(lambda q: jnp.abs(perlin(q)))
        out = jnp.where((k == FBM)[..., None],
                        fbm_v[..., None] * jnp.ones(3), out)
        out = jnp.where((k == WRINKLED)[..., None],
                        turb_v[..., None] * jnp.ones(3), out)
        # windy (textures.h WindyTexture: strength * height)
        wind = fbm(0.1 * p, 0.5, 3)
        waves = fbm(p, 0.5, 6)
        windy = jnp.abs(wind) * waves
        out = jnp.where((k == WINDY)[..., None],
                        windy[..., None] * jnp.ones(3), out)
        # marble: spline(c, .5+.5 sin(scale*y + variation*fbm))
        marble = ps[..., 1] + prm[..., 3] * fbm_v
        t = 0.5 + 0.5 * jnp.sin(marble)
        nseg = _MARBLE_C.shape[0] - 3
        first = jnp.clip((t * nseg).astype(jnp.int32), 0, nseg - 1)
        tt = t * nseg - first
        cm = jnp.asarray(_MARBLE_C)
        c_0, c_1 = cm[first], cm[first + 1]
        c_2, c_3 = cm[first + 2], cm[first + 3]
        s0 = (1 - tt)[..., None] * c_0 + tt[..., None] * c_1
        s1 = (1 - tt)[..., None] * c_1 + tt[..., None] * c_2
        s2 = (1 - tt)[..., None] * c_2 + tt[..., None] * c_3
        s0 = (1 - tt)[..., None] * s0 + tt[..., None] * s1
        s1 = (1 - tt)[..., None] * s1 + tt[..., None] * s2
        mar = 1.5 * ((1 - tt)[..., None] * s0 + tt[..., None] * s1)
        out = jnp.where((k == MARBLE)[..., None], mar, out)
    return out, k, c0


def eval_texture(bank: Textures, tex_id, uv, p=None):
    """(R,) tex ids + (R,2) uv [+ (R,3) world pos] -> (R,3) rgb.
    tex_id < 0 -> ones."""
    tid = jnp.maximum(tex_id, 0)
    out, k, c0 = _eval_level(bank, tid, uv, p)
    # one nesting level for SCALE / MIX
    inner = jnp.maximum(bank.inner[tid], 0)
    inner_val, _, _ = _eval_level(bank, inner, uv, p)
    out = jnp.where((k == SCALE)[..., None], c0 * inner_val, out)
    inner2 = jnp.maximum(bank.inner2[tid], 0)
    inner2_val, _, _ = _eval_level(bank, inner2, uv, p)
    amt = c0[..., 0:1]
    out = jnp.where((k == MIX)[..., None],
                    (1.0 - amt) * inner_val + amt * inner2_val, out)
    return jnp.where((tex_id >= 0)[..., None], out, jnp.ones_like(out))


# ---------------------------------------------------------------------------
# Per-face textures (PtexTexture analog, textures.h:~700)
#
# The reference evaluates Disney Ptex files through the ptex library
# (per-face texel grids addressed by faceIndex). The TPU-native design
# bakes the faces into ONE texture atlas at scene-build time and rewrites
# the mesh's per-corner uv to each face's atlas rect — after that the hot
# path is a plain bilinear image lookup (single gather chain, no
# face-indexed dispatch). Rects map face-local uv to texel CENTERS, so
# bilinear taps never cross into a neighboring face.
#
# On-disk containers: raw .ptx files (pure-numpy Ptex parser in
# tools/ptex.py — constant/zipped/diffzipped/tiled encodings, all four
# data types) or an .npz with arrays face_0..face_{F-1}, each (h, w, 3)
# float.
# ---------------------------------------------------------------------------


def save_face_textures(path, faces):
    """Write the face-texture container (one (h,w,3) array per face)."""
    np.savez(path, **{f"face_{i}": np.asarray(f, np.float32)
                      for i, f in enumerate(faces)})


def load_face_textures(path):
    """Load per-face texel grids from a raw .ptx (tools/ptex.py pure-numpy
    Ptex parser) or the .npz face container."""
    if str(path).endswith(".ptx"):
        from ..tools.ptex import read_ptx

        return read_ptx(path).faces
    data = np.load(path)
    n = len([k for k in data.files if k.startswith("face_")])
    return [np.asarray(data[f"face_{i}"], np.float32) for i in range(n)]


def build_face_atlas(faces):
    """Shelf-pack face texel grids into one atlas.

    Returns (atlas (H,W,3) float32, rects) where rects[i] = (u0,v0,u1,v1)
    maps face i's local uv onto texel centers under the IMAGE-kind
    sampling convention of _eval_level (x = u*(W-1), y = (1-v)*(H-1))."""
    faces = [np.atleast_3d(np.asarray(f, np.float32)) for f in faces]
    area = sum(f.shape[0] * f.shape[1] for f in faces)
    W = 1
    while W * W < 2 * area:
        W *= 2
    order = sorted(range(len(faces)), key=lambda i: -faces[i].shape[0])
    pos = [None] * len(faces)
    x = y = shelf_h = 0
    for i in order:
        h, w = faces[i].shape[:2]
        if x + w > W:
            x, y = 0, y + shelf_h
            shelf_h = 0
        pos[i] = (y, x)
        x += w
        shelf_h = max(shelf_h, h)
    H = y + shelf_h + 1  # +1: keep u/v strictly below 1.0 (wrap-safe)
    atlas = np.zeros((H, W + 1, 3), np.float32)
    rects = []
    for i, f in enumerate(faces):
        h, w = f.shape[:2]
        r0, c0 = pos[i]
        atlas[r0:r0 + h, c0:c0 + w] = f[..., :3]
        u0 = c0 / (W + 1 - 1)
        u1 = (c0 + w - 1) / (W + 1 - 1)
        v0 = 1.0 - (r0 + h - 1) / (H - 1)
        v1 = 1.0 - r0 / (H - 1)
        rects.append((u0, v0, u1, v1))
    return atlas, rects
