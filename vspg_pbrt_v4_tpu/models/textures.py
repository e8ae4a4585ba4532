"""Textures (compact analog of ``src/pbrt/textures.h``).

SoA texture bank with masked evaluation: every texture is one row of a
fixed-size parameter table plus an optional image atlas entry. Supported
kinds (textures.h has 20+; these cover the common scene surface):

  0 CONSTANT  value rgb
  1 CHECKER   two rgb colors, uscale/vscale (procedural, uv-driven)
  2 IMAGE     bilinear lookup into a stacked image atlas (uv wrap)
  3 SCALE     rgb scale * another texture (one level of nesting)

Evaluation is fully vectorized: ``eval_texture(bank, tex_id, uv)`` gathers
parameters per lane and computes all kinds masked.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

CONSTANT = 0
CHECKER = 1
IMAGE = 2
SCALE = 3


@struct.dataclass
class Textures:
    kind: jnp.ndarray  # (T,)
    c0: jnp.ndarray  # (T,3) value / checker tex1 / scale factor
    c1: jnp.ndarray  # (T,3) checker tex2
    uvscale: jnp.ndarray  # (T,2)
    image_id: jnp.ndarray  # (T,) index into atlas, -1 none
    inner: jnp.ndarray  # (T,) nested texture (SCALE), -1 none
    atlas: jnp.ndarray  # (I, H, W, 3) stacked images (uniform size)
    has_images: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def build(textures, images=()):
        """textures: list of dicts {kind, c0, c1, uvscale, image_id, inner};
        images: list of (H,W,3) arrays, resized to the max size."""
        if not textures:
            textures = [dict(kind=CONSTANT, c0=(1.0, 1.0, 1.0))]
        T = len(textures)
        kind = jnp.asarray([t.get("kind", CONSTANT) for t in textures], jnp.int32)
        c0 = jnp.asarray([t.get("c0", (1, 1, 1)) for t in textures], jnp.float32)
        c1 = jnp.asarray([t.get("c1", (0, 0, 0)) for t in textures], jnp.float32)
        uvs = jnp.asarray([t.get("uvscale", (1, 1)) for t in textures], jnp.float32)
        img_id = jnp.asarray([t.get("image_id", -1) for t in textures], jnp.int32)
        inner = jnp.asarray([t.get("inner", -1) for t in textures], jnp.int32)
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
        return Textures(kind, c0, c1, uvs, img_id, inner, atlas, bool(images))


def _eval_level(bank: Textures, tid, uv):
    k = bank.kind[tid]
    c0 = bank.c0[tid]
    c1 = bank.c1[tid]
    uvs = bank.uvscale[tid]
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
    return out, k, c0


def eval_texture(bank: Textures, tex_id, uv):
    """(R,) tex ids + (R,2) uv -> (R,3) rgb. tex_id < 0 -> ones."""
    tid = jnp.maximum(tex_id, 0)
    out, k, c0 = _eval_level(bank, tid, uv)
    # one nesting level for SCALE
    inner = jnp.maximum(bank.inner[tid], 0)
    inner_val, _, _ = _eval_level(bank, inner, uv)
    out = jnp.where((k == SCALE)[..., None], c0 * inner_val, out)
    return jnp.where((tex_id >= 0)[..., None], out, jnp.ones_like(out))
