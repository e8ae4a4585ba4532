"""Image pyramid with trilinear filtered lookups (util/mipmap.h MIPMap).

The reference builds per-texture pyramids and filters with trilinear or EWA
footprints derived from ray differentials. Here the pyramid is a single
padded (L, H, W, C) array (each level upsampled back to the base resolution
by nearest-repeat so the whole pyramid is one gatherable tensor — TPU-dense,
memory cost 2x instead of 1.33x) with trilinear (bilinear + level lerp)
lookups. EWA and ray-differential plumbing through the wavefront are
follow-up work; `width_to_lod` maps a filter footprint to a level.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_pyramid(image):
    """(H, W, C) -> (L, H, W, C) pyramid; level l is the 2^l box-downsampled
    image re-expanded to the base grid (so lookups need no per-level shape
    bookkeeping)."""
    img = np.asarray(image, np.float32)
    H, W = img.shape[:2]
    levels = [img]
    cur = img
    while min(cur.shape[0], cur.shape[1]) > 1:
        h2 = max(cur.shape[0] // 2, 1)
        w2 = max(cur.shape[1] // 2, 1)
        cur = cur[: h2 * 2, : w2 * 2]
        cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2]
                      + cur[0::2, 1::2] + cur[1::2, 1::2])
        up = np.repeat(np.repeat(cur, H // cur.shape[0], 0),
                       W // cur.shape[1], 1)
        # guard non-power-of-two leftovers
        up = up[:H, :W]
        if up.shape[:2] != (H, W):
            pad = np.zeros_like(img)
            pad[: up.shape[0], : up.shape[1]] = up
            up = pad
        levels.append(up)
    return jnp.asarray(np.stack(levels))


def n_levels(pyramid):
    return pyramid.shape[0]


def width_to_lod(width, base_res):
    """Filter width in uv units -> fractional level (MIPMap::Lookup)."""
    return jnp.clip(jnp.log2(jnp.maximum(width * base_res, 1e-8)),
                    0.0, 1e6)


def lookup_trilinear(pyramid, uv, lod):
    """uv (...,2) wrapped, lod (...,) fractional level -> (..., C)."""
    L, H, W = pyramid.shape[0], pyramid.shape[1], pyramid.shape[2]
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    fl = (lod - l0)[..., None]

    def bilerp(level):
        u = (uv[..., 0] % 1.0) * (W - 1)
        v = (1.0 - uv[..., 1] % 1.0) * (H - 1)
        x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fu = (u - x0)[..., None]
        fv = (v - y0)[..., None]
        a = pyramid[level, y0, x0]
        b = pyramid[level, y0, x1]
        c = pyramid[level, y1, x0]
        d = pyramid[level, y1, x1]
        return (a * (1 - fu) + b * fu) * (1 - fv) \
            + (c * (1 - fu) + d * fu) * fv

    return bilerp(l0) * (1 - fl) + bilerp(l1) * fl
