"""Participating media (analog of ``src/pbrt/media.h``).

Media are stacked SoA parameter arrays indexed by a per-lane ``medium_id``
(-1 = vacuum). This file covers homogeneous media (media.h
HomogeneousMedium:221 + the fork's IsHomogeneous:1016); heterogeneous grid
media (GridMedium:284, NanoVDBMedium:657) layer a density grid + majorant
supergrid DDA on top and arrive with ops/dda.py.

Majorant iteration for homogeneous media is a single segment with
sigma_maj = sigma_a + sigma_s (media.h HomogeneousMajorantIterator:84).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MediumProperties(NamedTuple):
    sigma_a: jnp.ndarray  # (R,3)
    sigma_s: jnp.ndarray  # (R,3)
    Le: jnp.ndarray  # (R,3) emission
    g: jnp.ndarray  # (R,) HG asymmetry


class HomogeneousMedia(NamedTuple):
    """M homogeneous media, SoA."""

    sigma_a: jnp.ndarray  # (M,3)
    sigma_s: jnp.ndarray  # (M,3)
    Le: jnp.ndarray  # (M,3)
    g: jnp.ndarray  # (M,)

    @staticmethod
    def make(sigma_a, sigma_s, Le=None, g=None):
        sa = jnp.atleast_2d(jnp.asarray(sigma_a, jnp.float32))
        ss = jnp.atleast_2d(jnp.asarray(sigma_s, jnp.float32))
        m = sa.shape[0]
        le = jnp.zeros((m, 3), jnp.float32) if Le is None else jnp.atleast_2d(jnp.asarray(Le, jnp.float32))
        gg = jnp.zeros((m,), jnp.float32) if g is None else jnp.atleast_1d(jnp.asarray(g, jnp.float32))
        return HomogeneousMedia(sa, ss, le, gg)

    def sample_point(self, medium_id, p) -> MediumProperties:
        """Gather properties for lanes; medium_id < 0 -> vacuum zeros."""
        mid = jnp.maximum(medium_id, 0)
        valid = (medium_id >= 0)[..., None]
        return MediumProperties(
            jnp.where(valid, self.sigma_a[mid], 0.0),
            jnp.where(valid, self.sigma_s[mid], 0.0),
            jnp.where(valid, self.Le[mid], 0.0),
            jnp.where(valid[..., 0], self.g[mid], 0.0),
        )

    def sigma_maj(self, medium_id):
        """Spectral majorant per lane: sigma_a + sigma_s (exact for
        homogeneous)."""
        mid = jnp.maximum(medium_id, 0)
        valid = (medium_id >= 0)[..., None]
        return jnp.where(valid, self.sigma_a[mid] + self.sigma_s[mid], 0.0)
