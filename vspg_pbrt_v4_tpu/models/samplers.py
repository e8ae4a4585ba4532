"""Samplers: per-lane dimension counters over the stateless RNG.

Analog of the reference sampler interface (base/sampler.h:52-62:
StartPixelSample/Get1D/Get2D). A wavefront lane's sampler state is just
(pixel_id, sample_index, dim); every Get bumps `dim`. IndependentSampler uses
pcg4d counters; low-discrepancy samplers (Sobol/ZSobol, samplers.h:225-479)
come later and keep the same interface, replacing the hash with scrambled
Sobol' points indexed by (pixel, sample, dim).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import rng


class LaneSampler(NamedTuple):
    """Vectorized sampler state for R lanes (a pytree)."""

    seed: jnp.ndarray  # scalar uint32
    pixel_id: jnp.ndarray  # (R,) uint32
    sample_index: jnp.ndarray  # (R,) uint32
    dim: jnp.ndarray  # (R,) uint32

    @staticmethod
    def start(seed, pixel_id, sample_index):
        pid = jnp.asarray(pixel_id).astype(jnp.uint32)
        return LaneSampler(
            jnp.asarray(seed, jnp.uint32),
            pid,
            jnp.broadcast_to(jnp.asarray(sample_index, jnp.uint32), pid.shape).astype(jnp.uint32),
            jnp.zeros_like(pid),
        )

    def get_1d(self):
        u = rng.uniform1(self.seed, self.pixel_id, self.sample_index, self.dim)
        return self._replace(dim=self.dim + 1), u

    def get_2d(self):
        u = rng.uniform2(self.seed, self.pixel_id, self.sample_index, self.dim)
        return self._replace(dim=self.dim + 1), u

    def get_3d(self):
        u = rng.uniform3(self.seed, self.pixel_id, self.sample_index, self.dim)
        return self._replace(dim=self.dim + 1), u

    def get_4d(self):
        u = rng.uniform4(self.seed, self.pixel_id, self.sample_index, self.dim)
        return self._replace(dim=self.dim + 1), u
