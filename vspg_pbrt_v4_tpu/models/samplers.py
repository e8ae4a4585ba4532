"""Samplers: per-lane dimension counters over stateless generators.

Analog of the reference sampler interface (base/sampler.h:52-62:
StartPixelSample/Get1D/Get2D) and its sampler family (samplers.h:
Independent:442, Stratified:568, PaddedSobol:144, ZSobol:225, Sobol:479).

A wavefront lane's sampler state is just (pixel_id, sample_index, dim);
every Get bumps `dim`. Variants (static `kind`, compiled separately):

- "independent": pcg4d counter hashing (IndependentSampler).
- "stratified": latin-hypercube over spp via a stateless random permutation
  of sample indices per (pixel, dim) + jitter (StratifiedSampler's
  decorrelation strategy, grid collapsed to LHS for arbitrary spp).
- "paddedsobol": per-dimension Owen-scrambled Sobol' points over a
  per-(pixel,dim) permutation of the sample index — the reference's padded
  low-discrepancy strategy (samplers.h PaddedSobolSampler:144).
- "sobol": full-dimensional Sobol' (samplers.h SobolSampler:479 role):
  consecutive generator-matrix dimensions along the path (generated tables,
  utils/lowdiscrepancy.sobol_u32), per-pixel Owen scrambling instead of the
  reference's pixel-strided global indexing — same stratification across
  every consumed dimension, shard-trivial.
- "zsobol"/"halton": Morton-shuffled Sobol / scrambled-radical-inverse
  Halton as before.
"""

from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..utils import rng
from ..utils.lowdiscrepancy import (
    fast_owen_scramble,
    permutation_element,
    sobol_dim0,
    sobol_dim1,
    u32_to_unit_float,
)

_PADDED = ("paddedsobol", "zsobol", "halton")
_PMJ = ("pmj02bn", "pmj02")


@struct.dataclass
class LaneSampler:
    """Vectorized sampler state for R lanes (a pytree)."""

    seed: jnp.ndarray  # scalar uint32
    pixel_id: jnp.ndarray  # (R,) uint32
    sample_index: jnp.ndarray  # (R,) uint32
    dim: jnp.ndarray  # (R,) uint32
    kind: str = struct.field(pytree_node=False, default="independent")
    spp: int = struct.field(pytree_node=False, default=0)
    nx: int = struct.field(pytree_node=False, default=0)  # zsobol morton

    @staticmethod
    def start(seed, pixel_id, sample_index, kind="independent", spp=0, nx=0):
        pid = jnp.asarray(pixel_id).astype(jnp.uint32)
        return LaneSampler(
            jnp.asarray(seed, jnp.uint32),
            pid,
            jnp.broadcast_to(jnp.asarray(sample_index, jnp.uint32), pid.shape).astype(jnp.uint32),
            jnp.zeros_like(pid),
            kind, int(spp), int(nx),
        )

    # -- internals -----------------------------------------------------------
    def _dim_seed(self, salt):
        return rng.hash_u32(self.pixel_id, self.dim, self.seed,
                            jnp.uint32(salt))

    def _permuted_index(self, salt=0x9FA1):
        if self.spp <= 1:
            return self.sample_index
        return permutation_element(self.sample_index, jnp.uint32(self.spp),
                                   self._dim_seed(salt))

    def _draw(self, lane):
        """One scalar draw for sub-dimension `lane` of the current dim."""
        if self.kind == "independent":
            return rng.uniform4(self.seed, self.pixel_id, self.sample_index,
                                self.dim * jnp.uint32(4) + jnp.uint32(lane))[0]
        if self.kind == "stratified":
            # independent stratification per sub-dimension (padded LHS):
            # distinct permutations avoid diagonal u1-u2 correlation
            idx = self._permuted_index(0x9FA1 + 0x632B * lane)
            jit = rng.uniform4(self.seed, self.pixel_id, self.sample_index,
                               self.dim * jnp.uint32(4) + jnp.uint32(lane))[0]
            n = max(self.spp, 1)
            return jnp.minimum((idx.astype(jnp.float32) + jit) / n, 0.99999994)
        if self.kind == "halton":
            # padded scrambled Halton: sub-dimension `lane` uses the prime
            # base PRIMES[lane], decorrelated across (pixel, dim) by the
            # Owen-style digit permutations (samplers.h HaltonSampler
            # semantics, padded per pixel instead of pixel-strided)
            from ..utils.lowdiscrepancy import scrambled_radical_inverse

            return scrambled_radical_inverse(
                lane, self.sample_index, self._dim_seed(0x6A09 + 0x9E37 * lane))
        if self.kind == "zsobol" and self.nx > 0:
            # Morton-shuffled Sobol (samplers.h ZSobolSampler:225): one
            # hierarchically-permuted index per dimension, Sobol dims 0/1
            # for the sub-dimensions of each 2D draw
            from ..utils.lowdiscrepancy import (encode_morton2,
                                                zsobol_shuffled_index)

            nx = jnp.uint32(self.nx)
            px = self.pixel_id % nx
            py = self.pixel_id // nx
            log2spp = max(int(np.ceil(np.log2(max(self.spp, 1)))), 0)
            res_bits = int(np.ceil(np.log2(max(self.nx, 2))))
            n_d4 = (2 * res_bits + log2spp + 1) // 2 + 1
            morton = (encode_morton2(px, py) << jnp.uint32(log2spp)) \
                | (self.sample_index & jnp.uint32((1 << log2spp) - 1))
            idx = zsobol_shuffled_index(morton, n_d4, self._dim_seed(0x2F8B))
            v = sobol_dim1(idx) if lane == 1 else sobol_dim0(idx)
            v = fast_owen_scramble(v, self._dim_seed(0x55 + lane))
            return u32_to_unit_float(v)
        if self.kind in _PMJ:
            # per-pixel progressive pmj02 pairs: the sample_index walks an
            # Owen-scrambled (0,2) sequence whose scramble is keyed by
            # (pixel, dim) — pmj02 stratification within every pixel,
            # hashed decorrelation across pixels (PMJ02BNSampler role)
            v = sobol_dim1(self.sample_index) if lane == 1 \
                else sobol_dim0(self.sample_index)
            v = fast_owen_scramble(v, self._dim_seed(0x2B7E + 0x9E37 * lane))
            return u32_to_unit_float(v)
        if self.kind == "sobol":
            from ..utils.lowdiscrepancy import sobol_u32

            d_idx = (self.dim * jnp.uint32(4) + jnp.uint32(lane)).astype(jnp.int32)
            v = sobol_u32(self.sample_index, d_idx)
            # per-(pixel, dimension) Owen scramble; independent of the
            # sample index so the sequence stays a (0,2)-net per pixel
            v = fast_owen_scramble(
                v, rng.hash_u32(self.pixel_id, d_idx.astype(jnp.uint32),
                                self.seed, jnp.uint32(0x50B01)))
            return u32_to_unit_float(v)
        if self.kind in _PADDED:
            idx = self._permuted_index()
            v = sobol_dim1(idx) if lane == 1 else sobol_dim0(idx)
            if lane > 1:  # extra sub-dims: re-randomized dim0
                v = sobol_dim0(idx)
            v = fast_owen_scramble(v, self._dim_seed(0x55 + lane))
            return u32_to_unit_float(v)
        raise ValueError(f"unknown sampler kind {self.kind}")

    # -- interface ------------------------------------------------------------
    def get_1d(self):
        u = self._draw(0)
        return self.replace(dim=self.dim + 1), u

    def get_2d(self):
        u = jnp.stack([self._draw(0), self._draw(1)], axis=-1)
        return self.replace(dim=self.dim + 1), u

    def get_3d(self):
        u = jnp.stack([self._draw(0), self._draw(1), self._draw(2)], axis=-1)
        return self.replace(dim=self.dim + 1), u

    def get_4d(self):
        us = (self._draw(0), self._draw(1), self._draw(2), self._draw(3))
        return self.replace(dim=self.dim + 1), us
