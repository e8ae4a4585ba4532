"""Reconstruction filters (analog of ``src/pbrt/filters.h``).

pbrt-v4 importance-samples the pixel filter (FilterSampler): the film sample
position is drawn ~ |f| and the sample weight is f/p — exactly +-1 for the
tabulated sampler. Box/triangle/gaussian are sampled in closed form
(weight 1); Mitchell-Netravali samples its |f| via a host-built 1D table per
axis with sign weights.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import erf_inv


def _mitchell_1d(x, b=1.0 / 3.0, c=1.0 / 3.0):
    x = np.abs(2.0 * x)  # pbrt evaluates on x/radius * 2
    return np.where(
        x > 1,
        ((-b - 6 * c) * x**3 + (6 * b + 30 * c) * x**2 + (-12 * b - 48 * c) * x
         + (8 * b + 24 * c)) / 6,
        ((12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2
         + (6 - 2 * b)) / 6,
    ) * (x < 2)


_N_TAB = 64


@struct.dataclass
class Filter:
    table_cdf: jnp.ndarray  # (N+1,) cdf of |f| over [-r, r] (tabulated kinds)
    table_sign: jnp.ndarray  # (N,) sign of f per bin
    kind: str = struct.field(pytree_node=False, default="box")
    radius: float = struct.field(pytree_node=False, default=0.5)
    sigma: float = struct.field(pytree_node=False, default=0.5)

    @staticmethod
    def make(kind="box", radius=None, sigma=0.5):
        defaults = {"box": 0.5, "triangle": 2.0, "gaussian": 1.5,
                    "mitchell": 2.0}
        r = float(radius if radius is not None else defaults.get(kind, 0.5))
        if kind == "mitchell":
            xs = (np.arange(_N_TAB) + 0.5) / _N_TAB * 2 - 1  # [-1,1]
            f = _mitchell_1d(xs)
            cdf = np.zeros(_N_TAB + 1)
            cdf[1:] = np.cumsum(np.abs(f))
            cdf /= cdf[-1]
            sign = np.sign(f).astype(np.float32)
        else:
            cdf = np.linspace(0, 1, _N_TAB + 1)
            sign = np.ones(_N_TAB, np.float32)
        return Filter(jnp.asarray(cdf, jnp.float32), jnp.asarray(sign),
                      kind, r, float(sigma))

    def _sample_1d(self, u):
        if self.kind == "box":
            return (u - 0.5) * 2.0 * self.radius, jnp.ones_like(u)
        if self.kind == "triangle":
            take_neg = u < 0.5
            u0 = jnp.where(take_neg, 1.0 - 2.0 * u, 2.0 * u - 1.0)
            x = self.radius * (1.0 - jnp.sqrt(jnp.maximum(1.0 - u0, 0.0)))
            return jnp.where(take_neg, -x, x), jnp.ones_like(u)
        if self.kind == "gaussian":
            # truncated gaussian on [-r, r] via inverse-CDF
            import jax.scipy.special as jsp

            cap = jax.scipy.special.erf(self.radius / (self.sigma * np.sqrt(2)))
            x = self.sigma * np.sqrt(2) * erf_inv((2 * u - 1) * cap)
            return jnp.clip(x, -self.radius, self.radius), jnp.ones_like(u)
        # mitchell: tabulated |f| inverse-cdf + sign weight
        idx = jnp.clip(jnp.searchsorted(self.table_cdf, u, side="right") - 1,
                       0, _N_TAB - 1)
        lo = self.table_cdf[idx]
        hi = self.table_cdf[idx + 1]
        frac = jnp.where(hi > lo, (u - lo) / jnp.maximum(hi - lo, 1e-12), 0.5)
        x = ((idx + frac) / _N_TAB * 2.0 - 1.0) * self.radius
        return x, self.table_sign[idx]

    def sample(self, u2):
        """u2 (R,2) -> (offset (R,2) from the pixel center, weight (R,))."""
        x, wx = self._sample_1d(u2[..., 0])
        y, wy = self._sample_1d(u2[..., 1])
        return jnp.stack([x, y], -1), wx * wy
