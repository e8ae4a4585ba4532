"""Scalar math helpers (jnp, broadcastable).

TPU-native analog of the reference's ``src/pbrt/util/math.h``. Only the pieces
a vectorized renderer needs: safe transcendentals, robust quadratics, bit
tricks. Interval arithmetic is intentionally absent — ray-intersection
robustness on TPU f32 is handled by ray-offset epsilons (see ops/intersect.py)
rather than pbrt's running-error intervals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# -- constants (f32) ---------------------------------------------------------

PI = 3.14159265358979323846
INV_PI = 1.0 / PI
INV_2PI = 1.0 / (2.0 * PI)
INV_4PI = 1.0 / (4.0 * PI)
PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0
SQRT2 = 1.41421356237309504880

# numpy on purpose: jnp.float32(1) at module level would commit a device op
# at import time (breaks the CPU-pinned multichip dryrun).
FLOAT_ONE_MINUS_EPSILON = float(np.float32(1) - np.finfo(np.float32).eps / 2)
INFINITY = float("inf")
MACHINE_EPSILON = float(jnp.finfo(jnp.float32).eps) * 0.5


def sqr(x):
    return x * x


def lerp(t, a, b):
    """(1-t)*a + t*b  (argument order matches pbrt's Lerp)."""
    return (1.0 - t) * a + t * b


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def safe_div(a, b, fill=0.0):
    """a/b with 0-denominator giving `fill` (grad-safe double-where)."""
    b_ok = b != 0
    denom = jnp.where(b_ok, b, 1.0)
    return jnp.where(b_ok, a / denom, fill)


def difference_of_products(a, b, c, d):
    """a*b - c*d with an FMA-style compensation (pbrt util/math.h).

    XLA on TPU contracts to FMA where profitable; the explicit compensation
    keeps the cross products / determinants stable in f32.
    """
    cd = c * d
    dop = jnp.float32(a * b) - cd
    err = -(c * d - cd)  # best-effort; exact with FMA, harmless without
    return dop + err


def sum_of_products(a, b, c, d):
    cd = c * d
    sop = a * b + cd
    err = c * d - cd
    return sop + err


def quadratic(a, b, c):
    """Solve a t^2 + b t + c = 0 robustly.

    Returns (has_solution, t0, t1) with t0 <= t1. Vectorized; where there is
    no real solution t0/t1 are garbage and has_solution is False.
    Linear case (a==0) handled: single root -c/b in both slots.
    """
    disc = difference_of_products(b, b, 4.0 * a, c)
    has = disc >= 0.0
    root = safe_sqrt(disc)
    # Numerically stable: q = -0.5 (b + sign(b) * sqrt(disc))
    q = -0.5 * (b + jnp.where(b < 0, -root, root))
    t0 = safe_div(q, a, fill=0.0)
    t1 = safe_div(c, q, fill=0.0)
    lin_t = safe_div(-c, b, fill=0.0)
    is_lin = a == 0.0
    tmin, tmax = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    t0 = jnp.where(is_lin, lin_t, tmin)
    t1 = jnp.where(is_lin, lin_t, tmax)
    has = jnp.where(is_lin, b != 0.0, has)
    return has, t0, t1


def smooth_step(x, a, b):
    t = jnp.clip(safe_div(x - a, b - a), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def fast_exp(x):
    return jnp.exp(x)  # XLA's exp is already VPU-native; no LUT needed on TPU


def gaussian(x, mu=0.0, sigma=1.0):
    return (1.0 / jnp.sqrt(2.0 * PI * sigma * sigma)) * jnp.exp(
        -sqr(x - mu) / (2.0 * sigma * sigma)
    )


def gaussian_integral(x0, x1, mu=0.0, sigma=1.0):
    sigma_root2 = sigma * SQRT2
    return 0.5 * (
        jax.scipy.special.erf((mu - x0) / sigma_root2)
        - jax.scipy.special.erf((mu - x1) / sigma_root2)
    )


def logistic(x, s):
    x = jnp.abs(x)
    return jnp.exp(-x / s) / (s * sqr(1.0 + jnp.exp(-x / s)))


def logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def trimmed_logistic(x, s, a, b):
    return logistic(x, s) / (logistic_cdf(b, s) - logistic_cdf(a, s))


def i0(x):
    """Modified Bessel I0 (series, matches pbrt's 10-term evaluation)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * sqr(ifact))
        x2i = x2i * x * x
        i4 *= 4
    return val


def log_i0(x):
    return jnp.where(
        x > 12.0,
        x + 0.5 * (-jnp.log(2.0 * PI) + jnp.log(1.0 / x) + 1.0 / (8.0 * x)),
        jnp.log(i0(x)),
    )


def next_float_up(v):
    """Next representable f32 above v (for conservative ray offsets)."""
    vi = v.astype(jnp.float32).view(jnp.int32)
    vi = jnp.where(v >= 0, vi + 1, vi - 1)
    out = vi.view(jnp.float32)
    return jnp.where(v == jnp.inf, v, jnp.where(v == 0.0, jnp.finfo(jnp.float32).tiny, out))


def next_float_down(v):
    vi = v.astype(jnp.float32).view(jnp.int32)
    vi = jnp.where(v > 0, vi - 1, vi + 1)
    out = vi.view(jnp.float32)
    return jnp.where(v == -jnp.inf, v, jnp.where(v == 0.0, -jnp.finfo(jnp.float32).tiny, out))


def erf_inv(x):
    return jax.scipy.special.erfinv(x)


def newton_bisection(x0, x1, f, iters=32):
    """Vectorized Newton-bisection root find of f on [x0,x1].

    f(x) -> (fx, dfdx). Fixed trip count (TPU-friendly) instead of the
    reference's convergence test (util/math.h NewtonBisection).
    """
    def body(_, carry):
        lo, hi, x = carry
        fx, dfx = f(x)
        lo = jnp.where(fx < 0, x, lo)
        hi = jnp.where(fx < 0, hi, x)
        x_newton = x - safe_div(fx, dfx, fill=jnp.inf)
        bad = (x_newton <= lo) | (x_newton >= hi) | ~jnp.isfinite(x_newton)
        x = jnp.where(bad, 0.5 * (lo + hi), x_newton)
        return lo, hi, x

    x = 0.5 * (x0 + x1)
    _, _, x = jax.lax.fori_loop(0, iters, body, (x0 * jnp.ones_like(x), x1 * jnp.ones_like(x), x))
    return x
