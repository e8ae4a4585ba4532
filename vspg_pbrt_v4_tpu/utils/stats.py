"""Render statistics (analog of ``util/stats.h``'s registrar system).

The reference accumulates thread-local counters merged at exit
(STAT_COUNTER / STAT_TIME_COUNTER / STAT_INT_DISTRIBUTION, util/stats.h:
89-178). Device-side, per-lane counting would bloat the hot loops, so the
TPU design splits stats in two tiers:

- host tier: named counters / timers registered here (scene build, wave
  counts, training iterations) — plain Python, printed by report().
- device tier: per-wave summaries derived from the final path state
  (path-length distribution, termination causes) via one reduction per
  wave — `wave_stats()` — cheap because the state is already resident.

Per-pixel stat images (STAT_PIXEL_COUNTER, --pixelstats) map to extra film
AOV buffers; `PixelStats` scatter-adds per-lane quantities by pixel id.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_counters = defaultdict(int)
_timers = defaultdict(float)
_distributions = defaultdict(list)


def counter_add(name, value=1):
    _counters[name] += value


def distribution_add(name, value):
    _distributions[name].append(float(value))


class Timer:
    """Scoped wall timer (STAT_TIME_COUNTER / util/progressreporter Timer)."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _timers[self.name] += time.perf_counter() - self.t0


def clear():
    _counters.clear()
    _timers.clear()
    _distributions.clear()


def report() -> str:
    """Formatted stats dump (--stats output analog)."""
    lines = ["Statistics:"]
    if _counters:
        lines.append("  Counters")
        for k in sorted(_counters):
            lines.append(f"    {k:<48} {_counters[k]:>14,}")
    if _timers:
        lines.append("  Time")
        for k in sorted(_timers):
            lines.append(f"    {k:<48} {_timers[k]:>12.2f} s")
    if _distributions:
        lines.append("  Distributions")
        for k in sorted(_distributions):
            v = np.asarray(_distributions[k])
            lines.append(
                f"    {k:<40} avg {v.mean():10.3f} "
                f"min {v.min():10.3f} max {v.max():10.3f} (n={len(v)})")
    return "\n".join(lines)


class WaveStats(NamedTuple):
    """Device-side per-wave summary (one fetch per wave)."""

    n_paths: jnp.ndarray
    mean_depth: jnp.ndarray
    max_depth: jnp.ndarray
    frac_alive_at_cap: jnp.ndarray  # paths still alive when the loop capped
    mean_radiance: jnp.ndarray


def wave_stats(path_state) -> WaveStats:
    s = path_state
    depth = s.depth.astype(jnp.float32)
    return WaveStats(
        n_paths=jnp.asarray(s.depth.shape[0]),
        mean_depth=jnp.mean(depth),
        max_depth=jnp.max(s.depth),
        frac_alive_at_cap=jnp.mean(s.alive.astype(jnp.float32)),
        mean_radiance=jnp.mean(s.L),
    )


class PixelStats(NamedTuple):
    """Per-pixel stat images (STAT_PIXEL_COUNTER, --pixelstats EXR heatmaps)."""

    buffers: dict  # name -> (npix,) array

    @staticmethod
    def make(npix, names=("depth", "volumeInteractions")):
        return PixelStats({n: jnp.zeros(npix) for n in names})

    def add(self, name, pixel_id, values):
        b = dict(self.buffers)
        b[name] = b[name].at[pixel_id].add(values)
        return PixelStats(b)

    def to_images(self, resolution):
        nx, ny = resolution
        return {k: np.asarray(v).reshape(ny, nx) for k, v in self.buffers.items()}
