"""Multi-chip rendering over a jax.sharding.Mesh.

The reference's only parallelism is a single-node thread pool over image
tiles (util/parallel.cpp:291-307, SURVEY.md §2.5). The TPU-native scale-out
replaces tiles with device shards:

- axis 'rays': the wavefront (and the film rows it writes) is sharded over
  devices — embarrassingly parallel, zero collectives per wave; this is the
  production layout (tiles -> shards).
- axis 'spp' mode: every device renders the full frame at different sample
  indices and film states are psum-reduced over ICI — the analog of the
  per-wave film merge, and the layout guiding-statistics reduction will use.

Both run under ``shard_map`` so per-device code is identical to single-chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.integrators import volpath


def default_mesh(devices=None, axis_name="rays"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _trace_wave(scene, camera, film, cfg, seed, sample_index, pixel_id,
                camera_medium=-1):
    """Trace lanes for the given pixel ids; returns their radiance (R,3)."""
    s, _ = volpath.start_camera_paths(camera, film, seed, sample_index,
                                      pixel_id, camera_medium)
    s = volpath.trace_paths(scene, cfg, s)
    return s.L


def render_sharded(scene, camera, film, spp, cfg, seed, mesh=None):
    """Render with the wavefront sharded over the 'rays' mesh axis.

    Each device traces a contiguous slice of pixels for all spp waves and
    owns the matching film slice; the final gather is the only cross-device
    movement (XLA inserts it when the image is materialized).
    """
    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    npix = film.npix
    assert npix % n_dev == 0, "pixel count must divide the mesh"

    def shard_fn(pixel_id_shard):
        def wave(i, acc):
            L = _trace_wave(scene, camera, film, cfg, jnp.uint32(seed),
                            i.astype(jnp.uint32), pixel_id_shard)
            return acc + L

        acc0 = jnp.zeros((pixel_id_shard.shape[0], 3)) * pixel_id_shard[:, None]
        acc = jax.lax.fori_loop(0, spp, wave, acc0)
        return acc / spp

    pixel_id = jnp.arange(npix, dtype=jnp.int32)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P("rays"), out_specs=P("rays"),
    )
    rgb = jax.jit(fn)(pixel_id)
    nx, ny = film.resolution
    return (rgb * film.imaging_ratio).reshape(ny, nx, 3)


def render_spp_psum(scene, camera, film, spp_per_device, cfg, seed, mesh=None):
    """Render with samples sharded over devices, film psum-reduced over ICI.

    The reduction is the collective template for per-wave guiding-training
    statistics (SURVEY.md §5: psum of sample histograms each wave).
    """
    if mesh is None:
        mesh = default_mesh(axis_name="spp")
    axis = mesh.axis_names[0]

    def shard_fn(marker):
        dev = jax.lax.axis_index(axis)
        # fold a varying zero into pixel_id so every derived carry is varying
        pixel_id = jnp.arange(film.npix, dtype=jnp.int32) + 0 * dev.astype(jnp.int32)

        def wave(i, acc):
            s_idx = (dev * spp_per_device + i).astype(jnp.uint32)
            L = _trace_wave(scene, camera, film, cfg, jnp.uint32(seed), s_idx, pixel_id)
            return acc + L

        # seed the carry with a varying term so vma types match in the loop
        acc0 = jnp.zeros((film.npix, 3)) + 0.0 * marker[0]
        acc = jax.lax.fori_loop(0, spp_per_device, wave, acc0)
        acc = jax.lax.psum(acc, axis)
        n_total = spp_per_device * jax.lax.axis_size(axis)
        return acc[None] / n_total

    dummy = jnp.zeros((mesh.devices.size,), jnp.float32)
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    rgb = jax.jit(fn)(dummy)[0]  # all shards identical post-psum
    nx, ny = film.resolution
    return (rgb * film.imaging_ratio).reshape(ny, nx, 3)
