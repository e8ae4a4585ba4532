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
    """Trace lanes for the given pixel ids; returns (radiance (R,3),
    filter weight (R,))."""
    s, fw = volpath.start_camera_paths(camera, film, seed, sample_index,
                                       pixel_id, camera_medium)
    s = volpath.trace_paths(scene, cfg, s)
    return s.L, fw


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
        def wave(i, c):
            acc, wacc = c
            L, fw = _trace_wave(scene, camera, film, cfg, jnp.uint32(seed),
                                i.astype(jnp.uint32), pixel_id_shard)
            return acc + L * fw[:, None], wacc + fw

        acc0 = jnp.zeros((pixel_id_shard.shape[0], 3)) * pixel_id_shard[:, None]
        acc, wacc = jax.lax.fori_loop(0, spp, wave, (acc0, acc0[:, 0]))
        return acc / jnp.maximum(wacc, 1e-12)[:, None]

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
            L, fw = _trace_wave(scene, camera, film, cfg, jnp.uint32(seed),
                                s_idx, pixel_id)
            return acc + L * fw[:, None]

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


# ---------------------------------------------------------------------------
# Sharded VSPG wave (SURVEY §5: ICI reduction of film + guiding statistics)
# ---------------------------------------------------------------------------


def _row_specs(tree, npix, axis):
    """Pytree of PartitionSpecs: leading-axis sharding for per-pixel/lane
    arrays, replicated for scalars."""
    return jax.tree.map(
        lambda x: P(axis) if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] % npix == 0
                              and x.shape[0] > 0) else P(),
        tree)


def render_vspg_sharded(scene, camera, film, spp, cfg=None, gopt=None,
                        vopt=None, seed=0, mesh=None, spp_per_pass=1,
                        train=True):
    """Multi-device VSPG: lanes + film + ISGB rows sharded over the 'rays'
    axis; the per-wave TrainBatch stays row-sharded and the field EM update
    runs on the global batch (GSPMD inserts the cross-device reductions —
    the psum of guiding statistics per wave), so every device holds the
    identical updated field for the next wave. The reference's serial
    PostProcessWave barrier (cpu/integrators.cpp:214) becomes this
    per-wave collective.

    Returns (image, field, isgb)."""
    from ..models.guiding import field as gfield
    from ..models.guiding import isgb as gisgb
    from ..models.integrators import guided_volpath as gvp
    from ..models.integrators import vspg as vs
    from ..models.integrators.volpath import VolPathConfig

    cfg = cfg or VolPathConfig()
    gopt = gopt or gvp.GuidingOptions()
    vopt = vopt or vs.VSPGOptions()
    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    npix = film.npix
    assert npix % n_dev == 0, "pixel count must divide the mesh"

    g = scene.geometry
    pts = []
    for arr in (g.tri_p0, g.tri_p1, g.tri_p2, g.box_min, g.box_max):
        if arr.shape[0]:
            pts.append(np.asarray(arr))
    if g.sph_c.shape[0]:
        c = np.asarray(g.sph_c)
        r = np.asarray(g.sph_r)[:, None]
        pts += [c - r, c + r]
    allp = np.concatenate(pts, 0)
    field = gfield.GuidingField.make(allp.min(0) - 1e-3, allp.max(0) + 1e-3,
                                     res=gopt.field_res, n_lobes=gopt.n_lobes)
    isgb = gisgb.ISGB.make(film.resolution, vopt.vsp_criterion)
    film_state = film.init_state()
    tr_buffer = (jnp.ones((npix, 3))
                 if vopt.sampling_method == "nds+" else None)

    R = npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass  # pixel-major: contiguous pixel slices

    fs_specs = _row_specs(film_state, npix // n_dev, axis)
    isgb_specs = _row_specs(isgb, npix // n_dev, axis)
    tr_specs = P(axis) if tr_buffer is not None else None

    def wave_shard(pixel_id_s, film_s, isgb_s, tr_s, field_rep, wave_idx):
        fs, ib, batch, tr = vs.vspg_wave.__wrapped__(
            scene, camera, film, film_s, field_rep, isgb_s, cfg, gopt, vopt,
            jnp.uint32(seed), wave_idx, -1, bool(train), int(spp_per_pass),
            tr_s, pixel_id_s, pixel_id_s[0])
        if batch is None:
            batch = 0
        return fs, ib, batch, tr

    in_specs = (P(axis), fs_specs, isgb_specs, tr_specs,
                jax.tree.map(lambda _: P(), field), P())
    sharded = jax.jit(jax.shard_map(
        wave_shard, mesh=mesh, in_specs=in_specs,
        out_specs=(fs_specs, isgb_specs,
                   P(axis) if train else P(), P(axis)),
        check_vma=False,
    ))

    n_waves = spp // spp_per_pass
    for wave in range(n_waves):
        do_train = train and int(field.iteration) < gopt.train_waves
        film_state, isgb, batch, tr = sharded(
            pixel_id, film_state, isgb, tr_buffer, field, jnp.int32(wave))
        if tr_buffer is not None:
            tr_pix = tr.reshape(npix, spp_per_pass, 3).mean(1)
            tr_buffer = (tr_pix if wave == 0
                         else (tr_buffer * wave + tr_pix) / (wave + 1))
        if do_train:
            total_w = float(jnp.sum(jnp.where(batch.valid, batch.weight,
                                              0.0)))
            if total_w > gopt.min_train_weight:
                field = gvp.train_step(field, batch)
        if (wave + 1) in vopt.isgb_update_waves:
            isgb = gisgb.isgb_update(isgb)
    return film.image(film_state), field, isgb


def render_vspg_pallas_sharded(scene, camera, film, spp, cfg, gopt, vopt,
                               field, isgb, seed=0, mesh=None,
                               interpret=False):
    """Frozen-field VSPG render phase on a device mesh: each device runs
    the ops/pallas_vspg megakernel on its contiguous block of film rows
    (the SMEM pixel-base input keeps one compiled program for every
    shard). Tables (density, majorants, guiding field) are replicated;
    the per-pixel ISGB rows are sharded with the film. Zero collectives —
    the multi-chip analog of the reference's tile pool, with the fused
    kernel as the tile renderer.

    Returns the (ny, nx, 3) mean image."""
    from ..models.integrators import vspg as vs
    from ..ops import pallas_volpath as pv
    from ..ops import pallas_vspg as pk

    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    c = pv.extract_constants(scene, camera, film, cfg)
    if c is None or c["kind"] != "grid" or c.get("n_tri", 0):
        raise ValueError("scene not supported by the VSPG megakernel")
    npix = c["nx"] * c["ny"]
    npix_l = npix // n_dev
    if npix % n_dev or c["ny"] % n_dev or npix_l % 128:
        raise ValueError("film rows must shard into 128-pixel multiples")
    c_local = dict(c)
    c_local["ny"] = c["ny"] // n_dev  # shard height; nx decode unchanged
    gc = pk.guiding_constants(field, gopt, vopt)
    dens, maj, ftab, _tris = pk.pack_kernel_inputs(scene, field,
                                            vopt.vsp_criterion,
                                            field_mxu=gc["field_mxu"])
    # The n_tri guard above rejects triangle scenes, so the kernel is
    # built with no tris input and fn() below omits the tris arg. If
    # that guard is ever relaxed (teaser-class sharding), _tris must be
    # threaded through shard_fn or the kernel fails inside pallas_call.
    assert _tris is None, "sharded VSPG path assumes a no-triangle scene"
    itab = pk.pack_isgb_table(isgb, npix).reshape(3, npix // 128, 128)
    sub = 8
    while npix_l % (sub * 128) != 0:
        sub //= 2
    chunk = int(spp) if interpret else min(int(spp), pk.VSPG_SPP_CHUNK)

    def shard_fn(itab_s, dens_r, maj_r, ftab_r):
        base = (jax.lax.axis_index(axis) * npix_l).astype(jnp.uint32)
        imgs = []
        done = 0
        while done < int(spp):
            n = min(chunk, int(spp) - done)
            fn = pk._get_callable(c_local, gc, n, sub, bool(interpret))
            imgs.append(fn(jnp.uint32(seed) + jnp.uint32(done * 65537),
                           dens_r, maj_r, ftab_r, itab_s, base=base) * n)
            done += n
        return sum(imgs) / int(spp)  # (ny_local, nx, 3)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(), P()),
        out_specs=P(axis), check_vma=False)
    return fn(itab, dens, maj, ftab)
