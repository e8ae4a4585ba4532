"""Pallas TPU megakernel: persistent volumetric path tracing for the
homogeneous-medium scene class.

The general wavefront driver (volpath.render_persistent) steps ~60 f32 of
path state per lane through an XLA ``while_loop`` — every iteration the
carried state round-trips HBM, which is the measured bottleneck (PERF.md).
For the homogeneous scene class — axis-aligned-box medium interfaces,
homogeneous media, ≤1 point light, constant env light, pinhole perspective
camera, box filter — the entire path life-cycle fits in ONE Pallas kernel:

- one lane per pixel, persistent: a lane finishes a path, commits its
  radiance to a VMEM accumulator and immediately starts its next sample;
- all state lives in vector registers / VMEM for the whole render; the only
  HBM traffic is the final per-pixel accumulator (3 floats/pixel);
- the physics is the exact estimator of the jnp path:
  ``volpath._homogeneous_medium_interaction`` (closed-form single-step
  delta tracking, reference media.h:221 HomogeneousMedium +
  cpu/integrators.cpp:1022-1124 collision algebra),
  ``volpath.sample_ld_volume`` (NEE with analytic homogeneous
  transmittance, cpu/integrators.cpp:1319-1434) and the escaped-ray env
  MIS (cpu/integrators.cpp:1127-1143), all with the RGB hero-channel
  rescaled-pdf bookkeeping (spectrum.h:380-391).

Scene constants (σ, lights, box, camera matrices) are baked into the kernel
at trace time — the scene class is small enough that re-jitting per scene is
the right trade (same philosophy as the reference's template-specialized
wavefront kernels, wavefront/integrator.cpp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
INV_4PI = 1.0 / (4.0 * np.pi)
INV_PI = 1.0 / np.pi
_BIG = 3e37
# density grids above this voxel count use uint8-quad packing (half the
# gather sweep of bf16 pairs; quantization <= local-max/255, furnace-
# tested); tests may lower it to force the i8 path. 16^3 and below keep
# bf16 — their sweep is already trivial
I8_THRESHOLD = 4096

# MXU one-hot gather window: grids above MXU_MIN_VOX voxels gather
# densities via one-hot MXU matmuls over a transposed bf16 table
# (73-100x over the chunk sweep — PERF.md addendum 5). Working set per
# event ~= transposed table (2 B/vox) + one-hot operand (2 B/vox) +
# compare iota (4 B/vox) = 8 B/vox, which must fit VMEM (~16 MB) next to
# ~200 KB of path state — hence an explicit budget, AND a hardware-
# validated ceiling: only raise MXU_VALIDATED_VOX after an on-chip run at
# the new size (a boundary-size grid that compiles in interpret mode can
# still fail Mosaic allocation on chip).
MXU_MIN_VOX = 4096
_MXU_VMEM_BUDGET = 10 * 1024 * 1024
MXU_VALIDATED_VOX = 262144  # 64^3, measured on chip (PERF.md addendum 6)
# int8 working set: table (1 B/vox) + one-hot (1 B/vox) + iota (4 B/vox)
MXU_MAX_VOX = min(_MXU_VMEM_BUDGET // 6, MXU_VALIDATED_VOX)

# perf diagnostic (OFF by default): the grid kernel writes its while-loop
# iteration count into the blue channel instead of radiance, so the true
# events-per-block number is measurable on chip instead of modeled
PROBE_ITERS = False

# perf ablation (OFF in production; timing probes only — the image loses
# all direct lighting): never arm NEE shadow walks, so a run's time
# delta vs baseline measures the shadow-walk share of kernel cost.
# NOTE: _get_callable's cache key ignores this flag — probe scripts must
# clear _KERNEL_CACHE after flipping it.
ABLATE_NO_NEE = False
# timing probe: replace the per-collision density gather with a fake
# cheap value (image wrong) to measure the gather's cost share
ABLATE_CHEAP_DENS = False


# multi-cell flight: majorant cells the cheap unrolled walk crosses per
# body iteration before folding partial transmittance and resuming next
# iteration (exponential memorylessness makes the resume exact).
# Swept on chip (bench cloud, 256^2@32): K=2 10.9, K=3 11.6, K=4 11.6,
# K=6 10.5, K=8 9.4 Mpaths/s — each extra step is one more one-hot MXU
# majorant gather per body iteration, each fewer step re-runs the full
# event body for flights that cross more cells.
WALK_STEPS = 4

# NOTE (measured, round 5): swapping the majorant MXU gather for a
# pair-packed chunk sweep on small tables was 12% SLOWER on chip —
# per-lane take_along_axis gathers cost more than the one-hot matmul,
# which pipelines with VPU work. The MXU lookup stays.


def dens_pack_for(nvox):
    """Density-table format ladder shared by extract_constants and
    pallas_vspg.pack_kernel_inputs (reads the module globals at call time
    so tests can force a path by lowering a threshold)."""
    if nvox > MXU_MAX_VOX:
        return "i8"
    if nvox > MXU_MIN_VOX:
        return "mxu"
    if nvox > I8_THRESHOLD:
        return "i8"
    return "bf16"

# tiled lane mapping (grid kernels): each 1024-lane block renders a
# TILE_W x (1024/TILE_W) pixel tile instead of a raster strip, so the
# dynamic gather-sweep windows see a compact camera footprint. Big grids
# (>32768 voxels) prefer NARROWER tiles: the sweep window scales with the
# tile's x-footprint in voxels (chunk index ~ ix * gy*gz/512), so an
# 8-wide tile cuts the dominant window term ~4x vs 32-wide.
TILE_W = 32
TILE_W_BIG = 8

# mixed work distribution (MXU-gather grid kernels): each lane renders
# MIX_PPL slots — (pixel region q, spp/MIX_PPL sample chunk) — with the
# ppl pixels spread across vertically-separated, alternately x-mirrored
# image strips. Utilization fix: with lane == pixel, the heaviest pixel's
# full spp serializes its whole block (measured: every 64^3 bench block
# ran to the max_iters cap while edge lanes idled); mixing bounds a
# lane's total work by spp x mean-of-ppl-pixels instead of spp x heavy.
MIX_PPL = 4

# teaser-class scene extension: up to this many flat triangles (SMEM
# Moller-Trumbore sweep, pallas_surface.py idiom) fused into the grid
# kernel; glass/metal/diffuse surfaces inside the cloud
MAX_TRIS_GRID = 64

# mesh-class extension: above MAX_TRIS_GRID the kernel switches to a
# VMEM-resident triangle table swept in Morton-ordered chunks of
# MESH_CHUNK, each chunk guarded by a per-chunk AABB slab test +
# lax.cond skip (packet-traversal, TPU style: the wide-BVH answer to
# cpu/aggregates.h:28 / gpu/optix/aggregate.h:30 without per-lane
# stacks). Cap set by VMEM (tris (T,16) f32) and sweep cost.
MAX_TRIS_MESH = 16384
MESH_CHUNK = 64


def _pcg4d(a, b, c, d):
    """pcg4d (utils/rng.py) with numpy-scalar constants — Pallas kernels
    may not capture jax-array constants, so the multipliers must be np."""
    mult = np.uint32(1664525)
    inc = np.uint32(1013904223)
    a = a * mult + inc
    b = b * mult + inc
    c = c * mult + inc
    d = d * mult + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> np.uint32(16))
    b = b ^ (b >> np.uint32(16))
    c = c ^ (c >> np.uint32(16))
    d = d ^ (d >> np.uint32(16))
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(u):
    # Mosaic has no u32->f32 cast; >>8 clears the top bits so the i32
    # round-trip is exact (value < 2^24)
    return (u >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * np.float32(1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# Support predicate + constant extraction
# ---------------------------------------------------------------------------


def extract_constants(scene, camera, film, cfg):
    """Return the baked-constant dict if the scene/camera/film qualify for
    the megakernel, else None."""
    try:
        from ..models.cameras import PerspectiveCamera
        from ..models.filters import Filter  # noqa: F401

        if not isinstance(camera, PerspectiveCamera):
            return None
        if getattr(camera, "lens_radius", 0.0) > 0:
            return None
        if getattr(cfg, "spectral", False):
            return None
        g = scene.geometry
        n_tri = int(g.tri_p0.shape[0])
        n_other = (int(g.sph_c.shape[0]) + int(g.dsk_c.shape[0])
                   + int(g.cyl_c.shape[0]) + int(g.blp_p00.shape[0])
                   + (int(g.crv_p0.shape[0]) if g.crv_p0 is not None else 0))
        n_box = int(g.box_min.shape[0])
        if getattr(g, "inst", None) is not None:
            return None  # instanced meshes take the two-level XLA path
        if n_other or n_box != 1:
            return None
        if n_tri > MAX_TRIS_MESH:
            return None
        if n_tri:
            # teaser-class extension: flat-shaded triangles with
            # diffuse / smooth-dielectric / smooth-conductor materials
            # inside the grid medium (wavefront/integrator.cpp:374-432
            # generality, restricted to the scene class the fused kernel
            # serves); media transitions via per-tri med_in/med_out
            if (np.asarray(g.tri_light) >= 0).any():
                return None
            n0 = np.asarray(g.tri_n0)
            if (not np.allclose(n0, np.asarray(g.tri_n1))
                    or not np.allclose(n0, np.asarray(g.tri_n2))):
                return None
            t_mi = np.asarray(g.tri_med_in)
            t_mo = np.asarray(g.tri_med_out)
            if not (np.isin(t_mi, (-1, 0)).all()
                    and np.isin(t_mo, (-1, 0)).all()):
                return None
            mat_ids = np.asarray(g.tri_mat)
            if (mat_ids < 0).any():
                return None
            mats = scene.materials
            mt = np.asarray(mats.mat_type)
            rough = np.asarray(mats.roughness)
            at = np.asarray(mats.albedo_tex)
            for mid in np.unique(mat_ids):
                kind = int(mt[mid])
                # DIFFUSE / CONDUCTOR (smooth or Trowbridge-Reitz rough)
                # / smooth DIELECTRIC / COOK_TORRANCE (fork glossy)
                if kind not in (0, 1, 2, 11):
                    return None
                if kind == 2 and float(rough[mid]) >= 1e-3:
                    return None  # rough dielectric: XLA path
                if int(at[mid]) >= 0:
                    # round-4: CHECKER albedo textures ride the fused
                    # kernel (pure VPU parity select at the hit uv,
                    # textures.h:86 checker semantics); other texture
                    # kinds and mesh-class scenes stay on the XLA path
                    tex = scene.textures
                    tk = int(np.asarray(tex.kind)[int(at[mid])])
                    if tk != 1 or n_tri > MAX_TRIS_GRID:
                        return None
        if int(np.asarray(g.box_mat)[0]) >= 0:
            return None
        med_in = int(np.asarray(g.box_med_in)[0])
        med_out = int(np.asarray(g.box_med_out)[0])
        if med_in != 0 or med_out != -1:
            return None
        m = scene.media
        if len(m.procedurals):
            return None
        medium_kind = None
        if len(m.grids) == 0:
            if int(m.h_sigma_a.shape[0]) != 1:
                return None
            if float(np.asarray(m.h_Le).max()) > 0:
                return None
            medium_kind = "homog"
        elif len(m.grids) == 1 and m.n_homog == 0:
            from ..models.media import GridMedium, RGBGridMedium

            gm = m.grids[0]
            if isinstance(gm, RGBGridMedium) or not isinstance(gm,
                                                               GridMedium):
                return None
            if float(np.asarray(gm.Le).max()) > 0:
                return None
            if not (np.allclose(np.asarray(gm.b_min),
                                np.asarray(g.box_min)[0])
                    and np.allclose(np.asarray(gm.b_max),
                                    np.asarray(g.box_max)[0])):
                return None
            nvox = int(np.prod(gm.res))
            if nvox > 64 ** 3 or nvox % 128 != 0:
                return None
            if int(np.prod(gm.maj_res)) % 128 != 0:
                return None
            # the kernel's uniform majorant cells must match the jnp DDA's
            # linspace partition: grid res divisible by majorant res
            if any(int(gm.res[k]) % int(gm.maj_res[k])
                   for k in range(3)):
                return None
            medium_kind = "grid"
        else:
            return None
        li = scene.lights
        if (li.n_spot or li.n_gonio or li.n_proj or li.n_distant
                or li.n_area):
            return None
        if li.n_point > 1:
            return None
        if li.portal is not None or getattr(li, "has_env_img", False):
            return None
        if getattr(li, "bvh", None) is not None:
            return None
        # film: box filter (radius 0.5 jitter), identity sensor
        if film.filter.kind != "box":
            return None
        if abs(float(film.filter.radius) - 0.5) > 1e-6:
            return None
        if not np.allclose(np.asarray(film.sensor_matrix), np.eye(3)):
            return None
        if not np.isinf(film.max_component):
            return None

        has_env = bool(li.has_env)
        has_point = int(li.n_point) == 1
        if not (has_env or has_point):
            return None
        if n_tri and medium_kind != "grid":
            return None  # fused surfaces only in the grid kernel
        if medium_kind == "homog":
            sa_base = tuple(float(x) for x in np.asarray(m.h_sigma_a)[0])
            ss_base = tuple(float(x) for x in np.asarray(m.h_sigma_s)[0])
            g_hg = float(np.asarray(m.h_g)[0])
            grid_res = maj_res = None
            dens_pack = "bf16"
        else:
            gm = m.grids[0]
            sa_base = tuple(float(x) for x in np.asarray(gm.sigma_a))
            ss_base = tuple(float(x) for x in np.asarray(gm.sigma_s))
            g_hg = float(np.asarray(gm.g))
            grid_res = tuple(int(v) for v in gm.res)
            maj_res = tuple(int(v) for v in gm.maj_res)
            # big grids: MXU one-hot gather over a transposed bf16 table
            # (73-100x over the chunk sweep, PERF.md addendum 5); beyond
            # the VMEM bound fall back to supervoxel-scaled uint8 quads
            dens_pack = dens_pack_for(nvox)
        c = dict(
            kind=medium_kind,
            grid_res=grid_res,
            maj_res=maj_res,
            dens_pack=dens_pack,
            sigma_a=sa_base,
            sigma_s=ss_base,
            g_hg=g_hg,
            bmin=tuple(float(x) for x in np.asarray(g.box_min)[0]),
            bmax=tuple(float(x) for x in np.asarray(g.box_max)[0]),
            has_point=has_point,
            has_env=has_env,
            point_p=(tuple(float(x) for x in np.asarray(li.point_p)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            point_I=(tuple(float(x) for x in np.asarray(li.point_I)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            env_L=(tuple(float(x) for x in np.asarray(li.env_L))
                   if has_env else (0.0, 0.0, 0.0)),
            # raster -> camera: z=0 plane, so fold column 2 out
            rc=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.raster_to_camera.m)),
            cw=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.camera_to_world.m)),
            nx=int(film.resolution[0]),
            ny=int(film.resolution[1]),
            imaging_ratio=float(film.imaging_ratio),
            max_depth=int(cfg.max_depth),
            max_events=int(cfg.max_events),
            n_tri=n_tri,
        )
        if n_tri:
            mats = scene.materials
            c["mat_kind"] = tuple(int(v) for v in np.asarray(mats.mat_type))
            c["mat_albedo"] = tuple(
                tuple(float(x) for x in row)
                for row in np.asarray(mats.albedo, np.float32))
            c["mat_eta"] = tuple(float(v)
                                 for v in np.asarray(mats.eta, np.float32))
            c["mat_rough"] = tuple(
                float(v) for v in np.asarray(mats.roughness, np.float32))
            tex = scene.textures
            at_np = np.asarray(mats.albedo_tex)
            n_m = len(at_np)
            if tex is None:
                c["mat_tex_kind"] = (-1,) * n_m
                c["mat_tex_c0"] = ((0.0, 0.0, 0.0),) * n_m
                c["mat_tex_c1"] = ((0.0, 0.0, 0.0),) * n_m
                c["mat_tex_uvs"] = ((1.0, 1.0),) * n_m
            else:
                tkind = np.asarray(tex.kind)
                c["mat_tex_kind"] = tuple(
                    int(tkind[t]) if t >= 0 else -1 for t in at_np)
                c["mat_tex_c0"] = tuple(
                    tuple(float(x) for x in np.asarray(tex.c0)[max(t, 0)])
                    for t in at_np)
                c["mat_tex_c1"] = tuple(
                    tuple(float(x) for x in np.asarray(tex.c1)[max(t, 0)])
                    for t in at_np)
                c["mat_tex_uvs"] = tuple(
                    tuple(float(x)
                          for x in np.asarray(tex.uvscale)[max(t, 0)])
                    for t in at_np)
        return c
    except Exception:
        return None


# ---------------------------------------------------------------------------
# In-kernel math helpers (component-wise on (SUB, 128) f32 arrays)
# ---------------------------------------------------------------------------


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _coord_system(vx, vy, vz):
    """Duff et al. branchless ONB (utils/vecmath.coordinate_system)."""
    sign = jnp.where(vz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + vz)
    b = vx * vy * a
    t1 = (1.0 + sign * vx * vx * a, sign * b, -sign * vx)
    t2 = (b, sign + vy * vy * a, -vy)
    return t1, t2


def _hg_value(cos_theta, g):
    g = np.clip(g, -0.99, 0.99)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    denom = jnp.maximum(denom, 1e-12)
    return INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def _sample_hg(wox, woy, woz, g, u0, u1):
    """(utils/sampling.sample_henyey_greenstein, g static): returns
    (wix, wiy, wiz, pdf); cosθ measured in the +wo frame."""
    g = float(np.clip(g, -0.99, 0.99))
    if abs(g) < 1e-3:
        cos_theta = 1.0 - 2.0 * u0
    else:
        sq = (1.0 - g * g) / (1.0 + g - 2.0 * g * u0)
        cos_theta = -(1.0 + g * g - sq * sq) / (2.0 * g)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = (2.0 * np.pi) * u1
    lx = sin_theta * jnp.cos(phi)
    ly = sin_theta * jnp.sin(phi)
    lz = cos_theta
    t1, t2 = _coord_system(wox, woy, woz)
    wix = lx * t1[0] + ly * t2[0] + lz * wox
    wiy = lx * t1[1] + ly * t2[1] + lz * woy
    wiz = lx * t1[2] + ly * t2[2] + lz * woz
    return wix, wiy, wiz, _hg_value(cos_theta, g)


def _box_hit(ox, oy, oz, dx, dy, dz, bmin, bmax):
    """Slab test. Returns (hit, t_hit, entering): entering = the hit is the
    near face (origin outside); ~entering = exit face (origin inside)."""
    eps = 1e-4
    hit_t = None
    t_n = jnp.full_like(ox, -_BIG)
    t_f = jnp.full_like(ox, _BIG)
    for (o_c, d_c, lo, hi) in ((ox, dx, bmin[0], bmax[0]),
                               (oy, dy, bmin[1], bmax[1]),
                               (oz, dz, bmin[2], bmax[2])):
        inv = 1.0 / jnp.where(jnp.abs(d_c) < 1e-12,
                              jnp.where(d_c >= 0, 1e-12, -1e-12), d_c)
        t0 = (lo - o_c) * inv
        t1 = (hi - o_c) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        t_n = jnp.maximum(t_n, lo_t)
        t_f = jnp.minimum(t_f, hi_t)
    ok = (t_n <= t_f) & (t_f > eps)
    entering = t_n > eps
    hit_t = jnp.where(entering, t_n, t_f)
    return ok, jnp.where(ok, hit_t, _BIG), entering


def _uniform4(seed, pix, samp, dim):
    a, b, c, d = _pcg4d(pix, samp, dim, seed)
    return (_to_unit_float(a), _to_unit_float(b), _to_unit_float(c),
            _to_unit_float(d))


# ---------------------------------------------------------------------------
# bf16 pair-packed VMEM tables
#
# Per-lane scalar lookups sweep table chunks (Mosaic gathers only handle
# idx<128 on (S,128) operands), so lookup cost scales with table rows.
# Packing two bf16 values per f32 word halves the sweep. The medium the
# kernel renders is then the bf16-rounded density field — used
# consistently in collision probabilities AND weights, so the estimator
# stays unbiased for that (visually identical, <0.4%) field.
# ---------------------------------------------------------------------------


def encode_empty_skip(maj):
    """Empty-space skipping field folded into the majorant grid at zero
    lookup cost: cells with majorant 0 store -D, where D >= 1 is the
    Chebyshev distance (in cells) to the nearest cell with majorant > 0
    — every cell c' with cheb(c, c') < D is empty, so a walk standing
    in c may step straight to the exit plane of the 2D-wide empty cube
    instead of crawling cell by cell (the DDA macro-cell trick; the
    reference's DDAMajorantIterator has no analog because its per-cell
    step is a few scalar ops, while ours is a full block iteration).
    Decode in-kernel: majorant = max(v, 0), skip_cells = max(-v, 1).
    D values are small ints (<= grid res), exact in bf16."""
    m = np.asarray(maj, np.float32)
    occ = m > 0
    if occ.all():
        return m
    big = np.float32(120.0)
    D = np.where(occ, 0.0, big).astype(np.float32)
    # Chebyshev distance transform: iterate 3^3 min-filter (axis-wise
    # separable) until fixed point — grids are tiny (<= 64^3 cells)
    for _ in range(max(m.shape)):
        N = D.copy()
        for ax in range(3):
            a = np.roll(N, 1, axis=ax)
            b = np.roll(N, -1, axis=ax)
            # roll wraps; neutralize the wrapped slices
            sl = [slice(None)] * 3
            sl[ax] = 0
            a[tuple(sl)] = big
            sl[ax] = -1
            b[tuple(sl)] = big
            N = np.minimum(N, np.minimum(a, b))
        N = N + 1.0
        N = np.where(occ, 0.0, np.minimum(D, N))
        if (N == D).all():
            break
        D = N
    D = np.minimum(D, big)
    return np.where(occ, m, -D).astype(np.float32)


def pack_bf16_pairs(arr, mode="down"):
    """Flatten arr and pack value pairs into f32 words (bf16 halves):
    word[i] = bf16(a[2i]) | bf16(a[2i+1])<<16. Returns an
    (n_word_chunks, 128) f32 (bitcast view) array padded with zeros.

    mode: "nearest" rounds to nearest (densities — centered error, see
    pack_i8_transposed note), "down" truncates, "up" rounds away from
    zero (majorants). nearest-density never exceeds the up-rounded
    majorant, keeping the null-collision coefficient non-negative."""
    flat = np.asarray(arr, np.float32).reshape(-1)
    if flat.size % 2:
        flat = np.pad(flat, (0, 1))
    u = flat.view(np.uint32).astype(np.uint64)
    if mode == "up":
        r = np.minimum(u + 0xFFFF, 0xFFFF_FFFF) >> 16
    elif mode == "nearest":
        r = np.minimum(u + 0x8000, 0xFFFF_FFFF) >> 16
    else:
        r = u >> 16
    r = r.astype(np.uint32)
    words = (r[0::2] & 0xFFFF) | (r[1::2] << 16)
    pad = (-words.size) % 128
    words = np.pad(words, (0, pad))
    return words.view(np.float32).reshape(-1, 128)


def pack_bf16_transposed(arr, mode="down"):
    """Flatten arr into a TRANSPOSED (128, C) bfloat16 table for the MXU
    one-hot gather (benchmarks/gather_microbench.py; PERF.md round-2
    addendum 5 — measured 73-100x over the chunk sweep at 32^3/64^3):
    element [l, c] = bf16(arr.flat[c*128 + l]). mode "nearest" rounds to
    nearest (densities — centered error), "down" truncates, "up" rounds
    away from zero (majorants) — nearest-density stays <= the up-rounded
    majorant, as the null-collision algebra requires. C is padded to a
    multiple of 8 so the in-kernel one-hot (C, 128) operand is
    sublane-tile aligned."""
    flat = np.asarray(arr, np.float32).reshape(-1)
    u = flat.view(np.uint32).astype(np.uint64)
    if mode == "up":
        r = (np.minimum(u + 0xFFFF, 0xFFFF_FFFF) >> 16).astype(np.uint16)
    elif mode == "nearest":
        r = (np.minimum(u + 0x8000, 0xFFFF_FFFF) >> 16).astype(np.uint16)
    else:
        r = (u >> 16).astype(np.uint16)
    C = -(-r.size // 128)
    C = -(-C // 8) * 8
    r = np.pad(r, (0, C * 128 - r.size))
    return np.ascontiguousarray(r.reshape(C, 128).T).view(jnp.bfloat16)


def pack_i8_transposed(dens, maj, grid_res, maj_res):
    """Transposed (128, C) int8 density table for the MXU one-hot gather:
    element [l, c] = q(dens.flat[c*128 + l]) with q = floor(d / m_up(sv)
    * 127) in 0..127, where m_up is the voxel's supervoxel majorant
    rounded UP to bf16 (exactly the value the kernel's bf16 "up"-packed
    majorant table decodes to, so q*m_up/127 <= d always — density rounds
    down, majorant up; quantization error <= m_up/127, ~0.8% of the local
    max). int8 x int8 one-hot matmuls run 15x faster than bf16 on chip
    (PERF.md round 3): the one-hot build and MXU ingest both halve, and
    the i1->i8 cast is native where i1->bf16 relayouts."""
    d = np.asarray(dens, np.float32)
    gx, gy, gz = grid_res
    mx, my, mz = maj_res
    m = np.asarray(maj, np.float32).view(np.uint32).astype(np.uint64)
    m_up = ((np.minimum(m + 0xFFFF, 0xFFFF_FFFF) >> 16) << 16) \
        .astype(np.uint32).view(np.float32).reshape(mx, my, mz)
    ix = (np.arange(gx) * mx) // gx
    iy = (np.arange(gy) * my) // gy
    iz = (np.arange(gz) * mz) // gz
    scale = m_up[np.ix_(ix, iy, iz)]
    q = np.zeros_like(d, np.int32)
    nz = scale > 0
    # round-to-NEAREST (round-4 bias hunt): truncation rendered a
    # systematically THINNER quantized medium than the true field
    # (mean quantization error -0.5 LSB), measuring +2-3% radiance on
    # point-lit scenes vs the exact-field XLA reference. Nearest centers
    # the error (mean ~0); q <= 127 still guarantees d_q <= m_up, so
    # null-collision coefficients stay >= 0.
    q[nz] = np.clip(np.floor(d[nz] / scale[nz] * 127.0 + 0.5), 0,
                    127).astype(np.int32)
    flat = q.reshape(-1).astype(np.int8)
    C = -(-flat.size // 128)
    C = -(-C // 8) * 8
    flat = np.pad(flat, (0, C * 128 - flat.size))
    return np.ascontiguousarray(flat.reshape(C, 128).T)


def pack_tri_table(scene):
    """(T, 16) f32 SMEM triangle table for the fused grid kernel:
    p0(3) e1(3) e2(3) ng(3) mat med_in med_out pad (pallas_surface.py
    row idiom + per-tri medium interface ids)."""
    g = scene.geometry
    p0 = np.asarray(g.tri_p0, np.float32)
    n_tri = p0.shape[0]
    e1 = np.asarray(g.tri_p1, np.float32) - p0
    e2 = np.asarray(g.tri_p2, np.float32) - p0
    ng = np.asarray(g.tri_n0, np.float32)
    tab = np.zeros((n_tri, 24), np.float32)
    tab[:, 0:3] = p0
    tab[:, 3:6] = e1
    tab[:, 6:9] = e2
    tab[:, 9:12] = ng
    tab[:, 12] = np.asarray(g.tri_mat, np.float32)
    tab[:, 13] = np.asarray(g.tri_med_in, np.float32)
    tab[:, 14] = np.asarray(g.tri_med_out, np.float32)
    # vertex uvs (cols 16-21): hit uv = uv0 + b1 (uv1-uv0) + b2 (uv2-uv0)
    tab[:, 16:18] = np.asarray(g.tri_uv0, np.float32)
    tab[:, 18:20] = np.asarray(g.tri_uv1, np.float32)
    tab[:, 20:22] = np.asarray(g.tri_uv2, np.float32)
    return tab


def pack_tri_chunks(scene, chunk=MESH_CHUNK):
    """Morton-ordered MESH_CHUNK-tri chunks + per-chunk AABBs for the
    chunk-skip closest-hit sweep (mesh-class scenes). Returns
    (tris (T_pad, 16) f32 [VMEM layout], bounds (n_chunks, 8) f32
    [SMEM: bmin, bmax, pad2]). Padding rows are degenerate (det == 0).
    Only columns 0-14 are read by the mesh sweep (uv columns are gated
    to the <=MAX_TRIS_GRID SMEM class), so the 24-column full table is
    sliced to 16 to save VMEM (~0.5 MB at the 16k-tri cap)."""
    tab = pack_tri_table(scene)[:, :16]  # (T, 16)
    p0 = tab[:, 0:3]
    cen = p0 + (tab[:, 3:6] + tab[:, 6:9]) / 3.0
    lo = cen.min(0)
    ex = np.maximum(cen.max(0) - lo, 1e-9)
    q = np.clip(((cen - lo) / ex * 1023.0).astype(np.int64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    tab = tab[np.argsort(code, kind="stable")]
    T = tab.shape[0]
    nc = -(-T // chunk)
    pad = nc * chunk - T
    if pad:
        fill = np.zeros((pad, tab.shape[1]), np.float32)
        fill[:, 12:15] = -1.0  # mat/med ids
        tab = np.concatenate([tab, fill], 0)
    v0 = tab[:, 0:3]
    v1 = v0 + tab[:, 3:6]
    v2 = v0 + tab[:, 6:9]
    vs = np.stack([v0, v1, v2], 1).reshape(nc, chunk * 3, 3)
    real = np.arange(nc * chunk).reshape(nc, chunk).repeat(3, 1) < T
    big = np.float32(3e38)
    bmin = np.where(real[..., None], vs, big).min(1)
    bmax = np.where(real[..., None], vs, -big).max(1)
    bounds = np.zeros((nc, 8), np.float32)
    bounds[:, 0:3] = bmin - 1e-5
    bounds[:, 3:6] = bmax + 1e-5
    return np.ascontiguousarray(tab), bounds


def make_mesh_closest_hit(tris_ref, tb_ref, n_chunks, sub, zf):
    """Chunk-skip closest-hit for VMEM triangle tables: per chunk, a
    per-lane AABB slab test decides (lax.cond) whether to run the
    vectorized (chunk, 128) Moller-Trumbore block per sublane. Rays
    coherent within a block (camera tiles, point-light shadow packets)
    touch a handful of Morton-local chunks.

    Returns closest_hit(o, d, need, t_cap) -> (t, ngx, ngy, ngz, mat,
    med_in, med_out); `need` masks lanes actually querying (idle lanes
    must not force chunk sweeps), `t_cap` bounds the search (occlusion
    lanes pass their light distance)."""

    def closest_hit(qox, qoy, qoz, qdx, qdy, qdz, need, t_cap):
        t_b = jnp.where(need, t_cap, 0.0)
        nxb = zf
        nyb = zf
        nzb = zf
        mb = jnp.full_like(t_b, -1.0)
        mib = jnp.full_like(t_b, -1.0)
        mob = jnp.full_like(t_b, -1.0)
        ix = 1.0 / jnp.where(jnp.abs(qdx) < 1e-12,
                             jnp.where(qdx >= 0, 1e-12, -1e-12), qdx)
        iy = 1.0 / jnp.where(jnp.abs(qdy) < 1e-12,
                             jnp.where(qdy >= 0, 1e-12, -1e-12), qdy)
        iz = 1.0 / jnp.where(jnp.abs(qdz) < 1e-12,
                             jnp.where(qdz >= 0, 1e-12, -1e-12), qdz)

        def chunkloop(ci, carry):
            (t_b, nxb, nyb, nzb, mb, mib, mob) = carry
            tx0 = (tb_ref[ci, 0] - qox) * ix
            tx1 = (tb_ref[ci, 3] - qox) * ix
            ty0 = (tb_ref[ci, 1] - qoy) * iy
            ty1 = (tb_ref[ci, 4] - qoy) * iy
            tz0 = (tb_ref[ci, 2] - qoz) * iz
            tz1 = (tb_ref[ci, 5] - qoz) * iz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            might = need & (tmax >= tmin) & (tmin < t_b)

            def sweep(carry):
                (t_b, nxb, nyb, nzb, mb, mib, mob) = carry
                blk = tris_ref[pl.ds(ci * MESH_CHUNK, MESH_CHUNK), :]
                p0x = blk[:, 0:1]
                p0y = blk[:, 1:2]
                p0z = blk[:, 2:3]
                e1x = blk[:, 3:4]
                e1y = blk[:, 4:5]
                e1z = blk[:, 5:6]
                e2x = blk[:, 6:7]
                e2y = blk[:, 7:8]
                e2z = blk[:, 8:9]
                outs = []
                for s_ in range(sub):
                    dxr = qdx[s_:s_ + 1, :]
                    dyr = qdy[s_:s_ + 1, :]
                    dzr = qdz[s_:s_ + 1, :]
                    oxr = qox[s_:s_ + 1, :]
                    oyr = qoy[s_:s_ + 1, :]
                    ozr = qoz[s_:s_ + 1, :]
                    pvx = dyr * e2z - dzr * e2y
                    pvy = dzr * e2x - dxr * e2z
                    pvz = dxr * e2y - dyr * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                                        1.0 / det, 0.0)
                    tvx = oxr - p0x
                    tvy = oyr - p0y
                    tvz = ozr - p0z
                    b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    b2 = (dxr * qvx + dyr * qvy + dzr * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok = ((jnp.abs(det) > 1e-12) & (b1 >= 0.0)
                          & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                          & (tt > 1e-4) & (tt < t_b[s_:s_ + 1, :]))
                    tt = jnp.where(ok, tt, 3e38)
                    t_new = jnp.min(tt, axis=0, keepdims=True)
                    sel = ok & (tt <= t_new)
                    # break arg-min ties toward the lowest row id
                    rid = jax.lax.broadcasted_iota(
                        jnp.int32, tt.shape, 0)
                    rmin = jnp.min(jnp.where(sel, rid, 2 ** 30), axis=0,
                                   keepdims=True)
                    sel = sel & (rid == rmin)

                    def pick(col):
                        return jnp.sum(jnp.where(sel, blk[:, col:col + 1],
                                                 0.0), axis=0,
                                       keepdims=True)

                    outs.append((t_new, pick(9), pick(10), pick(11),
                                 pick(12), pick(13), pick(14)))
                t_new = jnp.concatenate([o[0] for o in outs], axis=0)
                closer = t_new < t_b
                t_b = jnp.where(closer, t_new, t_b)
                nxb2 = jnp.concatenate([o[1] for o in outs], axis=0)
                nyb2 = jnp.concatenate([o[2] for o in outs], axis=0)
                nzb2 = jnp.concatenate([o[3] for o in outs], axis=0)
                mb2 = jnp.concatenate([o[4] for o in outs], axis=0)
                mib2 = jnp.concatenate([o[5] for o in outs], axis=0)
                mob2 = jnp.concatenate([o[6] for o in outs], axis=0)
                nxb = jnp.where(closer, nxb2, nxb)
                nyb = jnp.where(closer, nyb2, nyb)
                nzb = jnp.where(closer, nzb2, nzb)
                mb = jnp.where(closer, mb2, mb)
                mib = jnp.where(closer, mib2, mib)
                mob = jnp.where(closer, mob2, mob)
                return (t_b, nxb, nyb, nzb, mb, mib, mob)

            return jax.lax.cond(jnp.any(might), sweep, lambda c: c, carry)

        carry = jax.lax.fori_loop(
            0, n_chunks, chunkloop,
            (t_b, nxb, nyb, nzb, mb, mib, mob))
        (t_b, nxb, nyb, nzb, mb, mib, mob) = carry
        found = mb >= 0.0
        t_out = jnp.where(found, t_b, _BIG)
        return (t_out, nxb, nyb, nzb, mb.astype(jnp.int32),
                mib.astype(jnp.int32), mob.astype(jnp.int32))

    return closest_hit


def make_mxu_lookup_i8(tt_ref, sub, C):
    """Per-lane random gather from a (128, C) int8 transposed table
    (pack_i8_transposed) via int8 one-hot MXU matmuls — same shape as
    make_mxu_lookup but ~15x faster (measured on chip at C=2048).
    Returns lookup(flat_idx) -> (sub,128) f32 of the RAW 0..127 quants;
    the caller multiplies by the supervoxel scale / 127."""
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def lookup(flat_idx):
        c_idx = flat_idx >> 7
        l_idx = flat_idx & 127
        tt = tt_ref[:]
        cols = []
        for s in range(sub):
            oh = (iota_c == c_idx[s:s + 1, :]).astype(jnp.int8)
            g = jnp.dot(tt, oh, preferred_element_type=jnp.int32)
            ohl = (iota_s == l_idx[s:s + 1, :]).astype(jnp.float32)
            cols.append(jnp.sum(g.astype(jnp.float32) * ohl, axis=0,
                                keepdims=True))
        return jnp.concatenate(cols, axis=0)

    return lookup


def make_mxu_lookup(tt_ref, sub, C):
    """Per-lane random table gather as one-hot MXU matmuls. tt_ref is the
    (128, C) bf16 transposed table from pack_bf16_transposed. Per sublane
    s: one-hot OH (C,128) via sublane-iota == c_idx[s] broadcast compare
    (no lane reshapes/transposes — those fail to lower in Mosaic),
    G = tt (128,C) @ OH (C,128) so column l of G is lane l's table row,
    then a second (128,128) one-hot multiply + sublane reduction picks the
    row element. Cost is sub*128*C*128 MACs per call per block,
    independent of index spread: no chunk loop, no dynamic windows.
    Returns lookup(flat_idx (sub,128) int32) -> (sub,128) f32."""
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def lookup(flat_idx):
        c_idx = flat_idx >> 7
        l_idx = flat_idx & 127
        tt = tt_ref[:]
        cols = []
        for s in range(sub):
            oh = (iota_c == c_idx[s:s + 1, :]).astype(jnp.bfloat16)
            g = jnp.dot(tt, oh, preferred_element_type=jnp.float32)
            ohl = (iota_s == l_idx[s:s + 1, :]).astype(jnp.float32)
            cols.append(jnp.sum(g * ohl, axis=0, keepdims=True))
        return jnp.concatenate(cols, axis=0)

    return lookup


def pack_i8_quads(dens, maj, grid_res, maj_res):
    """Pack a density grid as per-supervoxel-scaled uint8, FOUR values per
    f32 word: q = floor(d / m_up(sv) * 255) where m_up is the bf16
    up-rounded supervoxel majorant (the same value the kernel decodes
    with, so q*m_up/255 <= d always — density rounds down, majorant up).
    Returns an (n_word_chunks, 128) f32 bitcast view. Quantization error
    is <= m_up/255 per supervoxel — like bf16, ~0.4% of the local max —
    but the sweep is half the bf16-pair cost."""
    d = np.asarray(dens, np.float32)
    gx, gy, gz = grid_res
    mx, my, mz = maj_res
    # bf16-up-rounded majorant per supervoxel (matches _unpack of the
    # "up"-packed maj table the kernel reads scales from)
    m = np.asarray(maj, np.float32).view(np.uint32).astype(np.uint64)
    m_up = ((np.minimum(m + 0xFFFF, 0xFFFF_FFFF) >> 16) << 16) \
        .astype(np.uint32).view(np.float32).reshape(mx, my, mz)
    ix = (np.arange(gx) * mx) // gx
    iy = (np.arange(gy) * my) // gy
    iz = (np.arange(gz) * mz) // gz
    scale = m_up[np.ix_(ix, iy, iz)]
    q = np.zeros_like(d, np.uint32)
    nz = scale > 0
    q[nz] = np.clip(np.floor(d[nz] / scale[nz] * 255.0 + 0.5), 0, 255) \
        .astype(np.uint32)
    flat = q.reshape(-1)
    pad = (-flat.size) % 4
    flat = np.pad(flat, (0, pad))
    words = (flat[0::4] | (flat[1::4] << 8) | (flat[2::4] << 16)
             | (flat[3::4] << 24)).astype(np.uint32)
    pad = (-words.size) % 128
    words = np.pad(words, (0, pad))
    return words.view(np.float32).reshape(-1, 128)


def _unpack_i8(word_f32, parity):
    """Extract byte `parity` (0..3) of the bitcast word as f32 in 0..255.
    Static shift amounts only (Mosaic vector shifts by vectors are not
    relied on); the mask also clears sign-extension from >>24."""
    w = jax.lax.bitcast_convert_type(word_f32, jnp.int32)
    m = jnp.int32(255)
    return jnp.where(
        parity == 0, w & m,
        jnp.where(parity == 1, (w >> 8) & m,
                  jnp.where(parity == 2, (w >> 16) & m,
                            (w >> 24) & m))).astype(jnp.float32)


def _unpack_lo(word_f32):
    w = jax.lax.bitcast_convert_type(word_f32, jnp.int32)
    return jax.lax.bitcast_convert_type(w << 16, jnp.float32)


def _unpack_hi(word_f32):
    w = jax.lax.bitcast_convert_type(word_f32, jnp.int32)
    return jax.lax.bitcast_convert_type(w & jnp.int32(-65536), jnp.float32)


def _unpack_sel(word_f32, parity):
    return jnp.where(parity == 0, _unpack_lo(word_f32),
                     _unpack_hi(word_f32))


# exact-trilerp cutoff: density tables at or below this voxel count keep the
# 8-corner trilerp (their gather sweep is cheap); bigger tables sample ONE
# corner stochastically per lookup — see make_stoch_density_fn
STOCH_TRILERP_MAX_EXACT = 4096


def make_stoch_density_fn(dens_ref, maj_ref, *, sub, grid_res, maj_res,
                          bmin, bmax, ext, i8, n_dens_chunks, n_maj_chunks,
                          inv_r, mxu_lookup=None, maj_mxu_lookup=None):
    """Build density_at_1(px, py, pz, u_a, u_b): stochastic trilinear
    density — ONE corner sampled with its trilerp weight, so
    E[density_at_1] equals the exact 8-corner trilerp (stochastic texture
    filtering). Unbiased inside the delta-tracking / ratio-tracking walks:
    every estimator factor is LINEAR in the looked-up density and each
    lookup happens at a distinct point with fresh uniforms, so the
    expectation of the product factorizes into the exact-trilerp product
    (media_sampleTMaj.h:49-117 semantics preserved in expectation). The
    supervoxel majorant still bounds every corner (GridMedium.make pools
    with a 1-voxel halo), so null coefficients stay non-negative.

    Cost: one corner gather per sweep chunk instead of 8 — the 32^3+
    tables are sweep-bound (PERF.md), so this is ~6-8x on the walk's
    dominant term. u_a drives the x Bernoulli and, conditionally remapped,
    the z Bernoulli (exactly uniform given the x pick in real arithmetic);
    u_b drives y."""
    gx, gy, gz = grid_res
    mx, my, mz = maj_res
    inv_rx, inv_ry, inv_rz = inv_r
    zf = jnp.zeros((sub, 128), jnp.float32)

    def density_at_1(px, py, pz, u_a, u_b):
        fx = (px - bmin[0]) / ext[0] * gx - 0.5
        fy = (py - bmin[1]) / ext[1] * gy - 0.5
        fz = (pz - bmin[2]) / ext[2] * gz - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        z0 = jnp.floor(fz)
        wx, wy, wz = fx - x0, fy - y0, fz - z0
        sx = u_a < wx
        uz = jnp.where(sx, u_a / jnp.maximum(wx, 1e-12),
                       (u_a - wx) / jnp.maximum(1.0 - wx, 1e-12))
        ix = jnp.clip(x0.astype(jnp.int32) + jnp.where(sx, 1, 0), 0, gx - 1)
        iy = jnp.clip(y0.astype(jnp.int32) + jnp.where(u_b < wy, 1, 0),
                      0, gy - 1)
        iz = jnp.clip(z0.astype(jnp.int32) + jnp.where(uz < wz, 1, 0),
                      0, gz - 1)
        flat = (ix * gy + iy) * gz + iz
        if mxu_lookup is not None:
            # int8 MXU one-hot gather (pack_i8_transposed): q in 0..127
            # scaled by the corner voxel's bf16-up supervoxel majorant —
            # one cheap extra matmul on the small transposed maj table
            q = mxu_lookup(flat)
            sxm = jnp.floor((ix.astype(jnp.float32) + 0.5)
                            * inv_rx).astype(jnp.int32)
            sym = jnp.floor((iy.astype(jnp.float32) + 0.5)
                            * inv_ry).astype(jnp.int32)
            szm = jnp.floor((iz.astype(jnp.float32) + 0.5)
                            * inv_rz).astype(jnp.int32)
            msv = (sxm * my + sym) * mz + szm
            d = q * maj_mxu_lookup(msv) * np.float32(1.0 / 127.0)
            inside = ((px >= bmin[0]) & (px <= bmax[0])
                      & (py >= bmin[1]) & (py <= bmax[1])
                      & (pz >= bmin[2]) & (pz <= bmax[2]))
            return jnp.where(inside, d, 0.0)
        word_idx = flat >> (2 if i8 else 1)
        c_idx = word_idx >> 7
        l_idx = word_idx & 127

        def body(cc, acc):
            row = dens_ref[cc]
            chunk = jnp.broadcast_to(row[None, :], (sub, 128))
            gathered = jnp.take_along_axis(chunk, l_idx, axis=1)
            return jnp.where(c_idx == cc, gathered, acc)

        lo = jnp.min(c_idx)
        hi = jnp.minimum(jnp.max(c_idx), n_dens_chunks - 1)
        word = jax.lax.fori_loop(lo, hi + 1, body, zf)
        if i8:
            q = _unpack_i8(word, flat & 3)
            sxm = jnp.floor((ix.astype(jnp.float32) + 0.5)
                            * inv_rx).astype(jnp.int32)
            sym = jnp.floor((iy.astype(jnp.float32) + 0.5)
                            * inv_ry).astype(jnp.int32)
            szm = jnp.floor((iz.astype(jnp.float32) + 0.5)
                            * inv_rz).astype(jnp.int32)
            msv = (sxm * my + sym) * mz + szm
            mw = msv >> 1
            mc = mw >> 7

            def mbody(cc, acc):
                row = maj_ref[cc]
                chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                gathered = jnp.take_along_axis(chunk, mw & 127, axis=1)
                return jnp.where(mc == cc, gathered, acc)

            mlo = jnp.min(mc)
            mhi = jnp.minimum(jnp.max(mc), n_maj_chunks - 1)
            mword = jax.lax.fori_loop(mlo, mhi + 1, mbody, zf)
            d = q * _unpack_sel(mword, msv & 1) * np.float32(1.0 / 255.0)
        else:
            d = _unpack_sel(word, flat & 1)
        inside = ((px >= bmin[0]) & (px <= bmax[0])
                  & (py >= bmin[1]) & (py <= bmax[1])
                  & (pz >= bmin[2]) & (pz <= bmax[2]))
        return jnp.where(inside, d, 0.0)

    return density_at_1


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(c, spp, sub):
    """Build the kernel fn with constants `c` baked in. Lane layout: the
    block covers LB = sub*128 consecutive pixels, lane (i, j) -> pixel
    block_start + i*128 + j; each lane traces all `spp` samples of its
    pixel back-to-back."""
    sa = np.asarray(c["sigma_a"], np.float32)
    ss = np.asarray(c["sigma_s"], np.float32)
    st = sa + ss
    g_hg = c["g_hg"]
    bmin, bmax = c["bmin"], c["bmax"]
    has_point, has_env = c["has_point"], c["has_env"]
    lp = np.asarray(c["point_p"], np.float32)
    lI = np.asarray(c["point_I"], np.float32)
    envL = np.asarray(c["env_L"], np.float32)
    n_lights = int(has_point) + int(has_env)
    pmf = 1.0 / max(n_lights, 1)
    rc = np.asarray(c["rc"], np.float32)  # (4,4) raster->camera
    cw = np.asarray(c["cw"], np.float32)  # (4,4) camera->world
    nx = c["nx"]
    max_depth = c["max_depth"]
    max_iters = spp * c["max_events"]
    nx_pow2 = (nx & (nx - 1)) == 0
    nx_shift = int(np.log2(nx)) if nx_pow2 else 0
    LB = sub * 128

    def chan(vec3, h):
        """Select the hero channel of a per-channel constant triple."""
        return jnp.where(h == 0, float(vec3[0]),
                         jnp.where(h == 1, float(vec3[1]), float(vec3[2])))

    def exp3(coef, t):
        """(exp(-coef[k] * t) for k in 0..2) for a constant triple."""
        return tuple(jnp.exp(-float(coef[k]) * t) for k in range(3))

    def avg3(v):
        return (v[0] + v[1] + v[2]) * (1.0 / 3.0)

    def camera_ray(px, py):
        """Continuous raster coords -> (o fixed world origin, d world)."""
        # p_cam = rc @ (px, py, 0, 1), perspective divide
        xc = rc[0, 0] * px + rc[0, 1] * py + rc[0, 3]
        yc = rc[1, 0] * px + rc[1, 1] * py + rc[1, 3]
        zc = rc[2, 0] * px + rc[2, 1] * py + rc[2, 3]
        wc = rc[3, 0] * px + rc[3, 1] * py + rc[3, 3]
        inv_w = jnp.where(jnp.abs(wc - 1.0) < 1e-9, 1.0, 1.0 / wc)
        xc, yc, zc = xc * inv_w, yc * inv_w, zc * inv_w
        dxc, dyc, dzc = _normalize(xc, yc, zc)
        dx = cw[0, 0] * dxc + cw[0, 1] * dyc + cw[0, 2] * dzc
        dy = cw[1, 0] * dxc + cw[1, 1] * dyc + cw[1, 2] * dzc
        dz = cw[2, 0] * dxc + cw[2, 1] * dyc + cw[2, 2] * dzc
        return _normalize(dx, dy, dz)

    cam_o = (float(cw[0, 3]), float(cw[1, 3]), float(cw[2, 3]))

    def kernel(seed_ref, out_ref):
        block = pl.program_id(0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        pix_base = seed_ref[0, 1].astype(jnp.int32)
        pix_i = pix_base + block * LB + lane_i * 128 + lane_j
        pix = pix_i.astype(_U32)
        if nx_pow2:
            px_i = (pix_i & (nx - 1)).astype(jnp.float32)
            py_i = (pix_i >> nx_shift).astype(jnp.float32)
        else:
            pf = pix_i.astype(jnp.float32)
            py_i = jnp.floor(pf * (1.0 / nx) + 1e-6)
            px_i = pf - py_i * nx
        seed_a = jnp.full((sub, 128), seed_ref[0, 0], _U32)

        zf = jnp.zeros((sub, 128), jnp.float32)
        zi = jnp.zeros((sub, 128), jnp.int32)

        def start_path(samp, dim):
            """Camera ray + fresh state for sample index `samp`."""
            u0, u1, u2, _ = _uniform4(seed_a, pix, samp, dim)
            px = px_i + 0.5 + (u0 - 0.5)
            py = py_i + 0.5 + (u1 - 0.5)
            dx, dy, dz = camera_ray(px, py)
            hero = jnp.minimum(jnp.floor(u2 * 3.0).astype(jnp.int32), 2)
            o = (jnp.full_like(zf, cam_o[0]), jnp.full_like(zf, cam_o[1]),
                 jnp.full_like(zf, cam_o[2]))
            return o, (dx, dy, dz), hero, dim + _U32(1)

        o0, d0, hero0, _ = start_path(jnp.zeros((sub, 128), _U32),
                                      jnp.zeros((sub, 128), _U32))
        ones3 = (jnp.ones_like(zf),) * 3
        zeros3 = (zf,) * 3

        # carry layout (flat tuple)
        carry = (
            jnp.zeros((sub, 128), _U32),     # 0 samp
            jnp.full((sub, 128), 1, _U32),   # 1 dim (camera used dim 0)
            jnp.ones((sub, 128), jnp.int32),  # 2 alive (i32: Mosaic can't
            #   carry i1 vectors through scf.while)
            *o0,                              # 3..5 o
            *d0,                              # 6..8 d
            *ones3,                           # 9..11 beta
            *ones3,                           # 12..14 r_u
            *ones3,                           # 15..17 r_l
            *zeros3,                          # 18..20 L
            zi,                               # 21 depth
            hero0,                            # 22 hero
            jnp.full((sub, 128), -1, jnp.int32),  # 23 medium
            *zeros3,                          # 24..26 acc
            jnp.int32(0),                     # 27 iter
        )

        def cond(cy):
            return jnp.any(cy[2] != 0) & (cy[27] < max_iters)

        def body(cy):
            (samp, dim, alive_i, ox, oy, oz, dx, dy, dz,
             b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
             L0, L1, L2, depth, hero, med, a0, a1, a2, it) = cy
            alive = alive_i != 0

            st_h = chan(st, hero)
            sa_h = chan(sa, hero)
            ss_h = chan(ss, hero)

            hit, t_wall, entering = _box_hit(ox, oy, oz, dx, dy, dz,
                                             bmin, bmax)
            in_med = alive & (med == 0)
            seg = jnp.where(hit, t_wall, _BIG)

            # -- closed-form homogeneous collision ------------------------
            ua, ub, uc, ud = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            t_coll = -jnp.log1p(-ua) / jnp.maximum(st_h, 1e-30)
            t_coll = jnp.where(st_h > 0, t_coll, _BIG)
            coll = in_med & (t_coll < seg)

            # ran-to-end spectral rescale: exp(-seg (σ - σ_h))
            ran = in_med & ~coll
            segc = jnp.minimum(seg, _BIG)
            Te = exp3(st, segc)
            Te_h = jnp.maximum(jnp.exp(-st_h * segc), 1e-30)
            se = tuple(Te[k] / Te_h for k in range(3))
            b0 = jnp.where(ran, b0 * se[0], b0)
            b1 = jnp.where(ran, b1 * se[1], b1)
            b2 = jnp.where(ran, b2 * se[2], b2)
            ru0 = jnp.where(ran, ru0 * se[0], ru0)
            ru1 = jnp.where(ran, ru1 * se[1], ru1)
            ru2 = jnp.where(ran, ru2 * se[2], ru2)
            rl0 = jnp.where(ran, rl0 * se[0], rl0)
            rl1 = jnp.where(ran, rl1 * se[1], rl1)
            rl2 = jnp.where(ran, rl2 * se[2], rl2)

            # collision: absorb vs scatter (p_null = 0)
            p_absorb = sa_h / jnp.maximum(st_h, 1e-30)
            is_absorb = coll & (ub < p_absorb)
            is_scatter = coll & ~is_absorb
            depth_exceeded = is_scatter & (depth >= max_depth)
            terminated = is_absorb | depth_exceeded
            scat = is_scatter & ~depth_exceeded
            depth = jnp.where(scat, depth + 1, depth)
            Tm = exp3(st, t_coll)
            Tm_h = jnp.maximum(jnp.exp(-st_h * t_coll), 1e-30)
            pdf_s = jnp.maximum(Tm_h * ss_h, 1e-30)
            sc = tuple(Tm[k] * float(ss[k]) / pdf_s for k in range(3))
            b0 = jnp.where(scat, b0 * sc[0], b0)
            b1 = jnp.where(scat, b1 * sc[1], b1)
            b2 = jnp.where(scat, b2 * sc[2], b2)
            ru0 = jnp.where(scat, ru0 * sc[0], ru0)
            ru1 = jnp.where(scat, ru1 * sc[1], ru1)
            ru2 = jnp.where(scat, ru2 * sc[2], ru2)
            alive = alive & ~terminated

            # scatter point
            sx = ox + t_coll * dx
            sy = oy + t_coll * dy
            sz = oz + t_coll * dz
            wox, woy, woz = -dx, -dy, -dz

            # -- NEE (sample_ld_volume, analytic homogeneous Tr) ----------
            u_sel = uc
            u2a, u2b = ud, None
            un0, un1, _, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            if has_point:
                plx = sx - float(lp[0])
                ply = sy - float(lp[1])
                plz = sz - float(lp[2])
                dist2 = jnp.maximum(plx * plx + ply * ply + plz * plz, 1e-12)
                dist = jnp.sqrt(dist2)
                inv_dist = 1.0 / dist
                wix = -plx * inv_dist
                wiy = -ply * inv_dist
                wiz = -plz * inv_dist
                cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
                f_hg = _hg_value(cos_wi, g_hg)
                # medium chord toward the light: the shadow ray leaves the
                # box at t_exit (vacuum outside), so the attenuated length
                # is min(dist, t_exit) — supports lights inside AND outside
                _, t_exit_p, _ = _box_hit(sx, sy, sz, wix, wiy, wiz,
                                          bmin, bmax)
                Tr = exp3(st, jnp.minimum(dist, t_exit_p))
                # delta light: denom = avg(tr_l * r_u * pmf * 1)
                denom = jnp.maximum(avg3((ru0 * pmf, ru1 * pmf, ru2 * pmf)),
                                    1e-30)
                sel_pt = (u_sel < pmf * 1.0) if has_env else (u_sel >= -1.0)
                okp = scat & sel_pt & (f_hg > 0)
                w = f_hg / (dist2 * denom)
                L0 = jnp.where(okp, L0 + b0 * Tr[0] * float(lI[0]) * w, L0)
                L1 = jnp.where(okp, L1 + b1 * Tr[1] * float(lI[1]) * w, L1)
                L2 = jnp.where(okp, L2 + b2 * Tr[2] * float(lI[2]) * w, L2)
            if has_env:
                # uniform-sphere env sample
                ez = 1.0 - 2.0 * u2a
                er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
                ephi = (2.0 * np.pi) * u2b if u2b is not None else \
                    (2.0 * np.pi) * un0
                wix = er * jnp.cos(ephi)
                wiy = er * jnp.sin(ephi)
                wiz = ez
                cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
                f_hg = _hg_value(cos_wi, g_hg)
                # distance to wall along wi from inside
                _, t_exit, _ = _box_hit(sx, sy, sz, wix, wiy, wiz,
                                        bmin, bmax)
                Tr = exp3(st, jnp.minimum(t_exit, _BIG))
                p_l = pmf * INV_4PI
                denom = jnp.maximum(
                    avg3((ru0 * p_l + ru0 * f_hg,
                          ru1 * p_l + ru1 * f_hg,
                          ru2 * p_l + ru2 * f_hg)), 1e-30)
                sel_env = (u_sel >= pmf) if has_point else (u_sel >= -1.0)
                oke = scat & sel_env & (f_hg > 0)
                w = f_hg / denom
                L0 = jnp.where(oke, L0 + b0 * Tr[0] * float(envL[0]) * w, L0)
                L1 = jnp.where(oke, L1 + b1 * Tr[1] * float(envL[1]) * w, L1)
                L2 = jnp.where(oke, L2 + b2 * Tr[2] * float(envL[2]) * w, L2)

            # -- phase sampling -------------------------------------------
            pwx, pwy, pwz, ppdf = _sample_hg(wox, woy, woz, g_hg, un1,
                                             _uniform4(seed_a, pix, samp,
                                                       dim)[0])
            dim = dim + _U32(1)
            bad_phase = scat & (ppdf <= 0)
            alive = alive & ~bad_phase
            inv_ppdf = 1.0 / jnp.maximum(ppdf, 1e-30)
            rl0 = jnp.where(scat, ru0 * inv_ppdf, rl0)
            rl1 = jnp.where(scat, ru1 * inv_ppdf, rl1)
            rl2 = jnp.where(scat, ru2 * inv_ppdf, rl2)
            ox = jnp.where(scat, sx, ox)
            oy = jnp.where(scat, sy, oy)
            oz = jnp.where(scat, sz, oz)
            dx = jnp.where(scat, pwx, dx)
            dy = jnp.where(scat, pwy, dy)
            dz = jnp.where(scat, pwz, dz)

            # -- non-scattered lanes: escape / interface skip -------------
            flew = alive & ~scat & ~coll
            escaped = flew & ~hit
            if has_env:
                first = depth == 0
                ru_avg = jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
                no_mis = escaped & first
                L0 = jnp.where(no_mis, L0 + b0 * float(envL[0]) / ru_avg, L0)
                L1 = jnp.where(no_mis, L1 + b1 * float(envL[1]) / ru_avg, L1)
                L2 = jnp.where(no_mis, L2 + b2 * float(envL[2]) / ru_avg, L2)
                with_mis = escaped & ~first
                p_esc = pmf * INV_4PI
                den = jnp.maximum(avg3((ru0 + rl0 * p_esc,
                                        ru1 + rl1 * p_esc,
                                        ru2 + rl2 * p_esc)), 1e-30)
                L0 = jnp.where(with_mis, L0 + b0 * float(envL[0]) / den, L0)
                L1 = jnp.where(with_mis, L1 + b1 * float(envL[1]) / den, L1)
                L2 = jnp.where(with_mis, L2 + b2 * float(envL[2]) / den, L2)
            alive = alive & ~escaped

            iface = alive & flew & hit
            med = jnp.where(iface, jnp.where(entering, 0, -1), med)
            ox = jnp.where(iface, ox + (t_wall + 1e-4) * dx, ox)
            oy = jnp.where(iface, oy + (t_wall + 1e-4) * dy, oy)
            oz = jnp.where(iface, oz + (t_wall + 1e-4) * dz, oz)

            # -- commit + regenerate dead lanes ---------------------------
            died = ~alive & (samp < spp)  # includes init-dead & this-iter
            # NaN/Inf scrub at commit (RayIntegrator, integrators.cpp:308)
            bad = ~(jnp.isfinite(L0) & jnp.isfinite(L1) & jnp.isfinite(L2))
            L0 = jnp.where(bad, zf, L0)
            L1 = jnp.where(bad, zf, L1)
            L2 = jnp.where(bad, zf, L2)
            a0 = jnp.where(died, a0 + L0, a0)
            a1 = jnp.where(died, a1 + L1, a1)
            a2 = jnp.where(died, a2 + L2, a2)
            has_budget = died & (samp + _U32(1) < spp)
            samp = jnp.where(died, samp + _U32(1), samp)
            o_n, d_n, hero_n, _ = start_path(samp, jnp.zeros_like(dim))
            dim = jnp.where(has_budget, _U32(1), dim)
            ox = jnp.where(has_budget, o_n[0], ox)
            oy = jnp.where(has_budget, o_n[1], oy)
            oz = jnp.where(has_budget, o_n[2], oz)
            dx = jnp.where(has_budget, d_n[0], dx)
            dy = jnp.where(has_budget, d_n[1], dy)
            dz = jnp.where(has_budget, d_n[2], dz)
            hero = jnp.where(has_budget, hero_n, hero)
            one = jnp.ones_like(b0)
            b0 = jnp.where(has_budget, one, b0)
            b1 = jnp.where(has_budget, one, b1)
            b2 = jnp.where(has_budget, one, b2)
            ru0 = jnp.where(has_budget, one, ru0)
            ru1 = jnp.where(has_budget, one, ru1)
            ru2 = jnp.where(has_budget, one, ru2)
            rl0 = jnp.where(has_budget, one, rl0)
            rl1 = jnp.where(has_budget, one, rl1)
            rl2 = jnp.where(has_budget, one, rl2)
            L0 = jnp.where(has_budget, zf, L0)
            L1 = jnp.where(has_budget, zf, L1)
            L2 = jnp.where(has_budget, zf, L2)
            depth = jnp.where(has_budget, 0, depth)
            med = jnp.where(has_budget, -1, med)
            alive = alive | has_budget

            return (samp, dim, alive.astype(jnp.int32), ox, oy, oz,
                    dx, dy, dz, b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
                    L0, L1, L2, depth, hero, med, a0, a1, a2, it + 1)

        final = jax.lax.while_loop(cond, body, carry)
        a0, a1, a2 = final[24], final[25], final[26]
        scale = c["imaging_ratio"] / spp
        out_ref[0] = a0 * scale
        out_ref[1] = a1 * scale
        out_ref[2] = a2 * scale

    return kernel


# ---------------------------------------------------------------------------
# Grid-medium megakernel: fused DDA majorant walk + delta tracking
# ---------------------------------------------------------------------------


def _make_grid_kernel(c, spp, sub, tiled=False, tile_w=TILE_W,
                      mixed=False):
    """Megakernel for the single-GridMedium scene class: the DDA majorant
    iteration and delta-tracking collisions (media.h:140-218 +
    media_sampleTMaj.h:40-117, the jnp loop in
    volpath.sample_medium_interaction) run fused in VMEM. Density and
    majorant grids are VMEM tables; per-lane scalar lookups use chunked
    (sub,128) lane-gathers (Mosaic supports only idx<128 gathers, so a
    fori_loop sweeps the table chunks).

    tiled: map each block's sub*128 lanes to a square TILE_W x (LB/TILE_W)
    pixel tile instead of a raster strip — the gather sweeps bound their
    fori window to the [min, max] chunk the block's lanes touch, and a
    square tile's camera frustum cuts a far smaller voxel-index span than
    a full-width strip (the host un-permutes the output). Requires
    nx % TILE_W == 0, ny % (LB/TILE_W) == 0 and pixel base 0
    (single-chip launches).

    Each outer iteration processes ONE medium event per lane (segment
    tail, tentative collision, or surface/escape) — the memoryless
    exponential lets the ray origin advance to each event point, so the
    DDA cursor is re-derived from position instead of carried."""
    sa = np.asarray(c["sigma_a"], np.float32)   # per-channel base
    ss = np.asarray(c["sigma_s"], np.float32)
    st = sa + ss
    # gray sigma_t: the hero-relative tail ratios exp(-(st_k-st_h)*S)
    # are exactly 1 at trace time — skip the 18 tail-fold selects
    sigma_gray = float(st[0]) == float(st[1]) == float(st[2])
    g_hg = c["g_hg"]
    bmin, bmax = c["bmin"], c["bmax"]
    ext = tuple(bmax[k] - bmin[k] for k in range(3))
    gx, gy, gz = c["grid_res"]
    mx, my, mz = c["maj_res"]
    # density table format: bf16 pairs (2 values/word), supervoxel-scaled
    # uint8 quads (4 values/word), or a transposed bf16 table gathered by
    # one-hot MXU matmuls (big grids — no chunk sweep at all)
    i8 = c.get("dens_pack", "bf16") == "i8"
    mxu = c.get("dens_pack", "bf16") == "mxu"
    _cm = -(-(gx * gy * gz) // 128)
    C_mxu = -(-_cm // 8) * 8  # pad to sublane tile (pack_bf16_transposed)
    _cmj = -(-(mx * my * mz) // 128)
    C_maj_mxu = -(-_cmj // 8) * 8
    n_dens_chunks = -(-(gx * gy * gz) // (512 if i8 else 256))
    n_maj_chunks = -(-(mx * my * mz) // 256)
    inv_rx = 1.0 / (gx // mx)
    inv_ry = 1.0 / (gy // my)
    inv_rz = 1.0 / (gz // mz)
    # big tables: one stochastically-picked corner per density lookup
    # mxu implies stoch: the transposed table only serves the
    # one-corner lookup path (the exact 8-corner reader expects
    # packed words)
    stoch = (gx * gy * gz > STOCH_TRILERP_MAX_EXACT) or mxu
    has_point, has_env = c["has_point"], c["has_env"]
    lp = np.asarray(c["point_p"], np.float32)
    lI = np.asarray(c["point_I"], np.float32)
    envL = np.asarray(c["env_L"], np.float32)
    n_lights = int(has_point) + int(has_env)
    pmf = 1.0 / max(n_lights, 1)
    rc = np.asarray(c["rc"], np.float32)
    cw = np.asarray(c["cw"], np.float32)
    nx = c["nx"]
    max_depth = c["max_depth"]
    # events include null collisions AND shadow-walk steps (the unified
    # state machine spends one outer iteration per shadow step; a shadow
    # crossing costs about as much as a camera crossing, so the budget is
    # ~3x the path-event count, with slack — the loop exits early once
    # every lane has committed every sample, so this is a safety cap, not
    # a cost)
    max_iters = spp * c["max_events"] * 12
    nx_pow2 = (nx & (nx - 1)) == 0
    nx_shift = int(np.log2(nx)) if nx_pow2 else 0
    LB = sub * 128
    TX = tile_w
    TY = LB // TX
    ppl = MIX_PPL if mixed else 1
    sppq = spp // ppl  # samples per (lane, slot)
    n_tri = int(c.get("n_tri", 0))
    mesh_mode = n_tri > MAX_TRIS_GRID
    if n_tri:
        mat_kind = tuple(c["mat_kind"])
        mat_alb = np.asarray(c["mat_albedo"], np.float32).reshape(-1, 3)
        mat_eta = tuple(float(v) for v in c["mat_eta"])
        mat_rough = tuple(float(v) for v in c.get(
            "mat_rough", (0.0,) * len(mat_kind)))
        n_mat = len(mat_kind)
        n_tri_chunks = -(-n_tri // MESH_CHUNK)
        mat_tex_kind = tuple(c.get("mat_tex_kind", (-1,) * n_mat))
        mat_tex_c0 = np.asarray(c.get("mat_tex_c0",
                                      ((0.0,) * 3,) * n_mat), np.float32)
        mat_tex_c1 = np.asarray(c.get("mat_tex_c1",
                                      ((0.0,) * 3,) * n_mat), np.float32)
        mat_tex_uvs = np.asarray(c.get("mat_tex_uvs",
                                       ((1.0, 1.0),) * n_mat), np.float32)
        any_tex = any(k >= 0 for k in mat_tex_kind)
        # Trowbridge-Reitz lanes present? (rough conductor / CookTorrance;
        # wavefront/surfscatter.cpp generality, util/scattering.h math)
        any_rough = any(
            (mat_kind[i] == 1 and mat_rough[i] >= 1e-3)
            or mat_kind[i] == 11 for i in range(n_mat))
    npix_k = c["nx"] * c["ny"]
    if mixed:
        assert spp % ppl == 0 and (npix_k & (npix_k - 1)) == 0 and nx_pow2
        assert not tiled and not PROBE_ITERS
    mix_off = npix_k // ppl

    def chan(vec3, h):
        return jnp.where(h == 0, float(vec3[0]),
                         jnp.where(h == 1, float(vec3[1]), float(vec3[2])))

    def avg3(v):
        return (v[0] + v[1] + v[2]) * (1.0 / 3.0)

    def camera_ray(px, py):
        xc = rc[0, 0] * px + rc[0, 1] * py + rc[0, 3]
        yc = rc[1, 0] * px + rc[1, 1] * py + rc[1, 3]
        zc = rc[2, 0] * px + rc[2, 1] * py + rc[2, 3]
        wc = rc[3, 0] * px + rc[3, 1] * py + rc[3, 3]
        inv_w = jnp.where(jnp.abs(wc - 1.0) < 1e-9, 1.0, 1.0 / wc)
        xc, yc, zc = xc * inv_w, yc * inv_w, zc * inv_w
        dxc, dyc, dzc = _normalize(xc, yc, zc)
        dx = cw[0, 0] * dxc + cw[0, 1] * dyc + cw[0, 2] * dzc
        dy = cw[1, 0] * dxc + cw[1, 1] * dyc + cw[1, 2] * dzc
        dz = cw[2, 0] * dxc + cw[2, 1] * dyc + cw[2, 2] * dzc
        return _normalize(dx, dy, dz)

    cam_o = (float(cw[0, 3]), float(cw[1, 3]), float(cw[2, 3]))

    def kernel(seed_ref, dens_ref, maj_ref, *rest):
        if mesh_mode:
            tris_ref, tb_ref, out_ref = rest
        elif n_tri:
            tris_ref, out_ref = rest
        else:
            (out_ref,) = rest
        block = pl.program_id(0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        pix_base = seed_ref[0, 1].astype(jnp.int32)
        if tiled:
            # square-tile lane mapping (pixel base 0 by contract);
            # TX is a power of two so the vector ops are shifts/masks
            tpr = nx // TX
            tx_shift = int(np.log2(TX))
            lane_l = lane_i * 128 + lane_j
            tox = (block % tpr) * TX
            toy = (block // tpr) * TY
            pxi = tox + (lane_l & (TX - 1))
            pyi = toy + (lane_l >> tx_shift)
            pix_i = pyi * nx + pxi
            pix = pix_i.astype(_U32)
            px_i = pxi.astype(jnp.float32)
            py_i = pyi.astype(jnp.float32)
        else:
            pix_i = pix_base + block * LB + lane_i * 128 + lane_j
            pix = pix_i.astype(_U32)
            if nx_pow2:
                px_i = (pix_i & (nx - 1)).astype(jnp.float32)
                py_i = (pix_i >> nx_shift).astype(jnp.float32)
            else:
                pf = pix_i.astype(jnp.float32)
                py_i = jnp.floor(pf * (1.0 / nx) + 1e-6)
                px_i = pf - py_i * nx
        seed_a = jnp.full((sub, 128), seed_ref[0, 0], _U32)
        zf = jnp.zeros((sub, 128), jnp.float32)
        zi = jnp.zeros((sub, 128), jnp.int32)
        lane_g = block * LB + lane_i * 128 + lane_j  # raster lane id

        def mix_pix(q):
            # slot q of lane g -> pixel: vertical strip offset q*mix_off,
            # x mirrored on odd q (vector q, power-of-two npix/nx)
            base = (lane_g + q * mix_off) & (npix_k - 1)
            y = base >> nx_shift
            x = base & (nx - 1)
            xm = jnp.where((q & 1) == 1, nx - 1 - x, x)
            return ((y << nx_shift) | xm).astype(_U32)

        def slot_of(sampv):
            # current slot index = samp // sppq as a compare chain
            q = zi
            for t in range(1, ppl):
                q = q + (sampv >= _U32(t * sppq)).astype(jnp.int32)
            return q

        def table_lookup(tab_ref, n_chunks, flat_idx):
            """tab[flat_idx] via a word-chunk sweep on the bf16-pair-packed
            table; flat_idx (sub,128) int32. The sweep is bounded to the
            [min, max] chunk window the lanes actually touch — spatially
            coherent lanes (camera packets, shadow packets) then pay a
            fraction of the full-table cost."""
            word_idx = flat_idx >> 1
            c_idx = word_idx >> 7
            l_idx = word_idx & 127

            def body(cc, acc):
                row = tab_ref[cc]
                chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                gathered = jnp.take_along_axis(chunk, l_idx, axis=1)
                return jnp.where(c_idx == cc, gathered, acc)

            lo = jnp.min(c_idx)
            hi = jnp.minimum(jnp.max(c_idx), n_chunks - 1)
            word = jax.lax.fori_loop(lo, hi + 1, body, zf)
            return _unpack_sel(word, flat_idx & 1)

        def density_at(px, py, pz):
            """Trilinear density (media.py GridMedium.density_at / _trilerp
            semantics: clamp-to-edge inside, zero outside)."""
            fx = (px - bmin[0]) / ext[0] * gx - 0.5
            fy = (py - bmin[1]) / ext[1] * gy - 0.5
            fz = (pz - bmin[2]) / ext[2] * gz - 0.5
            x0 = jnp.floor(fx)
            y0 = jnp.floor(fy)
            z0 = jnp.floor(fz)
            wx, wy, wz = fx - x0, fy - y0, fz - z0
            ix0 = jnp.clip(x0.astype(jnp.int32), 0, gx - 1)
            iy0 = jnp.clip(y0.astype(jnp.int32), 0, gy - 1)
            iz0 = jnp.clip(z0.astype(jnp.int32), 0, gz - 1)
            ix1 = jnp.minimum(ix0 + 1, gx - 1)
            iy1 = jnp.minimum(iy0 + 1, gy - 1)
            iz1 = jnp.minimum(iz0 + 1, gz - 1)
            # one sweep over word chunks, 8 corner gathers per chunk;
            # words unpack by parity after the sweep
            corner_idx = []
            corner_w = []
            corner_cell = []
            for cx, wxa in ((ix0, 1.0 - wx), (ix1, wx)):
                for cy, wya in ((iy0, 1.0 - wy), (iy1, wy)):
                    for cz, wza in ((iz0, 1.0 - wz), (iz1, wz)):
                        corner_idx.append((cx * gy + cy) * gz + cz)
                        corner_w.append(wxa * wya * wza)
                        corner_cell.append((cx, cy, cz))
            wshift = 2 if i8 else 1
            corner_word = [ci >> wshift for ci in corner_idx]

            def body(cc, accs):
                row = dens_ref[cc]
                chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                new = []
                for cw_i, acc in zip(corner_word, accs):
                    gathered = jnp.take_along_axis(chunk, cw_i & 127, axis=1)
                    new.append(jnp.where((cw_i >> 7) == cc, gathered, acc))
                return tuple(new)

            # dynamic sweep window: corner 0 is the smallest flat index,
            # corner 7 the largest, so [min(chunk0), max(chunk7)] covers
            # every lane's corners; coherent lanes shrink the sweep
            lo = jnp.min(corner_word[0] >> 7)
            hi = jnp.minimum(jnp.max(corner_word[7] >> 7), n_dens_chunks - 1)
            vals = jax.lax.fori_loop(lo, hi + 1, body, (zf,) * 8)
            if i8:
                # q in 0..255 scaled by the corner supervoxel's bf16-up
                # majorant (the exact scale pack_i8_quads encoded with)
                qs = [_unpack_i8(v, ci & 3)
                      for v, ci in zip(vals, corner_idx)]
                msv_idx = []
                for (cx, cy, cz) in corner_cell:
                    # integer cell//ratio via exact float trick: the +0.5
                    # keeps the quotient strictly off integer boundaries
                    sxm = jnp.floor((cx.astype(jnp.float32) + 0.5)
                                    * inv_rx).astype(jnp.int32)
                    sym = jnp.floor((cy.astype(jnp.float32) + 0.5)
                                    * inv_ry).astype(jnp.int32)
                    szm = jnp.floor((cz.astype(jnp.float32) + 0.5)
                                    * inv_rz).astype(jnp.int32)
                    msv_idx.append((sxm * my + sym) * mz + szm)
                msv_word = [mi >> 1 for mi in msv_idx]

                def mbody(cc, accs):
                    row = maj_ref[cc]
                    chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                    new = []
                    for mw_i, acc in zip(msv_word, accs):
                        gathered = jnp.take_along_axis(chunk, mw_i & 127,
                                                       axis=1)
                        new.append(jnp.where((mw_i >> 7) == cc, gathered,
                                             acc))
                    return tuple(new)

                mlo = jnp.min(msv_word[0] >> 7)
                mhi = jnp.minimum(jnp.max(msv_word[7] >> 7),
                                  n_maj_chunks - 1)
                mvals = jax.lax.fori_loop(mlo, mhi + 1, mbody, (zf,) * 8)
                scales = [_unpack_sel(v, mi & 1)
                          for v, mi in zip(mvals, msv_idx)]
                d = sum(q * s * (np.float32(1.0 / 255.0) * w)
                        for q, s, w in zip(qs, scales, corner_w))
            else:
                d = sum(_unpack_sel(v, ci & 1) * w
                        for v, ci, w in zip(vals, corner_idx, corner_w))
            inside = ((px >= bmin[0]) & (px <= bmax[0])
                      & (py >= bmin[1]) & (py <= bmax[1])
                      & (pz >= bmin[2]) & (pz <= bmax[2]))
            return jnp.where(inside, d, 0.0)

        maj_mxu_lookup = (make_mxu_lookup(maj_ref, sub, C_maj_mxu)
                          if mxu else None)

        density_at_1 = make_stoch_density_fn(
            dens_ref, maj_ref, sub=sub, grid_res=(gx, gy, gz),
            maj_res=(mx, my, mz), bmin=bmin, bmax=bmax, ext=ext, i8=i8,
            n_dens_chunks=n_dens_chunks, n_maj_chunks=n_maj_chunks,
            inv_r=(inv_rx, inv_ry, inv_rz),
            mxu_lookup=(make_mxu_lookup_i8(dens_ref, sub, C_mxu)
                        if mxu else None),
            maj_mxu_lookup=maj_mxu_lookup) if stoch else None

        def maj_dens_at(px, py, pz, ddx=None, ddy=None, ddz=None):
            """Supervoxel majorant at p. When a direction is given, the
            cell index uses the SAME directional nudge as seg_exit, so
            the majorant (and its empty-skip distance, encode_empty_skip)
            always describes the cell the walk is about to traverse —
            without it, a lane within 3e-4 cells of a boundary reads the
            previous cell while stepping across the next one. May return
            NEGATIVE values (-D = skip field); callers decode
            max(v, 0) / max(-v, 1)."""

            def cell_i(p_c, d_c, lo, ex_c, m_c):
                u = (p_c - lo) / ex_c * m_c
                if d_c is not None:
                    u = u + jnp.where(d_c >= 0, 3e-4, -3e-4)
                return jnp.clip(u.astype(jnp.int32), 0, m_c - 1)

            ix = cell_i(px, ddx, bmin[0], ext[0], mx)
            iy = cell_i(py, ddy, bmin[1], ext[1], my)
            iz = cell_i(pz, ddz, bmin[2], ext[2], mz)
            flat = (ix * my + iy) * mz + iz
            inside = ((px >= bmin[0]) & (px <= bmax[0])
                      & (py >= bmin[1]) & (py <= bmax[1])
                      & (pz >= bmin[2]) & (pz <= bmax[2]))
            if mxu:
                # MXU gather: majorants ride the same transposed-bf16
                # layout as the density table (rounded UP at pack time)
                m_v = maj_mxu_lookup(flat)
            else:
                m_v = table_lookup(maj_ref, n_maj_chunks, flat)
            # zero outside the box: edge-clamped cells must not produce
            # phantom collisions for walks that graze or exit the grid
            return jnp.where(inside, m_v, 0.0)

        if n_tri and mesh_mode:
            mesh_hit = make_mesh_closest_hit(tris_ref, tb_ref,
                                             n_tri_chunks, sub, zf)

        def closest_hit(qox, qoy, qoz, qdx, qdy, qdz):
            """Moller-Trumbore SMEM sweep (pallas_surface.py idiom):
            returns (t, ngx, ngy, ngz, mat, med_in, med_out); t=_BIG,
            mat=-1 on miss."""

            def tri(ti, carry):
                (t_b, nxb, nyb, nzb, mb, mib, mob, uub, vvb) = carry
                p0x, p0y, p0z = tris_ref[ti, 0], tris_ref[ti, 1], \
                    tris_ref[ti, 2]
                e1x, e1y, e1z = tris_ref[ti, 3], tris_ref[ti, 4], \
                    tris_ref[ti, 5]
                e2x, e2y, e2z = tris_ref[ti, 6], tris_ref[ti, 7], \
                    tris_ref[ti, 8]
                pvx = qdy * e2z - qdz * e2y
                pvy = qdz * e2x - qdx * e2z
                pvz = qdx * e2y - qdy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = qox - p0x, qoy - p0y, qoz - p0z
                b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                b2 = (qdx * qvx + qdy * qvy + qdz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ((jnp.abs(det) > 1e-12) & (b1 >= 0.0) & (b2 >= 0.0)
                      & (b1 + b2 <= 1.0) & (tt > 1e-4) & (tt < t_b))
                t_b = jnp.where(ok, tt, t_b)
                nxb = jnp.where(ok, tris_ref[ti, 9], nxb)
                nyb = jnp.where(ok, tris_ref[ti, 10], nyb)
                nzb = jnp.where(ok, tris_ref[ti, 11], nzb)
                mb = jnp.where(ok, tris_ref[ti, 12].astype(jnp.int32), mb)
                mib = jnp.where(ok, tris_ref[ti, 13].astype(jnp.int32), mib)
                mob = jnp.where(ok, tris_ref[ti, 14].astype(jnp.int32), mob)
                # hit uv from barycentrics + vertex uvs (cols 16-21)
                uu = (tris_ref[ti, 16]
                      + b1 * (tris_ref[ti, 18] - tris_ref[ti, 16])
                      + b2 * (tris_ref[ti, 20] - tris_ref[ti, 16]))
                vv = (tris_ref[ti, 17]
                      + b1 * (tris_ref[ti, 19] - tris_ref[ti, 17])
                      + b2 * (tris_ref[ti, 21] - tris_ref[ti, 17]))
                uub = jnp.where(ok, uu, uub)
                vvb = jnp.where(ok, vv, vvb)
                return (t_b, nxb, nyb, nzb, mb, mib, mob, uub, vvb)

            init = (jnp.full((sub, 128), _BIG, jnp.float32), zf, zf, zf,
                    jnp.full((sub, 128), -1, jnp.int32),
                    jnp.full((sub, 128), -1, jnp.int32),
                    jnp.full((sub, 128), -1, jnp.int32), zf, zf)
            return jax.lax.fori_loop(0, n_tri, tri, init)

        def seg_exit(px, py, pz, dx, dy, dz, skip=None):
            """Distance to the current majorant supervoxel's exit plane
            (the DDA step length, media.h:182-207 re-derived from
            position). skip (cells, >= 1, from the encode_empty_skip
            field of the directionally-nudged cell) widens the exit to
            the boundary of the 2*skip-1 empty cube centered on the
            current cell — all cells within Chebyshev distance skip-1
            are empty by construction, so the widened step samples no
            collisions it could have missed."""
            t_seg = jnp.full_like(px, _BIG)
            for (p_c, d_c, lo, ex_c, m_c) in (
                    (px, dx, bmin[0], ext[0], mx),
                    (py, dy, bmin[1], ext[1], my),
                    (pz, dz, bmin[2], ext[2], mz)):
                u = (p_c - lo) / ex_c * m_c
                sgn = jnp.where(d_c >= 0, 1.0, -1.0)
                cell = jnp.floor(u + sgn * 3e-4)
                if skip is None:
                    bound = jnp.where(d_c >= 0, cell + 1.0, cell)
                else:
                    bound = jnp.where(d_c >= 0, cell + skip,
                                      cell - skip + 1.0)
                t_axis = (bound / m_c * ex_c + lo - p_c) / jnp.where(
                    jnp.abs(d_c) < 1e-12,
                    jnp.where(d_c >= 0, 1e-12, -1e-12), d_c)
                t_axis = jnp.where(jnp.abs(d_c) < 1e-12, _BIG, t_axis)
                t_seg = jnp.minimum(t_seg, t_axis)
            return jnp.maximum(t_seg, 1e-5)

        def start_path(pix_cur, samp, dim):
            u0, u1, u2, _ = _uniform4(seed_a, pix_cur, samp, dim)
            if mixed:
                pc = pix_cur.astype(jnp.int32)
                pxf = (pc & (nx - 1)).astype(jnp.float32)
                pyf = (pc >> nx_shift).astype(jnp.float32)
            else:
                pxf, pyf = px_i, py_i
            px = pxf + 0.5 + (u0 - 0.5)
            py = pyf + 0.5 + (u1 - 0.5)
            dx, dy, dz = camera_ray(px, py)
            hero = jnp.minimum(jnp.floor(u2 * 3.0).astype(jnp.int32), 2)
            o = (jnp.full_like(zf, cam_o[0]), jnp.full_like(zf, cam_o[1]),
                 jnp.full_like(zf, cam_o[2]))
            return o, (dx, dy, dz), hero, dim + _U32(1)

        pix0 = mix_pix(zi) if mixed else pix
        o0, d0, hero0, _ = start_path(pix0, jnp.zeros((sub, 128), _U32),
                                      jnp.zeros((sub, 128), _U32))
        ones3 = (jnp.ones_like(zf),) * 3
        zeros3 = (zf,) * 3
        carry = (
            jnp.zeros((sub, 128), _U32),      # 0 samp
            jnp.full((sub, 128), 1, _U32),    # 1 dim
            jnp.ones((sub, 128), jnp.int32),  # 2 alive
            *o0, *d0,                         # 3..8
            *ones3, *ones3, *ones3,           # 9..17 beta/ru/rl
            *zeros3,                          # 18..20 L
            zi,                               # 21 depth
            hero0,                            # 22 hero
            jnp.full((sub, 128), -1, jnp.int32),  # 23 medium
            *zeros3,                          # 24..26 acc
            jnp.int32(0),                     # 27 iter
            zi,                               # 28 mode (0 path, 1 sh-pt, 2 sh-env)
            *ones3, *ones3, *ones3,           # 29..37 shadow T / trl / tru
            *zeros3,                          # 38..40 shadow dir
            zf, zf,                           # 41 sh_t, 42 sh_end
            zf, jnp.ones_like(zf),            # 43 sh_pdf, 44 sh_dist2
            zi,                               # 45 rr_pend
            pix0,                             # 46 current pixel id (u32)
        ) + (zeros3 * (ppl - 1)) \
          + ((jnp.full((sub, 128), _BIG, jnp.float32),  # t_surf
              zf, zf, zf,                               # hit normal
              jnp.full((sub, 128), -1, jnp.int32),      # hit mat
              jnp.full((sub, 128), -1, jnp.int32),      # hit med_in
              jnp.full((sub, 128), -1, jnp.int32),      # hit med_out
              jnp.ones((sub, 128), jnp.int32),          # needs_isect
              zi,                                       # sh_need_occ
              zi,                                       # spec_last
              *zeros3) if n_tri else ()) \
          + ((zf, zf) if (n_tri and any_tex) else ()) \
          + (((lane_i * 128 + lane_j).astype(jnp.float32),)
             if PROBE_ITERS else ())
        # ^ busy probe, biased by lane_j (subtracted at readout): a
        #   constant-zero carry init gets a replicated Mosaic layout that
        #   the loop body's (0,0) layout cannot legally relayout to
        #   ("Invalid relayout" on fresh compiles); the iota init forces
        #   a materialized layout

        def cond(cy):
            return jnp.any(cy[2] != 0) & (cy[27] < max_iters)

        def body(cy):
            (samp, dim, alive_i, ox, oy, oz, dx, dy, dz,
             b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
             L0, L1, L2, depth, hero, med, a0, a1, a2, it, mode,
             sT0, sT1, sT2, sl0, sl1, sl2, su0, su1, su2,
             shx, shy, shz, sh_t, sh_end, sh_pdf, sh_d2, rr_pend) = \
                cy[:46]
            pix_c = cy[46]
            base_x = 47 + 3 * (ppl - 1)
            acc_x = list(cy[47:base_x])
            if n_tri:
                (t_surf, hngx, hngy, hngz, hmat, hmi, hmo, needs_i,
                 sh_occ, spec_last, shf0, shf1, shf2) = cy[base_x:
                                                           base_x + 13]
                base_x += 13
                if any_tex:
                    huv_u, huv_v = cy[base_x:base_x + 2]
                    base_x += 2
            busy = cy[base_x] if PROBE_ITERS else None
            alive = alive_i != 0
            is_sh = alive & (mode != 0)
            st_h = chan(st, hero)

            # Russian roulette, deferred from the previous volume scatter
            # so the pending NEE fold used the pre-RR beta (reference
            # order: integrators.cpp:1301-1312 runs RR after SampleLd +
            # phase sampling, before the next distance sample). Without
            # volume RR the densest paths run to max_depth and ONE slow
            # lane serializes its whole block (measured: every block hit
            # the max_iters cap on the 64^3 bench cloud).
            ur0, _, _, _ = _uniform4(seed_a, pix_c, samp, dim)
            dim = dim + _U32(1)
            do_rr_lane = alive & ~is_sh & (rr_pend != 0)
            rr_beta = jnp.maximum(jnp.maximum(b0, b1), b2) \
                / jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
            do_rr = do_rr_lane & (rr_beta < 1.0) & (depth > 1)
            q_rr = jnp.maximum(0.0, 1.0 - rr_beta)
            rr_kill = do_rr & (ur0 < q_rr)
            alive = alive & ~rr_kill
            inv1q = 1.0 / jnp.maximum(1.0 - q_rr, 1e-6)
            rr_scale = do_rr & ~rr_kill
            b0 = jnp.where(rr_scale, b0 * inv1q, b0)
            b1 = jnp.where(rr_scale, b1 * inv1q, b1)
            b2 = jnp.where(rr_scale, b2 * inv1q, b2)
            rr_pend = jnp.where(do_rr_lane, 0, rr_pend)

            if n_tri:
                # ONE Moller-Trumbore sweep per iteration, serving each
                # lane's pending query: path closest-hit (after any ray
                # change) or NEE shadow occlusion (at walk start). Lanes
                # resolving a path query stall their medium event this
                # iteration — cheap next to running the sweep per query.
                do_is = alive & ~is_sh & (needs_i != 0)
                do_oc = is_sh & (sh_occ != 0)
                qdx = jnp.where(do_oc, shx, dx)
                qdy = jnp.where(do_oc, shy, dy)
                qdz = jnp.where(do_oc, shz, dz)
                # point lights occlude up to the light, env to infinity
                occ_t = jnp.where(mode == 1, jnp.sqrt(sh_d2), _BIG)
                if mesh_mode:
                    # chunk-skip sweep: idle lanes must not force chunk
                    # visits; occlusion lanes cap the search at the light
                    t_cap = jnp.where(do_oc, occ_t, _BIG)
                    (t_h, nhx, nhy, nhz, m_h, mi_h, mo_h) = mesh_hit(
                        ox, oy, oz, qdx, qdy, qdz, do_is | do_oc, t_cap)
                    uu_h = vv_h = zf  # textures gated to <=64-tri class
                else:
                    # skip the whole SMEM sweep on iterations where no
                    # lane has a pending query (walk-phase iterations
                    # dominate; the sweep costs ~40 cycles/tri for the
                    # full block)
                    def _sweep(_):
                        return closest_hit(ox, oy, oz, qdx, qdy, qdz)

                    def _idle(_):
                        return (jnp.full((sub, 128), _BIG, jnp.float32),
                                zf, zf, zf,
                                jnp.full((sub, 128), -1, jnp.int32),
                                jnp.full((sub, 128), -1, jnp.int32),
                                jnp.full((sub, 128), -1, jnp.int32),
                                zf, zf)

                    (t_h, nhx, nhy, nhz, m_h, mi_h, mo_h, uu_h,
                     vv_h) = jax.lax.cond(jnp.any(do_is | do_oc),
                                          _sweep, _idle, 0)
                if any_tex:
                    huv_u = jnp.where(do_is, uu_h, huv_u)
                    huv_v = jnp.where(do_is, vv_h, huv_v)
                t_surf = jnp.where(do_is, t_h, t_surf)
                hngx = jnp.where(do_is, nhx, hngx)
                hngy = jnp.where(do_is, nhy, hngy)
                hngz = jnp.where(do_is, nhz, hngz)
                hmat = jnp.where(do_is, m_h, hmat)
                hmi = jnp.where(do_is, mi_h, hmi)
                hmo = jnp.where(do_is, mo_h, hmo)
                needs_i = jnp.where(do_is, 0, needs_i)
                blocked = do_oc & (t_h < occ_t - 1e-4)
                mode = jnp.where(blocked, 0, mode)
                sh_occ = jnp.where(do_oc, 0, sh_occ)
                is_sh = alive & (mode != 0)
                # blocked lanes dropped to transport AFTER the sweep ran:
                # their t_surf is stale (_BIG since the scatter), so one
                # unbounded medium step could collide PAST the real
                # surface (measured +3-6% on point-lit teaser scenes) —
                # stall them until the next iteration's sweep
                stall = do_is | (alive & (mode == 0) & (needs_i != 0))
            else:
                stall = jnp.zeros((sub, 128), bool)

            # medium state from POSITION, not just interface flags: a
            # grazing entry (o = wall + 1e-4 along d) can land PAST the
            # exit wall — outside the box with med==0. Such a lane would
            # walk "in medium" forever (edge-clamped majorants keep
            # colliding, escape requires ~in_med), pinning its whole
            # block at the max_iters cap — measured: runtime scaled
            # exactly linearly with max_events on the 64^3 bench until
            # this guard. Same guard as pallas_vspg.py's stuck-lane kill.
            outside_box = ((ox < bmin[0]) | (ox > bmax[0])
                           | (oy < bmin[1]) | (oy > bmax[1])
                           | (oz < bmin[2]) | (oz > bmax[2]))
            med = jnp.where((med == 0) & outside_box & ~is_sh, -1, med)

            hit, t_wall, entering = _box_hit(ox, oy, oz, dx, dy, dz,
                                             bmin, bmax)
            in_med = alive & ~is_sh & (med == 0) & ~stall
            wall_rem = jnp.where(hit, t_wall, _BIG)
            if n_tri:
                # the path's free-flight limit is the NEARER of the box
                # wall and the next surface
                path_lim = jnp.minimum(wall_rem, t_surf)
            else:
                path_lim = wall_rem

            # -- ONE unified majorant-walk event per lane ------------------
            # Path lanes step their camera/phase ray; shadow lanes step
            # their ratio-tracked shadow ray. Both share the SAME majorant
            # lookup + density lookup, so the per-iteration MXU/sweep cost
            # is one event for every lane — no lane ever stalls on another
            # lane's shadow walk (the round-2 kernel ran the whole shadow
            # walk as a nested while_loop: one scattering lane serialized
            # its entire block; PERF.md round-2 addendum 6).
            #
            # Multi-cell flight (round 5): each body iteration consumes
            # ONE exponential optical-depth target tau ~ Exp(1) and walks
            # it across majorant cells in a cheap inner loop (majorant
            # lookup + DDA exit only), accumulating the distance-weighted
            # majorant S = sum m_i*dt_i. The expensive event machinery
            # (density gather, scatter/null algebra, NEE arm) then runs
            # once per TENTATIVE COLLISION instead of once per cell
            # crossing — crossings used to cost full body iterations
            # (PERF.md round-5 addendum 2: "segment crossings dominate").
            # Per-channel transmittances telescope to exp(-st_k*S), so
            # the estimator is bit-for-bit the same algebra; lanes that
            # exhaust WALK_STEPS mid-flight fold S into beta and resample
            # tau next iteration (exponential memorylessness).
            epx = jnp.where(is_sh, ox + sh_t * shx, ox)
            epy = jnp.where(is_sh, oy + sh_t * shy, oy)
            epz = jnp.where(is_sh, oz + sh_t * shz, oz)
            wdx = jnp.where(is_sh, shx, dx)
            wdy = jnp.where(is_sh, shy, dy)
            wdz = jnp.where(is_sh, shz, dz)
            t_lim = jnp.where(is_sh, sh_end - sh_t, path_lim)
            ua, ub, uc, ud = _uniform4(seed_a, pix_c, samp, dim)
            dim = dim + _U32(1)
            walk = in_med | is_sh
            tau0 = -jnp.log1p(-ua)

            # unrolled masked walk (a nested while_loop measured cost-
            # neutral: per-step `any` reductions + loop spills ate the
            # event savings). Per-flight constants hoisted: cell-space
            # coordinates make the DDA exit 3 fma + 2 min per step, and
            # the 3 direction divides happen once, not once per cell.
            kx_, ky_, kz_ = mx / ext[0], my / ext[1], mz / ext[2]
            u0x = (epx - bmin[0]) * kx_
            u0y = (epy - bmin[1]) * ky_
            u0z = (epz - bmin[2]) * kz_
            du_x = wdx * kx_
            du_y = wdy * ky_
            du_z = wdz * kz_
            den_x = jnp.where(jnp.abs(wdx) < 1e-12,
                              jnp.where(wdx >= 0, 1e-12, -1e-12), wdx)
            den_y = jnp.where(jnp.abs(wdy) < 1e-12,
                              jnp.where(wdy >= 0, 1e-12, -1e-12), wdy)
            den_z = jnp.where(jnp.abs(wdz) < 1e-12,
                              jnp.where(wdz >= 0, 1e-12, -1e-12), wdz)
            inv_du_x = (ext[0] / mx) / den_x
            inv_du_y = (ext[1] / my) / den_y
            inv_du_z = (ext[2] / mz) / den_z
            eps_x = jnp.where(wdx >= 0, 3e-4, -3e-4)
            eps_y = jnp.where(wdy >= 0, 3e-4, -3e-4)
            eps_z = jnp.where(wdz >= 0, 3e-4, -3e-4)
            t_cum = zf
            S_acc = zf
            tau_rem = tau0
            m_d = zf
            act = walk
            coll_w = jnp.zeros((sub, 128), bool)
            lim_w = jnp.zeros((sub, 128), bool)
            for _k in range(WALK_STEPS):
                ux = u0x + t_cum * du_x
                uy = u0y + t_cum * du_y
                uz = u0z + t_cum * du_z
                cfx = jnp.floor(ux + eps_x)
                cfy = jnp.floor(uy + eps_y)
                cfz = jnp.floor(uz + eps_z)
                ix = jnp.clip(cfx.astype(jnp.int32), 0, mx - 1)
                iy = jnp.clip(cfy.astype(jnp.int32), 0, my - 1)
                iz = jnp.clip(cfz.astype(jnp.int32), 0, mz - 1)
                flat = (ix * my + iy) * mz + iz
                if mxu:
                    m_raw = maj_mxu_lookup(flat)
                else:
                    m_raw = table_lookup(maj_ref, n_maj_chunks, flat)
                ins_w = ((ux >= 0) & (ux <= mx) & (uy >= 0) & (uy <= my)
                         & (uz >= 0) & (uz <= mz))
                m_raw = jnp.where(ins_w, m_raw, 0.0)
                m_di = jnp.maximum(m_raw, 0.0)
                skip_i = jnp.maximum(-m_raw, 1.0)
                bx = jnp.where(wdx >= 0, cfx + skip_i, cfx - skip_i + 1.0)
                by = jnp.where(wdy >= 0, cfy + skip_i, cfy - skip_i + 1.0)
                bz = jnp.where(wdz >= 0, cfz + skip_i, cfz - skip_i + 1.0)
                t_exit = jnp.minimum(jnp.minimum((bx - u0x) * inv_du_x,
                                                 (by - u0y) * inv_du_y),
                                     (bz - u0z) * inv_du_z)
                t_exit = jnp.maximum(t_exit, t_cum + 1e-5)
                end_c = jnp.minimum(t_exit, t_lim)
                dtau = m_di * st_h * jnp.maximum(end_c - t_cum, 0.0)
                hit_c = act & (tau_rem < dtau)
                at_lim = act & ~hit_c & (t_lim <= t_exit + 1e-6)
                t_next = jnp.where(
                    hit_c,
                    t_cum + tau_rem / jnp.maximum(m_di * st_h, 1e-30),
                    end_c)
                S_acc = jnp.where(act, S_acc + m_di * (t_next - t_cum),
                                  S_acc)
                # crossing lanes step a hair past the cell plane so the
                # next lookup reads the next cell (the 1e-6 nudge the
                # one-cell-per-iteration walk applied on advance)
                t_cum = jnp.where(
                    act,
                    jnp.where(hit_c | at_lim, t_next, t_exit + 1e-6),
                    t_cum)
                tau_rem = jnp.where(act & ~hit_c, tau_rem - dtau, tau_rem)
                m_d = jnp.where(hit_c, m_di, m_d)
                coll_w = coll_w | hit_c
                lim_w = lim_w | at_lim
                act = act & ~hit_c & ~at_lim
            coll = walk & coll_w
            reached_lim = walk & lim_w
            p_coll = in_med & coll
            s_coll = is_sh & coll
            maj_h = m_d * st_h
            step = t_cum
            dt_coll = t_cum           # collision-point distance (coll lanes)
            Tm_h = jnp.maximum(jnp.exp(-st_h * S_acc), 1e-30)
            if sigma_gray:
                Tm = (Tm_h,) * 3
                sc_tail = (jnp.ones_like(zf),) * 3
            else:
                Tm = tuple(jnp.exp(-float(st[k]) * S_acc)
                           for k in range(3))
                sc_tail = tuple(Tm[k] / Tm_h for k in range(3))

            # collision point + local density (shared by both modes;
            # un2/un3 drive the stochastic corner pick)
            un0, un1, un2, un3 = _uniform4(seed_a, pix_c, samp, dim)
            dim = dim + _U32(1)
            sx = epx + dt_coll * wdx
            sy = epy + dt_coll * wdy
            sz = epz + dt_coll * wdz
            if ABLATE_CHEAP_DENS:
                dloc = m_d * (0.25 + 0.5 * un2)  # timing probe only
            elif stoch:
                dloc = density_at_1(sx, sy, sz, un2, un3)
            else:
                dloc = density_at(sx, sy, sz)
            # shared null-collision coefficients
            sn = tuple(jnp.maximum((m_d - dloc) * float(st[k]), 0.0)
                       for k in range(3))
            sn_h = jnp.maximum(m_d - dloc, 0.0) * st_h
            pdf_n = Tm_h * jnp.maximum(maj_h, 1e-30)

            # ===== shadow lanes: one ratio-tracking step ==================
            s_tail = is_sh & ~coll
            if not sigma_gray:
                sT0 = jnp.where(s_tail, sT0 * sc_tail[0], sT0)
                sT1 = jnp.where(s_tail, sT1 * sc_tail[1], sT1)
                sT2 = jnp.where(s_tail, sT2 * sc_tail[2], sT2)
                sl0 = jnp.where(s_tail, sl0 * sc_tail[0], sl0)
                sl1 = jnp.where(s_tail, sl1 * sc_tail[1], sl1)
                sl2 = jnp.where(s_tail, sl2 * sc_tail[2], sl2)
                su0 = jnp.where(s_tail, su0 * sc_tail[0], su0)
                su1 = jnp.where(s_tail, su1 * sc_tail[1], su1)
                su2 = jnp.where(s_tail, su2 * sc_tail[2], su2)
            inv_spdf = 1.0 / pdf_n
            sT0 = jnp.where(s_coll, sT0 * Tm[0] * sn[0] * inv_spdf, sT0)
            sT1 = jnp.where(s_coll, sT1 * Tm[1] * sn[1] * inv_spdf, sT1)
            sT2 = jnp.where(s_coll, sT2 * Tm[2] * sn[2] * inv_spdf, sT2)
            sl0 = jnp.where(s_coll,
                            sl0 * Tm[0] * m_d * float(st[0]) * inv_spdf, sl0)
            sl1 = jnp.where(s_coll,
                            sl1 * Tm[1] * m_d * float(st[1]) * inv_spdf, sl1)
            sl2 = jnp.where(s_coll,
                            sl2 * Tm[2] * m_d * float(st[2]) * inv_spdf, sl2)
            su0 = jnp.where(s_coll, su0 * Tm[0] * sn[0] * inv_spdf, su0)
            su1 = jnp.where(s_coll, su1 * Tm[1] * sn[1] * inv_spdf, su1)
            su2 = jnp.where(s_coll, su2 * Tm[2] * sn[2] * inv_spdf, su2)
            # transmittance russian roulette (integrators.cpp:1404)
            denom_rr = jnp.maximum(
                avg3((sl0 + su0, sl1 + su1, sl2 + su2)), 1e-30)
            trm = jnp.maximum(jnp.maximum(sT0, sT1), sT2) / denom_rr
            low = s_coll & (trm < 0.05)
            killed = low & (ub < 0.75)
            sT0 = jnp.where(killed, zf, jnp.where(low, sT0 / 0.25, sT0))
            sT1 = jnp.where(killed, zf, jnp.where(low, sT1 / 0.25, sT1))
            sT2 = jnp.where(killed, zf, jnp.where(low, sT2 / 0.25, sT2))
            sh_t_new = sh_t + step + 1e-6
            sh_t = jnp.where(is_sh, sh_t_new, sh_t)
            s_dead = is_sh & (
                (jnp.maximum(jnp.maximum(sT0, sT1), sT2) == 0)
                | (sh_t_new >= sh_end))
            # fold the finished shadow walk's contribution into L.
            # sh_f is the per-channel scatter-function value at the walk's
            # origin (phase: f_hg replicated == sh_pdf; diffuse surface:
            # albedo/pi * cos); sh_pdf is wi's sampling pdf for the env
            # MIS denominator
            if n_tri:
                sf0, sf1, sf2 = shf0, shf1, shf2
            else:
                sf0 = sf1 = sf2 = sh_pdf
            if has_point:
                okp = s_dead & (mode == 1)
                denom = jnp.maximum(
                    avg3((sl0 * ru0 * pmf, sl1 * ru1 * pmf,
                          sl2 * ru2 * pmf)), 1e-30)
                w = 1.0 / (sh_d2 * denom)
                L0 = jnp.where(okp, L0 + b0 * sT0 * sf0 * float(lI[0]) * w,
                               L0)
                L1 = jnp.where(okp, L1 + b1 * sT1 * sf1 * float(lI[1]) * w,
                               L1)
                L2 = jnp.where(okp, L2 + b2 * sT2 * sf2 * float(lI[2]) * w,
                               L2)
            if has_env:
                oke = s_dead & (mode == 2)
                p_l = pmf * INV_4PI
                denom = jnp.maximum(
                    avg3((sl0 * ru0 * p_l + su0 * ru0 * sh_pdf,
                          sl1 * ru1 * p_l + su1 * ru1 * sh_pdf,
                          sl2 * ru2 * p_l + su2 * ru2 * sh_pdf)),
                    1e-30)
                inv_den = 1.0 / denom
                L0 = jnp.where(oke, L0 + b0 * sT0 * sf0 * float(envL[0])
                               * inv_den, L0)
                L1 = jnp.where(oke, L1 + b1 * sT1 * sf1 * float(envL[1])
                               * inv_den, L1)
                L2 = jnp.where(oke, L2 + b2 * sT2 * sf2 * float(envL[2])
                               * inv_den, L2)
            mode = jnp.where(s_dead, 0, mode)

            # ===== path lanes: one delta-tracking event ===================
            # segment tail: telescoping rescale + advance
            if n_tri:
                # a tail that reaches the next surface BEFORE the box
                # wall is a surface interaction, not an interface skip
                at_surf_m = (in_med & ~coll & reached_lim
                             & (t_surf < wall_rem))
                at_wall = in_med & ~coll & reached_lim & ~at_surf_m
            else:
                at_surf_m = jnp.zeros((sub, 128), bool)
                at_wall = in_med & ~coll & reached_lim
            tail = in_med & ~coll
            if not sigma_gray:
                b0 = jnp.where(tail, b0 * sc_tail[0], b0)
                b1 = jnp.where(tail, b1 * sc_tail[1], b1)
                b2 = jnp.where(tail, b2 * sc_tail[2], b2)
                ru0 = jnp.where(tail, ru0 * sc_tail[0], ru0)
                ru1 = jnp.where(tail, ru1 * sc_tail[1], ru1)
                ru2 = jnp.where(tail, ru2 * sc_tail[2], ru2)
                rl0 = jnp.where(tail, rl0 * sc_tail[0], rl0)
                rl1 = jnp.where(tail, rl1 * sc_tail[1], rl1)
                rl2 = jnp.where(tail, rl2 * sc_tail[2], rl2)
            # the inner walk already nudged each crossing 1e-6 past its
            # cell plane, so the advance applies t_cum verbatim
            adv = tail & ~at_wall & ~at_surf_m
            ox = jnp.where(adv, ox + step * dx, ox)
            oy = jnp.where(adv, oy + step * dy, oy)
            oz = jnp.where(adv, oz + step * dz, oz)
            if n_tri:
                t_surf = jnp.where(adv, t_surf - step, t_surf)

            sa_h = dloc * chan(sa, hero)
            ss_h = dloc * chan(ss, hero)
            maj_safe = jnp.maximum(maj_h, 1e-30)
            p_absorb = sa_h / maj_safe
            p_scatter = ss_h / maj_safe
            is_absorb = p_coll & (ub < p_absorb)
            is_scatter = p_coll & ~is_absorb & (ub < p_absorb + p_scatter)
            is_null = p_coll & ~is_absorb & ~is_scatter
            depth_exceeded = is_scatter & (depth >= max_depth)
            terminated = is_absorb | depth_exceeded
            scat = is_scatter & ~depth_exceeded
            depth = jnp.where(scat, depth + 1, depth)
            alive = alive & ~terminated

            # scatter weights (integrators.cpp:1064-1100)
            pdf_s = jnp.maximum(Tm_h * ss_h, 1e-30)
            sc_s = tuple(Tm[k] * dloc * float(ss[k]) / pdf_s
                         for k in range(3))
            b0 = jnp.where(scat, b0 * sc_s[0], b0)
            b1 = jnp.where(scat, b1 * sc_s[1], b1)
            b2 = jnp.where(scat, b2 * sc_s[2], b2)
            ru0 = jnp.where(scat, ru0 * sc_s[0], ru0)
            ru1 = jnp.where(scat, ru1 * sc_s[1], ru1)
            ru2 = jnp.where(scat, ru2 * sc_s[2], ru2)

            # null-scatter weights (integrators.cpp:1102-1110)
            zero_pdf = is_null & (Tm_h * sn_h <= 0)
            inv_pdf_n = 1.0 / jnp.maximum(Tm_h * sn_h, 1e-30)
            b0 = jnp.where(is_null, b0 * Tm[0] * sn[0] * inv_pdf_n, b0)
            b1 = jnp.where(is_null, b1 * Tm[1] * sn[1] * inv_pdf_n, b1)
            b2 = jnp.where(is_null, b2 * Tm[2] * sn[2] * inv_pdf_n, b2)
            ru0 = jnp.where(is_null, ru0 * Tm[0] * sn[0] * inv_pdf_n, ru0)
            ru1 = jnp.where(is_null, ru1 * Tm[1] * sn[1] * inv_pdf_n, ru1)
            ru2 = jnp.where(is_null, ru2 * Tm[2] * sn[2] * inv_pdf_n, ru2)
            rl0 = jnp.where(is_null,
                            rl0 * Tm[0] * m_d * float(st[0]) * inv_pdf_n,
                            rl0)
            rl1 = jnp.where(is_null,
                            rl1 * Tm[1] * m_d * float(st[1]) * inv_pdf_n,
                            rl1)
            rl2 = jnp.where(is_null,
                            rl2 * Tm[2] * m_d * float(st[2]) * inv_pdf_n,
                            rl2)
            died_null = is_null & (zero_pdf
                                   | (jnp.maximum(jnp.maximum(b0, b1), b2)
                                      == 0))
            alive = alive & ~died_null
            # null lanes advance to the collision point and stay in flight
            nadv = is_null & ~died_null
            ox = jnp.where(nadv, sx, ox)
            oy = jnp.where(nadv, sy, oy)
            oz = jnp.where(nadv, sz, oz)
            if n_tri:
                t_surf = jnp.where(nadv, t_surf - dt_coll, t_surf)

            # ===== surface interactions (teaser scene class) ==============
            # lanes whose flight reached the next triangle: shade it
            # (diffuse with NEE + cosine bounce; smooth dielectric /
            # conductor as delta lobes), wavefront/integrator.cpp:374-432
            # generality for the fused scene class
            wox, woy, woz = -dx, -dy, -dz
            if n_tri:
                at_surf_nm = (alive & ~is_sh & ~stall & ~in_med
                              & (med != 0) & (t_surf < wall_rem)
                              & (t_surf < _BIG * 0.5))
                hit_s = (at_surf_m | at_surf_nm) & (hmat >= 0)
                hx = ox + t_surf * dx
                hy = oy + t_surf * dy
                hz = oz + t_surf * dz
                # shading normal on the incoming side
                nd = hngx * dx + hngy * dy + hngz * dz
                front = nd < 0  # ray hits the geometric-normal side
                nsx = jnp.where(front, hngx, -hngx)
                nsy = jnp.where(front, hngy, -hngy)
                nsz = jnp.where(front, hngz, -hngz)
                kind_l = jnp.full((sub, 128), -1, jnp.int32)
                alb0 = zf
                alb1 = zf
                alb2 = zf
                eta_l = jnp.ones_like(zf)
                rough_l = zf
                for mi_ in range(n_mat):
                    selm = hmat == mi_
                    kind_l = jnp.where(selm, mat_kind[mi_], kind_l)
                    alb0 = jnp.where(selm, float(mat_alb[mi_, 0]), alb0)
                    alb1 = jnp.where(selm, float(mat_alb[mi_, 1]), alb1)
                    alb2 = jnp.where(selm, float(mat_alb[mi_, 2]), alb2)
                    eta_l = jnp.where(selm, max(mat_eta[mi_], 1e-3), eta_l)
                    rough_l = jnp.where(selm, max(mat_rough[mi_], 1e-4),
                                        rough_l)
                # depth cap applies to surface bounces too
                # (integrators.cpp:1060 `if (depth++ == maxDepth) break`)
                s_exceed = hit_s & (depth >= max_depth)
                alive = alive & ~s_exceed
                hit_s = hit_s & ~s_exceed
                depth = jnp.where(hit_s, depth + 1, depth)
                if any_tex:
                    # CHECKER albedo textures (textures.py _eval_level
                    # checker semantics: parity of floor(u us)+floor(v
                    # vs) picks c0/c1) — pure VPU math at the hit uv
                    us_m = jnp.ones_like(zf)
                    vs_m = jnp.ones_like(zf)
                    for mi_ in range(n_mat):
                        if mat_tex_kind[mi_] >= 0:
                            selm = hmat == mi_
                            us_m = jnp.where(selm,
                                             float(mat_tex_uvs[mi_, 0]),
                                             us_m)
                            vs_m = jnp.where(selm,
                                             float(mat_tex_uvs[mi_, 1]),
                                             vs_m)
                    par0 = ((jnp.floor(huv_u * us_m)
                             + jnp.floor(huv_v * vs_m)).astype(jnp.int32)
                            % 2) == 0
                    for mi_ in range(n_mat):
                        if mat_tex_kind[mi_] >= 0:
                            selm = hmat == mi_
                            alb0 = jnp.where(
                                selm, jnp.where(
                                    par0, float(mat_tex_c0[mi_, 0]),
                                    float(mat_tex_c1[mi_, 0])), alb0)
                            alb1 = jnp.where(
                                selm, jnp.where(
                                    par0, float(mat_tex_c0[mi_, 1]),
                                    float(mat_tex_c1[mi_, 1])), alb1)
                            alb2 = jnp.where(
                                selm, jnp.where(
                                    par0, float(mat_tex_c0[mi_, 2]),
                                    float(mat_tex_c1[mi_, 2])), alb2)
                shade_df = hit_s & (kind_l == 0)
                smooth_l = rough_l < 1e-3
                shade_co = hit_s & (kind_l == 1) & smooth_l
                shade_dl = hit_s & (kind_l == 2)
                if any_rough:
                    # Trowbridge-Reitz glossy lanes: rough conductor
                    # (bxdfs.h ConductorBxDF) + CookTorrance (fork,
                    # bxdfs.cpp:78-183) — NEE-capable non-delta lobes
                    shade_cr = hit_s & (kind_l == 1) & ~smooth_l
                    shade_ct = hit_s & (kind_l == 11)
                    glossy = shade_cr | shade_ct
                    # local shading frame + microfacet helpers (all
                    # component-wise; util/scattering.h math)
                    (g1x, g1y, g1z), (g2x, g2y, g2z) = _coord_system(
                        nsx, nsy, nsz)

                    def to_loc(vx, vy, vz):
                        return (vx * g1x + vy * g1y + vz * g1z,
                                vx * g2x + vy * g2y + vz * g2z,
                                vx * nsx + vy * nsy + vz * nsz)

                    def to_wld(lx, ly, lz):
                        return (lx * g1x + ly * g2x + lz * nsx,
                                lx * g1y + ly * g2y + lz * nsy,
                                lx * g1z + ly * g2z + lz * nsz)

                    alpha_l = rough_l

                    def tr_d_z(mz2):
                        # D from cos^2(theta_m); tan2 = (1-c2)/c2
                        c2 = jnp.maximum(mz2, 1e-8)
                        t2 = (1.0 - c2) / c2
                        a2 = alpha_l * alpha_l
                        e = 1.0 + t2 / a2
                        return 1.0 / (np.pi * a2 * c2 * c2 * e * e)

                    def tr_lam(wz):
                        c2 = jnp.clip(wz * wz, 1e-8, 1.0)
                        t2 = (1.0 - c2) / c2
                        return 0.5 * (jnp.sqrt(
                            1.0 + alpha_l * alpha_l * t2) - 1.0)

                    wo_lx, wo_ly, wo_lz = to_loc(wox, woy, woz)
                else:
                    glossy = jnp.zeros((sub, 128), bool)
            else:
                shade_df = jnp.zeros((sub, 128), bool)
                hit_s = shade_df
                hx, hy, hz = sx, sy, sz
                nsx = nsy = nsz = zf

            # -- NEE setup at volume scatters AND diffuse surface hits ----
            # one light sample; the ratio-tracked shadow walk then steps
            # in subsequent iterations (preceded by a triangle-occlusion
            # sweep when the scene has triangles)
            spx = jnp.where(shade_df, hx, sx)
            spy = jnp.where(shade_df, hy, sy)
            spz = jnp.where(shade_df, hz, sz)
            u_sel = uc
            sel_pt = ((u_sel < pmf) if has_env else (u_sel >= -1.0)) \
                if has_point else (u_sel < -1.0)
            # point-light candidate
            plx = spx - float(lp[0])
            ply = spy - float(lp[1])
            plz = spz - float(lp[2])
            dist2 = jnp.maximum(plx * plx + ply * ply + plz * plz, 1e-12)
            dist = jnp.sqrt(dist2)
            inv_dist = 1.0 / dist
            # env candidate (uniform sphere)
            ez = 1.0 - 2.0 * ud
            er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
            ephi = (2.0 * np.pi) * un0
            wix = jnp.where(sel_pt, -plx * inv_dist, er * jnp.cos(ephi))
            wiy = jnp.where(sel_pt, -ply * inv_dist, er * jnp.sin(ephi))
            wiz = jnp.where(sel_pt, -plz * inv_dist, ez)
            cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
            f_hg = _hg_value(cos_wi, g_hg)
            _, t_exit_s, _ = _box_hit(spx, spy, spz, wix, wiy, wiz,
                                      bmin, bmax)
            t_med = jnp.where(sel_pt, jnp.minimum(dist, t_exit_s), t_exit_s)
            nee_vol = scat & (f_hg > 0)
            if n_tri:
                cosn = wix * nsx + wiy * nsy + wiz * nsz
                nee_srf = shade_df & (cosn > 0)
                if any_rough:
                    # glossy NEE: Trowbridge-Reitz f + pdf at the light
                    # sample (bxdfs.h ConductorBxDF::f/PDF, CookTorrance
                    # bxdfs.cpp:127-183)
                    def frd(ci, eta):
                        ci_ = jnp.clip(ci, 0.0, 1.0)
                        s2 = (1.0 - ci_ * ci_) / jnp.maximum(
                            eta * eta, 1e-12)
                        tir = s2 >= 1.0
                        ct_ = jnp.sqrt(jnp.maximum(1.0 - s2, 0.0))
                        rp = (eta * ci_ - ct_) / jnp.maximum(
                            eta * ci_ + ct_, 1e-12)
                        rq = (ci_ - eta * ct_) / jnp.maximum(
                            ci_ + eta * ct_, 1e-12)
                        return jnp.where(tir, 1.0,
                                         0.5 * (rp * rp + rq * rq))

                    nee_glo = glossy & (cosn > 0)
                    wi_lx, wi_ly, wi_lz = to_loc(wix, wiy, wiz)
                    hmx = wo_lx + wi_lx
                    hmy = wo_ly + wi_ly
                    hmz = wo_lz + wi_lz
                    hmx, hmy, hmz = _normalize(hmx, hmy, hmz)
                    hsg = jnp.where(hmz < 0, -1.0, 1.0)
                    hmx, hmy, hmz = hmx * hsg, hmy * hsg, hmz * hsg
                    Dm_n = tr_d_z(hmz * hmz)
                    lam_o = tr_lam(wo_lz)
                    lam_i = tr_lam(wi_lz)
                    G1o = 1.0 / (1.0 + lam_o)
                    G2 = 1.0 / (1.0 + lam_o + lam_i)
                    zo_s = jnp.maximum(jnp.abs(wo_lz), 1e-6)
                    zi_s = jnp.maximum(jnp.abs(wi_lz), 1e-6)
                    pdf_spec_n = G1o * Dm_n / (4.0 * zo_s)
                    c_owm = jnp.abs(wo_lx * hmx + wo_ly * hmy
                                    + wo_lz * hmz)
                    omcw = jnp.clip(1.0 - c_owm, 0.0, 1.0)
                    omcw5 = omcw * omcw * omcw * omcw * omcw
                    spec_c = Dm_n * G2 / (4.0 * zo_s * zi_s)
                    F_ct_n = frd(c_owm, eta_l)
                    pr_ct = frd(jnp.abs(wo_lz), eta_l)
                    # per-channel f at the NEE direction
                    fne0 = jnp.where(
                        shade_ct,
                        spec_c * F_ct_n + alb0 * INV_PI * (1.0 - F_ct_n),
                        spec_c * (alb0 + (1.0 - alb0) * omcw5))
                    fne1 = jnp.where(
                        shade_ct,
                        spec_c * F_ct_n + alb1 * INV_PI * (1.0 - F_ct_n),
                        spec_c * (alb1 + (1.0 - alb1) * omcw5))
                    fne2 = jnp.where(
                        shade_ct,
                        spec_c * F_ct_n + alb2 * INV_PI * (1.0 - F_ct_n),
                        spec_c * (alb2 + (1.0 - alb2) * omcw5))
                    pdf_glo = jnp.where(
                        shade_ct,
                        pr_ct * pdf_spec_n
                        + (1.0 - pr_ct) * jnp.maximum(cosn, 0.0) * INV_PI,
                        pdf_spec_n)
                    nee_srf = nee_srf | nee_glo
                else:
                    nee_glo = jnp.zeros((sub, 128), bool)
                nee_act = nee_vol | nee_srf
                pdf_w = jnp.where(nee_srf, jnp.maximum(cosn, 0.0) * INV_PI,
                                  f_hg)
                if any_rough:
                    pdf_w = jnp.where(nee_glo, pdf_glo, pdf_w)
                # the walk folds with the POST-continuation beta (it
                # already carries the albedo of this bounce), so the NEE
                # value is f_nee / w_continuation = cos/pi for diffuse
                f_srf = INV_PI * cosn
                shf0 = jnp.where(nee_act,
                                 jnp.where(nee_srf, f_srf, f_hg), shf0)
                shf1 = jnp.where(nee_act,
                                 jnp.where(nee_srf, f_srf, f_hg), shf1)
                shf2 = jnp.where(nee_act,
                                 jnp.where(nee_srf, f_srf, f_hg), shf2)
                sh_occ = jnp.where(nee_act, 1, sh_occ)
            else:
                nee_act = nee_vol
                pdf_w = f_hg
            if ABLATE_NO_NEE:
                nee_act = jnp.zeros((sub, 128), bool)
            one = jnp.ones_like(b0)
            mode = jnp.where(nee_act, jnp.where(sel_pt, 1, 2), mode)
            shx = jnp.where(nee_act, wix, shx)
            shy = jnp.where(nee_act, wiy, shy)
            shz = jnp.where(nee_act, wiz, shz)
            sh_t = jnp.where(nee_act, zf, sh_t)
            sh_end = jnp.where(nee_act, t_med, sh_end)
            sh_pdf = jnp.where(nee_act, pdf_w, sh_pdf)
            sh_d2 = jnp.where(nee_act, dist2, sh_d2)
            sT0 = jnp.where(nee_act, one, sT0)
            sT1 = jnp.where(nee_act, one, sT1)
            sT2 = jnp.where(nee_act, one, sT2)
            sl0 = jnp.where(nee_act, one, sl0)
            sl1 = jnp.where(nee_act, one, sl1)
            sl2 = jnp.where(nee_act, one, sl2)
            su0 = jnp.where(nee_act, one, su0)
            su1 = jnp.where(nee_act, one, su1)
            su2 = jnp.where(nee_act, one, su2)

            u_hg2 = _uniform4(seed_a, pix_c, samp, dim)[0]
            dim = dim + _U32(1)
            pwx, pwy, pwz, ppdf = _sample_hg(wox, woy, woz, g_hg, un1,
                                             u_hg2)
            bad_phase = scat & (ppdf <= 0)
            alive = alive & ~bad_phase
            inv_ppdf = 1.0 / jnp.maximum(ppdf, 1e-30)
            rl0 = jnp.where(scat, ru0 * inv_ppdf, rl0)
            rl1 = jnp.where(scat, ru1 * inv_ppdf, rl1)
            rl2 = jnp.where(scat, ru2 * inv_ppdf, rl2)
            ox = jnp.where(scat, sx, ox)
            oy = jnp.where(scat, sy, oy)
            oz = jnp.where(scat, sz, oz)
            dx = jnp.where(scat, pwx, dx)
            dy = jnp.where(scat, pwy, dy)
            dz = jnp.where(scat, pwz, dz)
            # RR due at this lane's next path event (after the NEE fold)
            rr_pend = jnp.where(scat, 1, rr_pend)

            if n_tri:
                # a volume scatter is a non-specular bounce: escape MIS
                # applies again afterwards
                spec_last = jnp.where(scat, 0, spec_last)

                # -- surface bounces --------------------------------------
                # diffuse: cosine-hemisphere continuation (beta *= albedo,
                # the cos/pi cancels; materials.py bsdf_sample semantics)
                (t1x, t1y, t1z), (t2x, t2y, t2z) = _coord_system(
                    nsx, nsy, nsz)
                r_cs = jnp.sqrt(un1)
                phi_cs = (2.0 * np.pi) * u_hg2
                lx = r_cs * jnp.cos(phi_cs)
                ly = r_cs * jnp.sin(phi_cs)
                lz = jnp.sqrt(jnp.maximum(1.0 - un1, 0.0))
                wdfx = lx * t1x + ly * t2x + lz * nsx
                wdfy = lx * t1y + ly * t2y + lz * nsy
                wdfz = lx * t1z + ly * t2z + lz * nsz
                pdf_df = jnp.maximum(lz, 1e-6) * INV_PI
                # conductor: mirror about ns, Schlick F0 tint
                dnd = dx * nsx + dy * nsy + dz * nsz
                wrx = dx - 2.0 * dnd * nsx
                wry = dy - 2.0 * dnd * nsy
                wrz = dz - 2.0 * dnd * nsz
                cos_o = jnp.clip(-dnd, 0.0, 1.0)
                # dielectric: Fresnel reflect/refract about ns
                eta_rel = jnp.where(front, eta_l, 1.0 / eta_l)
                # exact dielectric Fresnel (materials.py semantics)
                sin2_t = jnp.maximum(1.0 - cos_o * cos_o, 0.0) \
                    / jnp.maximum(eta_rel * eta_rel, 1e-12)
                tir = sin2_t >= 1.0
                cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
                r_par = ((eta_rel * cos_o - cos_t)
                         / jnp.maximum(eta_rel * cos_o + cos_t, 1e-12))
                r_per = ((cos_o - eta_rel * cos_t)
                         / jnp.maximum(cos_o + eta_rel * cos_t, 1e-12))
                F_dl = jnp.where(tir, 1.0,
                                 0.5 * (r_par * r_par + r_per * r_per))
                refl_dl = ub < F_dl
                inv_er = 1.0 / jnp.maximum(eta_rel, 1e-12)
                wtx = dx * inv_er + (cos_o * inv_er - cos_t) * nsx
                wty = dy * inv_er + (cos_o * inv_er - cos_t) * nsy
                wtz = dz * inv_er + (cos_o * inv_er - cos_t) * nsz
                wtx, wty, wtz = _normalize(wtx, wty, wtz)
                if any_rough:
                    # Trowbridge-Reitz VNDF sampling (Heitz 2018;
                    # scattering.h Sample_wm) in the local frame
                    u_r0, u_r1, u_r2, _ = _uniform4(seed_a, pix_c, samp,
                                                    dim)
                    dim = dim + _U32(1)
                    whx = alpha_l * wo_lx
                    why = alpha_l * wo_ly
                    whz = wo_lz
                    whx, why, whz = _normalize(whx, why, whz)
                    sgn_h = jnp.where(whz < 0, -1.0, 1.0)
                    whx, why, whz = whx * sgn_h, why * sgn_h, whz * sgn_h
                    tlen = jnp.sqrt(jnp.maximum(whx * whx + why * why,
                                                1e-18))
                    big_z = whz > 0.999999
                    t1hx = jnp.where(big_z, 1.0, -why / tlen)
                    t1hy = jnp.where(big_z, 0.0, whx / tlen)
                    t2hx = -whz * t1hy
                    t2hy = whz * t1hx
                    t2hz = whx * t1hy - why * t1hx
                    r_d = jnp.sqrt(u_r0)
                    ph_d = (2.0 * np.pi) * u_r1
                    px_d = r_d * jnp.cos(ph_d)
                    py_d = r_d * jnp.sin(ph_d)
                    h_d = jnp.sqrt(jnp.maximum(1.0 - px_d * px_d, 0.0))
                    mixz = (1.0 + whz) * 0.5
                    py_d = mixz * py_d + (1.0 - mixz) * h_d
                    pz_d = jnp.sqrt(jnp.maximum(
                        1.0 - px_d * px_d - py_d * py_d, 0.0))
                    nhx = px_d * t1hx + py_d * t2hx + pz_d * whx
                    nhy = px_d * t1hy + py_d * t2hy + pz_d * why
                    nhz = px_d * 0.0 + py_d * t2hz + pz_d * whz
                    wmx = alpha_l * nhx
                    wmy = alpha_l * nhy
                    wmz = jnp.maximum(nhz, 1e-6)
                    wmx, wmy, wmz = _normalize(wmx, wmy, wmz)
                    owm_s = wo_lx * wmx + wo_ly * wmy + wo_lz * wmz
                    rix = 2.0 * owm_s * wmx - wo_lx
                    riy = 2.0 * owm_s * wmy - wo_ly
                    riz = 2.0 * owm_s * wmz - wo_lz
                    # CookTorrance lobe pick: Fresnel(cos_o) chooses the
                    # glossy vs Lambertian lobe (bxdfs.cpp:78-126);
                    # the diffuse branch reuses the cosine sample (lx,
                    # ly, lz) already drawn for shade_df lanes
                    pr_s = frd(jnp.abs(wo_lz), eta_l)
                    take_spec = shade_cr | (shade_ct & (u_r2 < pr_s))
                    wi_glx = jnp.where(take_spec, rix, lx)
                    wi_gly = jnp.where(take_spec, riy, ly)
                    wi_glz = jnp.where(take_spec, riz, lz)
                    ziL = wi_glz
                    # f + pdf at the SAMPLED wi (eval half-vector)
                    hsx = wo_lx + wi_glx
                    hsy = wo_ly + wi_gly
                    hsz = wo_lz + wi_glz
                    hsx, hsy, hsz = _normalize(hsx, hsy, hsz)
                    hsg2 = jnp.where(hsz < 0, -1.0, 1.0)
                    hsx, hsy, hsz = hsx * hsg2, hsy * hsg2, hsz * hsg2
                    Dm_s = tr_d_z(hsz * hsz)
                    lam_i2 = tr_lam(ziL)
                    G2s = 1.0 / (1.0 + lam_o + lam_i2)
                    zi_c = jnp.maximum(jnp.abs(ziL), 1e-6)
                    pdf_spec_s = G1o * Dm_s / (4.0 * zo_s)
                    c_owm_s = jnp.abs(wo_lx * hsx + wo_ly * hsy
                                      + wo_lz * hsz)
                    omcs = jnp.clip(1.0 - c_owm_s, 0.0, 1.0)
                    omcs5 = omcs * omcs * omcs * omcs * omcs
                    spec_s = Dm_s * G2s / (4.0 * zo_s * zi_c)
                    F_ct_s = frd(c_owm_s, eta_l)
                    fg0 = jnp.where(
                        shade_ct,
                        spec_s * F_ct_s + alb0 * INV_PI * (1.0 - F_ct_s),
                        spec_s * (alb0 + (1.0 - alb0) * omcs5))
                    fg1 = jnp.where(
                        shade_ct,
                        spec_s * F_ct_s + alb1 * INV_PI * (1.0 - F_ct_s),
                        spec_s * (alb1 + (1.0 - alb1) * omcs5))
                    fg2 = jnp.where(
                        shade_ct,
                        spec_s * F_ct_s + alb2 * INV_PI * (1.0 - F_ct_s),
                        spec_s * (alb2 + (1.0 - alb2) * omcs5))
                    pdf_gs = jnp.where(
                        shade_ct,
                        pr_s * pdf_spec_s
                        + (1.0 - pr_s) * zi_c * INV_PI,
                        pdf_spec_s)
                    valid_g = (ziL > 1e-6) & (pdf_gs > 1e-12)
                    pdf_gs = jnp.maximum(pdf_gs, 1e-12)
                    inv_pgs = 1.0 / pdf_gs
                    # invalid samples: continuation weight collapses to
                    # TINY so the pending NEE fold (shf = f_nee/w_cont)
                    # still reconstructs the exact product; the lane is
                    # then RR-killed at its next path event (beta ~ 0)
                    TINY_G = 1e-18
                    wg0 = jnp.where(valid_g, fg0 * ziL * inv_pgs, TINY_G)
                    wg1 = jnp.where(valid_g, fg1 * ziL * inv_pgs, TINY_G)
                    wg2 = jnp.where(valid_g, fg2 * ziL * inv_pgs, TINY_G)
                    wi_wx, wi_wy, wi_wz = to_wld(wi_glx, wi_gly, wi_glz)
                    # pending glossy NEE: fold value = f_nee*cos / w_cont
                    shf0 = jnp.where(nee_glo, fne0 * cosn
                                     / jnp.maximum(wg0, 1e-30), shf0)
                    shf1 = jnp.where(nee_glo, fne1 * cosn
                                     / jnp.maximum(wg1, 1e-30), shf1)
                    shf2 = jnp.where(nee_glo, fne2 * cosn
                                     / jnp.maximum(wg2, 1e-30), shf2)
                # select outgoing direction + weights per material kind
                go_refl = shade_co | (shade_dl & refl_dl)
                n_dx = jnp.where(shade_df, wdfx,
                                 jnp.where(go_refl, wrx, wtx))
                n_dy = jnp.where(shade_df, wdfy,
                                 jnp.where(go_refl, wry, wty))
                n_dz = jnp.where(shade_df, wdfz,
                                 jnp.where(go_refl, wrz, wtz))
                if any_rough:
                    n_dx = jnp.where(glossy, wi_wx, n_dx)
                    n_dy = jnp.where(glossy, wi_wy, n_dy)
                    n_dz = jnp.where(glossy, wi_wz, n_dz)
                # beta: diffuse *= albedo; conductor *= Schlick(F0=albedo);
                # dielectric reflect *= 1, transmit *= 1/eta_rel^2
                omc = (1.0 - cos_o)
                omc5 = omc * omc * omc * omc * omc
                fs0 = alb0 + (1.0 - alb0) * omc5
                fs1 = alb1 + (1.0 - alb1) * omc5
                fs2 = alb2 + (1.0 - alb2) * omc5
                trans_sc = inv_er * inv_er
                w_b0 = jnp.where(shade_df, alb0,
                                 jnp.where(shade_co, fs0,
                                           jnp.where(refl_dl, 1.0,
                                                     trans_sc)))
                w_b1 = jnp.where(shade_df, alb1,
                                 jnp.where(shade_co, fs1,
                                           jnp.where(refl_dl, 1.0,
                                                     trans_sc)))
                w_b2 = jnp.where(shade_df, alb2,
                                 jnp.where(shade_co, fs2,
                                           jnp.where(refl_dl, 1.0,
                                                     trans_sc)))
                if any_rough:
                    w_b0 = jnp.where(glossy, wg0, w_b0)
                    w_b1 = jnp.where(glossy, wg1, w_b1)
                    w_b2 = jnp.where(glossy, wg2, w_b2)
                b0 = jnp.where(hit_s, b0 * w_b0, b0)
                b1 = jnp.where(hit_s, b1 * w_b1, b1)
                b2 = jnp.where(hit_s, b2 * w_b2, b2)
                # MIS bookkeeping: diffuse/glossy rl = ru/pdf; delta
                # lobes rl = ru
                inv_pdf_df = 1.0 / pdf_df
                if any_rough:
                    inv_pdf_df = jnp.where(glossy, inv_pgs, inv_pdf_df)
                    nondelta = shade_df | glossy
                else:
                    nondelta = shade_df
                rl0 = jnp.where(hit_s, jnp.where(nondelta,
                                                 ru0 * inv_pdf_df, ru0),
                                rl0)
                rl1 = jnp.where(hit_s, jnp.where(nondelta,
                                                 ru1 * inv_pdf_df, ru1),
                                rl1)
                rl2 = jnp.where(hit_s, jnp.where(nondelta,
                                                 ru2 * inv_pdf_df, ru2),
                                rl2)
                # medium switch on dielectric transmission (per-tri
                # med_in/med_out interface ids)
                went_t = shade_dl & ~refl_dl
                med = jnp.where(went_t, jnp.where(front, hmi, hmo), med)
                # move to the hit point, offset off the surface along the
                # outgoing side to dodge self-intersection
                out_sgn = jnp.where(
                    (n_dx * nsx + n_dy * nsy + n_dz * nsz) >= 0, 1.0, -1.0)
                ox = jnp.where(hit_s, hx + out_sgn * 1e-4 * nsx, ox)
                oy = jnp.where(hit_s, hy + out_sgn * 1e-4 * nsy, oy)
                oz = jnp.where(hit_s, hz + out_sgn * 1e-4 * nsz, oz)
                dx = jnp.where(hit_s, n_dx, dx)
                dy = jnp.where(hit_s, n_dy, dy)
                dz = jnp.where(hit_s, n_dz, dz)
                spec_last = jnp.where(hit_s,
                                      jnp.where(nondelta, 0, 1), spec_last)
                rr_pend = jnp.where(hit_s, 1, rr_pend)
                t_surf = jnp.where(hit_s | scat, _BIG, t_surf)
                needs_i = jnp.where(hit_s | scat, 1, needs_i)

            # -- escape / interface for non-medium + wall-reached lanes ---
            if n_tri:
                no_surf = t_surf >= _BIG * 0.5
                flew = ((alive & ~is_sh & ~stall & ~scat & ~coll & ~in_med
                         & ~hit_s & (wall_rem < t_surf)) | at_wall)
                escaped = (alive & ~is_sh & ~stall & ~in_med & ~scat
                           & ~coll & ~hit & ~hit_s & no_surf)
            else:
                flew = (alive & ~is_sh & ~scat & ~coll & ~in_med) | at_wall
                escaped = alive & ~is_sh & ~in_med & ~scat & ~coll & ~hit
            if has_env:
                first = depth == 0
                if n_tri:
                    # delta bounces have no light-sampling competitor
                    # (pbrt specularBounce flag)
                    first = first | (spec_last != 0)
                ru_avg = jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
                no_mis = escaped & first
                L0 = jnp.where(no_mis, L0 + b0 * float(envL[0]) / ru_avg,
                               L0)
                L1 = jnp.where(no_mis, L1 + b1 * float(envL[1]) / ru_avg,
                               L1)
                L2 = jnp.where(no_mis, L2 + b2 * float(envL[2]) / ru_avg,
                               L2)
                with_mis = escaped & ~first
                p_esc = pmf * INV_4PI
                den = jnp.maximum(avg3((ru0 + rl0 * p_esc,
                                        ru1 + rl1 * p_esc,
                                        ru2 + rl2 * p_esc)), 1e-30)
                L0 = jnp.where(with_mis, L0 + b0 * float(envL[0]) / den, L0)
                L1 = jnp.where(with_mis, L1 + b1 * float(envL[1]) / den, L1)
                L2 = jnp.where(with_mis, L2 + b2 * float(envL[2]) / den, L2)
            alive = alive & ~escaped

            iface = (alive & flew & hit) | (alive & at_wall)
            med = jnp.where(iface, jnp.where(entering & ~at_wall, 0, -1),
                            med)
            ox = jnp.where(iface, ox + (t_wall + 1e-4) * dx, ox)
            oy = jnp.where(iface, oy + (t_wall + 1e-4) * dy, oy)
            oz = jnp.where(iface, oz + (t_wall + 1e-4) * dz, oz)
            if n_tri:
                t_surf = jnp.where(iface, t_surf - (t_wall + 1e-4), t_surf)

            # -- commit + regenerate --------------------------------------
            # a lane mid-shadow-walk is still mid-path: it cannot die here
            # (every death condition above is gated on path events)
            died = ~alive & (samp < spp)
            bad = ~(jnp.isfinite(L0) & jnp.isfinite(L1) & jnp.isfinite(L2))
            L0 = jnp.where(bad, zf, L0)
            L1 = jnp.where(bad, zf, L1)
            L2 = jnp.where(bad, zf, L2)
            if mixed:
                q_cur = slot_of(samp)
                accs = [a0, a1, a2] + acc_x
                Ls = (L0, L1, L2)
                for qq in range(ppl):
                    selq = died & (q_cur == qq)
                    for k in range(3):
                        accs[qq * 3 + k] = jnp.where(
                            selq, accs[qq * 3 + k] + Ls[k],
                            accs[qq * 3 + k])
                a0, a1, a2 = accs[0], accs[1], accs[2]
                acc_x = accs[3:]
            else:
                a0 = jnp.where(died, a0 + L0, a0)
                a1 = jnp.where(died, a1 + L1, a1)
                a2 = jnp.where(died, a2 + L2, a2)
            has_budget = died & (samp + _U32(1) < spp)
            samp = jnp.where(died, samp + _U32(1), samp)
            if mixed:
                pix_new = mix_pix(slot_of(samp))
                pix_c = jnp.where(has_budget, pix_new, pix_c)
            o_n, d_n, hero_n, _ = start_path(pix_c, samp,
                                             jnp.zeros_like(dim))
            dim = jnp.where(has_budget, _U32(1), dim)
            ox = jnp.where(has_budget, o_n[0], ox)
            oy = jnp.where(has_budget, o_n[1], oy)
            oz = jnp.where(has_budget, o_n[2], oz)
            dx = jnp.where(has_budget, d_n[0], dx)
            dy = jnp.where(has_budget, d_n[1], dy)
            dz = jnp.where(has_budget, d_n[2], dz)
            hero = jnp.where(has_budget, hero_n, hero)
            b0 = jnp.where(has_budget, one, b0)
            b1 = jnp.where(has_budget, one, b1)
            b2 = jnp.where(has_budget, one, b2)
            ru0 = jnp.where(has_budget, one, ru0)
            ru1 = jnp.where(has_budget, one, ru1)
            ru2 = jnp.where(has_budget, one, ru2)
            rl0 = jnp.where(has_budget, one, rl0)
            rl1 = jnp.where(has_budget, one, rl1)
            rl2 = jnp.where(has_budget, one, rl2)
            L0 = jnp.where(has_budget, zf, L0)
            L1 = jnp.where(has_budget, zf, L1)
            L2 = jnp.where(has_budget, zf, L2)
            depth = jnp.where(has_budget, 0, depth)
            med = jnp.where(has_budget, -1, med)
            mode = jnp.where(has_budget, 0, mode)
            rr_pend = jnp.where(has_budget, 0, rr_pend)
            if n_tri:
                t_surf = jnp.where(has_budget, _BIG, t_surf)
                needs_i = jnp.where(has_budget, 1, needs_i)
                sh_occ = jnp.where(has_budget, 0, sh_occ)
                spec_last = jnp.where(has_budget, 0, spec_last)
            alive = alive | has_budget

            return (samp, dim, alive.astype(jnp.int32), ox, oy, oz,
                    dx, dy, dz, b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
                    L0, L1, L2, depth, hero, med, a0, a1, a2, it + 1, mode,
                    sT0, sT1, sT2, sl0, sl1, sl2, su0, su1, su2,
                    shx, shy, shz, sh_t, sh_end, sh_pdf, sh_d2, rr_pend,
                    pix_c) + tuple(acc_x) \
                + ((t_surf, hngx, hngy, hngz, hmat, hmi, hmo, needs_i,
                    sh_occ, spec_last, shf0, shf1, shf2)
                   if n_tri else ()) \
                + ((huv_u, huv_v) if (n_tri and any_tex) else ()) \
                + ((jnp.where(alive_i != 0, busy + 1.0, busy),)
                   if PROBE_ITERS else ())

        final = jax.lax.while_loop(cond, body, carry)
        a0, a1, a2 = final[24], final[25], final[26]
        # max_iters safety-cap exit: commit the partial L of any lane
        # still in flight (its NEE/escape adds so far) instead of
        # dropping its whole sample
        inflight = (final[2] != 0) & (final[0] < spp)
        Lf0, Lf1, Lf2 = final[18], final[19], final[20]
        okf = inflight & jnp.isfinite(Lf0) & jnp.isfinite(Lf1) \
            & jnp.isfinite(Lf2)
        scale = c["imaging_ratio"] / spp
        if mixed:
            accs = [a0, a1, a2] + list(final[47:47 + 3 * (ppl - 1)])
            qf = zi
            for t in range(1, ppl):
                qf = qf + (final[0] >= _U32(t * sppq)).astype(jnp.int32)
            Lfs = (Lf0, Lf1, Lf2)
            for qq in range(ppl):
                selq = okf & (qf == qq)
                for k in range(3):
                    accs[qq * 3 + k] = accs[qq * 3 + k] + jnp.where(
                        selq, Lfs[k], 0.0)
            for qq in range(ppl):
                for k in range(3):
                    out_ref[qq * 3 + k] = accs[qq * 3 + k] * scale
        else:
            a0 = a0 + jnp.where(okf, Lf0, 0.0)
            a1 = a1 + jnp.where(okf, Lf1, 0.0)
            a2 = a2 + jnp.where(okf, Lf2, 0.0)
            out_ref[0] = a0 * scale
            out_ref[1] = a1 * scale
            if PROBE_ITERS:
                # perf diagnostic: blue = block iteration count, green =
                # per-lane busy iterations (utilization = green/blue)
                busy_f = final[47] - (lane_i * 128
                                      + lane_j).astype(jnp.float32)
                out_ref[1] = busy_f
                out_ref[2] = busy_f * 0.0 + final[27].astype(jnp.float32)
            else:
                out_ref[2] = a2 * scale

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


_KERNEL_CACHE = {}


# spp per grid-kernel launch on real TPU (long launches trip the relay's
# TPU watchdog; chunking also bounds per-launch wall time for progressive
# display). Measured ~0.3s per 16-spp launch at 128^2 with most of it
# fixed dispatch overhead — 64 spp/launch amortizes it and stays far
# under the ~60s watchdog. Big grids walk slower per spp: smaller chunk.
GRID_SPP_CHUNK = 64
# big grids (MXU gather): after the stuck-lane fix + i8 gather, a 64-spp
# 128^2 launch runs ~0.2s on chip — the ~0.08s relay dispatch floor now
# DOMINATES small launches, so chunk as much spp per launch as the
# watchdog comfortably allows
GRID_SPP_CHUNK_BIG = 128

def pick_tile_w(nx, ny, nvox):
    """Choose the tile width for a grid kernel launch: narrowest
    power-of-two tile that divides the film (big grids), else TILE_W."""
    prefs = ((TILE_W_BIG, 16, TILE_W) if nvox > 32768 else (TILE_W,))
    for tw in prefs:
        ty = 8 * 128 // tw
        if nx % tw == 0 and ny % ty == 0:
            return tw
    return TILE_W


def tile_permutation(nx, ny, sub, tile_w=TILE_W):
    """slot -> pixel-id map of the tiled lane layout, and its inverse
    (pixel-id -> slot), as int32 numpy arrays of length nx*ny."""
    npix = nx * ny
    LB = sub * 128
    s = np.arange(npix, dtype=np.int64)
    b, l = s // LB, s % LB
    tpr = nx // tile_w
    ty = LB // tile_w
    pid = (((b // tpr) * ty + (l // tile_w)) * nx
           + (b % tpr) * tile_w + (l % tile_w)).astype(np.int32)
    inv = np.empty(npix, np.int32)
    inv[pid] = np.arange(npix, dtype=np.int32)
    return pid, inv


def _get_callable(c, spp, interpret):
    """Memoized jitted megakernel render fn for (constants, spp)."""
    key = (tuple(sorted((k, v) for k, v in c.items())), spp, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn
    npix = c["nx"] * c["ny"]
    is_grid = c["kind"] == "grid"
    sub = 64
    while npix % (sub * 128) != 0:
        sub //= 2
    # grid kernels, two lane layouts:
    # - MXU-gather grids ("mxu" pack): gather cost is window-independent,
    #   so use the MIXED slot layout (raster lanes, MIX_PPL pixel-strip/
    #   spp-chunk slots per lane) — the utilization fix.
    # - sweep-mode grids: tiled blocks (sub=8), so the sweep windows
    #   track the tile frustum, not a full-width strip.
    # tiled/tile_w/mixed are pure functions of (c, spp): cache key safe.
    tiled = False
    mixed = False
    tile_w = TILE_W
    if is_grid:
        mixed = (c.get("dens_pack", "bf16") == "mxu"
                 and (npix & (npix - 1)) == 0
                 and (c["nx"] & (c["nx"] - 1)) == 0
                 and npix % (8 * 128) == 0
                 and spp % MIX_PPL == 0 and spp >= MIX_PPL
                 and not PROBE_ITERS)
        if mixed:
            sub = 8
        else:
            tile_w = pick_tile_w(c["nx"], c["ny"],
                                 int(np.prod(c["grid_res"])))
            ty = 8 * 128 // tile_w
            tiled = (c["nx"] % tile_w == 0 and c["ny"] % ty == 0
                     and npix % (8 * 128) == 0)
            if tiled:
                sub = 8
    n_blocks = npix // (sub * 128)
    if is_grid:
        kernel = _make_grid_kernel(c, spp, sub, tiled, tile_w, mixed)
        nvox = int(np.prod(c["grid_res"]))
        nmaj = int(np.prod(c["maj_res"]))
        if c.get("dens_pack", "bf16") == "mxu":
            _cm = -(-nvox // 128)
            dens_spec = pl.BlockSpec((128, -(-_cm // 8) * 8),
                                     lambda b: (0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            vals_per_word = 4 if c.get("dens_pack", "bf16") == "i8" else 2
            dens_spec = pl.BlockSpec(
                (-(-nvox // (128 * vals_per_word)), 128),
                lambda b: (0, 0), memory_space=pltpu.VMEM)
        if c.get("dens_pack", "bf16") == "mxu":
            _cj = -(-nmaj // 128)
            maj_spec = pl.BlockSpec((128, -(-_cj // 8) * 8),
                                    lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
        else:
            maj_spec = pl.BlockSpec((-(-nmaj // 256), 128),
                                    lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
        n_out = 3 * (MIX_PPL if mixed else 1)
        n_tri_k = int(c.get("n_tri", 0))
        mesh_k = n_tri_k > MAX_TRIS_GRID
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    dens_spec,
                    maj_spec]
        if mesh_k:
            # mesh-class: VMEM triangle table + SMEM chunk bounds
            T_pad = -(-n_tri_k // MESH_CHUNK) * MESH_CHUNK
            in_specs.append(pl.BlockSpec((T_pad, 16), lambda b: (0, 0),
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        elif n_tri_k:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        call = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((n_out, npix // 128, 128),
                                           jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((n_out, sub, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

        inv_perm = (jnp.asarray(tile_permutation(c["nx"], c["ny"], sub,
                                                 tile_w)[1])
                    if tiled else None)
        if mixed:
            # pixel -> serving-lane inverse maps, one per slot (the
            # in-kernel mix_pix formula mirrored in numpy)
            g = np.arange(npix, dtype=np.int64)
            nxs = int(np.log2(c["nx"]))
            inv_q = []
            for q in range(MIX_PPL):
                base_q = (g + q * (npix // MIX_PPL)) & (npix - 1)
                y = base_q >> nxs
                x = base_q & (c["nx"] - 1)
                xm = (c["nx"] - 1 - x) if (q % 2 == 1) else x
                p_q = (y << nxs) | xm
                inv = np.empty(npix, np.int32)
                inv[p_q] = np.arange(npix, dtype=np.int32)
                inv_q.append(jnp.asarray(inv))

        @jax.jit
        def fn(seed, dens, maj, tris=None, base=0):
            # tiled/mixed layouts require base == 0 (single-chip launches)
            sm = jnp.stack([seed.astype(jnp.uint32),
                            jnp.asarray(base, jnp.uint32)]).reshape(1, 2)
            if mesh_k:
                out = call(sm, dens, maj, tris[0], tris[1])
            elif n_tri_k:
                out = call(sm, dens, maj, tris)
            else:
                out = call(sm, dens, maj)
            if mixed:
                acc = 0
                for q in range(MIX_PPL):
                    fq = jnp.transpose(out[q * 3:(q + 1) * 3],
                                       (1, 2, 0)).reshape(npix, 3)
                    acc = acc + fq[inv_q[q]]
                return acc.reshape(c["ny"], c["nx"], 3)
            flat = jnp.transpose(out, (1, 2, 0)).reshape(npix, 3)
            if tiled:
                flat = flat[inv_perm]
            return flat.reshape(c["ny"], c["nx"], 3)
    else:
        kernel = _make_kernel(c, spp, sub)
        call = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((3, npix // 128, 128),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((3, sub, 128), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

        @jax.jit
        def fn(seed, base=0):
            sm = jnp.stack([seed.astype(jnp.uint32),
                            jnp.asarray(base, jnp.uint32)]).reshape(1, 2)
            out = call(sm)
            return jnp.transpose(out, (1, 2, 0)).reshape(c["ny"], c["nx"],
                                                         3)

    _KERNEL_CACHE[key] = fn
    return fn


_PACK_CACHE = {}


def render_homog_pallas(scene, camera, film, spp, cfg, seed,
                        interpret=False):
    """Render via the megakernel (homogeneous OR single-grid scene class).
    Caller must have verified support via extract_constants (raises
    ValueError otherwise). Returns (ny, nx, 3)."""
    c = extract_constants(scene, camera, film, cfg)
    if c is None:
        raise ValueError("scene not supported by the megakernel")
    npix = c["nx"] * c["ny"]
    if npix % 128 != 0:
        raise ValueError("npix must be a multiple of 128")
    if c["kind"] == "grid":
        gm = scene.media.grids[0]
        # identity-keyed pack cache: equal-time wave loops call this with
        # the SAME scene object every wave — re-packing + re-uploading the
        # grid tables through the relay would dominate short launches
        # (entries hold a strong scene ref so `is` identity stays valid)
        hit = _PACK_CACHE.get(c["dens_pack"])
        if hit is not None and hit[0] is scene:
            dens, maj, tris = hit[1]
        else:
            if c["dens_pack"] == "mxu":
                dens = jnp.asarray(pack_i8_transposed(
                    np.asarray(gm.density), np.asarray(gm.majorant),
                    c["grid_res"], c["maj_res"]))
            elif c["dens_pack"] == "i8":
                dens = jnp.asarray(pack_i8_quads(
                    np.asarray(gm.density), np.asarray(gm.majorant),
                    c["grid_res"], c["maj_res"]))
            else:
                dens = jnp.asarray(pack_bf16_pairs(np.asarray(gm.density),
                                                   "nearest"))
            if c["dens_pack"] == "mxu":
                # fold the empty-space skip field into the majorant
                # table (negative entries = -Chebyshev distance); the
                # kernel decodes max(v,0)/max(-v,1) unconditionally, so
                # non-encoded tables (other pack modes, sharded path)
                # stay correct with skip 1
                maj = jnp.asarray(pack_bf16_transposed(
                    encode_empty_skip(np.asarray(gm.majorant)), "up"))
            else:
                maj = jnp.asarray(pack_bf16_pairs(np.asarray(gm.majorant),
                                                  "up"))
            n_tri_p = int(c.get("n_tri", 0))
            if n_tri_p > MAX_TRIS_GRID:
                tab_np, tb_np = pack_tri_chunks(scene)
                tris = (jnp.asarray(tab_np), jnp.asarray(tb_np))
            elif n_tri_p:
                tris = jnp.asarray(pack_tri_table(scene))
            else:
                tris = None
            _PACK_CACHE[c["dens_pack"]] = (scene, (dens, maj, tris))
        # chunk spp across kernel launches: the fused DDA kernel's runtime
        # scales with spp and long launches can trip the TPU watchdog
        nvox = int(np.prod(c["grid_res"]))
        per_launch = GRID_SPP_CHUNK if nvox <= 32768 else GRID_SPP_CHUNK_BIG
        chunk = int(spp) if interpret else min(int(spp), per_launch)
        imgs = []
        done = 0
        while done < int(spp):
            n = min(chunk, int(spp) - done)
            fn = _get_callable(c, n, bool(interpret))
            imgs.append(fn(jnp.asarray(seed, jnp.uint32)
                           + jnp.uint32(done * 65537), dens, maj,
                           tris) * n)
            done += n
        return sum(imgs) / int(spp)
    fn = _get_callable(c, int(spp), bool(interpret))
    return fn(jnp.asarray(seed, jnp.uint32))


def supports(scene, camera, film, cfg):
    c = extract_constants(scene, camera, film, cfg)
    if c is None:
        return False
    return (c["nx"] * c["ny"]) % 128 == 0
