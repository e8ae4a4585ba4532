"""Participating media (analog of ``src/pbrt/media.h``).

Two families:

- ``HomogeneousMedia``: M stacked homogeneous media (media.h
  HomogeneousMedium:221; majorant = sigma_a + sigma_s, one segment —
  HomogeneousMajorantIterator:84).
- ``GridMedium``: dense density grid with a max-pooled *majorant supergrid*
  walked by a 3D-DDA (media.h GridMedium:284, MajorantGrid:109,
  DDAMajorantIterator:140-218; grid majorant resolution 16^3 per
  media.cpp:252, NanoVDB-imported grids use 64^3 per media.cpp:574).

The TPU-native majorant iteration is a per-lane *segment iterator*
(``SegIter`` + ``seg_init``/``seg_next``): every wavefront lane carries its
DDA cursor (voxel, t_next, t_delta) and the integrator's collision loops
interleave "advance to next majorant segment" and "sample tentative
collision" steps in lockstep. Homogeneous lanes degenerate to a single
segment. Medium ids: [0, n_homog) homogeneous | n_homog + i for grids[i].
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct as struct
import jax.numpy as jnp
import numpy as np


class MediumProperties(NamedTuple):
    sigma_a: jnp.ndarray  # (R,3)
    sigma_s: jnp.ndarray  # (R,3)
    Le: jnp.ndarray  # (R,3) emission
    g: jnp.ndarray  # (R,) HG asymmetry


def _trilerp(grid, b_min, b_max, res, p):
    """Trilinear lookup of `grid` ((nx,ny,nz) or (nx,ny,nz,C)) at world p;
    zero outside [b_min, b_max] (media.h GridMedium::Density semantics)."""
    nx, ny, nz = res
    resf = jnp.asarray([nx, ny, nz], jnp.float32)
    g = (p - b_min) / (b_max - b_min) * resf - 0.5
    g0 = jnp.floor(g)
    w = g - g0
    i0 = jnp.clip(g0.astype(jnp.int32), 0, resf.astype(jnp.int32) - 1)
    i1 = jnp.clip(i0 + 1, 0, resf.astype(jnp.int32) - 1)
    has_c = grid.ndim == 4

    def at(ix, iy, iz):
        return grid[ix, iy, iz]

    def lerp(a, b, t):
        t = t[..., None] if has_c else t
        return a * (1 - t) + b * t

    d00 = lerp(at(i0[..., 0], i0[..., 1], i0[..., 2]),
               at(i1[..., 0], i0[..., 1], i0[..., 2]), w[..., 0])
    d10 = lerp(at(i0[..., 0], i1[..., 1], i0[..., 2]),
               at(i1[..., 0], i1[..., 1], i0[..., 2]), w[..., 0])
    d01 = lerp(at(i0[..., 0], i0[..., 1], i1[..., 2]),
               at(i1[..., 0], i0[..., 1], i1[..., 2]), w[..., 0])
    d11 = lerp(at(i0[..., 0], i1[..., 1], i1[..., 2]),
               at(i1[..., 0], i1[..., 1], i1[..., 2]), w[..., 0])
    d0 = lerp(d00, d10, w[..., 1])
    d1 = lerp(d01, d11, w[..., 1])
    out = lerp(d0, d1, w[..., 2])
    inside = jnp.all((p >= b_min) & (p <= b_max), axis=-1)
    return jnp.where(inside[..., None] if has_c else inside, out, 0.0)


@struct.dataclass
class GridMedium:
    """Axis-aligned dense density grid. density scales sigma_a/sigma_s."""

    density: jnp.ndarray  # (nx, ny, nz) nonneg
    sigma_a: jnp.ndarray  # (3,) base absorption
    sigma_s: jnp.ndarray  # (3,) base scattering
    Le: jnp.ndarray  # (3,) emission (scaled by density where Le_scale)
    g: jnp.ndarray  # () HG asymmetry
    b_min: jnp.ndarray  # (3,) world bounds
    b_max: jnp.ndarray  # (3,)
    majorant: jnp.ndarray  # (mx, my, mz) max density per supervoxel
    res: tuple = struct.field(pytree_node=False)  # (nx, ny, nz)
    maj_res: tuple = struct.field(pytree_node=False)  # (mx, my, mz)

    @staticmethod
    def make(density, sigma_a, sigma_s, b_min, b_max, g=0.0, Le=None,
             maj_res=16, majorant_scale=1.0):
        """density: numpy (nx,ny,nz). Builds the max-pooled majorant grid
        host-side (conservative: pool includes a 1-voxel halo so trilinear
        interpolation never exceeds the supervoxel majorant)."""
        d = np.asarray(density, np.float32)
        nx, ny, nz = d.shape
        if isinstance(maj_res, int):
            maj_res = (min(maj_res, nx), min(maj_res, ny), min(maj_res, nz))
        mx, my, mz = maj_res
        # conservative max-pool with halo
        maj = np.zeros((mx, my, mz), np.float32)
        xs = np.linspace(0, nx, mx + 1).astype(int)
        ys = np.linspace(0, ny, my + 1).astype(int)
        zs = np.linspace(0, nz, mz + 1).astype(int)
        for i in range(mx):
            x0, x1 = max(xs[i] - 1, 0), min(xs[i + 1] + 1, nx)
            for j in range(my):
                y0, y1 = max(ys[j] - 1, 0), min(ys[j + 1] + 1, ny)
                for k in range(mz):
                    z0, z1 = max(zs[k] - 1, 0), min(zs[k + 1] + 1, nz)
                    maj[i, j, k] = d[x0:x1, y0:y1, z0:z1].max()
        maj *= majorant_scale
        return GridMedium(
            jnp.asarray(d), jnp.asarray(sigma_a, jnp.float32),
            jnp.asarray(sigma_s, jnp.float32),
            jnp.zeros(3, jnp.float32) if Le is None else jnp.asarray(Le, jnp.float32),
            jnp.asarray(g, jnp.float32),
            jnp.asarray(b_min, jnp.float32), jnp.asarray(b_max, jnp.float32),
            jnp.asarray(maj), (nx, ny, nz), (mx, my, mz),
        )

    def density_at(self, p):
        """Trilinear density lookup at world p (media.h GridMedium::Density)."""
        return _trilerp(self.density, self.b_min, self.b_max, self.res, p)


@struct.dataclass
class RGBGridMedium:
    """Dense per-voxel RGB coefficient grids (media.h RGBGridMedium:392):
    sigma_a/sigma_s stored as full RGB per voxel (not density x base color);
    optional RGB emission grid with LeScale. The majorant supergrid holds
    the per-channel max of sigma_t over each supervoxel (media.h
    MajorantGrid over RGB maxima)."""

    sigma_a_grid: jnp.ndarray  # (nx,ny,nz,3)
    sigma_s_grid: jnp.ndarray  # (nx,ny,nz,3)
    Le_grid: jnp.ndarray  # (nx,ny,nz,3) or (1,1,1,3) zeros
    Le_scale: jnp.ndarray  # ()
    g: jnp.ndarray  # ()
    b_min: jnp.ndarray  # (3,)
    b_max: jnp.ndarray  # (3,)
    majorant: jnp.ndarray  # (mx,my,mz,3) per-channel sigma_t max
    res: tuple = struct.field(pytree_node=False)
    maj_res: tuple = struct.field(pytree_node=False)

    @staticmethod
    def make(sigma_a, sigma_s, b_min, b_max, Le=None, Le_scale=1.0, g=0.0,
             maj_res=16, majorant_scale=1.0):
        """sigma_a/sigma_s: numpy (nx,ny,nz,3) RGB coefficient grids."""
        sa = np.asarray(sigma_a, np.float32)
        ss = np.asarray(sigma_s, np.float32)
        assert sa.ndim == 4 and sa.shape[-1] == 3, sa.shape
        nx, ny, nz = sa.shape[:3]
        st = sa + ss
        if isinstance(maj_res, int):
            maj_res = (min(maj_res, nx), min(maj_res, ny), min(maj_res, nz))
        mx, my, mz = maj_res
        maj = np.zeros((mx, my, mz, 3), np.float32)
        xs = np.linspace(0, nx, mx + 1).astype(int)
        ys = np.linspace(0, ny, my + 1).astype(int)
        zs = np.linspace(0, nz, mz + 1).astype(int)
        for i in range(mx):
            x0, x1 = max(xs[i] - 1, 0), min(xs[i + 1] + 1, nx)
            for j in range(my):
                y0, y1 = max(ys[j] - 1, 0), min(ys[j + 1] + 1, ny)
                for k in range(mz):
                    z0, z1 = max(zs[k] - 1, 0), min(zs[k + 1] + 1, nz)
                    maj[i, j, k] = st[x0:x1, y0:y1, z0:z1].max((0, 1, 2))
        maj *= majorant_scale
        le = (np.zeros((1, 1, 1, 3), np.float32) if Le is None
              else np.asarray(Le, np.float32))
        return RGBGridMedium(
            jnp.asarray(sa), jnp.asarray(ss), jnp.asarray(le),
            jnp.asarray(Le_scale, jnp.float32), jnp.asarray(g, jnp.float32),
            jnp.asarray(b_min, jnp.float32), jnp.asarray(b_max, jnp.float32),
            jnp.asarray(maj), (nx, ny, nz), (mx, my, mz),
        )

    def sigma_at(self, p):
        """(sigma_a, sigma_s) RGB at world p."""
        sa = _trilerp(self.sigma_a_grid, self.b_min, self.b_max, self.res, p)
        ss = _trilerp(self.sigma_s_grid, self.b_min, self.b_max, self.res, p)
        return sa, ss

    def le_at(self, p):
        if self.Le_grid.shape[0] == 1:
            return jnp.zeros(p.shape[:-1] + (3,))
        return self.Le_scale * _trilerp(self.Le_grid, self.b_min, self.b_max,
                                        self.res, p)


@struct.dataclass
class CloudMedium:
    """Procedural cumulus cloud (media.h CloudMedium:470-583): fBm Perlin
    density with optional wispiness domain warp, altitude shaping, density
    clamped to [0,1]; constant majorant = sigma_a + sigma_s over the bounds
    (HomogeneousMajorantIterator semantics)."""

    sigma_a: jnp.ndarray  # (3,)
    sigma_s: jnp.ndarray  # (3,)
    g: jnp.ndarray  # ()
    b_min: jnp.ndarray  # (3,)
    b_max: jnp.ndarray  # (3,)
    density: jnp.ndarray  # () overall density scale
    wispiness: jnp.ndarray  # ()
    frequency: jnp.ndarray  # ()

    @staticmethod
    def make(sigma_a=(1, 1, 1), sigma_s=(1, 1, 1), g=0.0,
             p0=(0, 0, 0), p1=(1, 1, 1), density=1.0, wispiness=1.0,
             frequency=5.0):
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return CloudMedium(f32(sigma_a), f32(sigma_s), f32(g), f32(p0),
                           f32(p1), f32(density), f32(wispiness),
                           f32(frequency))

    def density_at(self, p):
        from ..utils.noise import perlin

        pp = self.frequency * p
        # wispiness: perturb the lookup point with two octaves of vector
        # noise (the role of DNoise at media.h:545-552), built from three
        # decorrelated Perlin channels
        vomega = 0.05 * self.wispiness
        vlam = 10.0
        for _ in range(2):
            dn = jnp.stack([
                perlin(vlam * pp + jnp.asarray([31.7, 0.0, 0.0])),
                perlin(vlam * pp + jnp.asarray([0.0, 57.3, 0.0])),
                perlin(vlam * pp + jnp.asarray([0.0, 0.0, 91.1])),
            ], -1)
            pp = pp + vomega * dn
            vomega = vomega * 0.5
            vlam = vlam * 1.99
        # 5-octave fBm (media.h:559-565)
        d = jnp.zeros(p.shape[:-1])
        omega, lam = 0.5, 1.0
        for _ in range(5):
            d = d + omega * perlin(lam * pp)
            omega *= 0.5
            lam *= 1.99
        # altitude shaping (media.h:567-570)
        d = jnp.clip((1.0 - p[..., 1]) * 4.5 * self.density * d, 0.0, 1.0)
        d = d + 2.0 * jnp.maximum(0.0, 0.5 - p[..., 1])
        inside = jnp.all((p >= self.b_min) & (p <= self.b_max), -1)
        return jnp.where(inside, jnp.clip(d, 0.0, 1.0), 0.0)

    def majorant_rgb(self):
        return self.sigma_a + self.sigma_s  # density <= 1

    def sigma_at(self, p):
        d = self.density_at(p)[..., None]
        return d * self.sigma_a, d * self.sigma_s


@struct.dataclass
class EarthMedium:
    """The fork's planet-scale medium (media.h EarthMedium:755-966):
    exponential-falloff atmosphere around a sphere plus a binary cloud
    shell whose outer radius comes from an equal-area heightmap; constant
    majorant over the bounds."""

    sigma_a_atm: jnp.ndarray  # (3,) (pre-scaled by scale_atmosphere)
    sigma_s_atm: jnp.ndarray
    sigma_a_cloud: jnp.ndarray  # (pre-scaled by scale_cloud)
    sigma_s_cloud: jnp.ndarray
    g: jnp.ndarray
    b_min: jnp.ndarray  # (3,)
    b_max: jnp.ndarray
    center: jnp.ndarray  # (3,)
    inner_r_atm: jnp.ndarray  # ()
    inner_r_cloud: jnp.ndarray
    outer_r_atm: jnp.ndarray
    outer_r_cloud: jnp.ndarray
    decay: jnp.ndarray  # h: atmosphere scale height
    majorant_scale: jnp.ndarray
    density_offset: jnp.ndarray
    rotation_y: jnp.ndarray  # radians (heightmap longitude shift)
    heightmap: jnp.ndarray  # (H,W) grayscale in [0,1]

    @staticmethod
    def make(sigma_a_atm=(1, 1, 1), sigma_s_atm=(1, 1, 1),
             sigma_a_cloud=(0, 0, 0), sigma_s_cloud=(0, 0, 0), g=0.0,
             p0=(-2, -2, -2), p1=(2, 2, 2), center=(0, 0, 0),
             inner_r_atm=1.0, inner_r_cloud=1.0, outer_r_atm=1.0,
             outer_r_cloud=1.0, decay=1.0, majorant_scale=1.0,
             density_offset=0.0, rotation_y=0.0, heightmap=None,
             scale_atm=1.0, scale_cloud=1.0):
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        hm = (np.zeros((1, 1), np.float32) if heightmap is None
              else np.asarray(heightmap, np.float32))
        return EarthMedium(
            f32(sigma_a_atm) * scale_atm, f32(sigma_s_atm) * scale_atm,
            f32(sigma_a_cloud) * scale_cloud, f32(sigma_s_cloud) * scale_cloud,
            f32(g), f32(p0), f32(p1), f32(center), f32(inner_r_atm),
            f32(inner_r_cloud), f32(outer_r_atm), f32(outer_r_cloud),
            f32(decay), f32(majorant_scale), f32(density_offset),
            f32(np.radians(rotation_y)), jnp.asarray(hm))

    def _exp_density(self, p):
        """exp(-(altitude)/h) + densityOffset (media.h:861-866)."""
        from ..utils.vecmath import distance

        dist = distance(p, self.center) - self.inner_r_atm
        dist = jnp.clip(dist, 0.0, self.outer_r_atm)
        return jnp.exp(-dist / jnp.maximum(self.decay, 1e-9)) + self.density_offset

    def _cloud_height(self, v):
        """Shell outer radius along direction v (media.h GetHeight:935-939;
        equal-area UV with the reference's longitude-roll convention)."""
        from ..utils.vecmath import equal_area_sphere_to_square, normalize

        sq = equal_area_sphere_to_square(normalize(v))
        u0 = sq[..., 0] / jnp.pi
        u0 = u0 - jnp.floor(u0)
        v1 = (sq[..., 1] + self.rotation_y) / (2.0 * jnp.pi)
        v1 = v1 - jnp.floor(v1)
        # reference swaps (u, v) before the lookup
        H, W = self.heightmap.shape
        ix = jnp.clip((v1 * W).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip((u0 * H).astype(jnp.int32), 0, H - 1)
        hval = self.heightmap[iy, ix]
        return self.inner_r_cloud + (self.outer_r_cloud - self.inner_r_cloud) * hval

    def sigma_at(self, p):
        from ..utils.vecmath import length

        ed = self._exp_density(p)[..., None]
        shifted = p - self.center
        in_cloud = (length(shifted) <= self._cloud_height(shifted))[..., None]
        inside = jnp.all((p >= self.b_min) & (p <= self.b_max), -1)[..., None]
        sa = ed * self.sigma_a_atm + jnp.where(in_cloud, self.sigma_a_cloud, 0.0)
        ss = ed * self.sigma_s_atm + jnp.where(in_cloud, self.sigma_s_cloud, 0.0)
        return jnp.where(inside, sa, 0.0), jnp.where(inside, ss, 0.0)

    def majorant_rgb(self):
        """(media.h:852-855) atmosphere * (1 + densityOffset) + cloud."""
        return ((self.sigma_a_atm + self.sigma_s_atm) * (1.0 + self.density_offset)
                + self.sigma_a_cloud + self.sigma_s_cloud) * self.majorant_scale


@struct.dataclass
class Media:
    """All media in a scene: a homogeneous block + static tuples of grids
    and procedural media (cloud/earth)."""

    h_sigma_a: jnp.ndarray  # (Mh,3)
    h_sigma_s: jnp.ndarray  # (Mh,3)
    h_Le: jnp.ndarray  # (Mh,3)
    h_g: jnp.ndarray  # (Mh,)
    grids: tuple  # tuple[GridMedium]
    procedurals: tuple = ()  # tuple[CloudMedium | EarthMedium]

    @staticmethod
    def make(homogeneous=None, grids=(), procedurals=()):
        """homogeneous: list of dicts {sigma_a, sigma_s, [Le], [g]}."""
        h = list(homogeneous or [])
        if h:
            sa = jnp.asarray([m["sigma_a"] for m in h], jnp.float32)
            ss = jnp.asarray([m["sigma_s"] for m in h], jnp.float32)
            le = jnp.asarray([m.get("Le", (0, 0, 0)) for m in h], jnp.float32)
            g = jnp.asarray([m.get("g", 0.0) for m in h], jnp.float32)
        else:
            sa = ss = le = jnp.zeros((0, 3), jnp.float32)
            g = jnp.zeros((0,), jnp.float32)
        return Media(sa, ss, le, g, tuple(grids), tuple(procedurals))

    @property
    def n_homog(self):
        return self.h_sigma_a.shape[0]

    @property
    def base_procedural(self):
        return self.n_homog + len(self.grids)

    def is_homogeneous(self, medium_id):
        """Fork's Medium::IsHomogeneous (media.h:1016)."""
        return (medium_id >= 0) & (medium_id < self.n_homog)

    # -- point properties ---------------------------------------------------
    def sample_point(self, medium_id, p, lam=None) -> MediumProperties:
        """Gather medium properties at p; medium_id < 0 -> vacuum.

        lam: optional (R,N) sampled wavelengths — spectral (N=4) mode uplifts
        the RGB coefficient tables to spectra (RGBUnboundedSpectrum role)."""
        shape3 = medium_id.shape + (3,)
        if self.n_homog > 0:
            mid = jnp.clip(medium_id, 0, self.n_homog - 1)
            is_h = self.is_homogeneous(medium_id)[..., None]
            sigma_a = jnp.where(is_h, self.h_sigma_a[mid], 0.0)
            sigma_s = jnp.where(is_h, self.h_sigma_s[mid], 0.0)
            Le = jnp.where(is_h, self.h_Le[mid], 0.0)
            g = jnp.where(is_h[..., 0], self.h_g[mid], 0.0)
        else:
            sigma_a = jnp.zeros(shape3)
            sigma_s = jnp.zeros(shape3)
            Le = jnp.zeros(shape3)
            g = jnp.zeros(medium_id.shape)
        for i, gm in enumerate(self.grids):
            sel = medium_id == self.n_homog + i
            if isinstance(gm, RGBGridMedium):
                sa_g, ss_g = gm.sigma_at(p)
                sigma_a = jnp.where(sel[..., None], sa_g, sigma_a)
                sigma_s = jnp.where(sel[..., None], ss_g, sigma_s)
                Le = jnp.where(sel[..., None], gm.le_at(p), Le)
                g = jnp.where(sel, gm.g, g)
                continue
            dens = gm.density_at(p)
            sigma_a = jnp.where(sel[..., None], dens[..., None] * gm.sigma_a, sigma_a)
            sigma_s = jnp.where(sel[..., None], dens[..., None] * gm.sigma_s, sigma_s)
            Le = jnp.where(sel[..., None], gm.Le, Le)
            g = jnp.where(sel, gm.g, g)
        for j, pm in enumerate(self.procedurals):
            sel = medium_id == self.base_procedural + j
            sa_p, ss_p = pm.sigma_at(p)
            sigma_a = jnp.where(sel[..., None], sa_p, sigma_a)
            sigma_s = jnp.where(sel[..., None], ss_p, sigma_s)
            g = jnp.where(sel, pm.g, g)
        if lam is not None:
            from ..utils.spectrum import uplift_unbounded

            sigma_a = uplift_unbounded(sigma_a, lam)
            sigma_s = uplift_unbounded(sigma_s, lam)
            Le = uplift_unbounded(Le, lam)
        return MediumProperties(sigma_a, sigma_s, Le, g)


# ---------------------------------------------------------------------------
# Per-lane majorant segment iterator (DDAMajorantIterator, vectorized)
# ---------------------------------------------------------------------------


class SegIter(NamedTuple):
    """Per-lane majorant-segment cursor for the collision loops."""

    t_seg_start: jnp.ndarray  # (R,)
    t_seg_end: jnp.ndarray  # (R,)
    sigma_maj: jnp.ndarray  # (R,3) of current segment
    voxel: jnp.ndarray  # (R,3) int32 DDA voxel (grid lanes)
    t_next: jnp.ndarray  # (R,3) next axis crossings
    t_delta: jnp.ndarray  # (R,3)
    step: jnp.ndarray  # (R,3) int32 +-1
    t_exit: jnp.ndarray  # (R,) medium exit along ray
    done: jnp.ndarray  # (R,) iterator exhausted


def _up(rgb, lam):
    """RGB -> spectral-at-lam uplift when lam is given (N=4 mode)."""
    if lam is None:
        return rgb
    from ..utils.spectrum import uplift_unbounded

    return uplift_unbounded(rgb, lam)


def seg_init(media: Media, medium_id, o, d, t_max, active, lam=None) -> SegIter:
    """Initialize the per-lane segment iterator over [0, t_max].

    Homogeneous lanes: one segment covering the whole range. Grid lanes:
    clip to grid bounds, set up DDA over the majorant supergrid; first
    segment is the first supervoxel crossing. lam: optional (R,N) sampled
    wavelengths — sigma_maj is uplifted to spectral samples.
    """
    R = o.shape[:-1]
    nchan = 3 if lam is None else lam.shape[-1]
    zero = jnp.zeros_like(t_max)
    is_h = media.is_homogeneous(medium_id)
    if media.n_homog > 0:
        mid = jnp.clip(medium_id, 0, media.n_homog - 1)
        sigma_maj = jnp.where(
            is_h[..., None],
            _up(media.h_sigma_a[mid] + media.h_sigma_s[mid], lam), 0.0)
    else:
        sigma_maj = jnp.zeros(R + (nchan,))
    n_known = media.n_homog + len(media.grids) + len(media.procedurals)
    it = SegIter(
        t_seg_start=zero,
        t_seg_end=jnp.where(is_h, t_max, zero),
        sigma_maj=sigma_maj,
        voxel=jnp.zeros(R + (3,), jnp.int32),
        t_next=jnp.zeros(R + (3,)) + jnp.inf,
        t_delta=jnp.zeros(R + (3,)) + jnp.inf,
        step=jnp.zeros(R + (3,), jnp.int32),
        t_exit=jnp.where(is_h, t_max, zero),
        done=jnp.zeros(R, bool) | ~active,
    )
    done = ~active | (medium_id < 0) | (medium_id >= n_known)
    for i, gm in enumerate(media.grids):
        sel = active & (medium_id == media.n_homog + i)
        mx, my, mz = gm.maj_res
        mres = jnp.asarray([mx, my, mz], jnp.float32)
        # clip ray to grid bounds
        inv_d = 1.0 / d
        t_lo = (gm.b_min - o) * inv_d
        t_hi = (gm.b_max - o) * inv_d
        t0 = jnp.maximum(jnp.nanmax(jnp.minimum(t_lo, t_hi), -1), 0.0)
        t1 = jnp.minimum(jnp.nanmin(jnp.maximum(t_lo, t_hi), -1), t_max)
        miss = t0 >= t1
        # DDA set-up in supergrid index space
        ext = gm.b_max - gm.b_min
        p0 = o + (t0 + 1e-6)[..., None] * d  # nudge inside
        gpos = (p0 - gm.b_min) / ext * mres
        vox = jnp.clip(gpos.astype(jnp.int32), 0, jnp.asarray([mx - 1, my - 1, mz - 1]))
        d_idx = d / ext * mres  # velocity in index space
        step = jnp.where(d_idx >= 0, 1, -1).astype(jnp.int32)
        next_bound = vox + (step > 0).astype(jnp.int32)
        safe_inv = 1.0 / jnp.where(jnp.abs(d_idx) < 1e-20,
                                   jnp.where(d_idx >= 0, 1e-20, -1e-20), d_idx)
        t_next = t0[..., None] + (next_bound.astype(jnp.float32) - gpos) * safe_inv
        t_next = jnp.where(jnp.abs(d_idx) < 1e-20, jnp.inf, t_next)
        t_delta = jnp.abs(safe_inv)
        seg_end = jnp.minimum(jnp.min(t_next, -1), t1)
        if isinstance(gm, RGBGridMedium):
            smaj = _up(gm.majorant[vox[..., 0], vox[..., 1], vox[..., 2]],
                       lam)
        else:
            maj_dens = gm.majorant[vox[..., 0], vox[..., 1], vox[..., 2]]
            smaj = maj_dens[..., None] * _up(gm.sigma_a + gm.sigma_s, lam)
        it = it._replace(
            t_seg_start=jnp.where(sel, t0, it.t_seg_start),
            t_seg_end=jnp.where(sel, jnp.where(miss, t0, seg_end), it.t_seg_end),
            sigma_maj=jnp.where(sel[..., None], smaj, it.sigma_maj),
            voxel=jnp.where(sel[..., None], vox, it.voxel),
            t_next=jnp.where(sel[..., None], t_next, it.t_next),
            t_delta=jnp.where(sel[..., None], t_delta, it.t_delta),
            step=jnp.where(sel[..., None], step, it.step),
            t_exit=jnp.where(sel, t1, it.t_exit),
        )
        done = done | (sel & miss)
    for j, pm in enumerate(media.procedurals):
        sel = active & (medium_id == media.base_procedural + j)
        inv_d = 1.0 / d
        t_lo = (pm.b_min - o) * inv_d
        t_hi = (pm.b_max - o) * inv_d
        t0 = jnp.maximum(jnp.nanmax(jnp.minimum(t_lo, t_hi), -1), 0.0)
        t1 = jnp.minimum(jnp.nanmin(jnp.maximum(t_lo, t_hi), -1), t_max)
        miss = t0 >= t1
        smaj = jnp.broadcast_to(_up(pm.majorant_rgb(), lam),
                                it.sigma_maj.shape)
        it = it._replace(
            t_seg_start=jnp.where(sel, t0, it.t_seg_start),
            t_seg_end=jnp.where(sel, jnp.where(miss, t0, t1), it.t_seg_end),
            sigma_maj=jnp.where(sel[..., None], smaj, it.sigma_maj),
            t_exit=jnp.where(sel, t1, it.t_exit),
        )
        done = done | (sel & miss)
    return it._replace(done=done)


def seg_next(media: Media, medium_id, it: SegIter, want, lam=None) -> SegIter:
    """Advance lanes in `want` (and not exhausted) to their next segment."""
    want = want & ~it.done
    # homogeneous + procedural lanes: single segment -> exhausted
    one_seg = media.is_homogeneous(medium_id) | (
        medium_id >= media.base_procedural)
    done = it.done | (want & one_seg)
    out = it._replace(done=done)
    for i, gm in enumerate(media.grids):
        sel = (medium_id == media.n_homog + i) & want
        mx, my, mz = gm.maj_res
        # step along the axis with the smallest t_next
        axis = jnp.argmin(it.t_next, -1)
        one_hot = jnp.arange(3) == axis[..., None]
        vox = it.voxel + jnp.where(one_hot, it.step, 0)
        t_next = it.t_next + jnp.where(one_hot, it.t_delta, 0.0)
        t_start = it.t_seg_end
        out_of_grid = (
            (vox[..., 0] < 0) | (vox[..., 0] >= mx)
            | (vox[..., 1] < 0) | (vox[..., 1] >= my)
            | (vox[..., 2] < 0) | (vox[..., 2] >= mz)
            | (t_start >= it.t_exit - 1e-7)
        )
        vox_c = jnp.clip(vox, 0, jnp.asarray([mx - 1, my - 1, mz - 1]))
        seg_end = jnp.minimum(jnp.min(t_next, -1), it.t_exit)
        if isinstance(gm, RGBGridMedium):
            smaj = _up(gm.majorant[vox_c[..., 0], vox_c[..., 1],
                                   vox_c[..., 2]], lam)
        else:
            maj_dens = gm.majorant[vox_c[..., 0], vox_c[..., 1],
                                   vox_c[..., 2]]
            smaj = maj_dens[..., None] * _up(gm.sigma_a + gm.sigma_s, lam)
        out = out._replace(
            t_seg_start=jnp.where(sel, t_start, out.t_seg_start),
            t_seg_end=jnp.where(sel, seg_end, out.t_seg_end),
            sigma_maj=jnp.where(sel[..., None], smaj, out.sigma_maj),
            voxel=jnp.where(sel[..., None], vox_c, out.voxel),
            t_next=jnp.where(sel[..., None], t_next, out.t_next),
            done=jnp.where(sel, out_of_grid, out.done),
        )
    return out


# -- backwards-compatible alias used by early tests --------------------------


class HomogeneousMedia(Media):
    """Deprecated constructor shim: HomogeneousMedia.make(sigma_a, sigma_s)."""

    @staticmethod
    def make(sigma_a, sigma_s, Le=None, g=None):  # type: ignore[override]
        sa = np.atleast_2d(np.asarray(sigma_a, np.float32))
        ss = np.atleast_2d(np.asarray(sigma_s, np.float32))
        m = sa.shape[0]
        le = np.zeros((m, 3), np.float32) if Le is None else np.atleast_2d(np.asarray(Le, np.float32))
        gg = np.zeros((m,), np.float32) if g is None else np.atleast_1d(np.asarray(g, np.float32))
        return Media.make([
            dict(sigma_a=sa[i], sigma_s=ss[i], Le=le[i], g=float(gg[i]))
            for i in range(m)
        ])
