"""Spatial-directional guiding field (TPU OpenPGL-Field replacement).

The reference consumes OpenPGL's Field: an adaptive spatial kd-tree whose
leaves hold parallax-aware vMF mixtures + VSP statistics, trained per wave
from path-segment samples (SURVEY.md §2.4, guidedvolpathvspgintegrator.cpp:
111-248). The TPU-native design replaces the kd-tree with a *uniform voxel
grid over the scene bounds* (S^3 cells, gather-addressable in O(1) with no
pointer chasing — the standard trade for SIMT/SIMD guiding) and keeps:

- separate surface and volume fields (Field's surface/volume distinction);
- per-cell K-lobe vMF mixture trained by incremental weighted EM
  (vmf.em_update);
- per-cell irradiance/fluence moments and *volume scatter probability*
  statistics with contribution and variance criteria (the fork's
  SetVarianceBasedVSP, used for secondary-ray VSP guiding);
- per-lobe mean distances for parallax-aware re-aiming at query time;
- train/frozen modes (loading a stored field disables training,
  guidedvolpathvspgintegrator.cpp:117-131) via plain orbax/npz of this
  pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.math import INV_4PI
from ...utils.vecmath import normalize
from . import vmf


@struct.dataclass
class FieldHalf:
    """One half (surface or volume) of the guiding field."""

    weights: jnp.ndarray  # (C,K)
    mu: jnp.ndarray  # (C,K,3)
    kappa: jnp.ndarray  # (C,K)
    stats_w: jnp.ndarray  # (C,K) EM sufficient statistics
    stats_s: jnp.ndarray  # (C,K,3)
    stats_dist: jnp.ndarray  # (C,K) weighted distance sums (parallax)
    # VSP statistics (fork: variance-based VSP, per cell):
    vsp_c_vol: jnp.ndarray  # (C,) sum of volume-scatter contributions
    vsp_c_surf: jnp.ndarray  # (C,) sum of surface contributions
    vsp_c2_vol: jnp.ndarray  # (C,) second moments
    vsp_c2_surf: jnp.ndarray  # (C,)
    vsp_n: jnp.ndarray  # (C,) sample counts
    flux: jnp.ndarray  # (C,3) RGB fluence/irradiance accumulator
    flux_w: jnp.ndarray  # (C,)
    # directional VSP: per-lobe contribution moments, responsibility-
    # weighted (the distribution-level VolumeScatterProbability(wi) of the
    # fork's OpenPGL branch; guiding.h:564-574)
    vsp_lobe_vol: jnp.ndarray = None  # (C,K)
    vsp_lobe_surf: jnp.ndarray = None  # (C,K)


@struct.dataclass
class GuidingField:
    b_min: jnp.ndarray  # (3,)
    b_max: jnp.ndarray  # (3,)
    surface: FieldHalf
    volume: FieldHalf
    iteration: jnp.ndarray  # () int32 training iterations done
    res: int = struct.field(pytree_node=False)  # cells per axis
    n_lobes: int = struct.field(pytree_node=False)
    # -- adaptive two-level addressing (OpenPGL's sample-density-adaptive
    #    kd-tree, SURVEY §2.4, re-designed gather-friendly): a coarse res^3
    #    grid whose dense cells are split into 2^3 children; leaves live in
    #    flat (L, ...) arrays addressed through an indirection table.
    #    n_extra == 0 -> plain uniform grid (r1 behavior, zero overhead).
    leaf_of: jnp.ndarray = None  # (C,) int32 coarse cell -> leaf
    refined: jnp.ndarray = None  # (C,) bool
    child_base: jnp.ndarray = None  # (C,) int32 first of the 8 children
    n_leaves: jnp.ndarray = None  # () int32 allocated leaves
    leaf_center: jnp.ndarray = None  # (L,3) leaf centers (parallax re-aim)
    n_extra: int = struct.field(pytree_node=False, default=0)

    # ---------------------------------------------------------------
    @staticmethod
    def make(b_min, b_max, res=16, n_lobes=8, n_extra=0):
        C = res**3
        L = C + int(n_extra)
        K = n_lobes
        # init lobes: directions on a sphere via fibonacci spiral
        i = np.arange(K)
        golden = (1 + 5**0.5) / 2
        z = 1 - 2 * (i + 0.5) / K
        r = np.sqrt(np.maximum(0, 1 - z * z))
        phi = 2 * np.pi * i / golden
        dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)

        def half():
            return FieldHalf(
                weights=jnp.full((L, K), 1.0 / K),
                mu=jnp.tile(jnp.asarray(dirs)[None], (L, 1, 1)),
                kappa=jnp.full((L, K), 1.0),
                stats_w=jnp.zeros((L, K)),
                stats_s=jnp.zeros((L, K, 3)),
                stats_dist=jnp.zeros((L, K)),
                vsp_c_vol=jnp.zeros((L,)),
                vsp_c_surf=jnp.zeros((L,)),
                vsp_c2_vol=jnp.zeros((L,)),
                vsp_c2_surf=jnp.zeros((L,)),
                vsp_n=jnp.zeros((L,)),
                flux=jnp.zeros((L, 3)),
                flux_w=jnp.zeros((L,)),
                vsp_lobe_vol=jnp.zeros((L, K)),
                vsp_lobe_surf=jnp.zeros((L, K)),
            )

        bmin = np.asarray(b_min, np.float32)
        bmax = np.asarray(b_max, np.float32)
        ii = np.arange(C)
        idx = np.stack([ii // (res * res), (ii // res) % res, ii % res],
                       -1).astype(np.float32) + 0.5
        centers = bmin + idx / res * (bmax - bmin)
        leaf_center = np.zeros((L, 3), np.float32)
        leaf_center[:C] = centers
        return GuidingField(
            jnp.asarray(bmin), jnp.asarray(bmax),
            half(), half(), jnp.int32(0), int(res), int(n_lobes),
            leaf_of=jnp.arange(C, dtype=jnp.int32),
            refined=jnp.zeros((C,), bool),
            child_base=jnp.zeros((C,), jnp.int32),
            n_leaves=jnp.int32(C),
            leaf_center=jnp.asarray(leaf_center),
            n_extra=int(n_extra),
        )

    # ---------------------------------------------------------------
    def cell_id(self, p):
        """(..., 3) world position -> flat LEAF index (...)."""
        g = (p - self.b_min) / (self.b_max - self.b_min)
        gi = jnp.clip(g * self.res, 0.0, self.res - 1e-4)
        i = gi.astype(jnp.int32)
        c = (i[..., 0] * self.res + i[..., 1]) * self.res + i[..., 2]
        if self.n_extra == 0 or self.leaf_of is None:
            return c
        frac = gi - i.astype(jnp.float32)
        octant = ((frac[..., 0] >= 0.5).astype(jnp.int32) * 4
                  + (frac[..., 1] >= 0.5).astype(jnp.int32) * 2
                  + (frac[..., 2] >= 0.5).astype(jnp.int32))
        return jnp.where(self.refined[c], self.child_base[c] + octant,
                         self.leaf_of[c])

    @property
    def trained(self):
        """Field usable once at least one training iteration ran."""
        return self.iteration > 0


class CellDistribution(NamedTuple):
    """Per-lane directional sampling distribution gathered from the field
    (the SurfaceSamplingDistribution / VolumeSamplingDistribution analog;
    products already applied)."""

    weights: jnp.ndarray  # (R,K)
    mu: jnp.ndarray  # (R,K,3)
    kappa: jnp.ndarray  # (R,K)
    valid: jnp.ndarray  # (R,) field cell had data
    cell: jnp.ndarray  # (R,) cell id (GetId analog)
    vsp: jnp.ndarray  # (R,) cell volume-scatter-probability estimate
    flux: jnp.ndarray  # (R,3) cell mean radiance (radiance-cache analog)
    vsp_lobe_vol: jnp.ndarray = None  # (R,K) directional VSP moments
    vsp_lobe_surf: jnp.ndarray = None  # (R,K)


def _gather_half(field: GuidingField, half: FieldHalf, p, vsp_variance=True):
    cid = field.cell_id(p)
    w = half.weights[cid]
    mu = half.mu[cid]
    kap = half.kappa[cid]
    tot = jnp.sum(half.stats_w[cid], -1)
    valid = tot > 8.0  # enough mass to be trustworthy
    # parallax re-aim: point each lobe from the cell centroid's mean target
    # to the query position (OpenPGL parallax-aware VMM)
    dist = half.stats_dist[cid] / jnp.maximum(half.stats_w[cid], 1e-12)
    has_dist = dist > 1e-6
    cell_center = _cell_center(field, cid)
    target = cell_center[..., None, :] + mu * dist[..., None]
    mu_re = normalize(target - p[..., None, :])
    mu = jnp.where((has_dist & valid[..., None])[..., None], mu_re, mu)

    # VSP estimate (contribution or variance criterion,
    # guidedvolpathvspgintegrator.cpp vspcriterion)
    n = jnp.maximum(half.vsp_n[cid], 1.0)
    c_vol = half.vsp_c_vol[cid] / n
    c_surf = half.vsp_c_surf[cid] / n
    if vsp_variance:
        v_vol = jnp.maximum(half.vsp_c2_vol[cid] / n - c_vol**2, 0.0)
        v_surf = jnp.maximum(half.vsp_c2_surf[cid] / n - c_surf**2, 0.0)
        num = c_vol * c_vol + v_vol
        den = num + c_surf * c_surf + v_surf
    else:
        num = c_vol
        den = c_vol + c_surf
    vsp = jnp.where(den > 0, num / jnp.maximum(den, 1e-20), -1.0)
    vsp = jnp.where(half.vsp_n[cid] > 8.0, vsp, -1.0)

    flux = half.flux[cid] / jnp.maximum(half.flux_w[cid], 1e-12)[..., None]
    lv = None if half.vsp_lobe_vol is None else half.vsp_lobe_vol[cid]
    ls_ = None if half.vsp_lobe_surf is None else half.vsp_lobe_surf[cid]
    return CellDistribution(w, mu, kap, valid, cid, vsp, flux, lv, ls_)


def _cell_center(field: GuidingField, cid):
    if field.n_extra > 0 and field.leaf_center is not None:
        return field.leaf_center[cid]
    res = field.res
    iz = cid % res
    iy = (cid // res) % res
    ix = cid // (res * res)
    idx = jnp.stack([ix, iy, iz], -1).astype(jnp.float32) + 0.5
    return field.b_min + idx / res * (field.b_max - field.b_min)


def surface_distribution(field: GuidingField, p, ns, apply_cosine=True):
    """SurfaceSamplingDistribution::Init + ApplyCosineProduct
    (guiding.h:83-109: cosine product only for opaque surfaces)."""
    d = _gather_half(field, field.surface, p)
    if apply_cosine:
        w, mu, kap = vmf.product_with_vmf(
            d.weights, d.mu, d.kappa, ns, jnp.full(ns.shape[:-1], vmf.COSINE_KAPPA)
        )
        return d._replace(weights=w, mu=mu, kappa=kap)
    return d


def volume_distribution(field: GuidingField, p, wo, g, apply_hg=True):
    """VolumeSamplingDistribution::Init + ApplySingleLobeHenyeyGreenstein
    Product (guiding.h:383-398)."""
    d = _gather_half(field, field.volume, p)
    if apply_hg:
        mu_h, kap_h = vmf.hg_lobe(wo, g)
        w, mu, kap = vmf.product_with_vmf(d.weights, d.mu, d.kappa, mu_h, kap_h)
        # only apply where anisotropic
        aniso = (jnp.abs(g) > 1e-3)[..., None]
        w = jnp.where(aniso, w, d.weights)
        mu = jnp.where(aniso[..., None], mu, d.mu)
        kap = jnp.where(aniso, kap, d.kappa)
        return d._replace(weights=w, mu=mu, kappa=kap)
    return d


def dist_sample(d: CellDistribution, u_sel, u2):
    """Sample wi from the gathered distribution; (wi, pdf)."""
    return vmf.mixture_sample(d.weights, d.mu, d.kappa, u_sel, u2)


def dist_pdf(d: CellDistribution, wi):
    return vmf.mixture_pdf(wi, d.weights, d.mu, d.kappa)


def dist_vsp_directional(d: CellDistribution, wi):
    """Directional VolumeScatterProbability(wi) (guiding.h:564-574): blend
    the per-lobe contribution moments by the mixture posterior at wi; falls
    back to the cell-level estimate where the lobes carry too little
    mass."""
    if d.vsp_lobe_vol is None:
        return d.vsp
    resp = d.weights * vmf.vmf_pdf(wi[..., None, :], d.mu, d.kappa)
    resp = resp / jnp.maximum(jnp.sum(resp, -1, keepdims=True), 1e-20)
    num = jnp.sum(resp * d.vsp_lobe_vol, -1)
    den = num + jnp.sum(resp * d.vsp_lobe_surf, -1)
    mass = jnp.sum(d.vsp_lobe_vol + d.vsp_lobe_surf, -1)
    vdir = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-20), -1.0)
    return jnp.where((mass > 8.0) & (vdir >= 0.0), vdir, d.vsp)


def incoming_radiance_pdf(field: GuidingField, half_name, p, wi):
    """IncomingRadiancePDF: pdf of the *unproduct* field distribution
    (used as the RIS target's radiance term, guiding.h:169-257)."""
    half = field.surface if half_name == "surface" else field.volume
    d = _gather_half(field, half, p)
    pdf = vmf.mixture_pdf(wi, d.weights, d.mu, d.kappa)
    return jnp.where(d.valid, pdf, INV_4PI)


# ---------------------------------------------------------------------------
# Training (Field::Update analog)
# ---------------------------------------------------------------------------


class TrainBatch(NamedTuple):
    """Flattened training samples (the SampleStorage analog)."""

    pos: jnp.ndarray  # (N,3)
    wi: jnp.ndarray  # (N,3)
    weight: jnp.ndarray  # (N,) scalar radiance weight (Li luminance / pdf)
    radiance: jnp.ndarray  # (N,3) RGB incoming radiance estimate
    distance: jnp.ndarray  # (N,) distance to the radiance source
    is_volume: jnp.ndarray  # (N,) bool
    # per-vertex VSP observations:
    c_vol: jnp.ndarray  # (N,) volume-scattered contribution (luminance)
    c_surf: jnp.ndarray  # (N,) surface contribution (luminance)
    valid: jnp.ndarray  # (N,) bool


def _update_half(field, half: FieldHalf, batch: TrainBatch, sel, decay):
    cid = field.cell_id(batch.pos)
    w = jnp.where(sel & batch.valid, batch.weight, 0.0)
    stats_w, stats_s, weights, mu, kappa = vmf.em_update(
        half.stats_w, half.stats_s, half.weights, half.mu, half.kappa,
        cid, half.weights.shape[0], batch.wi, w, decay=decay,
    )
    # distance stats follow the same responsibilities approximation:
    # assign full weight to the nearest lobe (cheap, adequate for parallax)
    p_lobe = vmf.vmf_pdf(batch.wi[..., None, :], mu[cid], kappa[cid])
    resp = weights[cid] * p_lobe
    resp = resp / jnp.maximum(jnp.sum(resp, -1, keepdims=True), 1e-20)
    d_ok = jnp.isfinite(batch.distance) & (batch.distance > 0)
    wd = jnp.where(sel & batch.valid & d_ok, batch.weight, 0.0)
    stats_dist = half.stats_dist * decay + jnp.zeros_like(half.stats_dist).at[cid].add(
        resp * (wd * jnp.minimum(batch.distance, 1e6))[..., None]
    )
    # VSP + flux statistics
    wv = jnp.where(sel & batch.valid, 1.0, 0.0)
    vsp_c_vol = half.vsp_c_vol * decay + jnp.zeros_like(half.vsp_c_vol).at[cid].add(wv * batch.c_vol)
    vsp_c_surf = half.vsp_c_surf * decay + jnp.zeros_like(half.vsp_c_surf).at[cid].add(wv * batch.c_surf)
    vsp_c2_vol = half.vsp_c2_vol * decay + jnp.zeros_like(half.vsp_c2_vol).at[cid].add(wv * batch.c_vol**2)
    vsp_c2_surf = half.vsp_c2_surf * decay + jnp.zeros_like(half.vsp_c2_surf).at[cid].add(wv * batch.c_surf**2)
    vsp_n = half.vsp_n * decay + jnp.zeros_like(half.vsp_n).at[cid].add(wv)
    flux = half.flux * decay + jnp.zeros_like(half.flux).at[cid].add(
        jnp.where((sel & batch.valid)[..., None], batch.radiance, 0.0))
    flux_w = half.flux_w * decay + jnp.zeros_like(half.flux_w).at[cid].add(wv)
    # directional VSP: responsibility-weighted per-lobe moments
    vsp_lobe_vol = half.vsp_lobe_vol * decay + jnp.zeros_like(
        half.vsp_lobe_vol).at[cid].add(resp * (wv * batch.c_vol)[..., None])
    vsp_lobe_surf = half.vsp_lobe_surf * decay + jnp.zeros_like(
        half.vsp_lobe_surf).at[cid].add(resp * (wv * batch.c_surf)[..., None])
    return FieldHalf(weights, mu, kappa, stats_w, stats_s, stats_dist,
                     vsp_c_vol, vsp_c_surf, vsp_c2_vol, vsp_c2_surf, vsp_n,
                     flux, flux_w, vsp_lobe_vol, vsp_lobe_surf)


def field_update(field: GuidingField, batch: TrainBatch, decay=0.75):
    """One per-wave training iteration (PostProcessWave's Field::Update)."""
    surface = _update_half(field, field.surface, batch, ~batch.is_volume, decay)
    volume = _update_half(field, field.volume, batch, batch.is_volume, decay)
    return field.replace(surface=surface, volume=volume,
                         iteration=field.iteration + 1)


def refine_field(field: GuidingField, threshold=256.0, max_splits=16):
    """Between-wave spatial refinement (OpenPGL's sample-adaptive kd-tree
    subdivision, SURVEY §2.4): coarse cells whose accumulated EM sample
    mass exceeds `threshold` split into 2^3 children that inherit the
    parent's distribution with 1/8 of its sufficient statistics. Runs
    host-side between waves (array SHAPES stay fixed, so the render jit is
    not invalidated). No-op for uniform-grid fields (n_extra == 0)."""
    if field.n_extra == 0 or field.leaf_center is None:
        return field
    C = field.res ** 3
    L = C + field.n_extra
    n_leaves = int(field.n_leaves)
    cap = (L - n_leaves) // 8
    if cap <= 0:
        return field
    leaf_of = np.asarray(field.leaf_of).copy()
    refined = np.asarray(field.refined).copy()
    child_base = np.asarray(field.child_base).copy()
    leaf_center = np.asarray(field.leaf_center).copy()
    mass = (np.asarray(field.surface.stats_w).sum(-1)
            + np.asarray(field.volume.stats_w).sum(-1))
    cell_mass = np.where(refined, 0.0, mass[leaf_of])
    order = np.argsort(-cell_mass)
    picks = [int(c) for c in order if cell_mass[c] > threshold]
    picks = picks[: min(int(max_splits), cap)]
    if not picks:
        return field
    bmin = np.asarray(field.b_min)
    bmax = np.asarray(field.b_max)
    cell = (bmax - bmin) / field.res
    import dataclasses

    halves = {}
    for name in ("surface", "volume"):
        h = getattr(field, name)
        halves[name] = {f.name: np.asarray(getattr(h, f.name)).copy()
                        for f in dataclasses.fields(h)}
    for c in picks:
        src_leaf = leaf_of[c]
        base = n_leaves
        for name, arrs in halves.items():
            for k, a in arrs.items():
                row = a[src_leaf]
                if k in ("weights", "mu", "kappa"):
                    a[base:base + 8] = row  # inherit the distribution
                else:
                    a[base:base + 8] = row / 8.0  # split the statistics
        ix, iy, iz = c // (field.res ** 2), (c // field.res) % field.res,             c % field.res
        lo = bmin + np.asarray([ix, iy, iz]) * cell
        for o in range(8):
            off = np.asarray([(o >> 2) & 1, (o >> 1) & 1, o & 1],
                             np.float32)
            leaf_center[base + o] = lo + (off * 0.5 + 0.25) * cell
        refined[c] = True
        child_base[c] = base
        n_leaves += 8
    def mk_half(arrs):
        return FieldHalf(**{k: jnp.asarray(v) for k, v in arrs.items()})
    return field.replace(
        surface=mk_half(halves["surface"]),
        volume=mk_half(halves["volume"]),
        leaf_of=jnp.asarray(leaf_of), refined=jnp.asarray(refined),
        child_base=jnp.asarray(child_base),
        n_leaves=jnp.int32(n_leaves),
        leaf_center=jnp.asarray(leaf_center))


def save_field(field: GuidingField, path):
    """Store the field (storeGuidingCache analog) as an npz."""
    flat, treedef = jax.tree.flatten(field)
    np.savez(path, *[np.asarray(x) for x in flat],
             res=field.res, n_lobes=field.n_lobes,
             n_extra=field.n_extra)


def load_field(path) -> GuidingField:
    data = np.load(path)
    n_meta = 3 if "n_extra" in data.files else 2
    arrays = [data[f"arr_{i}"] for i in range(len(data.files) - n_meta)]
    template = GuidingField.make(
        arrays[0], arrays[1], res=int(data["res"]),
        n_lobes=int(data["n_lobes"]),
        n_extra=int(data["n_extra"]) if "n_extra" in data.files else 0)
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in arrays])
