"""Pallas TPU megakernel: VSPG render-phase path tracing for the
grid-medium scene class.

The VSPG wave (models/integrators/vspg.py) is the paper's flagship
estimator — VSP-guided distance sampling (reservoir resampling route),
vMF-mixture directional guiding with one-sample-MIS / RIS combination,
and guided Russian roulette (guidedvolpathvspgintegrator.cpp:650-1100 +
media_sampleTMaj.h:120-247 + openpgl GuidedRussianRoulette). As an XLA
while_loop graph it is relay-dispatch-bound (~0.004 Mpaths/s, PERF.md);
this kernel runs the ENTIRE render-phase bounce loop fused in VMEM, one
persistent lane per pixel, the same architecture as
ops/pallas_volpath._make_grid_kernel.

Scope (render phase only): the guiding field and the ISGB are FROZEN
inputs — training waves stay on the XLA path (they are a small spp
fraction), then the remaining spp render through this kernel. Freezing
mid-render changes only the sampling distributions, never the estimator
weights, so the result stays unbiased (the reference's
train-then-freeze protocol, guidedvolpathvspgintegrator.cpp:117-131).

Field data rides in as a packed VMEM table (8K+5 parameter rows of C
cell values, C = field_res^3); per-lane cell lookups use the chunked
(sub,128) lane-gather sweep (PERF.md Mosaic facts). ISGB per-pixel rows
(primary VSP, pixel-estimate luminance/mean) arrive pre-sliced per
block through the BlockSpec — lane (i,j) IS its pixel, so no gather is
needed. All vMF mixture math (parallax re-aim, HG product, CDF lobe
select, pdf sums) is unrolled over the K lobes as pure VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_volpath import (_BIG, INV_4PI, STOCH_TRILERP_MAX_EXACT, _U32,
                             _box_hit, _coord_system, _dot, _hg_value,
                             _normalize, _sample_hg, _uniform4, _unpack_hi,
                             _unpack_i8, _unpack_lo, _unpack_sel,
                             extract_constants, make_mxu_lookup,
                             make_mxu_lookup_i8, make_stoch_density_fn,
                             pack_bf16_pairs, pack_bf16_transposed,
                             pack_i8_quads, pack_i8_transposed,
                             pack_tri_table as _pv_pack_tri_table)

MIN_KAPPA = 1e-2
MAX_KAPPA = 2e3

# majorant/density micro-steps per kernel iteration. Round-4 measured
# UNROLL=2 at 0.85 -> 0.65 Mpaths/s on the 64^3 pyro cloud (worse): the
# ~90-carry state already saturates vregs, so doubling the step body
# spills more than the amortized fixed cost saves. Keep 1.
WALK_UNROLL = 1

# multi-cell flight inside each micro-step (pallas_volpath.WALK_STEPS
# idiom, round 5): the walk consumes its collision target across up to
# this many majorant cells in a fused unrolled loop (cell-space coords,
# hoisted direction inverses) before the expensive event machinery runs.
# Swept on chip (pyro cloud, frozen-field render): K=1 1.32, K=2 1.30,
# K=3 1.23 Mpaths/s — unlike the volpath kernel (K=4 wins there), the
# guided walks run at the VSP-SCALED majorant, so collisions dominate
# crossings and extra steps only add one-hot majorant gathers. K=1
# still beats the round-4 kernel (1.20) via the hoisted cell math,
# exp-once-per-event transmittances, and gray-sigma tail-fold skips.
WALK_STEPS = 1

# Field-cell parameter fetch strategy: one one-hot MXU matmul per sublane
# fetches ALL P_ROWS parameters of each lane's cell at once (every row
# shares the cell index, so G = Ftab (P,FC) @ onehot (FC,128) yields the
# whole parameter column per lane) — replaces the PW-rows x n_chunks
# take_along_axis sweep. Same bf16 parameter precision as the packed-pair
# table (mu still renormalized after fetch).
FIELD_MXU = True
# kernel-table lobe budget: the packed tables carry only each leaf's
# top-K_PACK lobes by weight (renormalized). Sampling and every pdf the
# kernel evaluates use the SAME truncated mixture, so the estimator stays
# consistent/unbiased — the truncation only approximates the trained
# guiding distribution (vMF transcendental cost scales linearly in K;
# PERF.md round-4 ablation). None = pack all lobes.
K_PACK = 4
_LUM = (0.2126, 0.7152, 0.0722)


# ---------------------------------------------------------------------------
# Host-side table packing
# ---------------------------------------------------------------------------


def pack_field_table(field, criterion="variance", with_surface=False,
                     k_top=None):
    """Flatten the frozen volume half into a (P, L) f32 table over all
    L = res^3 + n_extra LEAVES.

    Row layout (P = 8K + 8): for each lobe k: [w, mux, muy, muz, kappa,
    mean_dist, vsp_lobe_vol, vsp_lobe_surf]; then leaf rows [valid, vsp,
    flux_r, flux_g, flux_b, cx, cy, cz] (leaf centers drive the in-kernel
    parallax re-aim — uniform cells and adaptive children alike). vsp has
    the criterion (variance | contribution) pre-applied exactly as
    guiding/field._gather_half.

    with_surface=True (teaser scenes: triangles in the medium) appends the
    SURFACE half's rows in the same layout right after the volume rows —
    both halves share the spatial tree, so one MXU fetch returns the whole
    column for guided-BSDF sampling at surface hits (guiding.h:57-358).

    Adaptive fields (n_extra > 0, the OpenPGL kd-tree analog) append 5
    indirection rows indexed by COARSE cell id, split into <=128-valued
    halves so they survive the bf16 pack exactly:
    [leaf_of_hi, leaf_of_lo, child_base_hi, child_base_lo, refined]."""
    rows = _pack_half_rows(field, field.volume, criterion, k_top)
    if with_surface:
        rows += _pack_half_rows(field, field.surface, criterion, k_top)
    C = field.res ** 3
    L = C + int(field.n_extra)
    if field.n_extra:
        lo_of = np.asarray(field.leaf_of, np.int64)
        cb = np.asarray(field.child_base, np.int64)
        rf = np.asarray(field.refined).astype(np.float32)

        def split(v):
            pad = np.zeros(L, np.float32)
            hi = pad.copy()
            lo = pad.copy()
            hi[:C] = (v >> 7).astype(np.float32)
            lo[:C] = (v & 127).astype(np.float32)
            return hi, lo

        of_hi, of_lo = split(lo_of)
        cb_hi, cb_lo = split(cb)
        rfp = np.zeros(L, np.float32)
        rfp[:C] = rf
        rows += [of_hi, of_lo, cb_hi, cb_lo, rfp]
    return np.stack(rows, 0).astype(np.float32)  # (P, L)


def _pack_half_rows(field, vol, criterion, k_top=None):
    C = field.res ** 3
    L = C + int(field.n_extra)
    K = field.n_lobes
    w = np.asarray(vol.weights, np.float32)[:L]
    mu = np.asarray(vol.mu, np.float32)[:L]
    kap = np.asarray(vol.kappa, np.float32)[:L]
    sw = np.asarray(vol.stats_w, np.float32)[:L]
    sd = np.asarray(vol.stats_dist, np.float32)[:L]
    dist = sd / np.maximum(sw, 1e-12)
    vlv = np.asarray(vol.vsp_lobe_vol, np.float32)[:L]
    vls = np.asarray(vol.vsp_lobe_surf, np.float32)[:L]
    if k_top is not None and k_top < K:
        # keep each leaf's top-k lobes by weight, renormalized to the
        # original mixture mass (K_PACK doc above)
        order = np.argsort(-w, axis=1)[:, :k_top]  # (L, k)
        li = np.arange(L)[:, None]
        tot = w.sum(1, keepdims=True)
        w = w[li, order]
        w = w * tot / np.maximum(w.sum(1, keepdims=True), 1e-20)
        mu = mu[li, order]
        kap = kap[li, order]
        sw = sw[li, order]
        dist = dist[li, order]
        vlv = vlv[li, order]
        vls = vls[li, order]
        K = k_top
    valid = (sw.sum(-1) > 8.0).astype(np.float32)
    n = np.maximum(np.asarray(vol.vsp_n, np.float32)[:L], 1.0)
    c_vol = np.asarray(vol.vsp_c_vol, np.float32)[:L] / n
    c_surf = np.asarray(vol.vsp_c_surf, np.float32)[:L] / n
    if criterion == "variance":
        v_vol = np.maximum(
            np.asarray(vol.vsp_c2_vol, np.float32)[:L] / n - c_vol**2, 0.0)
        v_surf = np.maximum(
            np.asarray(vol.vsp_c2_surf, np.float32)[:L] / n - c_surf**2, 0.0)
        num = c_vol * c_vol + v_vol
        den = num + c_surf * c_surf + v_surf
    else:
        num = c_vol
        den = c_vol + c_surf
    vsp = np.where(den > 0, num / np.maximum(den, 1e-20), -1.0)
    vsp = np.where(np.asarray(vol.vsp_n, np.float32)[:L] > 8.0, vsp, -1.0)
    flux = (np.asarray(vol.flux, np.float32)[:L]
            / np.maximum(np.asarray(vol.flux_w, np.float32)[:L],
                         1e-12)[:, None])
    if field.leaf_center is not None:
        centers = np.asarray(field.leaf_center, np.float32)[:L]
    else:
        res = int(field.res)
        ii = np.arange(C)
        gi = np.stack([ii // (res * res), (ii // res) % res, ii % res],
                      -1).astype(np.float32)
        b0 = np.asarray(field.b_min, np.float32)
        b1 = np.asarray(field.b_max, np.float32)
        centers = b0 + (gi + 0.5) / res * (b1 - b0)
        centers = np.pad(centers, ((0, L - C), (0, 0)))
    rows = []
    for k in range(K):
        rows += [w[:, k], mu[:, k, 0], mu[:, k, 1], mu[:, k, 2], kap[:, k],
                 dist[:, k], vlv[:, k], vls[:, k]]
    rows += [valid, vsp.astype(np.float32), flux[:, 0], flux[:, 1],
             flux[:, 2], centers[:, 0], centers[:, 1], centers[:, 2]]
    return rows


def pack_isgb_table(isgb, npix, tr_buffer=None):
    """(3, npix) f32: [primary_vsp(-1 if not ready), pixel-estimate
    luminance, pixel-estimate channel mean]. With tr_buffer (the NDS+
    per-pixel primary transmittance cache, trbuffer.h:17-101), rows 3-5
    append its clipped RGB — (6, npix)."""
    from ..models.guiding import isgb as gisgb

    pid = jnp.arange(npix, dtype=jnp.int32)
    vsp = gisgb.isgb_primary_vsp(isgb, pid)
    pe = gisgb.isgb_contribution(isgb, pid)
    lum = pe[:, 0] * _LUM[0] + pe[:, 1] * _LUM[1] + pe[:, 2] * _LUM[2]
    mean = jnp.mean(pe, -1)
    rows = [vsp, lum, mean]
    if tr_buffer is not None:
        tr = jnp.clip(jnp.asarray(tr_buffer, jnp.float32), 0.0, 1.0)
        rows += [tr[:, 0], tr[:, 1], tr[:, 2]]
    return jnp.stack(rows, 0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


# training-record rows written by the record variant (one 1-spp wave):
# per-slot rows 0-2 pos, 3-5 wi, 6 scatter weight R (f/pdf), 7 pdf,
# 8-10 NEE direct (beta-free, guiding.h:729), 11-13 MIS-weighted emission
# (guiding.h:748-784); slot-0-only rows 14 first-event-is-volume,
# 15-17 first-event normal (-d or surface ns), feeding the ISGB sample
# stream; per-slot row 18 vertex-is-volume (surface vertices train the
# surface half, guiding.h:786/810); slot-0-only rows 19-21 first-event
# albedo (medium single-scatter albedo / material albedo); per-slot rows
# 22-23 scatter weight G/B (channel-dependent at textured/diffuse surface
# vertices; equal to row 6 at volume vertices).
REC_ROWS = 24


def _make_vspg_kernel(c, gc, spp, sub, tiled=False, record=False,
                      rec_depth=6):
    """Build the render-phase kernel. `c` = grid scene constants
    (pallas_volpath.extract_constants, kind == 'grid'), `gc` = guiding
    constants dict: fres, K, fb_min, fb_max, pg, mode, vsp_mis_ratio,
    guide_rr, min_rr_depth, guide_primary, guide_secondary, trained,
    volume_guiding, max_collisions.

    record=True builds the TRAINING variant (spp must be 1): alongside the
    image it fills a (REC_ROWS, rec_depth, sub, 128) per-block record
    buffer with the path-segment data the guiding trainer consumes — the
    in-kernel analog of the reference's PathSegmentStorage recording
    (guiding.h:682-832), replacing the ~100x slower XLA training wave."""
    sa = np.asarray(c["sigma_a"], np.float32)
    ss = np.asarray(c["sigma_s"], np.float32)
    st = sa + ss
    # gray sigma_t: hero-relative tail ratios are exactly 1 at trace time
    sigma_gray = float(st[0]) == float(st[1]) == float(st[2])
    g_hg = float(np.clip(c["g_hg"], -0.99, 0.99))
    bmin, bmax = c["bmin"], c["bmax"]
    ext = tuple(bmax[k] - bmin[k] for k in range(3))
    gx, gy, gz = c["grid_res"]
    mx, my, mz = c["maj_res"]
    # density/majorant tables arrive bf16-pair-packed (pallas_volpath
    # .pack_bf16_pairs): chunk counts are over WORDS — half the sweep.
    # Big grids use uint8 quads (pack_i8_quads) — a quarter the sweep.
    i8 = c.get("dens_pack", "bf16") == "i8"
    mxu = c.get("dens_pack", "bf16") == "mxu"
    _cm = -(-(gx * gy * gz) // 128)
    C_mxu = -(-_cm // 8) * 8
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
    nx_pow2 = (nx & (nx - 1)) == 0
    nx_shift = int(np.log2(nx)) if nx_pow2 else 0
    LB = sub * 128

    # teaser scene class constants (must precede the field-table layout:
    # surface rows double P_ROWS)
    n_tri = int(c.get("n_tri", 0))
    with_surf = n_tri > 0

    # guiding constants
    fres = int(gc["fres"])
    K = int(gc["K"])
    n_extra = int(gc.get("n_extra", 0))
    adaptive = n_extra > 0
    FC = fres ** 3
    FL = FC + n_extra  # leaf count (adaptive two-level field)
    n_cell_chunks = max(-(-FL // 128), 1)
    P_HALF = 8 * K + 8
    P_ROWS = P_HALF * (2 if with_surf else 1)
    P_TOT = P_ROWS + (5 if adaptive else 0)
    fmxu = bool(gc.get("field_mxu", False))
    assert fmxu or not adaptive, "adaptive fields need the MXU field path"
    assert fmxu or not with_surf, "surface rows need the MXU field path"
    FCp = max(-(-FL // 128), 1) * 128
    P_pad = -(-P_TOT // 8) * 8
    fb0 = tuple(float(v) for v in gc["fb_min"])
    fb1 = tuple(float(v) for v in gc["fb_max"])
    fext = tuple(fb1[k] - fb0[k] for k in range(3))
    pg = float(gc["pg"])
    ris = gc["mode"] == "ris"
    # NEE MIS blend ratio (vspg_bounce:828: pg for 'mis', 0.5 for 'ris')
    pg_nee = pg if not ris else 0.5
    mis_ratio = float(gc["vsp_mis_ratio"])
    guide_rr = bool(gc["guide_rr"])
    min_rr_depth = int(gc["min_rr_depth"])
    guide_primary = bool(gc["guide_primary"])
    guide_secondary = bool(gc["guide_secondary"]) and bool(gc["trained"])
    vol_guiding = bool(gc["volume_guiding"]) and bool(gc["trained"])
    # static vMF of the HG product lobe (vmf.hg_lobe: rho = |g|)
    rho = abs(g_hg)
    kappa_h = float(np.clip(rho * (3 - rho * rho) / max(1 - rho * rho, 1e-6),
                            0.0, MAX_KAPPA))
    hg_sign = 1.0 if g_hg >= 0 else -1.0
    apply_hg_product = abs(g_hg) > 1e-3

    # teaser scene class: triangles (diffuse / smooth-dielectric /
    # smooth-conductor) inside the medium, with guided-BSDF sampling at
    # diffuse hits (GuidedBSDF, guiding.h:57-358). The field table then
    # carries BOTH halves (volume rows, then surface rows).
    if n_tri:
        mat_kind = c["mat_kind"]
        mat_alb = np.asarray(c["mat_albedo"], np.float32)
        mat_eta = c["mat_eta"]
        mat_rough = tuple(float(v) for v in c.get(
            "mat_rough", (0.0,) * len(mat_kind)))
        # Trowbridge-Reitz glossy lanes (rough conductor / CookTorrance,
        # pallas_volpath's any_rough machinery): sampled UNGUIDED in this
        # kernel (the XLA path guides them; guiding only changes sampling
        # distributions, so the mixed estimator stays unbiased)
        any_rough = any(
            (mat_kind[i] == 1 and mat_rough[i] >= 1e-3)
            or mat_kind[i] == 11 for i in range(len(mat_kind)))
        n_mat = len(mat_kind)
        # vMF approximation of the clamped-cosine lobe (vmf.COSINE_KAPPA,
        # OpenPGL ApplyCosineProduct)
        kappa_cos = 2.18853
        log_c_cos = float(np.log(kappa_cos) - np.log(2.0 * np.pi)
                          - np.log1p(-np.exp(-2.0 * kappa_cos)))
    surf_guide = (with_surf and bool(gc.get("surface_guiding", True))
                  and bool(gc["trained"]))
    scale_vsp_cap = float(gc.get("scale_vsp_cap", 0.95))
    # NDS / NDS+ optical-depth-space distance sampling
    # (media_sampleTMaj.h:250-491; XLA analog vspg._heterogeneous_ods):
    # a STATIC kernel configuration — guided lanes run an exact majorant
    # OD prepass (mode 6) and then the ODS walk in the delta-step
    # machinery (mode 2) instead of the reservoir route. Reservoir
    # carries are reused as ODS state (see mode-6 block).
    nds = str(gc.get("sampling_method", "resampling")) in ("nds", "nds+")
    nds_plus = str(gc.get("sampling_method", "resampling")) == "nds+"
    INV_PI = float(1.0 / np.pi)

    def chan(vec3, h):
        return jnp.where(h == 0, float(vec3[0]),
                         jnp.where(h == 1, float(vec3[1]), float(vec3[2])))

    def avg3(v):
        return (v[0] + v[1] + v[2]) * (1.0 / 3.0)

    def lum3(v0, v1, v2):
        return v0 * _LUM[0] + v1 * _LUM[1] + v2 * _LUM[2]

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

    # -- vMF math (all elementwise on (sub,128)) ---------------------------

    def vmf_pdf_e(cw_, kappa):
        """vMF density from cos(angle to mu): exp(k(c-1)) * k/(2pi(1-e^-2k))."""
        k = jnp.maximum(kappa, MIN_KAPPA)
        cnorm = k / (2.0 * np.pi * (1.0 - jnp.exp(-2.0 * k)))
        val = cnorm * jnp.exp(k * (cw_ - 1.0))
        return jnp.where(kappa < MIN_KAPPA, INV_4PI, val)

    def log_c(kappa):
        k = jnp.maximum(kappa, MIN_KAPPA)
        return jnp.log(k) - np.float32(np.log(2.0 * np.pi)) \
            - jnp.log1p(-jnp.exp(-2.0 * k))

    log_c_h = float(np.log(max(kappa_h, MIN_KAPPA))
                    - np.log(2.0 * np.pi)
                    - np.log1p(-np.exp(-2.0 * max(kappa_h, MIN_KAPPA))))

    def kernel(seed_ref, dens_ref, maj_ref, ftab_ref, isgb_ref, *rest):
        if n_tri:
            tris_ref = rest[0]
            rest = rest[1:]
        out_ref = rest[0]
        rec_ref = rest[1] if record else None
        if record:
            rec_ref[...] = jnp.zeros((REC_ROWS, rec_depth, sub, 128),
                                     jnp.float32)

        def rec_put(row, sl, sel, val):
            cur = rec_ref[row, sl]
            rec_ref[row, sl] = jnp.where(sel, val, cur)

        block = pl.program_id(0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        pix_base = seed_ref[0, 1].astype(jnp.int32)
        if tiled:
            # square-tile lane mapping (pallas_volpath.tile_permutation
            # layout; pixel base 0 by contract — single-chip launches;
            # host pre-permutes the ISGB rows and un-permutes the output)
            from .pallas_volpath import TILE_W as _TW

            tpr = nx // _TW
            ty = LB // _TW
            tx_shift = int(np.log2(_TW))
            lane_l = lane_i * 128 + lane_j
            pxi = (block % tpr) * _TW + (lane_l & (_TW - 1))
            pyi = (block // tpr) * ty + (lane_l >> tx_shift)
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

        # per-pixel frozen ISGB rows (this block's slice)
        isgb_vsp = isgb_ref[0]
        isgb_pel = isgb_ref[1]
        isgb_pem = isgb_ref[2]
        if nds_plus:
            # previous-wave primary-transmittance cache (TrBuffer rows)
            tr_prev = (isgb_ref[3], isgb_ref[4], isgb_ref[5])

        # -- grid helpers (as in pallas_volpath._make_grid_kernel) --------

        def table_lookup(tab_ref, n_chunks, flat_idx):
            """Lookup on a bf16-pair-packed table (word chunks)."""
            word_idx = flat_idx >> 1
            c_idx = word_idx >> 7
            l_idx = word_idx & 127

            def body(cc, acc):
                row = tab_ref[cc]
                chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                gathered = jnp.take_along_axis(chunk, l_idx, axis=1)
                return jnp.where(c_idx == cc, gathered, acc)

            # dynamic window: sweep only chunks some lane touches
            lo = jnp.min(c_idx)
            hi = jnp.minimum(jnp.max(c_idx), n_chunks - 1)
            word = jax.lax.fori_loop(lo, hi + 1, body, zf)
            return _unpack_sel(word, flat_idx & 1)

        def density_at(px, py, pz):
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

            # dynamic window: corner 0 is the min flat index, corner 7 the
            # max, so [min(chunk0), max(chunk7)] covers all lanes' corners
            lo = jnp.min(corner_word[0] >> 7)
            hi = jnp.minimum(jnp.max(corner_word[7] >> 7), n_dens_chunks - 1)
            vals = jax.lax.fori_loop(lo, hi + 1, body, (zf,) * 8)
            if i8:
                # uint8 quads scaled by the corner supervoxel's bf16-up
                # majorant (pallas_volpath.pack_i8_quads contract)
                qs = [_unpack_i8(v, ci & 3)
                      for v, ci in zip(vals, corner_idx)]
                msv_idx = []
                for (cx, cy, cz) in corner_cell:
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

        def maj_dens_at(px, py, pz):
            ix = jnp.clip(((px - bmin[0]) / ext[0] * mx).astype(jnp.int32),
                          0, mx - 1)
            iy = jnp.clip(((py - bmin[1]) / ext[1] * my).astype(jnp.int32),
                          0, my - 1)
            iz = jnp.clip(((pz - bmin[2]) / ext[2] * mz).astype(jnp.int32),
                          0, mz - 1)
            flat = (ix * my + iy) * mz + iz
            if mxu:
                return maj_mxu_lookup(flat)
            return table_lookup(maj_ref, n_maj_chunks, flat)

        def seg_exit(px, py, pz, dx, dy, dz):
            t_seg = jnp.full_like(px, _BIG)
            for (p_c, d_c, lo, ex_c, m_c) in (
                    (px, dx, bmin[0], ext[0], mx),
                    (py, dy, bmin[1], ext[1], my),
                    (pz, dz, bmin[2], ext[2], mz)):
                u = (p_c - lo) / ex_c * m_c
                sgn = jnp.where(d_c >= 0, 1.0, -1.0)
                cell = jnp.floor(u + sgn * 3e-4)
                bound = jnp.where(d_c >= 0, cell + 1.0, cell)
                t_axis = (bound / m_c * ex_c + lo - p_c) / jnp.where(
                    jnp.abs(d_c) < 1e-12,
                    jnp.where(d_c >= 0, 1e-12, -1e-12), d_c)
                t_axis = jnp.where(jnp.abs(d_c) < 1e-12, _BIG, t_axis)
                t_seg = jnp.minimum(t_seg, t_axis)
            return jnp.maximum(t_seg, 1e-5)

        def closest_hit(qox, qoy, qoz, qdx, qdy, qdz):
            """Moller-Trumbore SMEM sweep (pallas_volpath idiom): returns
            (t, ngx, ngy, ngz, mat, med_in, med_out); t=_BIG, mat=-1 on
            miss."""

            def tri(ti, carry):
                (t_b, nxb, nyb, nzb, mb, mib, mob) = carry
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
                return (t_b, nxb, nyb, nzb, mb, mib, mob)

            init = (jnp.full((sub, 128), _BIG, jnp.float32), zf, zf, zf,
                    jnp.full((sub, 128), -1, jnp.int32),
                    jnp.full((sub, 128), -1, jnp.int32),
                    jnp.full((sub, 128), -1, jnp.int32))
            return jax.lax.fori_loop(0, n_tri, tri, init)

        # -- field query --------------------------------------------------

        def field_query(px, py, pz):
            """Gather all P_ROWS params of the lane's field cell.
            Returns dict of per-lobe lists + cell rows, with parallax
            re-aim applied to mu (guiding/field._gather_half)."""
            gfx = jnp.clip((px - fb0[0]) / fext[0] * fres, 0.0, fres - 1e-4)
            gfy = jnp.clip((py - fb0[1]) / fext[1] * fres, 0.0, fres - 1e-4)
            gfz = jnp.clip((pz - fb0[2]) / fext[2] * fres, 0.0, fres - 1e-4)
            ix = gfx.astype(jnp.int32)
            iy = gfy.astype(jnp.int32)
            iz = gfz.astype(jnp.int32)
            cid = (ix * fres + iy) * fres + iz
            if fmxu:
                # one MXU matmul per sublane fetches the whole parameter
                # column of each lane's cell: G[p, l] = ftab[p, cid[s, l]]
                iota_f = jax.lax.broadcasted_iota(jnp.int32, (FCp, 128), 0)
                ft = ftab_ref[:]

                def fetch_cols(idx):
                    gs_ = []
                    for s in range(sub):
                        oh = (iota_f == idx[s:s + 1, :]).astype(
                            jnp.bfloat16)
                        gs_.append(jnp.dot(
                            ft, oh, preferred_element_type=jnp.float32))
                    return gs_

                if adaptive:
                    # stage 1: coarse-cell indirection rows (OpenPGL
                    # kd-tree analog: leaf = refined ? child+octant :
                    # leaf_of); integers ride as exact <=128 bf16 halves
                    gs0 = fetch_cols(cid)
                    ind = [jnp.concatenate(
                        [gs0[s][P_ROWS + r:P_ROWS + r + 1, :]
                         for s in range(sub)], axis=0) for r in range(5)]
                    leaf_of = (ind[0] * 128.0 + ind[1]).astype(jnp.int32)
                    child = (ind[2] * 128.0 + ind[3]).astype(jnp.int32)
                    refined = ind[4] > 0.5
                    frx = gfx - ix.astype(jnp.float32)
                    fry = gfy - iy.astype(jnp.float32)
                    frz = gfz - iz.astype(jnp.float32)
                    octant = ((frx >= 0.5).astype(jnp.int32) * 4
                              + (fry >= 0.5).astype(jnp.int32) * 2
                              + (frz >= 0.5).astype(jnp.int32))
                    leaf = jnp.where(refined, child + octant, leaf_of)
                else:
                    leaf = cid
                gs = fetch_cols(leaf)
                vals = [jnp.concatenate([gs[s][p:p + 1, :]
                                         for s in range(sub)], axis=0)
                        for p in range(P_ROWS)]
            else:
                c_idx = cid >> 7
                l_idx = cid & 127

                # rows ride bf16-packed in PAIRS (row 2q lo, row 2q+1
                # hi): half the gathers, static-parity unpack after the
                # sweep
                PW = (P_ROWS + 1) // 2

                def body(cc, accs):
                    new = []
                    for q in range(PW):
                        row = ftab_ref[q * n_cell_chunks + cc]
                        chunk = jnp.broadcast_to(row[None, :], (sub, 128))
                        gathered = jnp.take_along_axis(chunk, l_idx,
                                                       axis=1)
                        new.append(jnp.where(c_idx == cc, gathered,
                                             accs[q]))
                    return tuple(new)

                lo = jnp.min(c_idx)
                hi = jnp.minimum(jnp.max(c_idx), n_cell_chunks - 1)
                words = jax.lax.fori_loop(lo, hi + 1, body, (zf,) * PW)
                vals = []
                for p in range(P_ROWS):
                    w_q = words[p // 2]
                    vals.append(_unpack_lo(w_q) if p % 2 == 0
                                else _unpack_hi(w_q))
            def parse_half(base):
                lobes = []
                for k in range(K):
                    (w_k, mux, muy, muz, kap, dstk, vlv,
                     vls) = vals[base + 8 * k:base + 8 * k + 8]
                    # bf16 mu is ~0.4% off unit — renormalize (kappa can
                    # be ~2e3, where exp(kappa*(dot-1)) amplifies any
                    # |mu| error)
                    mux, muy, muz = _normalize(mux, muy, muz)
                    lobes.append(dict(w=w_k, mu=(mux, muy, muz), kappa=kap,
                                      dist=dstk, vlv=vlv, vls=vls))
                valid = vals[base + 8 * K] > 0.5
                vsp_cell = vals[base + 8 * K + 1]
                flux = (vals[base + 8 * K + 2], vals[base + 8 * K + 3],
                        vals[base + 8 * K + 4])
                # parallax re-aim: target = LEAF center + mu * dist,
                # re-point at the query position (OpenPGL parallax-aware
                # VMM); centers ride in the table so adaptive children
                # re-aim correctly
                ccx = vals[base + 8 * K + 5]
                ccy = vals[base + 8 * K + 6]
                ccz = vals[base + 8 * K + 7]
                for lb in lobes:
                    mux, muy, muz = lb["mu"]
                    tx = ccx + mux * lb["dist"] - px
                    ty = ccy + muy * lb["dist"] - py
                    tz = ccz + muz * lb["dist"] - pz
                    rx, ry, rz = _normalize(tx, ty, tz)
                    use = (lb["dist"] > 1e-6) & valid
                    lb["mu"] = (jnp.where(use, rx, mux),
                                jnp.where(use, ry, muy),
                                jnp.where(use, rz, muz))
                return lobes, valid, vsp_cell, flux

            vol_half = parse_half(0)
            if with_surf:
                return vol_half + parse_half(P_HALF)
            return vol_half

        def mixture_pdf(lobes, wx, wy, wz):
            # vmf.mixture_pdf: plain weighted sum (weights are EM-normalized)
            p = zf
            for lb in lobes:
                cw_ = wx * lb["mu"][0] + wy * lb["mu"][1] + wz * lb["mu"][2]
                p = p + lb["w"] * vmf_pdf_e(cw_, lb["kappa"])
            return p

        def product_vmf(lobes, mbx, mby, mbz, kappa_b, log_c_b):
            """Multiply every lobe by one vMF (vmf.product_with_vmf with a
            static kappa_b). Returns new lobes list."""
            total_old = zf
            total_new = zf
            out = []
            for lb in lobes:
                kmux = lb["kappa"] * lb["mu"][0] + kappa_b * mbx
                kmuy = lb["kappa"] * lb["mu"][1] + kappa_b * mby
                kmuz = lb["kappa"] * lb["mu"][2] + kappa_b * mbz
                k_new = jnp.sqrt(jnp.maximum(
                    kmux * kmux + kmuy * kmuy + kmuz * kmuz, 1e-12))
                inv = 1.0 / jnp.maximum(k_new, 1e-8)
                log_s = (log_c(lb["kappa"]) + log_c_b - log_c(k_new)
                         + (k_new - lb["kappa"] - kappa_b))
                w_new = lb["w"] * jnp.exp(jnp.clip(log_s, -60.0, 60.0))
                total_old = total_old + lb["w"]
                total_new = total_new + w_new
                out.append(dict(w=w_new,
                                mu=(kmux * inv, kmuy * inv, kmuz * inv),
                                kappa=jnp.clip(k_new, 0.0, MAX_KAPPA)))
            scale = total_old / jnp.maximum(total_new, 1e-20)
            for lb in out:
                lb["w"] = lb["w"] * scale
            return out

        def product_hg(lobes, dx, dy, dz):
            """Apply the HG-lobe vMF product (vmf.product_with_vmf with
            mu_b = d * sign(g), kappa_b static). Returns new lobes list."""
            if not apply_hg_product:
                return lobes
            return product_vmf(lobes, dx * hg_sign, dy * hg_sign,
                               dz * hg_sign, kappa_h, log_c_h)

        def mixture_sample(lobes, u_sel, u0, u1):
            """CDF lobe select + vMF sample (vmf.mixture_sample)."""
            tot = zf
            for lb in lobes:
                tot = tot + lb["w"]
            inv_tot = 1.0 / jnp.maximum(tot, 1e-12)
            cdf = zf
            k_idx = zi
            for k, lb in enumerate(lobes):
                cdf = cdf + lb["w"] * inv_tot
                k_idx = k_idx + (u_sel >= cdf).astype(jnp.int32)
            k_idx = jnp.clip(k_idx, 0, K - 1)
            mux, muy, muz, kap = zf, zf, zf, zf
            for k, lb in enumerate(lobes):
                sel = k_idx == k
                mux = jnp.where(sel, lb["mu"][0], mux)
                muy = jnp.where(sel, lb["mu"][1], muy)
                muz = jnp.where(sel, lb["mu"][2], muz)
                kap = jnp.where(sel, lb["kappa"], kap)
            # vmf_sample (Jakob 2012 inversion)
            sk = jnp.maximum(kap, MIN_KAPPA)
            ct = 1.0 + jnp.log1p(
                -(1.0 - jnp.exp(-2.0 * sk)) * (1.0 - u0)) / sk
            ct = jnp.where(kap < MIN_KAPPA, 1.0 - 2.0 * u0, ct)
            ct = jnp.clip(ct, -1.0, 1.0)
            st_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
            phi = (2.0 * np.pi) * u1
            t1, t2 = _coord_system(mux, muy, muz)
            wx = st_ * jnp.cos(phi) * t1[0] + st_ * jnp.sin(phi) * t2[0] \
                + ct * mux
            wy = st_ * jnp.cos(phi) * t1[1] + st_ * jnp.sin(phi) * t2[1] \
                + ct * muy
            wz = st_ * jnp.cos(phi) * t1[2] + st_ * jnp.sin(phi) * t2[2] \
                + ct * muz
            wx, wy, wz = _normalize(wx, wy, wz)
            return wx, wy, wz, mixture_pdf(lobes, wx, wy, wz)

        def vsp_directional(lobes, vsp_cell, dx, dy, dz):
            """dist_vsp_directional: posterior-blended per-lobe VSP
            moments along d, cell-level fallback."""
            resp_sum = zf
            num = zf
            den = zf
            mass = zf
            for lb in lobes:
                cw_ = dx * lb["mu"][0] + dy * lb["mu"][1] + dz * lb["mu"][2]
                r = lb["w"] * vmf_pdf_e(cw_, lb["kappa"])
                resp_sum = resp_sum + r
                num = num + r * lb["vlv"]
                den = den + r * (lb["vlv"] + lb["vls"])
                mass = mass + lb["vlv"] + lb["vls"]
            inv = 1.0 / jnp.maximum(resp_sum, 1e-20)
            num = num * inv
            den = den * inv
            vdir = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-20),
                             -1.0)
            return jnp.where((mass > 8.0) & (vdir >= 0.0), vdir, vsp_cell)

        # -- unified per-lane state machine --------------------------------
        # Round-3 restructure (the same surgery that took the volpath grid
        # kernel 0.18 -> 5.4 Mpaths/s at 64^3): the round-2 kernel ran the
        # VSP prepass, the reservoir/delta distance walks and the NEE
        # shadow walk as NESTED while_loops, so one scattering lane
        # serialized its whole (sub,128) block and each outer iteration
        # paid three walks' worth of full-tile density gathers. Here every
        # lane performs exactly ONE shared majorant+density event per
        # iteration, whatever phase of its path it is in.
        #
        # Per-lane mode: 0 transport/decide, 2 ONE-PASS reservoir
        # resampling walk (media_sampleTMaj.h:183-247; the reference's
        # optical-depth prepass :153-168 is folded into the walk itself —
        # tau accumulates on the fly, the majorant scale comes from a
        # one-point estimate at walk start), 3 delta-tracking walk
        # (media_sampleTMaj.h:49-117), 4/5 NEE ratio-tracking shadow walk
        # toward the point light / env (integrators.cpp:1195-1244).

        def start_path(samp, dim):
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
        max_iters_u = spp * c["max_events"] * 12
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
            zi,                               # 28 mode
            zf,                               # 29 t_walk
            *ones3, *ones3, *ones3,           # 30..38 walk f/u/l factors
            *ones3, *ones3,                   # 39..44 wT / wtr (reservoir)
            zf, zf, zf, zf,                   # 45 w_sum 46 c_t 47 c_wi 48 c_ste
            *ones3, *ones3,                   # 49..54 cn / cd (candidate)
            zi,                               # 55 has_c
            jnp.ones_like(zf), jnp.zeros_like(zf),  # 56 maj_sc, 57 tau_acc
            zf,                               # 58 vsp_c
            *zeros3,                          # 59..61 shadow dir
            zf, zf, zf, jnp.ones_like(zf),    # 62 sh_t 63 sh_end 64 sh_pdf 65 sh_d2
            *ones3, *ones3, *ones3,           # 66..74 shT / shl / shu
            zf,                               # 75 sh_f
            jnp.ones_like(zf),                # 76 rr_srv (deferred RR)
            zf,                               # 77 sh_fl (f_hg, record var.)
        ) + ((jnp.full((sub, 128), _BIG, jnp.float32),  # 78 t_surf
              zf, zf, zf,                               # 79..81 hit normal
              jnp.full((sub, 128), -1, jnp.int32),      # 82 hit mat
              jnp.full((sub, 128), -1, jnp.int32),      # 83 hit med_in
              jnp.full((sub, 128), -1, jnp.int32),      # 84 hit med_out
              jnp.ones((sub, 128), jnp.int32),          # 85 needs_isect
              zi,                                       # 86 sh_need_occ
              zi) if n_tri else ()) \
          + ((zi,) if record else ()) \
          + ((jnp.ones_like(zf),) * 3 if (record and n_tri) else ()) \
          + ((zf, zf) if (n_tri and any_rough) else ())  # sh_f1 sh_f2

        def cond(cy):
            return jnp.any(cy[2] != 0) & (cy[27] < max_iters_u)

        def body(cy):
            (samp, dim, alive_i, ox, oy, oz, dx, dy, dz,
             b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
             L0, L1, L2, depth, hero, med, a0, a1, a2, it, mode, t_walk,
             wf0, wf1, wf2, wu0, wu1, wu2, wl0, wl1, wl2,
             wT0, wT1, wT2, wr0, wr1, wr2,
             w_sum, c_t, c_wi, c_ste, cn0, cn1, cn2, cd0, cd1, cd2,
             has_c_i, maj_sc, tau_acc, vsp_c,
             shx, shy, shz, sh_t, sh_end, sh_pdf, sh_d2,
             sT0, sT1, sT2, sl0, sl1, sl2, su0, su1, su2, sh_f,
             rr_srv, sh_fl) = cy[:78]
            xi = 78
            if n_tri:
                (t_surf, hngx, hngy, hngz, hmat, hmi, hmo, needs_i,
                 sh_occ, spec_last) = cy[xi:xi + 10]
                xi += 10
            if record:
                rslot = cy[xi]
                xi += 1
            if record and n_tri:
                ra0, ra1, ra2 = cy[xi:xi + 3]
                xi += 3
            if n_tri and any_rough:
                # per-channel deferred-NEE fold values (glossy f is
                # channel-dependent, unlike cos/pi / f_hg whose albedo
                # rides in beta); sh_f doubles as channel 0
                sh_f1, sh_f2 = cy[xi:xi + 2]
                xi += 3
            alive = alive_i != 0
            is_sh = alive & (mode >= 4)
            walk_res = alive & (mode == 2)
            walk_del = alive & (mode == 3)
            st_h = chan(st, hero)
            one = jnp.ones_like(zf)

            # deferred RR (guided or throughput survival stored at the
            # scatter, applied at the lane's next transport event so the
            # pending NEE fold used the pre-RR beta — reference order:
            # SampleLd then RR, guidedvolpathvspgintegrator.cpp:804-874)
            u_rr0, _, _, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            do_rr = alive & (mode == 0) & (rr_srv < 1.0)
            rr_kill = do_rr & (u_rr0 >= rr_srv)
            alive = alive & ~rr_kill
            inv_srv = 1.0 / jnp.maximum(rr_srv, 1e-3)
            rr_ok = do_rr & ~rr_kill
            b0 = jnp.where(rr_ok, b0 * inv_srv, b0)
            b1 = jnp.where(rr_ok, b1 * inv_srv, b1)
            b2 = jnp.where(rr_ok, b2 * inv_srv, b2)
            rr_srv = jnp.where(alive & (mode == 0), one, rr_srv)

            if n_tri:
                # ONE Moller-Trumbore sweep per iteration, serving each
                # lane's pending query: path closest-hit (after any ray
                # change) or NEE shadow occlusion (at walk start) —
                # pallas_volpath teaser-kernel structure (PERF.md round-3
                # addendum 4)
                do_is = alive & (mode == 0) & (needs_i != 0)
                do_oc = is_sh & (sh_occ != 0)
                qdx = jnp.where(do_oc, shx, dx)
                qdy = jnp.where(do_oc, shy, dy)
                qdz = jnp.where(do_oc, shz, dz)

                # skip the whole SMEM sweep on iterations where no lane
                # has a pending query (walk-phase iterations dominate)
                def _sweep(_):
                    return closest_hit(ox, oy, oz, qdx, qdy, qdz)

                def _idle(_):
                    return (jnp.full((sub, 128), _BIG, jnp.float32),
                            zf, zf, zf,
                            jnp.full((sub, 128), -1, jnp.int32),
                            jnp.full((sub, 128), -1, jnp.int32),
                            jnp.full((sub, 128), -1, jnp.int32))

                (t_h, nhx, nhy, nhz, m_h, mi_h,
                 mo_h) = jax.lax.cond(jnp.any(do_is | do_oc),
                                      _sweep, _idle, 0)
                t_surf = jnp.where(do_is, t_h, t_surf)
                hngx = jnp.where(do_is, nhx, hngx)
                hngy = jnp.where(do_is, nhy, hngy)
                hngz = jnp.where(do_is, nhz, hngz)
                hmat = jnp.where(do_is, m_h, hmat)
                hmi = jnp.where(do_is, mi_h, hmi)
                hmo = jnp.where(do_is, mo_h, hmo)
                needs_i = jnp.where(do_is, 0, needs_i)
                # point lights occlude up to the light, env to infinity
                occ_t = jnp.where(mode == 4, jnp.sqrt(sh_d2), _BIG)
                blocked = do_oc & (t_h < occ_t - 1e-4)
                mode = jnp.where(blocked, 0, mode)
                sh_occ = jnp.where(do_oc, 0, sh_occ)
                is_sh = alive & (mode >= 4)
                # a lane whose shadow walk was BLOCKED just dropped to
                # transport with a STALE t_surf (its path ray was never
                # swept after the scatter's direction change): it must
                # stall this iteration, or it starts a walk bounded only
                # by the box wall and traverses the medium THROUGH
                # triangles (measured: +7-16% energy leak around the
                # cubes on point-lit teaser scenes — walk modes never
                # re-run the sweep, so the whole chord went unbounded)
                stall = do_is | (alive & (mode == 0) & (needs_i != 0))
            else:
                stall = jnp.zeros((sub, 128), bool)

            # medium state from POSITION (stuck-lane guard: a grazing
            # entry can land PAST the exit wall; edge-clamped majorants
            # then collide forever)
            oob = ((ox < bmin[0]) | (ox > bmax[0])
                   | (oy < bmin[1]) | (oy > bmax[1])
                   | (oz < bmin[2]) | (oz > bmax[2]))
            med = jnp.where((med == 0) & oob & (mode == 0) & ~stall, -1,
                            med)

            hit, t_wall, entering = _box_hit(ox, oy, oz, dx, dy, dz,
                                             bmin, bmax)

            # -- transport lanes: enter the box or escape ------------------
            outside = alive & (mode == 0) & (med != 0) & ~stall
            if n_tri:
                no_surf = t_surf >= _BIG * 0.5
                escaped = outside & ~hit & no_surf
            else:
                escaped = outside & ~hit
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
                L0 = jnp.where(with_mis, L0 + b0 * float(envL[0]) / den,
                               L0)
                L1 = jnp.where(with_mis, L1 + b1 * float(envL[1]) / den,
                               L1)
                L2 = jnp.where(with_mis, L2 + b2 * float(envL[2]) / den,
                               L2)
                if record:
                    # beta-free MIS-weighted emission on the edge leaving
                    # the most recent vertex (addInfiniteLightEmission)
                    w_mis = jnp.where(first, jnp.ones_like(zf),
                                      ru_avg / den)
                    for sl in range(rec_depth):
                        s_ = escaped & (rslot - 1 == sl)
                        rec_put(11, sl, s_, float(envL[0]) * w_mis)
                        rec_put(12, sl, s_, float(envL[1]) * w_mis)
                        rec_put(13, sl, s_, float(envL[2]) * w_mis)
            alive = alive & ~escaped
            if n_tri:
                # surface BEFORE the box wall: non-medium flight reaches
                # a triangle (glass-interior lanes included); otherwise a
                # box-wall crossing toggles the medium by `entering`
                wall_o = jnp.where(hit, t_wall, _BIG)
                at_surf_nm = outside & ~escaped & ~no_surf \
                    & (t_surf < wall_o)
                iface = outside & ~escaped & ~at_surf_nm & hit
                med = jnp.where(iface, jnp.where(entering, 0, -1), med)
                ox = jnp.where(iface, ox + (t_wall + 1e-4) * dx, ox)
                oy = jnp.where(iface, oy + (t_wall + 1e-4) * dy, oy)
                oz = jnp.where(iface, oz + (t_wall + 1e-4) * dz, oz)
                t_surf = jnp.where(iface, t_surf - (t_wall + 1e-4),
                                   t_surf)
                enter = iface & entering
            else:
                at_surf_nm = jnp.zeros((sub, 128), bool)
                enter = alive & outside & hit & entering
                med = jnp.where(enter, 0, med)
                ox = jnp.where(enter, ox + (t_wall + 1e-4) * dx, ox)
                oy = jnp.where(enter, oy + (t_wall + 1e-4) * dy, oy)
                oz = jnp.where(enter, oz + (t_wall + 1e-4) * dz, oz)
                stuck = alive & outside & hit & ~entering
                alive = alive & ~stuck
            in_med = alive & (mode == 0) & (med == 0) & ~enter & ~stall
            wall = jnp.where(hit, t_wall, _BIG)
            if n_tri:
                # walks are bounded by the NEARER of the wall and the
                # next surface (the resampling route's tMax semantics:
                # media_sampleTMaj.h:137 walks to the closest hit)
                plim = jnp.minimum(wall, t_surf)
            else:
                plim = wall

            # ===== WALK_UNROLL shared majorant+density events per lane =====
            # Round-4: the walk phases (guided reservoir, delta, shadow
            # ratio-tracking) dominate the iteration count while the
            # fixed per-iteration machinery (field fetch + vMF mixtures +
            # NEE + direction sampling + surface sweep) is paid every
            # iteration by every lane. Running WALK_UNROLL micro-steps
            # per iteration amortizes that fixed cost; lanes whose walk
            # concludes freeze until the loop exits (conclusions are
            # processed once, below).
            has_c = has_c_i != 0
            d_real_a = jnp.zeros((sub, 128), bool)
            d_died_a = jnp.zeros((sub, 128), bool)
            d_passed_a = jnp.zeros((sub, 128), bool)
            res_done_a = jnp.zeros((sub, 128), bool)
            for _mstep in range(WALK_UNROLL):
                frozen = d_real_a | d_died_a | d_passed_a | res_done_a
                walk_res_m = walk_res & ~frozen
                walk_del_m = walk_del & ~frozen
                if nds:
                    # mode 2 is the ODS walk under the NDS config; the
                    # reservoir machinery is statically absent. Carry
                    # aliases (reservoir slots reused as ODS state):
                    #   c_t   -> rem (candidate OD distance; -1 = draw,
                    #            _BIG = passing to the surface)
                    #   wT0   -> t_v_cur, wT1 -> t_n_cur
                    #   tau_acc -> t_v (total), c_ste -> t_n (total)
                    #   cn0..2 -> tp (per-channel truncation renorms)
                    #   c_wi  -> dt_lane (1.0 = defensive plain-exp lane)
                    #   w_sum -> inv_gamma (NDS+ primary bias exponent)
                    walk_nds_m = walk_res_m
                    walk_res_m = jnp.zeros((sub, 128), bool)
                    walk_pre_m = alive & (mode == 1) & ~frozen
                else:
                    walk_nds_m = jnp.zeros((sub, 128), bool)
                    walk_pre_m = jnp.zeros((sub, 128), bool)
                is_sh_m = alive & (mode >= 4)
                # -- one shared majorant+density event (micro-step body) ------
                epx = jnp.where(is_sh_m, ox + sh_t * shx, ox + t_walk * dx)
                epy = jnp.where(is_sh_m, oy + sh_t * shy, oy + t_walk * dy)
                epz = jnp.where(is_sh_m, oz + sh_t * shz, oz + t_walk * dz)
                wdx = jnp.where(is_sh_m, shx, dx)
                wdy = jnp.where(is_sh_m, shy, dy)
                wdz = jnp.where(is_sh_m, shz, dz)
                t_lim = jnp.where(is_sh_m, sh_end - sh_t, plim - t_walk)
                ua, ub, uc_, ud_ = _uniform4(seed_a, pix, samp, dim)
                dim = dim + _U32(1)
                if nds:
                    # ODS candidate draw (media_sampleTMaj.h:338-407):
                    # lanes with no active candidate (rem < 0) draw an
                    # OD-space distance from the truncated exponential on
                    # [0, t_n_cur) — defensive (dt_lane) lanes draw the
                    # plain exponential; both accumulate the truncation
                    # renormalizations into tp (pdf bookkeeping for the
                    # one-sample MIS factor r_u_factor).
                    need_d = walk_nds_m & (c_t < 0)
                    tn_pos = jnp.maximum(wT1, 0.0)
                    step_tr = -jnp.expm1(-tn_pos)
                    dist_g = -jnp.log1p(
                        -ua * jnp.clip(step_tr, 0.0, 1.0 - 1e-7))
                    dist = jnp.where(c_wi > 0.5, -jnp.log1p(-ua), dist_g)
                    inv_sth = 1.0 / jnp.maximum(st_h, 1e-30)
                    cn0 = jnp.where(need_d, cn0 * jnp.maximum(-jnp.expm1(
                        -tn_pos * float(st[0]) * inv_sth), 1e-30), cn0)
                    cn1 = jnp.where(need_d, cn1 * jnp.maximum(-jnp.expm1(
                        -tn_pos * float(st[1]) * inv_sth), 1e-30), cn1)
                    cn2 = jnp.where(need_d, cn2 * jnp.maximum(-jnp.expm1(
                        -tn_pos * float(st[2]) * inv_sth), 1e-30), cn2)
                    pass_n = need_d & (wT0 - dist < 1e-5)
                    tailf = jnp.maximum(-jnp.expm1(-jnp.maximum(
                        c_ste - tau_acc, 0.0)), 1e-30)
                    cn0 = jnp.where(pass_n, cn0 / tailf, cn0)
                    cn1 = jnp.where(pass_n, cn1 / tailf, cn1)
                    cn2 = jnp.where(pass_n, cn2 / tailf, cn2)
                    c_t = jnp.where(need_d,
                                    jnp.where(pass_n, _BIG, dist), c_t)
                stepper = (walk_res_m | walk_del_m | is_sh_m
                           | walk_nds_m | walk_pre_m)
                # -- multi-cell flight (pallas_volpath WALK_STEPS idiom):
                # the collision target lives in rate-scaled OD units, so
                # one target crosses any number of majorant cells; the
                # per-cell exits use hoisted cell-space coordinates.
                # reservoir lanes consume at the VSP-scaled rate
                # (media_sampleTMaj.h:170-181); ODS lanes consume their
                # candidate OD c_t at the unscaled rate; the prepass
                # never collides (accumulates OD to the chord end).
                rate = jnp.where(walk_res_m, maj_sc, one)
                tau0 = -jnp.log1p(-ua)
                if nds:
                    tau0 = jnp.where(walk_nds_m, jnp.maximum(c_t, 0.0),
                                     tau0)
                    tau0 = jnp.where(walk_pre_m, _BIG, tau0)
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
                S_raw = zf
                tau_rem = tau0
                m_last = zf
                act_w = stepper
                coll_w = jnp.zeros((sub, 128), bool)
                for _kk in range(WALK_STEPS):
                    ux = u0x + t_cum * du_x
                    uy = u0y + t_cum * du_y
                    uz = u0z + t_cum * du_z
                    # lookup cell: truncation without nudge (maj_dens_at
                    # semantics); exit bound: nudged floor (seg_exit)
                    ix = jnp.clip(ux.astype(jnp.int32), 0, mx - 1)
                    iy = jnp.clip(uy.astype(jnp.int32), 0, my - 1)
                    iz = jnp.clip(uz.astype(jnp.int32), 0, mz - 1)
                    flat_w = (ix * my + iy) * mz + iz
                    if mxu:
                        m_raw_i = maj_mxu_lookup(flat_w)
                    else:
                        m_raw_i = table_lookup(maj_ref, n_maj_chunks,
                                               flat_w)
                    cfx = jnp.floor(ux + eps_x)
                    cfy = jnp.floor(uy + eps_y)
                    cfz = jnp.floor(uz + eps_z)
                    bx = jnp.where(wdx >= 0, cfx + 1.0, cfx)
                    by = jnp.where(wdy >= 0, cfy + 1.0, cfy)
                    bz = jnp.where(wdz >= 0, cfz + 1.0, cfz)
                    t_exit = jnp.minimum(
                        jnp.minimum((bx - u0x) * inv_du_x,
                                    (by - u0y) * inv_du_y),
                        (bz - u0z) * inv_du_z)
                    t_exit = jnp.maximum(t_exit, t_cum + 1e-5)
                    end_c = jnp.minimum(t_exit, t_lim)
                    r_i = m_raw_i * rate * st_h
                    dtau = r_i * jnp.maximum(end_c - t_cum, 0.0)
                    hit_c = act_w & (tau_rem < dtau)
                    at_lim = act_w & ~hit_c & (t_lim <= t_exit + 1e-6)
                    t_next = jnp.where(
                        hit_c, t_cum + tau_rem / jnp.maximum(r_i, 1e-30),
                        end_c)
                    S_raw = jnp.where(act_w,
                                      S_raw + m_raw_i * (t_next - t_cum),
                                      S_raw)
                    t_cum = jnp.where(
                        act_w,
                        jnp.where(hit_c | at_lim, t_next, t_exit + 1e-6),
                        t_cum)
                    tau_rem = jnp.where(act_w & ~hit_c, tau_rem - dtau,
                                        tau_rem)
                    m_last = jnp.where(hit_c, m_raw_i, m_last)
                    coll_w = coll_w | hit_c
                    act_w = act_w & ~hit_c & ~at_lim
                coll = stepper & coll_w
                m_d = jnp.where(walk_res_m, m_last * maj_sc, m_last)
                maj_h = m_d * st_h
                dt = t_cum
                step = t_cum
                S_eff = S_raw * rate
                od_raw = st_h * S_raw  # unscaled OD traversed this step
                Tm_h = jnp.maximum(jnp.exp(-st_h * S_eff), 1e-30)
                if sigma_gray:
                    Tm = (Tm_h,) * 3
                    sc_tail = (one,) * 3
                else:
                    Tm = tuple(jnp.exp(-float(st[k]) * S_eff)
                               for k in range(3))
                    sc_tail = tuple(Tm[k] / Tm_h for k in range(3))
                un0, un1, un2, un3 = _uniform4(seed_a, pix, samp, dim)
                dim = dim + _U32(1)
                cpx = epx + dt * wdx
                cpy = epy + dt * wdy
                cpz = epz + dt * wdz
                if stoch:
                    dloc = density_at_1(cpx, cpy, cpz, un2, un3)
                else:
                    dloc = density_at(cpx, cpy, cpz)
                st_loc_h = dloc * st_h
                sn = tuple(jnp.maximum((m_d - dloc) * float(st[k]), 0.0)
                           for k in range(3))
                sn_h = jnp.maximum(m_d - dloc, 0.0) * st_h

                # ===== modes 4/5: one shadow ratio-tracking step ===============
                s_coll = is_sh_m & coll
                s_tail = is_sh_m & ~coll
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
                pdf_sh = jnp.maximum(Tm_h * maj_h, 1e-30)
                inv_spdf = 1.0 / pdf_sh
                sT0 = jnp.where(s_coll, sT0 * Tm[0] * sn[0] * inv_spdf, sT0)
                sT1 = jnp.where(s_coll, sT1 * Tm[1] * sn[1] * inv_spdf, sT1)
                sT2 = jnp.where(s_coll, sT2 * Tm[2] * sn[2] * inv_spdf, sT2)
                sl0 = jnp.where(s_coll,
                                sl0 * Tm[0] * m_d * float(st[0]) * inv_spdf,
                                sl0)
                sl1 = jnp.where(s_coll,
                                sl1 * Tm[1] * m_d * float(st[1]) * inv_spdf,
                                sl1)
                sl2 = jnp.where(s_coll,
                                sl2 * Tm[2] * m_d * float(st[2]) * inv_spdf,
                                sl2)
                su0 = jnp.where(s_coll, su0 * Tm[0] * sn[0] * inv_spdf, su0)
                su1 = jnp.where(s_coll, su1 * Tm[1] * sn[1] * inv_spdf, su1)
                su2 = jnp.where(s_coll, su2 * Tm[2] * sn[2] * inv_spdf, su2)
                # transmittance russian roulette (integrators.cpp:1404)
                denom_rr = jnp.maximum(
                    avg3((sl0 + su0, sl1 + su1, sl2 + su2)), 1e-30)
                trm = jnp.maximum(jnp.maximum(sT0, sT1), sT2) / denom_rr
                low = s_coll & (trm < 0.05)
                killed = low & (un0 < 0.75)
                sT0 = jnp.where(killed, zf, jnp.where(low, sT0 / 0.25, sT0))
                sT1 = jnp.where(killed, zf, jnp.where(low, sT1 / 0.25, sT1))
                sT2 = jnp.where(killed, zf, jnp.where(low, sT2 / 0.25, sT2))
                sh_t_new = sh_t + step + 1e-6
                sh_t = jnp.where(is_sh_m, sh_t_new, sh_t)
                s_dead = is_sh_m & (
                    (jnp.maximum(jnp.maximum(sT0, sT1), sT2) == 0)
                    | (sh_t_new >= sh_end))
                # fold the finished walk: sh_f = f_hg(wi)/scale_v so that the
                # POST-continuation beta reproduces beta_scatter * f_hg
                if has_point:
                    okp = s_dead & (mode == 4)
                    denom = jnp.maximum(
                        avg3((sl0 * ru0 * pmf, sl1 * ru1 * pmf,
                              sl2 * ru2 * pmf)), 1e-30)
                    w = sh_f / (sh_d2 * denom)
                    if n_tri and any_rough:
                        w1_ = sh_f1 / (sh_d2 * denom)
                        w2_ = sh_f2 / (sh_d2 * denom)
                    else:
                        w1_ = w2_ = w
                    L0 = jnp.where(okp, L0 + b0 * sT0 * float(lI[0]) * w, L0)
                    L1 = jnp.where(okp, L1 + b1 * sT1 * float(lI[1]) * w1_,
                                   L1)
                    L2 = jnp.where(okp, L2 + b2 * sT2 * float(lI[2]) * w2_,
                                   L2)
                    if record:
                        # beta-free direct at the vertex (_combine_ld local:
                        # r_p == 1 in the MIS denominator); ra* carry the
                        # surface-BSDF albedo tint (1 at volume vertices)
                        den_lp = jnp.maximum(
                            avg3((sl0 * pmf, sl1 * pmf, sl2 * pmf)), 1e-30)
                        wl_ = sh_fl / (sh_d2 * den_lp)
                        t0_ = ra0 if n_tri else one
                        t1_ = ra1 if n_tri else one
                        t2_ = ra2 if n_tri else one
                        for sl in range(rec_depth):
                            s_ = okp & (rslot - 1 == sl)
                            rec_put(8, sl, s_, sT0 * float(lI[0]) * wl_ * t0_)
                            rec_put(9, sl, s_, sT1 * float(lI[1]) * wl_ * t1_)
                            rec_put(10, sl, s_,
                                    sT2 * float(lI[2]) * wl_ * t2_)
                if has_env:
                    oke = s_dead & (mode == 5)
                    p_l = pmf * INV_4PI
                    denom = jnp.maximum(
                        avg3((sl0 * ru0 * p_l + su0 * ru0 * sh_pdf,
                              sl1 * ru1 * p_l + su1 * ru1 * sh_pdf,
                              sl2 * ru2 * p_l + su2 * ru2 * sh_pdf)), 1e-30)
                    w = sh_f / denom
                    if n_tri and any_rough:
                        w1_ = sh_f1 / denom
                        w2_ = sh_f2 / denom
                    else:
                        w1_ = w2_ = w
                    L0 = jnp.where(oke, L0 + b0 * sT0 * float(envL[0]) * w, L0)
                    L1 = jnp.where(oke, L1 + b1 * sT1 * float(envL[1]) * w1_,
                                   L1)
                    L2 = jnp.where(oke, L2 + b2 * sT2 * float(envL[2]) * w2_,
                                   L2)
                    if record:
                        den_le = jnp.maximum(
                            avg3((sl0 * p_l + su0 * sh_pdf,
                                  sl1 * p_l + su1 * sh_pdf,
                                  sl2 * p_l + su2 * sh_pdf)), 1e-30)
                        wl_ = sh_fl / den_le
                        t0_ = ra0 if n_tri else one
                        t1_ = ra1 if n_tri else one
                        t2_ = ra2 if n_tri else one
                        for sl in range(rec_depth):
                            s_ = oke & (rslot - 1 == sl)
                            cur0 = rec_ref[8, sl]
                            rec_put(8, sl, s_, cur0 + sT0 * float(envL[0])
                                    * wl_ * t0_)
                            cur1 = rec_ref[9, sl]
                            rec_put(9, sl, s_, cur1 + sT1 * float(envL[1])
                                    * wl_ * t1_)
                            cur2 = rec_ref[10, sl]
                            rec_put(10, sl, s_, cur2 + sT2 * float(envL[2])
                                    * wl_ * t2_)
                mode = jnp.where(s_dead, 0, mode)

                # ===== mode 3: one delta-tracking step =========================
                # (under the NDS config, ODS lanes [mode 2] ride the same
                # step algebra: their candidate distances were drawn in
                # OD space above, and NDS-specific MIS/bias factors are
                # applied after the shared updates)
                wd_m = (walk_del_m | walk_nds_m) if nds else walk_del_m
                d_coll = wd_m & coll
                d_tail = wd_m & ~coll
                if not sigma_gray:
                    wf0 = jnp.where(d_tail, wf0 * sc_tail[0], wf0)
                    wf1 = jnp.where(d_tail, wf1 * sc_tail[1], wf1)
                    wf2 = jnp.where(d_tail, wf2 * sc_tail[2], wf2)
                    wu0 = jnp.where(d_tail, wu0 * sc_tail[0], wu0)
                    wu1 = jnp.where(d_tail, wu1 * sc_tail[1], wu1)
                    wu2 = jnp.where(d_tail, wu2 * sc_tail[2], wu2)
                    wl0 = jnp.where(d_tail, wl0 * sc_tail[0], wl0)
                    wl1 = jnp.where(d_tail, wl1 * sc_tail[1], wl1)
                    wl2 = jnp.where(d_tail, wl2 * sc_tail[2], wl2)
                p_real = st_loc_h / jnp.maximum(maj_h, 1e-30)
                if nds_plus:
                    # NDS+ raises the primary-ray real-collision
                    # probability to pScatter^(1/(1+Tr)) using the
                    # previous-wave transmittance buffer
                    # (guidedvolpathvspgintegrator.cpp:929-938); w_sum
                    # aliases inv_gamma for ODS lanes
                    prim_l = walk_nds_m & (depth == 0)
                    p_cls = jnp.where(
                        prim_l,
                        jnp.clip(p_real, 1e-30, 1.0)
                        ** jnp.clip(w_sum, 1e-3, 1.0),
                        p_real)
                else:
                    p_cls = p_real
                d_real = d_coll & (ub < p_cls)
                d_real_a = d_real_a | d_real
                d_null = d_coll & ~d_real
                pdf_r = jnp.maximum(Tm_h * st_loc_h, 1e-30)
                wf0 = jnp.where(d_real,
                                wf0 * Tm[0] * dloc * float(ss[0]) / pdf_r, wf0)
                wf1 = jnp.where(d_real,
                                wf1 * Tm[1] * dloc * float(ss[1]) / pdf_r, wf1)
                wf2 = jnp.where(d_real,
                                wf2 * Tm[2] * dloc * float(ss[2]) / pdf_r, wf2)
                wu0 = jnp.where(d_real,
                                wu0 * Tm[0] * dloc * float(st[0]) / pdf_r, wu0)
                wu1 = jnp.where(d_real,
                                wu1 * Tm[1] * dloc * float(st[1]) / pdf_r, wu1)
                wu2 = jnp.where(d_real,
                                wu2 * Tm[2] * dloc * float(st[2]) / pdf_r, wu2)
                pdf_dn = Tm_h * sn_h
                inv_dn = 1.0 / jnp.maximum(pdf_dn, 1e-30)
                wf0 = jnp.where(d_null, wf0 * Tm[0] * sn[0] * inv_dn, wf0)
                wf1 = jnp.where(d_null, wf1 * Tm[1] * sn[1] * inv_dn, wf1)
                wf2 = jnp.where(d_null, wf2 * Tm[2] * sn[2] * inv_dn, wf2)
                wu0 = jnp.where(d_null, wu0 * Tm[0] * sn[0] * inv_dn, wu0)
                wu1 = jnp.where(d_null, wu1 * Tm[1] * sn[1] * inv_dn, wu1)
                wu2 = jnp.where(d_null, wu2 * Tm[2] * sn[2] * inv_dn, wu2)
                wl0 = jnp.where(d_null,
                                wl0 * Tm[0] * m_d * float(st[0]) * inv_dn, wl0)
                wl1 = jnp.where(d_null,
                                wl1 * Tm[1] * m_d * float(st[1]) * inv_dn, wl1)
                wl2 = jnp.where(d_null,
                                wl2 * Tm[2] * m_d * float(st[2]) * inv_dn, wl2)
                d_died_a = d_died_a | (d_null & (
                    (pdf_dn <= 0)
                    | (jnp.maximum(jnp.maximum(wf0, wf1), wf2) == 0)))
                del_t_new = jnp.where(d_coll, t_walk + dt + 1e-6,
                                      t_walk + step + 1e-6)
                pass_now_w = d_tail & (del_t_new >= plim)
                d_passed_a = d_passed_a | pass_now_w
                t_walk = jnp.where(wd_m, del_t_new, t_walk)
                if nds:
                    # ODS bookkeeping: consume the traversed OD from the
                    # running interval; null collisions re-draw next step
                    od_step = od_raw
                    wT0 = jnp.where(walk_nds_m, wT0 - od_step, wT0)
                    wT1 = jnp.where(walk_nds_m, wT1 - od_step, wT1)
                    n_coll = walk_nds_m & coll
                    c_t = jnp.where(n_coll, -one,
                                    jnp.where(walk_nds_m & ~coll,
                                              c_t - od_step, c_t))
                    # one-sample MIS factor vs plain delta tracking
                    # (media_sampleTMaj.h:389,435,461): applied to r_u at
                    # real collisions and to r_u AND r_l at pass-exit
                    ruf0 = mis_ratio / jnp.maximum(cn0, 1e-30) \
                        + (1.0 - mis_ratio)
                    ruf1 = mis_ratio / jnp.maximum(cn1, 1e-30) \
                        + (1.0 - mis_ratio)
                    ruf2 = mis_ratio / jnp.maximum(cn2, 1e-30) \
                        + (1.0 - mis_ratio)
                    nreal = d_real & walk_nds_m
                    npass = pass_now_w & walk_nds_m
                    wu0 = jnp.where(nreal | npass, wu0 * ruf0, wu0)
                    wu1 = jnp.where(nreal | npass, wu1 * ruf1, wu1)
                    wu2 = jnp.where(nreal | npass, wu2 * ruf2, wu2)
                    wl0 = jnp.where(npass, wl0 * ruf0, wl0)
                    wl1 = jnp.where(npass, wl1 * ruf1, wl1)
                    wl2 = jnp.where(npass, wl2 * ruf2, wl2)
                    if nds_plus:
                        # exact r_u compensation for the biased
                        # classification (channel-independent ratios)
                        comp_r = m_d * p_cls / jnp.maximum(dloc, 1e-30)
                        comp_n = m_d * (1.0 - p_cls) \
                            / jnp.maximum(m_d - dloc, 1e-30)
                        nr_p = nreal & prim_l
                        nn_p = d_null & prim_l
                        wu0 = jnp.where(nr_p, wu0 * comp_r,
                                        jnp.where(nn_p, wu0 * comp_n,
                                                  wu0))
                        wu1 = jnp.where(nr_p, wu1 * comp_r,
                                        jnp.where(nn_p, wu1 * comp_n,
                                                  wu1))
                        wu2 = jnp.where(nr_p, wu2 * comp_r,
                                        jnp.where(nn_p, wu2 * comp_n,
                                                  wu2))
                    # ===== mode 1: exact majorant-OD prepass ==========
                    # (media_sampleTMaj.h:298-314; tau_acc accumulates
                    # t_v; at the chord end the lane either falls back to
                    # plain delta tracking — NDS cannot LOWER the scatter
                    # probability below 1-e^-t_v — or starts the ODS walk)
                    tau_acc = jnp.where(walk_pre_m, tau_acc + od_raw,
                                        tau_acc)
                    pre_t_new = t_walk + step + 1e-6
                    pre_done = walk_pre_m & (pre_t_new >= plim)
                    t_walk = jnp.where(walk_pre_m,
                                       jnp.where(pre_done, zf, pre_t_new),
                                       t_walk)
                    one_m_e = -jnp.expm1(-tau_acc)
                    fb_nds = pre_done & ((vsp_c < one_m_e)
                                         | (tau_acc <= 1e-7))
                    go_nds = pre_done & ~fb_nds
                    mode = jnp.where(pre_done,
                                     jnp.where(fb_nds, 3, 2), mode)
                    t_n0 = -jnp.log1p(-jnp.minimum(
                        one_m_e / jnp.maximum(vsp_c, 1e-4), 1.0 - 1e-7))
                    wT0 = jnp.where(go_nds, tau_acc, wT0)
                    wT1 = jnp.where(go_nds, t_n0, wT1)
                    c_ste = jnp.where(go_nds, t_n0, c_ste)
                    c_t = jnp.where(go_nds, -one, c_t)
                    cn0 = jnp.where(go_nds, one, cn0)
                    cn1 = jnp.where(go_nds, one, cn1)
                    cn2 = jnp.where(go_nds, one, cn2)
                    # defensive-MIS technique pick (':338-345')
                    c_wi = jnp.where(
                        go_nds, (uc_ > mis_ratio).astype(jnp.float32),
                        c_wi)
                    if nds_plus:
                        tr_h = jnp.where(hero == 0, tr_prev[0],
                                         jnp.where(hero == 1, tr_prev[1],
                                                   tr_prev[2]))
                        w_sum = jnp.where(
                            go_nds,
                            jnp.where(depth == 0,
                                      1.0 / (1.0 + jnp.clip(tr_h, 0.0,
                                                            1.0)),
                                      one),
                            w_sum)
                    else:
                        w_sum = jnp.where(go_nds, one, w_sum)

                # ===== mode 2: one reservoir-resampling step ===================
                # One-pass TPU adaptation of the reference's TWO-pass resampling
                # route (media_sampleTMaj.h:153-181 walks the whole segment once
                # just to sum the majorant optical depth before the collision
                # walk): the reservoir walk always continues to the far wall, so
                # the majorant optical depth is accumulated DURING the walk and
                # the volume-ratio weight is formed at conclusion instead.
                # Halves the volume traversals per guided segment; the RIS
                # weights stay self-consistent, so the estimator is unbiased.
                tau_acc = jnp.where(walk_res_m, tau_acc + od_raw,
                                    tau_acc)
                r_coll = walk_res_m & coll
                r_tail = walk_res_m & ~coll
                live_r = walk_res_m
                wT0n = jnp.where(live_r, wT0 * Tm[0], wT0)
                wT1n = jnp.where(live_r, wT1 * Tm[1], wT1)
                wT2n = jnp.where(live_r, wT2 * Tm[2], wT2)
                tr_h = jnp.where(hero == 0, wr0,
                                 jnp.where(hero == 1, wr1, wr2))
                wi_r = jnp.where(r_coll,
                                 st_loc_h / jnp.maximum(maj_h, 1e-30) * tr_h,
                                 0.0)
                w_sum_new = w_sum + wi_r
                take = r_coll & (wi_r > 0) \
                    & (ub < wi_r / jnp.maximum(w_sum_new, 1e-30))
                T_h = jnp.maximum(
                    jnp.where(hero == 0, wT0n,
                              jnp.where(hero == 1, wT1n, wT2n)), 1e-30)
                pdf_rr = jnp.maximum(T_h * st_loc_h, 1e-30)
                num0 = wf0 * wT0n * dloc * float(ss[0]) / pdf_rr
                num1 = wf1 * wT1n * dloc * float(ss[1]) / pdf_rr
                num2 = wf2 * wT2n * dloc * float(ss[2]) / pdf_rr
                den0 = wu0 * wT0n * dloc * float(st[0]) / pdf_rr
                den1 = wu1 * wT1n * dloc * float(st[1]) / pdf_rr
                den2 = wu2 * wT2n * dloc * float(st[2]) / pdf_rr
                t_c_r = t_walk + dt
                c_t = jnp.where(take, t_c_r, c_t)
                c_wi = jnp.where(take, wi_r, c_wi)
                c_ste = jnp.where(take, wi_r, c_ste)
                cn0 = jnp.where(take, num0, cn0)
                cn1 = jnp.where(take, num1, cn1)
                cn2 = jnp.where(take, num2, cn2)
                cd0 = jnp.where(take, den0, cd0)
                cd1 = jnp.where(take, den1, cd1)
                cd2 = jnp.where(take, den2, cd2)
                has_c = has_c | take
                w_sum = jnp.where(r_coll, w_sum_new, w_sum)
                pdf_rn = jnp.maximum(T_h * sn_h, 1e-30)
                wf0 = jnp.where(r_coll, wf0 * wT0n * sn[0] / pdf_rn, wf0)
                wf1 = jnp.where(r_coll, wf1 * wT1n * sn[1] / pdf_rn, wf1)
                wf2 = jnp.where(r_coll, wf2 * wT2n * sn[2] / pdf_rn, wf2)
                wu0 = jnp.where(r_coll, wu0 * wT0n * sn[0] / pdf_rn, wu0)
                wu1 = jnp.where(r_coll, wu1 * wT1n * sn[1] / pdf_rn, wu1)
                wu2 = jnp.where(r_coll, wu2 * wT2n * sn[2] / pdf_rn, wu2)
                wl0 = jnp.where(r_coll,
                                wl0 * wT0n * m_d * float(st[0]) / pdf_rn, wl0)
                wl1 = jnp.where(r_coll,
                                wl1 * wT1n * m_d * float(st[1]) / pdf_rn, wl1)
                wl2 = jnp.where(r_coll,
                                wl2 * wT2n * m_d * float(st[2]) / pdf_rn, wl2)
                inv_mh = 1.0 / jnp.maximum(m_d, 1e-30)
                nsc = jnp.maximum(m_d - dloc, 0.0) * inv_mh
                wr0 = jnp.where(r_coll, wr0 * nsc, wr0)
                wr1 = jnp.where(r_coll, wr1 * nsc, wr1)
                wr2 = jnp.where(r_coll, wr2 * nsc, wr2)
                wT0 = jnp.where(r_coll, one, wT0n)
                wT1 = jnp.where(r_coll, one, wT1n)
                wT2 = jnp.where(r_coll, one, wT2n)
                # transmittance RR on the walk TAIL (the shadow walk's
                # integrators.cpp:1404 pattern): once the null-ratio product
                # has collapsed, the remaining chord only serves the
                # (near-zero) pass-through candidate — every candidate
                # snapshot already taken is unaffected. Terminating sets
                # wr = 0 (surface candidate killed); survivors compensate
                # ALL tail-dependent running products. Cuts the dense-chord
                # full-traversal cost that dominates the guided walk
                # (PERF.md round-4 ablation: delta walks stop at the first
                # real collision; this walk crossed the whole chord).
                # NOTE (round-4): a transmittance-RR truncation of this walk
                # (kill the tail once the null-ratio product collapses, the
                # shadow walk's integrators.cpp:1404 pattern) measured a 3x
                # relMSE REGRESSION on the backlit pyro cloud at zero
                # throughput gain — on backlit media the pass-through
                # candidate carries the dominant (transmitted) contribution,
                # so truncating it trades exactly the wrong variance. Keep
                # the full-chord walk (the reference's own cost profile,
                # media_sampleTMaj.h:183-247).
                res_t_new = jnp.where(r_coll, t_c_r,
                                      t_walk + step + 1e-6)
                t_walk = jnp.where(walk_res_m, res_t_new, t_walk)
                res_done_a = res_done_a \
                    | (walk_res_m & (res_t_new >= plim))

            d_real = d_real_a
            d_died = d_died_a
            d_passed = d_passed_a
            res_done = res_done_a
            u_rc, _, _, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)

            # reservoir conclusion: final tail fold + candidate selection
            T_hf = jnp.maximum(
                jnp.where(hero == 0, wT0, jnp.where(hero == 1, wT1, wT2)),
                1e-30)
            ff0 = wf0 * wT0 / T_hf
            ff1 = wf1 * wT1 / T_hf
            ff2 = wf2 * wT2 / T_hf
            fu0_ = wu0 * wT0 / T_hf
            fu1_ = wu1 * wT1 / T_hf
            fu2_ = wu2 * wT2 / T_hf
            fl0_ = wl0 * wT0 / T_hf
            fl1_ = wl1 * wT1 / T_hf
            fl2_ = wl2 * wT2 / T_hf
            tr_hf = jnp.where(hero == 0, wr0,
                              jnp.where(hero == 1, wr1, wr2))
            surf_wi = tr_hf
            adj = res_done & (tr_hf < 1) & (tr_hf > 0) & (w_sum > 0)
            # volume ratio from the ACTUAL scaled optical depth the walk
            # traversed (prepass-free: tau accumulated in-walk above).
            # The exact prepass guarantees achieved-P >= vsp so vratio <= 1
            # (media_sampleTMaj.h:170-181); with an ESTIMATED scale the
            # walk can undershoot — clamp to keep the surface candidate's
            # RIS weight non-negative (a negative weight silently drops
            # the transmitted contribution on thin rays: measured as a
            # relMSE floor at the cloud edges)
            vratio = jnp.minimum(
                vsp_c / jnp.maximum(1.0 - jnp.exp(-maj_sc * tau_acc),
                                    1e-6), 1.0)
            vol_ratio = (vratio * mis_ratio
                         + (1.0 - tr_hf) * (1.0 - mis_ratio))
            surf_ratio = 1.0 - vol_ratio
            surf_wi = jnp.where(
                adj, surf_ratio / jnp.maximum(vol_ratio, 1e-6) * w_sum,
                surf_wi)
            w_total = w_sum + surf_wi
            r_dead0 = res_done & (w_total <= 0)
            pick_surf = res_done & ~r_dead0 \
                & (u_rc < surf_wi / jnp.maximum(w_total, 1e-30))
            pick_vol = res_done & ~r_dead0 & ~pick_surf & has_c
            r_dead = r_dead0 | (res_done & ~pick_surf & ~has_c)
            sel_wi = jnp.where(pick_surf, surf_wi, c_wi)
            sel_ste = jnp.where(pick_surf, tr_hf, c_ste)
            sn0_ = jnp.where(pick_surf, ff0, cn0)
            sn1_ = jnp.where(pick_surf, ff1, cn1)
            sn2_ = jnp.where(pick_surf, ff2, cn2)
            sd0_ = jnp.where(pick_surf, fu0_, cd0)
            sd1_ = jnp.where(pick_surf, fu1_, cd1)
            sd2_ = jnp.where(pick_surf, fu2_, cd2)
            factor = w_total * sel_ste / jnp.maximum(sel_wi, 1e-30)
            r_ok = res_done & ~r_dead
            rfb0 = jnp.where(r_ok, sn0_ * factor, one)
            rfb1 = jnp.where(r_ok, sn1_ * factor, one)
            rfb2 = jnp.where(r_ok, sn2_ * factor, one)
            rfu0 = jnp.where(r_ok, sd0_, one)
            rfu1 = jnp.where(r_ok, sd1_, one)
            rfu2 = jnp.where(r_ok, sd2_, one)
            rfl0 = jnp.where(pick_surf, fl0_, one)
            rfl1 = jnp.where(pick_surf, fl1_, one)
            rfl2 = jnp.where(pick_surf, fl2_, one)
            r_bad = r_ok & ~(jnp.isfinite(rfb0) & jnp.isfinite(rfb1)
                             & jnp.isfinite(rfb2) & jnp.isfinite(rfu0)
                             & jnp.isfinite(rfu1) & jnp.isfinite(rfu2)
                             & jnp.isfinite(rfl0) & jnp.isfinite(rfl1)
                             & jnp.isfinite(rfl2))
            r_dead = r_dead | r_bad
            r_scat = pick_vol & ~r_bad

            # ===== merged walk conclusions ================================
            # apply the accumulated walk factors to the path weights
            del_conc = d_real | d_died | d_passed
            b0 = jnp.where(del_conc, b0 * wf0, jnp.where(res_done,
                                                         b0 * rfb0, b0))
            b1 = jnp.where(del_conc, b1 * wf1, jnp.where(res_done,
                                                         b1 * rfb1, b1))
            b2 = jnp.where(del_conc, b2 * wf2, jnp.where(res_done,
                                                         b2 * rfb2, b2))
            ru0 = jnp.where(del_conc, ru0 * wu0, jnp.where(res_done,
                                                           ru0 * rfu0, ru0))
            ru1 = jnp.where(del_conc, ru1 * wu1, jnp.where(res_done,
                                                           ru1 * rfu1, ru1))
            ru2 = jnp.where(del_conc, ru2 * wu2, jnp.where(res_done,
                                                           ru2 * rfu2, ru2))
            rl0 = jnp.where(del_conc, rl0 * wl0,
                            jnp.where(res_done, rl0 * rfl0, rl0))
            rl1 = jnp.where(del_conc, rl1 * wl1,
                            jnp.where(res_done, rl1 * rfl1, rl1))
            rl2 = jnp.where(del_conc, rl2 * wl2,
                            jnp.where(res_done, rl2 * rfl2, rl2))
            scat_w = d_real | r_scat
            term_w = d_died | r_dead
            passed = d_passed | pick_surf
            if nds:
                # c_t aliases the ODS candidate OD (can be _BIG): only
                # delta/ODS real collisions carry a scatter t here
                t_sc = jnp.where(d_real, t_walk, zf)
            else:
                t_sc = jnp.where(d_real, t_walk, c_t)  # delta: t at real
            alive = alive & ~term_w
            depth_exceeded = scat_w & (depth >= max_depth)
            alive = alive & ~depth_exceeded
            scat = scat_w & ~depth_exceeded & alive
            depth = jnp.where(scat, depth + 1, depth)
            # pass-through lanes reach the segment bound: the box wall
            # (leave the medium; box convex: next iteration escapes) or
            # — teaser scenes — the next triangle (surface interaction
            # below, medium unchanged). Every concluded walk drops back
            # to transport (scatter lanes re-enter shadow mode below).
            if n_tri:
                at_surf_m = passed & (t_surf < wall - 1e-6)
                leave = passed & ~at_surf_m
            else:
                at_surf_m = jnp.zeros((sub, 128), bool)
                leave = passed
            med = jnp.where(leave, -1, med)
            mode = jnp.where(passed | term_w | scat_w, 0, mode)
            ox = jnp.where(leave, ox + (wall + 1e-4) * dx, ox)
            oy = jnp.where(leave, oy + (wall + 1e-4) * dy, oy)
            oz = jnp.where(leave, oz + (wall + 1e-4) * dz, oz)
            if n_tri:
                t_surf = jnp.where(leave, t_surf - (wall + 1e-4), t_surf)

            # ===== ONE shared field query ================================
            # serves (a) transport lanes starting a walk (secondary VSP
            # along d at o), (b) scatter vertices (directional guiding
            # product + flux for guided RR at s) and — teaser scenes —
            # (c) surface hits (guided-BSDF surface half + guided RR
            # flux at h) — pairwise disjoint lane sets
            sx = ox + t_sc * dx
            sy = oy + t_sc * dy
            sz = oz + t_sc * dz
            qx = jnp.where(scat, sx, ox)
            qy = jnp.where(scat, sy, oy)
            qz = jnp.where(scat, sz, oz)
            if n_tri:
                # surface interaction lanes (depth cap applies to surface
                # bounces too, integrators.cpp:1060)
                hit_s0 = (at_surf_m | at_surf_nm) & (hmat >= 0)
                s_exceed = hit_s0 & (depth >= max_depth)
                alive = alive & ~s_exceed
                hit_s = hit_s0 & ~s_exceed & alive
                depth = jnp.where(hit_s, depth + 1, depth)
                hx = ox + t_surf * dx
                hy = oy + t_surf * dy
                hz = oz + t_surf * dz
                qx = jnp.where(hit_s, hx, qx)
                qy = jnp.where(hit_s, hy, qy)
                qz = jnp.where(hit_s, hz, qz)
            fq = field_query(qx, qy, qz)
            lobes_q, valid_q, vsp_cell_q, flux_q = fq[:4]
            if with_surf:
                slobes_q, svalid_q, _svsp_q, sflux_q = fq[4:8]

            # -- transport lanes: VSP lookup + walk start ------------------
            primary = depth == 0
            vsp = jnp.full_like(zf, -1.0)
            if guide_primary:
                vsp = jnp.where(primary, isgb_vsp, vsp)
            if guide_secondary:
                v_sec = vsp_directional(lobes_q, vsp_cell_q, dx, dy, dz)
                vsp = jnp.where(~primary, v_sec, vsp)
            guide = in_med & (vsp >= 0.0)
            vsp_c = jnp.where(in_med, jnp.clip(vsp, 0.001, 0.999), vsp_c)
            if nds:
                # guided lanes first run the EXACT majorant-OD prepass
                # (mode 1, media_sampleTMaj.h:298-314) and then the ODS
                # walk (mode 2); no majorant scaling in OD space. (Mode 1
                # is free here; modes >= 4 are the shadow walks.)
                mode = jnp.where(in_med, jnp.where(guide, 1, 3), mode)
            else:
                mode = jnp.where(in_med, jnp.where(guide, 2, 3), mode)
            t_walk = jnp.where(in_med, zf, t_walk)
            w_sum = jnp.where(in_med, zf, w_sum)
            tau_acc = jnp.where(in_med, zf, tau_acc)
            # majorant scale for the guided walk: a ONE-point stochastic
            # estimate of the segment's majorant optical depth replaces
            # the reference's exact prepass (media_sampleTMaj.h:170-181).
            # The scale only shapes importance — an estimate costs some
            # variance in thin regions, never bias; the clip bounds the
            # collision blowup when the estimate runs low.
            u_m0, _, _, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            m_pt = maj_dens_at(ox + u_m0 * plim * dx,
                               oy + u_m0 * plim * dy,
                               oz + u_m0 * plim * dz)
            tau_e = m_pt * st_h * plim
            # collision-budget cap: the reference scales the majorant so
            # achieved-P >= vsp (media_sampleTMaj.h:170-181); at the 0.999
            # VSP clamp that is -log(1e-3) ~ 6.9 expected collisions per
            # guided segment — ~7 block-wide iterations on a TPU where a
            # delta walk stops at the FIRST real collision (the measured
            # 2.5x cost gap, PERF.md round-4 ablation). Targeting at most
            # P ~ scale_vsp_cap keeps dense segments exact (tau already >
            # min_total there => scale 1) and caps thin-segment walks at
            # ~3 collisions; the scale only shapes importance — the
            # vratio<=1 clamp already handles under-achieved targets, so
            # the estimator stays unbiased.
            vsp_for_scale = jnp.minimum(vsp_c, scale_vsp_cap)
            min_total = -jnp.log(jnp.maximum(1.0 - vsp_for_scale, 1e-6))
            if nds:
                maj_sc = jnp.where(in_med, one, maj_sc)
            else:
                maj_sc = jnp.where(
                    guide,
                    jnp.clip(min_total / jnp.maximum(tau_e, 1e-6), 1.0,
                             16.0),
                    jnp.where(in_med, one, maj_sc))
            # per-walk state init (delta + reservoir share wf/wu/wl)
            wf0 = jnp.where(in_med, one, wf0)
            wf1 = jnp.where(in_med, one, wf1)
            wf2 = jnp.where(in_med, one, wf2)
            wu0 = jnp.where(in_med, one, wu0)
            wu1 = jnp.where(in_med, one, wu1)
            wu2 = jnp.where(in_med, one, wu2)
            wl0 = jnp.where(in_med, one, wl0)
            wl1 = jnp.where(in_med, one, wl1)
            wl2 = jnp.where(in_med, one, wl2)
            wT0 = jnp.where(guide, one, wT0)
            wT1 = jnp.where(guide, one, wT1)
            wT2 = jnp.where(guide, one, wT2)
            wr0 = jnp.where(guide, one, wr0)
            wr1 = jnp.where(guide, one, wr1)
            wr2 = jnp.where(guide, one, wr2)
            c_t = jnp.where(guide, zf, c_t)
            c_wi = jnp.where(guide, zf, c_wi)
            c_ste = jnp.where(guide, zf, c_ste)
            cn0 = jnp.where(guide, one, cn0)
            cn1 = jnp.where(guide, one, cn1)
            cn2 = jnp.where(guide, one, cn2)
            cd0 = jnp.where(guide, one, cd0)
            cd1 = jnp.where(guide, one, cd1)
            cd2 = jnp.where(guide, one, cd2)
            has_c = has_c & ~guide

            # -- scatter processing: guided RR + NEE + direction -----------
            use_guide = scat & valid_q & vol_guiding
            prod = product_hg(lobes_q, dx, dy, dz)
            wox, woy, woz = -dx, -dy, -dz

            if n_tri:
                # surface material classification + shading frame
                # (pallas_volpath teaser block; guided-BSDF additions
                # follow the XLA path, vspg.py:944-1046)
                nd_ = hngx * dx + hngy * dy + hngz * dz
                front = nd_ < 0  # ray hits the geometric-normal side
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
                smooth_l = rough_l < 1e-3
                shade_df = hit_s & (kind_l == 0)
                shade_co = hit_s & (kind_l == 1) & smooth_l
                shade_dl = hit_s & (kind_l == 2)
                spec_lane = shade_co | shade_dl
                if any_rough:
                    # Trowbridge-Reitz glossy lanes (rough conductor /
                    # CookTorrance; util/scattering.h math, sampled
                    # unguided — see any_rough note above)
                    shade_cr = hit_s & (kind_l == 1) & ~smooth_l
                    shade_ct = hit_s & (kind_l == 11)
                    glossy = shade_cr | shade_ct
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
                        c2 = jnp.maximum(mz2, 1e-8)
                        t2 = (1.0 - c2) / c2
                        a2 = alpha_l * alpha_l
                        e_ = 1.0 + t2 / a2
                        return 1.0 / (np.pi * a2 * c2 * c2 * e_ * e_)

                    def tr_lam(wz):
                        c2 = jnp.clip(wz * wz, 1e-8, 1.0)
                        t2 = (1.0 - c2) / c2
                        return 0.5 * (jnp.sqrt(
                            1.0 + alpha_l * alpha_l * t2) - 1.0)

                    def frd(ci, eta):
                        ci_ = jnp.clip(ci, 0.0, 1.0)
                        s2_ = (1.0 - ci_ * ci_) / jnp.maximum(
                            eta * eta, 1e-12)
                        tir_ = s2_ >= 1.0
                        ct_ = jnp.sqrt(jnp.maximum(1.0 - s2_, 0.0))
                        rp_ = (eta * ci_ - ct_) / jnp.maximum(
                            eta * ci_ + ct_, 1e-12)
                        rq_ = (ci_ - eta * ct_) / jnp.maximum(
                            ci_ + eta * ct_, 1e-12)
                        return jnp.where(tir_, 1.0,
                                         0.5 * (rp_ * rp_ + rq_ * rq_))

                    wo_lx, wo_ly, wo_lz = to_loc(-dx, -dy, -dz)
                    lam_o = tr_lam(wo_lz)
                    G1o = 1.0 / (1.0 + lam_o)
                    zo_s = jnp.maximum(jnp.abs(wo_lz), 1e-6)
                else:
                    glossy = jnp.zeros((sub, 128), bool)
                if surf_guide:
                    # GuidedBSDF.init: cosine product about the shading
                    # normal (vMF approximation, guiding.h:83-109)
                    use_gs = shade_df & svalid_q
                    sprod = product_vmf(slobes_q, nsx, nsy, nsz,
                                        kappa_cos, log_c_cos)
                else:
                    use_gs = jnp.zeros((sub, 128), bool)

            # guided RR survival (openpgl GuidedRussianRoulette), stored
            # for deferred application after the NEE fold
            if guide_rr:
                num_rr = lum3(b0 * flux_q[0], b1 * flux_q[1],
                              b2 * flux_q[2])
                survival = jnp.where(
                    valid_q & (isgb_pem > 0),
                    jnp.clip(num_rr / jnp.maximum(isgb_pel, 1e-6), 0.1,
                             1.0),
                    one)
            else:
                ru_avg2 = jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
                survival = jnp.clip(
                    jnp.maximum(jnp.maximum(b0, b1), b2) / ru_avg2, 0.0,
                    1.0)
            rr_due = scat & (depth > min_rr_depth)
            rr_srv = jnp.where(rr_due, survival, rr_srv)

            # NEE light pick + direction (volume scatters AND diffuse
            # surface hits share one light sample; the ratio-tracked
            # shadow walk then steps in subsequent iterations)
            up0, up1, up2, up3 = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            sel_pt = ((up0 < pmf) if has_env else (up0 >= -1.0)) \
                if has_point else (up0 < -1.0)
            if n_tri:
                spx = jnp.where(shade_df, hx, sx)
                spy = jnp.where(shade_df, hy, sy)
                spz = jnp.where(shade_df, hz, sz)
            else:
                spx, spy, spz = sx, sy, sz
            plx = spx - float(lp[0])
            ply = spy - float(lp[1])
            plz = spz - float(lp[2])
            dist2 = jnp.maximum(plx * plx + ply * ply + plz * plz, 1e-12)
            dist = jnp.sqrt(dist2)
            inv_dist = 1.0 / dist
            ez = 1.0 - 2.0 * up1
            er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
            ephi = (2.0 * np.pi) * up2
            wix = jnp.where(sel_pt, -plx * inv_dist, er * jnp.cos(ephi))
            wiy = jnp.where(sel_pt, -ply * inv_dist, er * jnp.sin(ephi))
            wiz = jnp.where(sel_pt, -plz * inv_dist, ez)
            cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
            f_hg = _hg_value(cos_wi, g_hg)
            gpdf_l = mixture_pdf(prod, wix, wiy, wiz)
            spdf_l = jnp.where(use_guide,
                               (1.0 - pg_nee) * f_hg + pg_nee * gpdf_l,
                               f_hg)
            _, t_exit_s, _ = _box_hit(spx, spy, spz, wix, wiy, wiz, bmin,
                                      bmax)
            t_med = jnp.where(sel_pt, jnp.minimum(dist, t_exit_s),
                              t_exit_s)
            nee_act = scat & (f_hg > 0)
            if n_tri:
                # diffuse-surface NEE: guided mixture blended into the
                # MIS scatter pdf exactly as the XLA path
                # (vspg.py:995-1008, scatter_pdf2)
                cosn = wix * nsx + wiy * nsy + wiz * nsz
                nee_srf = shade_df & (cosn > 0)
                bpdf_nee = jnp.maximum(cosn, 0.0) * INV_PI
                if surf_guide:
                    gpdf_nee = mixture_pdf(sprod, wix, wiy, wiz)
                    spdf_srf = jnp.where(
                        use_gs, (1.0 - pg) * bpdf_nee + pg * gpdf_nee,
                        bpdf_nee)
                else:
                    spdf_srf = bpdf_nee
                f_srf_nee = cosn * INV_PI
                if any_rough:
                    # glossy NEE: TR f + pdf at the light direction
                    # (bxdfs.h ConductorBxDF::f/PDF, CookTorrance
                    # bxdfs.cpp:127-183 — pallas_volpath math verbatim)
                    nee_glo = glossy & (cosn > 0)
                    wi_lx, wi_ly, wi_lz = to_loc(wix, wiy, wiz)
                    hmx_ = wo_lx + wi_lx
                    hmy_ = wo_ly + wi_ly
                    hmz_ = wo_lz + wi_lz
                    hmx_, hmy_, hmz_ = _normalize(hmx_, hmy_, hmz_)
                    hsg_ = jnp.where(hmz_ < 0, -1.0, 1.0)
                    hmx_, hmy_, hmz_ = (hmx_ * hsg_, hmy_ * hsg_,
                                        hmz_ * hsg_)
                    Dm_n = tr_d_z(hmz_ * hmz_)
                    lam_i = tr_lam(wi_lz)
                    G2_ = 1.0 / (1.0 + lam_o + lam_i)
                    zi_s = jnp.maximum(jnp.abs(wi_lz), 1e-6)
                    pdf_spec_n = G1o * Dm_n / (4.0 * zo_s)
                    c_owm = jnp.abs(wo_lx * hmx_ + wo_ly * hmy_
                                    + wo_lz * hmz_)
                    omcw = jnp.clip(1.0 - c_owm, 0.0, 1.0)
                    omcw5 = omcw * omcw * omcw * omcw * omcw
                    spec_c = Dm_n * G2_ / (4.0 * zo_s * zi_s)
                    F_ct_n = frd(c_owm, eta_l)
                    pr_ct = frd(jnp.abs(wo_lz), eta_l)
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
                    spdf_srf = jnp.where(nee_glo, pdf_glo, spdf_srf)
                else:
                    nee_glo = jnp.zeros((sub, 128), bool)

            # direction sampling: one-sample MIS or RIS ------------------
            u_p0, u_p1, u_sel, u_pk = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            u_c, u_g0, u_g1, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            hwx, hwy, hwz, hpdf = _sample_hg(wox, woy, woz, g_hg, u_p0,
                                             u_p1)
            if not ris:
                take_g = use_guide & (u_c < pg)
                u_lobe = jnp.clip(u_c / max(pg, 1e-6), 0.0, 0.999999)
                gwx2, gwy2, gwz2, gpdf_g2 = mixture_sample(prod, u_lobe,
                                                           u_g0, u_g1)
                wvx = jnp.where(take_g, gwx2, hwx)
                wvy = jnp.where(take_g, gwy2, hwy)
                wvz = jnp.where(take_g, gwz2, hwz)
                base_pdf = jnp.where(
                    take_g,
                    _hg_value(_dot(wox, woy, woz, gwx2, gwy2, gwz2), g_hg),
                    hpdf)
                guide_pdf = jnp.where(take_g, gpdf_g2,
                                      mixture_pdf(prod, hwx, hwy, hwz))
                mix = jnp.where(use_guide,
                                (1.0 - pg) * base_pdf + pg * guide_pdf,
                                hpdf)
                pdf_v = mix
                mis_pdf = mix
                valid_v = ((take_g & (base_pdf > 0))
                           | (~take_g & (hpdf > 0))) & (pdf_v > 0)
            else:
                gwx, gwy, gwz, gpdf_g = mixture_sample(prod, u_g0, u_pk,
                                                       u_sel)
                bpdf_g = _hg_value(_dot(wox, woy, woz, gwx, gwy, gwz),
                                   g_hg)
                gpdf_b = mixture_pdf(prod, hwx, hwy, hwz)
                irp_b = jnp.where(valid_q,
                                  mixture_pdf(lobes_q, hwx, hwy, hwz),
                                  INV_4PI)
                irp_g = jnp.where(valid_q,
                                  mixture_pdf(lobes_q, gwx, gwy, gwz),
                                  INV_4PI)
                mis0 = 0.5 * (hpdf + gpdf_b)
                mis1 = 0.5 * (bpdf_g + gpdf_g)
                target0 = hpdf * ((1 - pg) * INV_4PI + pg * irp_b)
                target1 = bpdf_g * ((1 - pg) * INV_4PI + pg * irp_g)
                w0 = jnp.where(hpdf > 0,
                               target0 / jnp.maximum(mis0, 1e-20), 0.0)
                w1 = jnp.where(bpdf_g > 0,
                               target1 / jnp.maximum(mis1, 1e-20), 0.0)
                sum_w = w0 + w1
                pick1 = u_c * jnp.maximum(sum_w, 1e-20) > w0
                wvx = jnp.where(pick1, gwx, hwx)
                wvy = jnp.where(pick1, gwy, hwy)
                wvz = jnp.where(pick1, gwz, hwz)
                mis_sel = jnp.where(pick1, mis1, mis0)
                w_sel = jnp.where(pick1, w1, w0)
                pdf_ris = w_sel * mis_sel * 2.0 / jnp.maximum(sum_w, 1e-20)
                ris_valid = use_guide & (sum_w > 0) & (pdf_ris > 0)
                wvx = jnp.where(use_guide, wvx, hwx)
                wvy = jnp.where(use_guide, wvy, hwy)
                wvz = jnp.where(use_guide, wvz, hwz)
                pdf_v = jnp.where(use_guide, pdf_ris, hpdf)
                mis_pdf = jnp.where(use_guide, mis_sel, hpdf)
                valid_v = (use_guide & ris_valid) \
                    | (~use_guide & (hpdf > 0))

            f_v = _hg_value(_dot(wox, woy, woz, wvx, wvy, wvz), g_hg)
            alive = alive & ~(scat & ~valid_v)
            scale_v = f_v / jnp.maximum(pdf_v, 1e-30)
            b0 = jnp.where(scat, b0 * scale_v, b0)
            b1 = jnp.where(scat, b1 * scale_v, b1)
            b2 = jnp.where(scat, b2 * scale_v, b2)
            inv_mis = 1.0 / jnp.maximum(mis_pdf, 1e-30)
            rl0 = jnp.where(scat, ru0 * inv_mis, rl0)
            rl1 = jnp.where(scat, ru1 * inv_mis, rl1)
            rl2 = jnp.where(scat, ru2 * inv_mis, rl2)
            ox = jnp.where(scat, sx, ox)
            oy = jnp.where(scat, sy, oy)
            oz = jnp.where(scat, sz, oz)
            dx = jnp.where(scat, wvx, dx)
            dy = jnp.where(scat, wvy, dy)
            dz = jnp.where(scat, wvz, dz)

            if n_tri:
                # ===== surface bounces ================================
                # diffuse (guided-BSDF one-sample MIS / RIS over cosine
                # x cosine-product mixture, guiding.h:120-257), smooth
                # conductor (Schlick mirror), smooth dielectric
                # (Fresnel reflect/refract + medium switch) — the
                # pallas_volpath teaser materials with the XLA path's
                # guided sampling (vspg.py:1010-1046) layered on
                u_s0, u_s1, u_s2, u_s3 = _uniform4(seed_a, pix, samp, dim)
                dim = dim + _U32(1)
                (t1x, t1y, t1z), (t2x, t2y, t2z) = _coord_system(
                    nsx, nsy, nsz)
                r_cs = jnp.sqrt(u_s0)
                phi_cs = (2.0 * np.pi) * u_s1
                lx_ = r_cs * jnp.cos(phi_cs)
                ly_ = r_cs * jnp.sin(phi_cs)
                lz_ = jnp.sqrt(jnp.maximum(1.0 - u_s0, 0.0))
                wdfx = lx_ * t1x + ly_ * t2x + lz_ * nsx
                wdfy = lx_ * t1y + ly_ * t2y + lz_ * nsy
                wdfz = lx_ * t1z + ly_ * t2z + lz_ * nsz
                pdf_df = jnp.maximum(lz_, 1e-6) * INV_PI
                if surf_guide:
                    # reuse the volume direction-sampling uniforms: scat
                    # and hit_s lane sets are disjoint
                    if not ris:
                        take_gs = use_gs & (u_c < pg)
                        u_lob = jnp.clip(u_c / max(pg, 1e-6), 0.0,
                                         0.999999)
                        gsx, gsy, gsz, gspdf = mixture_sample(
                            sprod, u_lob, u_g0, u_g1)
                        wsx = jnp.where(take_gs, gsx, wdfx)
                        wsy = jnp.where(take_gs, gsy, wdfy)
                        wsz = jnp.where(take_gs, gsz, wdfz)
                        cos_g = gsx * nsx + gsy * nsy + gsz * nsz
                        base_pdf_s = jnp.where(
                            take_gs, jnp.maximum(cos_g, 0.0) * INV_PI,
                            pdf_df)
                        guide_pdf_s = jnp.where(
                            take_gs, gspdf,
                            mixture_pdf(sprod, wdfx, wdfy, wdfz))
                        mix_s = jnp.where(
                            use_gs,
                            (1.0 - pg) * base_pdf_s + pg * guide_pdf_s,
                            pdf_df)
                        pdf_sv = mix_s
                        mis_pdf_s = mix_s
                        # boolean algebra, not where(): i1-vector data
                        # operands fail to lower in Mosaic ("Unsupported
                        # target bitwidth for truncation")
                        valid_sv = ((take_gs & (base_pdf_s > 0))
                                    | (~take_gs & (pdf_df > 0))) \
                            & (pdf_sv > 0)
                    else:
                        gsx, gsy, gsz, gspdf = mixture_sample(
                            sprod, u_g0, u_pk, u_sel)
                        cos_g = gsx * nsx + gsy * nsy + gsz * nsz
                        bpdf_gs = jnp.maximum(cos_g, 0.0) * INV_PI
                        gpdf_bs = mixture_pdf(sprod, wdfx, wdfy, wdfz)
                        irp_bs = jnp.where(
                            svalid_q,
                            mixture_pdf(slobes_q, wdfx, wdfy, wdfz),
                            INV_4PI)
                        irp_gs = jnp.where(
                            svalid_q,
                            mixture_pdf(slobes_q, gsx, gsy, gsz),
                            INV_4PI)
                        mis0s = 0.5 * (pdf_df + gpdf_bs)
                        mis1s = 0.5 * (bpdf_gs + gspdf)
                        tgt0 = pdf_df * ((1 - pg) * INV_4PI + pg * irp_bs)
                        tgt1 = bpdf_gs * ((1 - pg) * INV_4PI + pg * irp_gs)
                        w0s = jnp.where(pdf_df > 0,
                                        tgt0 / jnp.maximum(mis0s, 1e-20),
                                        0.0)
                        w1s = jnp.where(bpdf_gs > 0,
                                        tgt1 / jnp.maximum(mis1s, 1e-20),
                                        0.0)
                        sum_ws = w0s + w1s
                        pick1s = u_c * jnp.maximum(sum_ws, 1e-20) > w0s
                        wsx = jnp.where(pick1s, gsx, wdfx)
                        wsy = jnp.where(pick1s, gsy, wdfy)
                        wsz = jnp.where(pick1s, gsz, wdfz)
                        mis_sel_s = jnp.where(pick1s, mis1s, mis0s)
                        w_sel_s = jnp.where(pick1s, w1s, w0s)
                        pdf_ris_s = w_sel_s * mis_sel_s * 2.0 \
                            / jnp.maximum(sum_ws, 1e-20)
                        ris_ok_s = use_gs & (sum_ws > 0) & (pdf_ris_s > 0)
                        wsx = jnp.where(use_gs, wsx, wdfx)
                        wsy = jnp.where(use_gs, wsy, wdfy)
                        wsz = jnp.where(use_gs, wsz, wdfz)
                        pdf_sv = jnp.where(use_gs, pdf_ris_s, pdf_df)
                        mis_pdf_s = jnp.where(use_gs, mis_sel_s, pdf_df)
                        valid_sv = (use_gs & ris_ok_s) \
                            | (~use_gs & (pdf_df > 0))
                else:
                    wsx, wsy, wsz = wdfx, wdfy, wdfz
                    pdf_sv = pdf_df
                    mis_pdf_s = pdf_df
                    valid_sv = pdf_df > 0
                cos_out = jnp.maximum(
                    wsx * nsx + wsy * nsy + wsz * nsz, 0.0)
                # channel-independent continuation scale: beta *= alb *
                # s_df (for pure cosine sampling s_df == 1, the volpath
                # teaser identity)
                s_df = cos_out * INV_PI / jnp.maximum(pdf_sv, 1e-30)
                # Invalid guided draws (vMF sample below the hemisphere:
                # base_pdf 0 in the MIS branch) must NOT kill the lane
                # here — the vertex's deferred surface NEE (nee_gs,
                # armed below) would be silently dropped, biasing
                # mode='mis' + surface_guiding renders dark. Mirror
                # pallas_volpath's TINY_G trick instead: collapse the
                # continuation weight so beta *= alb*TINY ~ 0 while the
                # NEE fold sh_f = f_nee/s_df reconstructs the exact
                # pre-continuation product; the ~zero-beta lane is then
                # RR-killed at its next path event. XLA analog adds Ld
                # before invalidating (vspg.py:1014 vs :1038).
                TINY_G = 1e-18
                s_df = jnp.where(shade_df & ~valid_sv, TINY_G, s_df)
                if any_rough:
                    # glossy continuation: Trowbridge-Reitz VNDF sample
                    # (Heitz 2018; scattering.h Sample_wm) in the local
                    # frame — pallas_volpath math verbatim; CookTorrance
                    # picks glossy-vs-Lambertian by Fresnel(cos_o) and
                    # the diffuse lobe reuses the cosine sample above
                    u_r0, u_r1, u_r2, _ = _uniform4(seed_a, pix, samp,
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
                    pr_s = frd(jnp.abs(wo_lz), eta_l)
                    take_spec = shade_cr | (shade_ct & (u_r2 < pr_s))
                    wi_glx = jnp.where(take_spec, rix, lx_)
                    wi_gly = jnp.where(take_spec, riy, ly_)
                    wi_glz = jnp.where(take_spec, riz, lz_)
                    ziL = wi_glz
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
                        pr_s * pdf_spec_s + (1.0 - pr_s) * zi_c * INV_PI,
                        pdf_spec_s)
                    valid_g = (ziL > 1e-6) & (pdf_gs > 1e-12)
                    pdf_gs = jnp.maximum(pdf_gs, 1e-12)
                    inv_pgs = 1.0 / pdf_gs
                    # invalid draws: continuation collapses to TINY so
                    # the pending NEE fold still reconstructs the exact
                    # product (the TINY_G idiom above)
                    wg0 = jnp.where(valid_g, fg0 * ziL * inv_pgs, TINY_G)
                    wg1 = jnp.where(valid_g, fg1 * ziL * inv_pgs, TINY_G)
                    wg2 = jnp.where(valid_g, fg2 * ziL * inv_pgs, TINY_G)
                    wi_wx, wi_wy, wi_wz = to_wld(wi_glx, wi_gly, wi_glz)
                hit_s = shade_df | shade_co | shade_dl
                if any_rough:
                    hit_s = hit_s | glossy
                # conductor: mirror about ns, Schlick F0 tint
                dnd = dx * nsx + dy * nsy + dz * nsz
                wrx = dx - 2.0 * dnd * nsx
                wry = dy - 2.0 * dnd * nsy
                wrz = dz - 2.0 * dnd * nsz
                cos_o = jnp.clip(-dnd, 0.0, 1.0)
                # dielectric: exact Fresnel reflect/refract about ns
                eta_rel = jnp.where(front, eta_l, 1.0 / eta_l)
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
                refl_dl = u_s2 < F_dl
                inv_er = 1.0 / jnp.maximum(eta_rel, 1e-12)
                wtx = dx * inv_er + (cos_o * inv_er - cos_t) * nsx
                wty = dy * inv_er + (cos_o * inv_er - cos_t) * nsy
                wtz = dz * inv_er + (cos_o * inv_er - cos_t) * nsz
                wtx, wty, wtz = _normalize(wtx, wty, wtz)
                go_refl = shade_co | (shade_dl & refl_dl)
                n_dx = jnp.where(shade_df, wsx,
                                 jnp.where(go_refl, wrx, wtx))
                n_dy = jnp.where(shade_df, wsy,
                                 jnp.where(go_refl, wry, wty))
                n_dz = jnp.where(shade_df, wsz,
                                 jnp.where(go_refl, wrz, wtz))
                if any_rough:
                    n_dx = jnp.where(glossy, wi_wx, n_dx)
                    n_dy = jnp.where(glossy, wi_wy, n_dy)
                    n_dz = jnp.where(glossy, wi_wz, n_dz)
                omc = (1.0 - cos_o)
                omc5 = omc * omc * omc * omc * omc
                fs0 = alb0 + (1.0 - alb0) * omc5
                fs1 = alb1 + (1.0 - alb1) * omc5
                fs2 = alb2 + (1.0 - alb2) * omc5
                trans_sc = inv_er * inv_er
                w_b0 = jnp.where(shade_df, alb0 * s_df,
                                 jnp.where(shade_co, fs0,
                                           jnp.where(refl_dl, 1.0,
                                                     trans_sc)))
                w_b1 = jnp.where(shade_df, alb1 * s_df,
                                 jnp.where(shade_co, fs1,
                                           jnp.where(refl_dl, 1.0,
                                                     trans_sc)))
                w_b2 = jnp.where(shade_df, alb2 * s_df,
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
                # lobes rl = ru (no light-sampling competitor)
                inv_mis_s = 1.0 / jnp.maximum(mis_pdf_s, 1e-30)
                if any_rough:
                    inv_mis_s = jnp.where(glossy, inv_pgs, inv_mis_s)
                    nondelta_s = shade_df | glossy
                else:
                    nondelta_s = shade_df
                rl0 = jnp.where(hit_s, jnp.where(nondelta_s,
                                                 ru0 * inv_mis_s, ru0),
                                rl0)
                rl1 = jnp.where(hit_s, jnp.where(nondelta_s,
                                                 ru1 * inv_mis_s, ru1),
                                rl1)
                rl2 = jnp.where(hit_s, jnp.where(nondelta_s,
                                                 ru2 * inv_mis_s, ru2),
                                rl2)
                # medium switch on dielectric transmission (per-tri
                # med_in/med_out interface ids)
                went_t = shade_dl & ~refl_dl
                med = jnp.where(went_t, jnp.where(front, hmi, hmo), med)
                out_sgn = jnp.where(
                    (n_dx * nsx + n_dy * nsy + n_dz * nsz) >= 0, 1.0,
                    -1.0)
                ox = jnp.where(hit_s, hx + out_sgn * 1e-4 * nsx, ox)
                oy = jnp.where(hit_s, hy + out_sgn * 1e-4 * nsy, oy)
                oz = jnp.where(hit_s, hz + out_sgn * 1e-4 * nsz, oz)
                dx = jnp.where(hit_s, n_dx, dx)
                dy = jnp.where(hit_s, n_dy, dy)
                dz = jnp.where(hit_s, n_dz, dz)
                spec_last = jnp.where(hit_s,
                                      jnp.where(nondelta_s, 0, 1),
                                      jnp.where(scat, 0, spec_last))
                t_surf = jnp.where(hit_s | scat, _BIG, t_surf)
                needs_i = jnp.where(hit_s | scat, 1, needs_i)
                # guided RR at surfaces (XLA path vspg.py:1054-1066):
                # flux from the SURFACE half, post-continuation beta;
                # specular lanes survive at 0.95
                if guide_rr:
                    num_rs = lum3(b0 * sflux_q[0], b1 * sflux_q[1],
                                  b2 * sflux_q[2])
                    surv_s = jnp.where(
                        svalid_q & (isgb_pem > 0),
                        jnp.clip(num_rs / jnp.maximum(isgb_pel, 1e-6),
                                 0.1, 1.0),
                        one)
                    surv_s = jnp.where(spec_lane, 0.95, surv_s)
                else:
                    ru_avg3 = jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
                    surv_s = jnp.clip(
                        jnp.maximum(jnp.maximum(b0, b1), b2) / ru_avg3,
                        0.0, 1.0)
                rr_due_s = hit_s & (depth > min_rr_depth)
                rr_srv = jnp.where(rr_due_s, surv_s, rr_srv)

            if record:
                # new vertex slot (record_vertex): compact slot counter
                # rslot (specular surface bounces are NOT recorded, so
                # depth-1 would leave gaps that break the backward
                # propagation chain); vertices beyond rec_depth are
                # dropped, matching the XLA recorder
                rec_v = scat
                if n_tri:
                    rec_nd = (shade_df | glossy) if any_rough else shade_df
                    rec_v = scat | rec_nd
                    rpx = jnp.where(rec_nd, hx, sx)
                    rpy = jnp.where(rec_nd, hy, sy)
                    rpz = jnp.where(rec_nd, hz, sz)
                    rwx = jnp.where(shade_df, wsx, wvx)
                    rwy = jnp.where(shade_df, wsy, wvy)
                    rwz = jnp.where(shade_df, wsz, wvz)
                    rsw0 = jnp.where(shade_df, alb0 * s_df, scale_v)
                    rsw1 = jnp.where(shade_df, alb1 * s_df, scale_v)
                    rsw2 = jnp.where(shade_df, alb2 * s_df, scale_v)
                    rpdf = jnp.where(shade_df, pdf_sv, pdf_v)
                    if any_rough:
                        rwx = jnp.where(glossy, wi_wx, rwx)
                        rwy = jnp.where(glossy, wi_wy, rwy)
                        rwz = jnp.where(glossy, wi_wz, rwz)
                        rsw0 = jnp.where(glossy, wg0, rsw0)
                        rsw1 = jnp.where(glossy, wg1, rsw1)
                        rsw2 = jnp.where(glossy, wg2, rsw2)
                        rpdf = jnp.where(glossy, pdf_gs, rpdf)
                else:
                    rpx, rpy, rpz = sx, sy, sz
                    rwx, rwy, rwz = wvx, wvy, wvz
                    rsw0 = rsw1 = rsw2 = scale_v
                    rpdf = pdf_v
                for sl in range(rec_depth):
                    s_ = rec_v & (rslot == sl)
                    rec_put(0, sl, s_, rpx)
                    rec_put(1, sl, s_, rpy)
                    rec_put(2, sl, s_, rpz)
                    rec_put(3, sl, s_, rwx)
                    rec_put(4, sl, s_, rwy)
                    rec_put(5, sl, s_, rwz)
                    rec_put(6, sl, s_, rsw0)
                    rec_put(22, sl, s_, rsw1)
                    rec_put(23, sl, s_, rsw2)
                    rec_put(7, sl, s_, rpdf)
                    rec_put(18, sl, s_,
                            jnp.where(scat, one, zf) if n_tri else one)
                f1_ = scat & (depth == 1)  # ISGB first-event data
                rec_put(14, 0, f1_, one)
                rec_put(15, 0, f1_, wox)
                rec_put(16, 0, f1_, woy)
                rec_put(17, 0, f1_, woz)
                rec_put(19, 0, f1_, jnp.full_like(zf, float(
                    ss[0] / max(st[0], 1e-12))))
                rec_put(20, 0, f1_, jnp.full_like(zf, float(
                    ss[1] / max(st[1], 1e-12))))
                rec_put(21, 0, f1_, jnp.full_like(zf, float(
                    ss[2] / max(st[2], 1e-12))))
                if n_tri:
                    fs1_ = hit_s & (depth == 1)
                    rec_put(15, 0, fs1_, nsx)
                    rec_put(16, 0, fs1_, nsy)
                    rec_put(17, 0, fs1_, nsz)
                    rec_put(19, 0, fs1_, alb0)
                    rec_put(20, 0, fs1_, alb1)
                    rec_put(21, 0, fs1_, alb2)
                rslot = jnp.where(rec_v, rslot + 1, rslot)

            # shadow-walk setup for the pending NEE (folds with the
            # POST-continuation beta, so sh_f = f_hg / scale_v; at
            # diffuse surfaces f = cos/pi and the continuation carries
            # alb * s_df, so sh_f = (cos/pi) / s_df — channel-independent
            # because the albedo rides in beta)
            nee_go = nee_act & alive
            if n_tri:
                nee_gs = nee_srf & alive & shade_df
                nee_gl = (nee_glo & alive) if any_rough \
                    else jnp.zeros((sub, 128), bool)
                nee_all = nee_go | nee_gs | nee_gl
            else:
                nee_gs = jnp.zeros((sub, 128), bool)
                nee_gl = jnp.zeros((sub, 128), bool)
                nee_all = nee_go
            mode = jnp.where(nee_all, jnp.where(sel_pt, 4, 5), mode)
            shx = jnp.where(nee_all, wix, shx)
            shy = jnp.where(nee_all, wiy, shy)
            shz = jnp.where(nee_all, wiz, shz)
            sh_t = jnp.where(nee_all, zf, sh_t)
            sh_end = jnp.where(nee_all, t_med, sh_end)
            sh_pdf = jnp.where(nee_go, spdf_l, sh_pdf)
            sh_d2 = jnp.where(nee_all, dist2, sh_d2)
            sh_f = jnp.where(nee_go,
                             f_hg / jnp.maximum(scale_v, 1e-30), sh_f)
            sh_fl = jnp.where(nee_go, f_hg, sh_fl)
            if n_tri:
                sh_pdf = jnp.where(nee_gs | nee_gl, spdf_srf, sh_pdf)
                sh_f = jnp.where(
                    nee_gs, f_srf_nee / jnp.maximum(s_df, 1e-30), sh_f)
                sh_fl = jnp.where(nee_gs, f_srf_nee, sh_fl)
                sh_occ = jnp.where(nee_all, 1, sh_occ)
                if any_rough:
                    # glossy deferred fold is per-channel: f is tinted
                    # (conductor Fresnel / CT mix) and the continuation
                    # weight wg_k it divides by is too
                    sh_f1 = jnp.where(nee_go | nee_gs, sh_f, sh_f1)
                    sh_f2 = jnp.where(nee_go | nee_gs, sh_f, sh_f2)
                    sh_f = jnp.where(
                        nee_gl,
                        fne0 * cosn / jnp.maximum(wg0, 1e-30), sh_f)
                    sh_f1 = jnp.where(
                        nee_gl,
                        fne1 * cosn / jnp.maximum(wg1, 1e-30), sh_f1)
                    sh_f2 = jnp.where(
                        nee_gl,
                        fne2 * cosn / jnp.maximum(wg2, 1e-30), sh_f2)
                    sh_fl = jnp.where(nee_gl, cosn, sh_fl)
            if record and n_tri:
                # surface NEE records carry the material albedo tint
                # (the XLA recorder's f_hat2 includes the BSDF albedo)
                ra0 = jnp.where(nee_all, jnp.where(nee_gs, alb0, one),
                                ra0)
                ra1 = jnp.where(nee_all, jnp.where(nee_gs, alb1, one),
                                ra1)
                ra2 = jnp.where(nee_all, jnp.where(nee_gs, alb2, one),
                                ra2)
                if any_rough:
                    # glossy records: sh_fl carries cosn, the tint rows
                    # carry the per-channel TR f at the light direction
                    ra0 = jnp.where(nee_gl, fne0, ra0)
                    ra1 = jnp.where(nee_gl, fne1, ra1)
                    ra2 = jnp.where(nee_gl, fne2, ra2)
            sT0 = jnp.where(nee_go, one, sT0)
            sT1 = jnp.where(nee_go, one, sT1)
            sT2 = jnp.where(nee_go, one, sT2)
            sl0 = jnp.where(nee_go, one, sl0)
            sl1 = jnp.where(nee_go, one, sl1)
            sl2 = jnp.where(nee_go, one, sl2)
            su0 = jnp.where(nee_go, one, su0)
            su1 = jnp.where(nee_go, one, su1)
            su2 = jnp.where(nee_go, one, su2)

            # -- commit + regenerate dead lanes ----------------------------
            died = ~alive & (samp < spp)
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
            rr_srv = jnp.where(has_budget, one, rr_srv)
            if n_tri:
                t_surf = jnp.where(has_budget, _BIG, t_surf)
                needs_i = jnp.where(has_budget, 1, needs_i)
                sh_occ = jnp.where(has_budget, 0, sh_occ)
                spec_last = jnp.where(has_budget, 0, spec_last)
            if record:
                rslot = jnp.where(has_budget, 0, rslot)
            alive = alive | has_budget

            return (samp, dim, alive.astype(jnp.int32), ox, oy, oz,
                    dx, dy, dz, b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
                    L0, L1, L2, depth, hero, med, a0, a1, a2, it + 1,
                    mode, t_walk,
                    wf0, wf1, wf2, wu0, wu1, wu2, wl0, wl1, wl2,
                    wT0, wT1, wT2, wr0, wr1, wr2,
                    w_sum, c_t, c_wi, c_ste, cn0, cn1, cn2, cd0, cd1, cd2,
                    has_c.astype(jnp.int32), maj_sc, tau_acc, vsp_c,
                    shx, shy, shz, sh_t, sh_end, sh_pdf, sh_d2,
                    sT0, sT1, sT2, sl0, sl1, sl2, su0, su1, su2, sh_f,
                    rr_srv, sh_fl) \
                + ((t_surf, hngx, hngy, hngz, hmat, hmi, hmo, needs_i,
                    sh_occ, spec_last) if n_tri else ()) \
                + ((rslot,) if record else ()) \
                + ((ra0, ra1, ra2) if (record and n_tri) else ()) \
                + ((sh_f1, sh_f2) if (n_tri and any_rough) else ())

        final = jax.lax.while_loop(cond, body, carry)
        a0, a1, a2 = final[24], final[25], final[26]
        scale = c["imaging_ratio"] / spp
        out_ref[0] = a0 * scale
        out_ref[1] = a1 * scale
        out_ref[2] = a2 * scale

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


_KERNEL_CACHE = {}

# spp per launch: per-launch relay dispatch overhead (~0.3-0.6s) dwarfed
# the 4-spp compute at 128^2 — the analytic work profile of the bench
# cloud (PERF.md round-2 addendum 3) puts one 32-spp launch well under a
# second of kernel time, far below the ~60s TPU watchdog.
VSPG_SPP_CHUNK = 128


def guiding_constants(field, gopt, vopt, trained=None):
    """Static guiding-constant dict for the kernel cache key."""
    return dict(
        fres=int(field.res),
        K=(int(field.n_lobes) if K_PACK is None
           else min(int(field.n_lobes), int(K_PACK))),
        fb_min=tuple(float(x) for x in np.asarray(field.b_min)),
        fb_max=tuple(float(x) for x in np.asarray(field.b_max)),
        pg=float(gopt.guiding_prob),
        mode=str(gopt.mode),
        vsp_mis_ratio=float(vopt.vsp_mis_ratio),
        sampling_method=str(vopt.sampling_method),
        guide_rr=bool(vopt.guide_rr),
        min_rr_depth=int(vopt.min_rr_depth),
        guide_primary=bool(vopt.guide_vsp and vopt.guide_primary_vsp),
        guide_secondary=bool(vopt.guide_vsp and vopt.guide_secondary_vsp),
        volume_guiding=bool(gopt.volume_guiding),
        surface_guiding=bool(gopt.surface_guiding),
        scale_vsp_cap=float(getattr(vopt, "scale_vsp_cap", 0.95)),
        trained=bool(int(field.iteration) > 0) if trained is None
        else bool(trained),
        max_collisions=256,
        n_extra=int(getattr(field, "n_extra", 0)),
        # module flag snapshot: rides in gc so the kernel cache key and
        # the builder see a consistent value (tests flip FIELD_MXU)
        field_mxu=bool(FIELD_MXU),
    )


def _get_callable(c, gc, spp, sub, interpret, tiled=False, record=False,
                  rec_depth=6):
    key = (tuple(sorted((k, v) for k, v in c.items())),
           tuple(sorted((k, v) for k, v in gc.items())), spp, sub,
           interpret, tiled, record, rec_depth)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn
    npix = c["nx"] * c["ny"]
    n_blocks = npix // (sub * 128)
    ir = 6 if str(gc.get("sampling_method", "")) == "nds+" else 3
    nvox = int(np.prod(c["grid_res"]))
    nmaj = int(np.prod(c["maj_res"]))
    FC = int(gc["fres"]) ** 3 + int(gc.get("n_extra", 0))
    n_cc = max(-(-FC // 128), 1)
    n_tri = int(c.get("n_tri", 0))
    P_ROWS = (8 * int(gc["K"]) + 8) * (2 if n_tri else 1) \
        + (5 if gc.get("n_extra", 0) else 0)
    kernel = _make_vspg_kernel(c, gc, spp, sub, tiled, record=record,
                               rec_depth=rec_depth)
    out_shape = jax.ShapeDtypeStruct((3, npix // 128, 128), jnp.float32)
    out_spec = pl.BlockSpec((3, sub, 128), lambda b: (0, b, 0),
                            memory_space=pltpu.VMEM)
    if record:
        assert spp == 1, "record variant runs one training sample per lane"
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (REC_ROWS, rec_depth, npix // 128, 128), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((REC_ROWS, rec_depth, sub, 128),
                                 lambda b: (0, 0, b, 0),
                                 memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  (pl.BlockSpec((128, -(-(-(-nvox // 128)) // 8) * 8),
                                lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
                   if c.get("dens_pack", "bf16") == "mxu" else
                   pl.BlockSpec((-(-nvox // (128 * (
                       4 if c.get("dens_pack", "bf16") == "i8" else 2))),
                       128), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM)),
                  (pl.BlockSpec((128, -(-(-(-nmaj // 128)) // 8) * 8),
                                lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
                   if c.get("dens_pack", "bf16") == "mxu" else
                   pl.BlockSpec((-(-nmaj // 256), 128), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)),
                  (pl.BlockSpec((-(-P_ROWS // 8) * 8, max(n_cc, 1) * 128),
                                lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
                   if gc.get("field_mxu", False) else
                   pl.BlockSpec((((P_ROWS + 1) // 2) * n_cc, 128),
                                lambda b: (0, 0),
                                memory_space=pltpu.VMEM)),
                  pl.BlockSpec((ir, sub, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if n_tri else []),
        out_specs=out_spec,
        interpret=interpret,
    )

    if tiled:
        from .pallas_volpath import tile_permutation

        pid_np, inv_np = tile_permutation(c["nx"], c["ny"], sub)
        pid_perm, inv_perm = jnp.asarray(pid_np), jnp.asarray(inv_np)

    @jax.jit
    def fn(seed, dens, maj, ftab, itab, tris=None, base=0):
        # tiled layout requires base == 0 (single-chip launches)
        sm = jnp.stack([seed.astype(jnp.uint32),
                        jnp.asarray(base, jnp.uint32)]).reshape(1, 2)
        if tiled:
            # ISGB rows ride per-block BlockSpec slices: permute them to
            # the tiled slot order so lane (i, j) still reads its pixel
            itab = itab.reshape(ir, npix)[:, pid_perm] \
                .reshape(ir, npix // 128, 128)
        if n_tri:
            out = call(sm, dens, maj, ftab, itab, tris)
        else:
            out = call(sm, dens, maj, ftab, itab)
        rec = None
        if record:
            out, rec = out
            rec = rec.reshape(REC_ROWS, rec_depth, npix)
        flat = jnp.transpose(out, (1, 2, 0)).reshape(npix, 3)
        if tiled:
            flat = flat[inv_perm]
        img = flat.reshape(c["ny"], c["nx"], 3)
        return (img, rec) if record else img

    _KERNEL_CACHE[key] = fn
    return fn


def supports(scene, camera, film, cfg, gopt, vopt, field):
    """True when the VSPG megakernel can serve this render phase."""
    c = extract_constants(scene, camera, film, cfg)
    if c is None or c["kind"] != "grid":
        return False
    if c.get("n_tri", 0):
        if not FIELD_MXU:
            return False  # surface field rows need the MXU field fetch
        from .pallas_volpath import MAX_TRIS_GRID as _MTG

        if int(c["n_tri"]) > _MTG:
            return False  # mesh-class scenes: volpath kernel only
        # surface machinery: diffuse + smooth delta lobes + (round 5)
        # Trowbridge-Reitz rough conductor / CookTorrance, sampled
        # unguided in-kernel; rough DIELECTRIC and textured albedo
        # still route to the volpath kernel / XLA wave
        for mk, mr, mt in zip(
                c["mat_kind"],
                c.get("mat_rough", (0.0,) * len(c["mat_kind"])),
                c.get("mat_tex_kind", (-1,) * len(c["mat_kind"]))):
            if mk not in (0, 1, 2, 11) or (mk == 2 and mr >= 1e-3):
                return False
            if mt >= 0:
                return False  # textured albedo: volpath kernel only
    # density lookups: chunk sweep for small grids, one-hot MXU gather
    # up to MXU_MAX_VOX (PERF.md addendum 5); beyond that the XLA wave
    # still serves the scene
    from . import pallas_volpath as _pv

    if (c["grid_res"][0] * c["grid_res"][1]
            * c["grid_res"][2]) > _pv.MXU_MAX_VOX:
        return False
    if (field is not None and getattr(field, "n_extra", 0) != 0
            and not FIELD_MXU):
        return False  # adaptive indirection needs the MXU field fetch
    FC = int(field.res) ** 3 if field is not None else 0
    if FC % 128 != 0 and FC > 128:
        return False
    npix = c["nx"] * c["ny"]
    return npix % 128 == 0


def pack_kernel_inputs(scene, field, crit, field_mxu=None,
                       packed_scene=None):
    """Host-side table packing shared by the single-chip and sharded
    renderers: returns (dens, maj, ftab, tris) device arrays
    (bf16-pair-packed; the field table packs row PAIRS unpacked by static
    parity; tris is the SMEM triangle table or None).

    ``field_mxu`` should be the gc['field_mxu'] snapshot taken by
    guiding_constants so one read governs both the packed layout and the
    kernel's expectation (defaults to the module flag for standalone use).

    ``packed_scene``: optional (dens, maj, tris) from a previous call on
    the SAME scene — skips re-packing and re-uploading the density and
    majorant tables (they never change across training waves; only the
    field table does)."""
    if field_mxu is None:
        field_mxu = FIELD_MXU
    n_tri = int(scene.geometry.tri_p0.shape[0])
    ftab_np = pack_field_table(field, crit, with_surface=n_tri > 0,
                               k_top=K_PACK)  # (P, C)
    P, FC = ftab_np.shape
    pad_c = (-FC) % 128 if FC >= 128 else 128 - FC
    if pad_c:
        ftab_np = np.pad(ftab_np, ((0, 0), (0, pad_c)))
        FC = ftab_np.shape[1]
    if field_mxu:
        # transposed-free MXU layout: (P_pad, FC) bf16, matmul operand
        P_pad = -(-P // 8) * 8
        fp = np.pad(ftab_np, ((0, P_pad - P), (0, 0))).astype(np.float32)
        u = np.ascontiguousarray(fp).view(np.uint32).astype(np.uint64)
        r = (np.minimum(u + 0x8000, 0xFFFF_FFFF) >> 16).astype(np.uint16)
        ftab = jnp.asarray(r.view(jnp.bfloat16))
    else:
        if P % 2:
            ftab_np = np.pad(ftab_np, ((0, 1), (0, 0)))
        u = np.ascontiguousarray(ftab_np).view(np.uint32).astype(np.uint64)
        r = (np.minimum(u + 0x8000, 0xFFFF_FFFF) >> 16).astype(np.uint32)
        words = (r[0::2, :] & 0xFFFF) | (r[1::2, :] << 16)
        ftab = jnp.asarray(np.ascontiguousarray(words).view(np.float32)
                           .reshape(-1, 128))
    if packed_scene is not None:
        dens, maj, tris = packed_scene
        return dens, maj, ftab, tris
    tris = (jnp.asarray(_pv_pack_tri_table(scene)) if n_tri else None)
    gm = scene.media.grids[0]
    from . import pallas_volpath as _pv

    nvox = int(np.prod(gm.res))
    pack = _pv.dens_pack_for(nvox)  # same ladder as extract_constants
    if pack == "i8":
        dens = jnp.asarray(pack_i8_quads(
            np.asarray(gm.density), np.asarray(gm.majorant),
            tuple(int(v) for v in gm.res),
            tuple(int(v) for v in gm.maj_res)))
    elif pack == "mxu":
        dens = jnp.asarray(pack_i8_transposed(
            np.asarray(gm.density), np.asarray(gm.majorant),
            tuple(int(v) for v in gm.res),
            tuple(int(v) for v in gm.maj_res)))
    else:
        dens = jnp.asarray(pack_bf16_pairs(np.asarray(gm.density),
                                           "nearest"))
    if pack == "mxu":
        maj = jnp.asarray(pack_bf16_transposed(np.asarray(gm.majorant),
                                               "up"))
    else:
        maj = jnp.asarray(pack_bf16_pairs(np.asarray(gm.majorant), "up"))
    return dens, maj, ftab, tris


def train_wave_pallas(scene, camera, film, cfg, gopt, vopt, field, isgb,
                      seed, interpret=False, sub=None, packed_scene=None):
    """One 1-spp TRAINING wave through the megakernel.

    Returns (image, SegmentRecord, first_albedo, first_normal, first_vol,
    L_raw, (dens, maj)) — the same artifacts vspg_wave produces on the
    XLA path, ~100x faster, plus the packed scene tables to feed back via
    ``packed_scene`` on subsequent waves. The guiding field/ISGB passed
    in steer this wave's sampling (the reference's progressive per-wave
    training, guidedvolpathvspgintegrator.cpp:230-259)."""
    from ..models.guiding.recording import SegmentRecord

    c = extract_constants(scene, camera, film, cfg)
    if c is None or c["kind"] != "grid":
        raise ValueError("scene not supported by the VSPG megakernel")
    gc = guiding_constants(field, gopt, vopt)
    dens, maj, ftab, tris = pack_kernel_inputs(
        scene, field, vopt.vsp_criterion, field_mxu=gc["field_mxu"],
        packed_scene=packed_scene)
    npix = c["nx"] * c["ny"]
    nds_plus_t = str(vopt.sampling_method) == "nds+"
    ir_t = 6 if nds_plus_t else 3
    itab = pack_isgb_table(
        isgb, npix,
        tr_buffer=(jnp.ones((npix, 3), jnp.float32) if nds_plus_t
                   else None)).reshape(ir_t, npix // 128, 128)
    if sub is None:
        sub = 8
        while npix % (sub * 128) != 0:
            sub //= 2
    D = int(gopt.record_depth)
    fn = _get_callable(c, gc, 1, sub, bool(interpret), tiled=False,
                       record=True, rec_depth=D)
    img, rec = fn(jnp.asarray(seed, jnp.uint32), dens, maj, ftab, itab,
                  tris)
    # rec rows -> SegmentRecord (R=npix lanes, D slots); edge distances
    # from consecutive vertex positions (record_vertex closes the edge the
    # same way); unset distances fall through to propagate()'s 1e6 default
    pos = jnp.moveaxis(rec[0:3], 0, -1).transpose(1, 0, 2)  # (npix,D,3)
    wi = jnp.moveaxis(rec[3:6], 0, -1).transpose(1, 0, 2)
    sw = jnp.stack([rec[6], rec[22], rec[23]], -1).transpose(1, 0, 2)
    pdf = rec[7].T
    direct = jnp.moveaxis(rec[8:11], 0, -1).transpose(1, 0, 2)
    emission = jnp.moveaxis(rec[11:14], 0, -1).transpose(1, 0, 2)
    valid = pdf > 0
    is_vol = (rec[18].T > 0.5) & valid
    nxt = jnp.concatenate([valid[:, 1:], jnp.zeros_like(valid[:, :1])], 1)
    dpos = jnp.concatenate([pos[:, 1:] - pos[:, :-1],
                            jnp.zeros_like(pos[:, :1])], 1)
    dist = jnp.where(nxt, jnp.sqrt(jnp.maximum(
        jnp.sum(dpos * dpos, -1), 0.0)), 0.0)
    segrec = SegmentRecord(pos=pos, wi=wi, scatter_w=sw, direct=direct,
                           emission=emission, pdf=pdf, distance=dist,
                           is_volume=is_vol, valid=valid,
                           count=jnp.sum(valid, 1).astype(jnp.int32))
    first_vol = rec[14, 0] > 0.5
    first_normal = jnp.moveaxis(rec[15:18, 0], 0, -1)  # (npix, 3)
    first_albedo = jnp.moveaxis(rec[19:22, 0], 0, -1)  # (npix, 3)
    # un-scale the film image back to raw per-lane L for the ISGB stream
    L_raw = img.reshape(npix, 3) / c["imaging_ratio"]
    return (img, segrec, first_albedo, first_normal, first_vol, L_raw,
            (dens, maj, tris))


# frozen-phase input cache: repeated equal-time waves call
# render_vspg_pallas with the SAME scene/field/isgb objects — re-packing
# and re-uploading the density/majorant/field/ISGB tables every wave
# costs more than the kernel itself through the relay. Entries hold
# strong refs to the keyed objects so `is` identity stays valid.
_INPUT_CACHE = {}


def render_vspg_pallas(scene, camera, film, spp, cfg, gopt, vopt, field,
                      isgb, seed, interpret=False, sub=None,
                      tr_buffer=None):
    """Render `spp` frozen-field VSPG samples per pixel via the
    megakernel. Returns the (ny, nx, 3) mean image. tr_buffer: (npix, 3)
    previous-wave primary transmittance (REQUIRED for
    sampling_method='nds+'; rides as extra ISGB table rows)."""
    c = extract_constants(scene, camera, film, cfg)
    if c is None or c["kind"] != "grid":
        raise ValueError("scene not supported by the VSPG megakernel")
    gc = guiding_constants(field, gopt, vopt)
    npix = c["nx"] * c["ny"]
    nds_plus = str(vopt.sampling_method) == "nds+"
    if nds_plus and tr_buffer is None:
        tr_buffer = jnp.ones((npix, 3), jnp.float32)
    ir = 6 if nds_plus else 3
    ck = (vopt.vsp_criterion, gc["field_mxu"], npix)
    hit = _INPUT_CACHE.get(ck)
    if (hit is not None and hit[0] is scene and hit[1] is field
            and hit[2] is isgb and not nds_plus):
        dens, maj, ftab, itab, tris = hit[3]
    else:
        dens, maj, ftab, tris = pack_kernel_inputs(
            scene, field, vopt.vsp_criterion, field_mxu=gc["field_mxu"])
        itab = pack_isgb_table(
            isgb, npix,
            tr_buffer=tr_buffer if nds_plus else None).reshape(
                ir, npix // 128, 128)
        if not nds_plus:  # tr varies per wave: never cache nds+ tables
            _INPUT_CACHE[ck] = (scene, field, isgb,
                                (dens, maj, ftab, itab, tris))
        if len(_INPUT_CACHE) > 8:
            _INPUT_CACHE.pop(next(iter(_INPUT_CACHE)))
    if sub is None:
        sub = 8
        while npix % (sub * 128) != 0:
            sub //= 2
    chunk = int(spp) if interpret else min(int(spp), VSPG_SPP_CHUNK)
    # tiled lane mapping when the film divides into 32x(LB/32) tiles
    # (single-chip only: the sharded phase keeps the raster layout)
    from .pallas_volpath import TILE_W as _TW

    tiled = (c["nx"] % _TW == 0 and c["ny"] % max(sub * 128 // _TW, 1) == 0
             and sub * 128 >= _TW)
    imgs = []
    done = 0
    while done < int(spp):
        n = min(chunk, int(spp) - done)
        fn = _get_callable(c, gc, n, sub, bool(interpret), tiled)
        imgs.append(fn(jnp.asarray(seed, jnp.uint32)
                       + jnp.uint32(done * 65537), dens, maj, ftab,
                       itab, tris) * n)
        done += n
    return sum(imgs) / int(spp)
