"""Metropolis light transport (PSSMLT over BDPT), TPU-native.

Analog of the reference's ``MLTIntegrator`` (cpu/integrators.h:766-817,
cpu/integrators.cpp:2540-2800) and ``MLTSampler`` (samplers.h:634-735):
primary-sample-space Metropolis where each mutation re-evaluates one BDPT
strategy of a fixed path depth.

TPU re-design:
- Markov chains are wavefront lanes: thousands of chains run in lockstep,
  one full path re-trace per iteration (jit-compiled per depth).
- The MLTSampler's lazily-mutated coordinate vector becomes an eagerly
  mutated (R, 3, D) primary-sample array with the reference's three
  streams (camera / light / connection, samplers.h:652-665) — eager
  mutation of every coordinate is distribution-identical to the lazy
  backlog replay.
- Strategy choice: the reference picks (s,t) per mutation from a sampler
  draw (integrators.cpp:2550-2557). Static shapes forbid per-lane (s,t),
  so both subpaths are generated at full length once and every strategy of
  the depth is evaluated masked; a one-hot select keeps exactly the chosen
  one. Subpath prefixes are shared, so this costs only the extra
  connection evaluations.
- Bootstrap: per-depth luminance means give the normalization b and the
  per-depth chain allocation (the reference's alias table over bootstrap
  weights, integrators.cpp:2647-2654).
- Acceptance + both-state splats are masked scatter-adds into the film
  splat plane (film.AddSplat, integrators.cpp:2746-2752).
"""

from __future__ import annotations

from functools import partial

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import rng as vrng
from ...utils.spectrum import average
from . import bdpt as _bdpt

N_STREAMS = 3
STREAM_CAMERA, STREAM_LIGHT, STREAM_CONNECT = 0, 1, 2
D_STREAM = 32  # per-stream coordinate budget


@struct.dataclass
class ReplaySampler:
    """Sampler API (get_1d/get_2d) backed by a primary-sample array —
    the MLTSampler's X vector (samplers.h:658-676) in SoA form."""

    X: jnp.ndarray  # (R, N_STREAMS, D_STREAM)
    stream: int = struct.field(pytree_node=False, default=0)
    cursor_init: int = struct.field(pytree_node=False, default=0)
    cursor: jnp.ndarray = None  # (R,) int32

    def start_stream(self, i):
        return ReplaySampler(self.X, i, 0,
                             jnp.zeros(self.X.shape[0], jnp.int32))

    def _take(self, n):
        idx = jnp.clip(self.cursor[:, None] + jnp.arange(n), 0, D_STREAM - 1)
        vals = jnp.take_along_axis(self.X[:, self.stream, :], idx, axis=1)
        return self.replace(cursor=self.cursor + n), vals

    def get_1d(self):
        s, v = self._take(1)
        return s, v[:, 0]

    def get_2d(self):
        s, v = self._take(2)
        return s, v

    def get_3d(self):
        s, v = self._take(3)
        return s, v

    def get_4d(self):
        s, v = self._take(4)
        return s, (v[:, 0], v[:, 1], v[:, 2], v[:, 3])


def _fresh_X(seed, chain_id, salt, R):
    """Uniform primary-sample array regenerated from counters (stateless)."""
    dims = N_STREAMS * D_STREAM
    cols = []
    for d in range(0, dims, 4):
        u = vrng.uniform4(seed, chain_id, salt, jnp.uint32(d))
        cols.extend(u)
    X = jnp.stack(cols[:dims], axis=-1)
    return X.reshape(R, N_STREAMS, D_STREAM)


def _mlt_L(scene, camera, film, X, depth, use_media=False,
           camera_medium=-1, light_medium=-1, cfg=None):
    """One BDPT strategy evaluation from primary samples (MLTIntegrator::L,
    integrators.cpp:2542-2605). Returns (L (R,3), pixel_id (R,))."""
    R = X.shape[0]
    Kc = depth + 2
    Kl = depth + 1
    n_strategies = 1 if depth == 0 else depth + 2

    # strategy choice from the first connection-stream coordinate
    u_strat = X[:, STREAM_CONNECT, 0]
    s_choice = jnp.minimum((u_strat * n_strategies).astype(jnp.int32),
                           n_strategies - 1)

    # camera subpath: raster position uniform over the film (stream 0)
    smp = ReplaySampler(X).start_stream(STREAM_CAMERA)
    smp, u_pix = smp.get_2d()
    nx, ny = camera.resolution
    px = jnp.minimum((u_pix[:, 0] * nx).astype(jnp.int32), nx - 1)
    py = jnp.minimum((u_pix[:, 1] * ny).astype(jnp.int32), ny - 1)
    pixel_id = py * nx + px
    smp, cv = _bdpt.generate_camera_subpath(
        scene, camera, smp, pixel_id, Kc, camera_medium=camera_medium,
        cfg=cfg, use_media=use_media)
    lsmp = ReplaySampler(X).start_stream(STREAM_LIGHT)
    lsmp, lv = _bdpt.generate_light_subpath(
        scene, lsmp, R, Kl, light_medium=light_medium, cfg=cfg,
        use_media=use_media)

    csm = ReplaySampler(X).start_stream(STREAM_CONNECT)
    csm, _ = csm.get_1d()  # consumed by the strategy choice
    L_out = jnp.zeros((R, 3))
    pix_out = pixel_id
    for s in range(0, n_strategies):
        t = depth + 2 - s
        if t < 1 or (s == 1 and t == 1) or (t == 1 and s < 2):
            continue
        csm, Lst, splat_pix = _bdpt.connect(scene, camera, csm, lv, cv,
                                            s, t, cfg=cfg,
                                            use_media=use_media)
        sel = s_choice == s
        if splat_pix is not None:
            # unify units: our t=1 splats are per-pixel We = npix * full-film
            Lst = Lst / film.npix
            pix_out = jnp.where(sel, jnp.maximum(splat_pix, 0), pix_out)
            Lst = jnp.where((splat_pix >= 0)[:, None], Lst, 0.0)
        L_out = jnp.where(sel[:, None], Lst * n_strategies, L_out)
    return L_out, pix_out


def _luminance(L):
    return jnp.maximum(average(L), 0.0)


@partial(jax.jit, static_argnames=("depth", "n_iters", "sigma", "p_large",
                                   "use_media", "camera_medium",
                                   "light_medium", "cfg"))
def _run_chains(scene, camera, film, film_state, X0, seed, depth,
                n_iters, sigma, p_large, use_media=False,
                camera_medium=-1, light_medium=-1, cfg=None):
    """Run all chains of one depth group for n_iters mutations."""
    R = X0.shape[0]
    chain_id = jnp.arange(R, dtype=jnp.uint32)

    L0, pix0 = _mlt_L(scene, camera, film, X0, depth, use_media,
                      camera_medium, light_medium, cfg)

    def body(it, carry):
        X, L_cur, pix_cur, fs = carry
        it_u = it.astype(jnp.uint32)
        # mutate: large step w.p. p_large, else gaussian perturbation
        u_large = vrng.uniform4(seed, chain_id, it_u, jnp.uint32(9001))[0]
        large = u_large < p_large
        X_fresh = _fresh_X(seed, chain_id, it_u + jnp.uint32(77), R)
        dims = N_STREAMS * D_STREAM
        normals = []
        for d in range(0, dims, 2):
            u1, u2, u3, u4 = vrng.uniform4(seed, chain_id, it_u,
                                           jnp.uint32(3000 + d))
            r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
            normals.append(r * jnp.cos(2 * jnp.pi * u2))
            normals.append(r * jnp.sin(2 * jnp.pi * u2))
        N = jnp.stack(normals[:dims], -1).reshape(R, N_STREAMS, D_STREAM)
        X_small = X + sigma * N
        X_small = X_small - jnp.floor(X_small)  # wrap to [0,1)
        X_prop = jnp.where(large[:, None, None], X_fresh, X_small)

        L_prop, pix_prop = _mlt_L(scene, camera, film, X_prop, depth,
                                  use_media, camera_medium,
                                  light_medium, cfg)
        c_cur = _luminance(L_cur)
        c_prop = _luminance(L_prop)
        accept = jnp.where(c_cur > 0, jnp.minimum(1.0, c_prop / jnp.maximum(c_cur, 1e-30)),
                           jnp.where(c_prop > 0, 1.0, 0.0))
        # splat both states (integrators.cpp:2746-2752)
        w_prop = jnp.where(c_prop > 0, accept / jnp.maximum(c_prop, 1e-30), 0.0)
        w_cur = jnp.where(c_cur > 0, (1.0 - accept) / jnp.maximum(c_cur, 1e-30), 0.0)
        fs = film.add_splats(fs, pix_prop, L_prop * w_prop[:, None])
        fs = film.add_splats(fs, pix_cur, L_cur * w_cur[:, None])
        # accept/reject
        u_acc = vrng.uniform4(seed, chain_id, it_u, jnp.uint32(8191))[1]
        take = u_acc < accept
        X = jnp.where(take[:, None, None], X_prop, X)
        L_cur = jnp.where(take[:, None], L_prop, L_cur)
        pix_cur = jnp.where(take, pix_prop, pix_cur)
        return X, L_cur, pix_cur, fs

    X, L_cur, pix_cur, film_state = jax.lax.fori_loop(
        0, n_iters, body, (X0, L0, pix0, film_state))
    return film_state


@partial(jax.jit, static_argnames=("depth", "nb", "use_media",
                                   "camera_medium", "light_medium",
                                   "cfg"))
def _bootstrap_weights(scene, camera, film, seed, depth, nb,
                       use_media=False, camera_medium=-1,
                       light_medium=-1, cfg=None):
    chain_id = jnp.arange(nb, dtype=jnp.uint32)
    X = _fresh_X(seed, chain_id, jnp.uint32(depth), nb)
    L, _ = _mlt_L(scene, camera, film, X, depth, use_media,
                  camera_medium, light_medium, cfg)
    return _luminance(L)


def render(scene, camera, film, mutations_per_pixel=64, max_depth=5,
           n_chains=4096, n_bootstrap=4096, sigma=0.01,
           large_step_probability=0.3, seed=0, camera_medium=-1,
           light_medium=-1, cfg=None):
    """MLT render (MLTIntegrator::Render). Image = splats * b / mpp with
    per-depth chain groups allocated by bootstrap luminance."""
    import warnings

    if scene.lights.has_env and scene.lights.portal is not None:
        warnings.warn("mlt ignores PORTAL env lights (BDPT core)",
                      stacklevel=2)
    use_media = _bdpt.scene_has_media(scene)
    if cfg is None:
        cfg = _bdpt.VolPathConfig(max_depth=max_depth)
    media_kw = dict(use_media=use_media,
                    camera_medium=int(camera_medium),
                    light_medium=int(light_medium), cfg=cfg)
    seed = jnp.uint32(seed)
    # bootstrap each depth
    b_d = []
    boot_w = []
    for d in range(max_depth + 1):
        w = np.asarray(jax.device_get(
            _bootstrap_weights(scene, camera, film, seed, d, n_bootstrap,
                               **media_kw)))
        boot_w.append(w)
        b_d.append(float(w.mean()))
    b = float(sum(b_d))
    if b <= 0:
        raise RuntimeError("MLT bootstrap found no light-carrying paths")

    total_mutations = film.npix * mutations_per_pixel
    film_state = film.init_state()
    host_rng = np.random.default_rng(int(seed))
    for d in range(max_depth + 1):
        n_d = int(round(n_chains * b_d[d] / b))
        if n_d == 0:
            continue
        iters = max(int(round(total_mutations * (b_d[d] / b) / n_d)), 1)
        # seed chains from bootstrap states, weight-proportional
        w = boot_w[d]
        p = w / w.sum() if w.sum() > 0 else np.full_like(w, 1.0 / len(w))
        starts = host_rng.choice(len(w), size=n_d, p=p).astype(np.uint32)
        chain_id = jnp.asarray(starts)
        X0 = _fresh_X(seed, chain_id, jnp.uint32(d), n_d)
        film_state = _run_chains(scene, camera, film, film_state, X0, seed,
                                 d, int(iters), float(sigma),
                                 float(large_step_probability),
                                 **media_kw)
    # E[splat/chain-iter] integrates to 1/b of the image: scale back
    n_eff = total_mutations
    return film.image(film_state, splat_scale=b * film.npix / max(n_eff, 1))
