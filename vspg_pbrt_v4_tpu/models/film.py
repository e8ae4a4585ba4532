"""Film: pixel accumulation via scatter-add (analog of ``src/pbrt/film.h``).

The reference accumulates per-pixel weighted radiance with AtomicDouble splats
(film.h RGBFilm:244). On TPU the wavefront's (ray -> pixel) contributions
become one big segment-sum: ``.at[pixel_id].add()`` scatters, which XLA
lowers to an on-device sort/segmented reduction — no atomics, deterministic.

In RGB rendering mode the sensor is ``imagingRatio * L`` (film.h:95-104), so
PixelSensor reduces to a scalar gain + optional 3x3 white-balance matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct as struct
import jax.numpy as jnp
import numpy as np


class FilmState(NamedTuple):
    """Accumulation buffers, a pytree carried through the wave loop."""

    rgb_sum: jnp.ndarray  # (npix, 3) weighted radiance sum
    weight_sum: jnp.ndarray  # (npix,) filter weight sum
    splat_sum: jnp.ndarray  # (npix, 3) unweighted splats (BDPT/light tracing)


@struct.dataclass
class RGBFilm:
    sensor_matrix: jnp.ndarray  # (3,3) white-balance / sensor->output RGB
    filter: object  # models.filters.Filter (box default)
    resolution: tuple = struct.field(pytree_node=False)  # (nx, ny)
    imaging_ratio: float = struct.field(pytree_node=False)
    max_component: float = struct.field(pytree_node=False)  # clamp ("maxcomponentvalue")

    @staticmethod
    def make(resolution, imaging_ratio=1.0, sensor_matrix=None,
             max_component=np.inf, filter=None):
        if sensor_matrix is None:
            sensor_matrix = np.eye(3, dtype=np.float32)
        if filter is None:
            from .filters import Filter

            filter = Filter.make("box")
        return RGBFilm(
            jnp.asarray(sensor_matrix, jnp.float32),
            filter,
            (int(resolution[0]), int(resolution[1])),
            float(imaging_ratio),
            float(max_component),
        )

    @property
    def npix(self):
        return self.resolution[0] * self.resolution[1]

    def init_state(self) -> FilmState:
        return FilmState(
            jnp.zeros((self.npix, 3), jnp.float32),
            jnp.zeros((self.npix,), jnp.float32),
            jnp.zeros((self.npix, 3), jnp.float32),
        )

    def add_samples(self, state: FilmState, pixel_id, L, weight) -> FilmState:
        """Scatter-add a wavefront of samples.

        pixel_id: (R,) int32; L: (R,3); weight: (R,) filter weight.
        NaN/Inf scrubbing mirrors RayIntegrator (cpu/integrators.cpp:308-318).
        """
        bad = jnp.any(~jnp.isfinite(L), axis=-1)
        L = jnp.where(bad[..., None], 0.0, L)
        L = jnp.minimum(L, self.max_component)
        rgb = self.imaging_ratio * L
        return state._replace(
            rgb_sum=state.rgb_sum.at[pixel_id].add(rgb * weight[..., None]),
            weight_sum=state.weight_sum.at[pixel_id].add(weight),
        )

    def add_spectral_samples(self, state: FilmState, pixel_id, values, lam,
                             pdf, weight) -> FilmState:
        """Accumulate N=4 spectral radiance samples: CIE-integrate each
        lane's (value, lambda, pdf) quadruple to XYZ, convert to the sensor
        RGB, then scatter-add like add_samples (the role of the reference's
        spectral film + PixelSensor::ToSensorRGB)."""
        from ..utils.spectrum import spectral_to_sensor_rgb

        rgb = spectral_to_sensor_rgb(values, lam, pdf)
        return self.add_samples(state, pixel_id, rgb, weight)

    def add_splats(self, state: FilmState, pixel_id, L) -> FilmState:
        bad = jnp.any(~jnp.isfinite(L), axis=-1)
        L = jnp.where(bad[..., None], 0.0, L)
        return state._replace(
            splat_sum=state.splat_sum.at[pixel_id].add(self.imaging_ratio * L)
        )

    def image(self, state: FilmState, splat_scale=0.0):
        """Final (ny, nx, 3) image."""
        w = jnp.maximum(state.weight_sum, 1e-12)[..., None]
        rgb = state.rgb_sum / w + splat_scale * state.splat_sum
        rgb = rgb @ self.sensor_matrix.T
        nx, ny = self.resolution
        return rgb.reshape(ny, nx, 3)


def pixel_coords(resolution):
    """(npix, 2) integer pixel centers in raster order (x fastest)."""
    nx, ny = resolution
    xs = jnp.arange(nx)
    ys = jnp.arange(ny)
    gx, gy = jnp.meshgrid(xs, ys)  # (ny, nx)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def mse(img, ref):
    return jnp.mean((img - ref) ** 2)


def relmse(img, ref, eps=0.01):
    return jnp.mean((img - ref) ** 2 / (ref * ref + eps))


def mae(img, ref):
    return jnp.mean(jnp.abs(img - ref))


def mrse(img, ref, eps=1e-3):
    """Mean relative squared error as in imgtool diff --metric MRSE."""
    return jnp.mean((img - ref) ** 2 / (ref * ref + eps))


class SpectralFilmState(NamedTuple):
    """SpectralFilm accumulation buffers (film.h:498 Pixel analog)."""

    rgb_sum: jnp.ndarray  # (npix, 3)
    weight_sum: jnp.ndarray  # (npix,)
    splat_sum: jnp.ndarray  # (npix, 3)
    bucket_sums: jnp.ndarray  # (npix, B) per-wavelength-bucket radiance
    bucket_weights: jnp.ndarray  # (npix, B) per-bucket filter weights


@struct.dataclass
class SpectralFilm:
    """Per-wavelength-bucket film (film.h SpectralFilm:498-563): keeps
    an accurate RGB image like RGBFilm AND accumulates radiance into
    `n_buckets` equal wavelength buckets over [lambda_min, lambda_max].

    The reference deposits raw L (not divided by the wavelength pdf)
    because its SampleWavelengths is uniform (:504-507). The renderer
    here importance-samples visible wavelengths, so each sample is
    reweighted by pdf_uniform/pdf — identical estimator when sampling
    is uniform, unbiased otherwise. Output channel naming matches
    film.cpp:1186 ("%.3fnm" bucket centers).
    """

    sensor_matrix: jnp.ndarray
    filter: object
    resolution: tuple = struct.field(pytree_node=False)
    imaging_ratio: float = struct.field(pytree_node=False)
    max_component: float = struct.field(pytree_node=False)
    lambda_min: float = struct.field(pytree_node=False)
    lambda_max: float = struct.field(pytree_node=False)
    n_buckets: int = struct.field(pytree_node=False)

    @staticmethod
    def make(resolution, imaging_ratio=1.0, sensor_matrix=None,
             max_component=np.inf, filter=None, lambda_min=360.0,
             lambda_max=830.0, n_buckets=16):
        if sensor_matrix is None:
            sensor_matrix = np.eye(3, dtype=np.float32)
        if filter is None:
            from .filters import Filter

            filter = Filter.make("box")
        return SpectralFilm(
            jnp.asarray(sensor_matrix, jnp.float32), filter,
            (int(resolution[0]), int(resolution[1])),
            float(imaging_ratio), float(max_component),
            float(lambda_min), float(lambda_max), int(n_buckets))

    @property
    def npix(self):
        return self.resolution[0] * self.resolution[1]

    def init_state(self) -> SpectralFilmState:
        return SpectralFilmState(
            jnp.zeros((self.npix, 3), jnp.float32),
            jnp.zeros((self.npix,), jnp.float32),
            jnp.zeros((self.npix, 3), jnp.float32),
            jnp.zeros((self.npix, self.n_buckets), jnp.float32),
            jnp.zeros((self.npix, self.n_buckets), jnp.float32),
        )

    def add_samples(self, state, pixel_id, L, weight):
        # RGB-only samples keep the RGB image accurate; buckets gain
        # nothing (an RGB triple has no wavelength position)
        bad = jnp.any(~jnp.isfinite(L), axis=-1)
        L = jnp.where(bad[..., None], 0.0, L)
        L = jnp.minimum(L, self.max_component)
        rgb = self.imaging_ratio * L
        return state._replace(
            rgb_sum=state.rgb_sum.at[pixel_id].add(rgb * weight[..., None]),
            weight_sum=state.weight_sum.at[pixel_id].add(weight),
        )

    def add_spectral_samples(self, state, pixel_id, values, lam, pdf,
                             weight):
        from ..utils.spectrum import CIE_Y_INTEGRAL, spectral_to_sensor_rgb

        rgb = spectral_to_sensor_rgb(values, lam, pdf)
        state = self.add_samples(state, pixel_id, rgb, weight)
        # spectral buckets (film.h:530-552): clamp, x CIE_Y_integral;
        # reweight importance-sampled wavelengths to the uniform-pdf
        # estimator the reference's bucket algebra assumes
        bad = jnp.any(~jnp.isfinite(values), axis=-1)
        Ls = jnp.where(bad[..., None], 0.0, values)
        lm = jnp.max(Ls, axis=-1, keepdims=True)
        Ls = jnp.where(lm > self.max_component,
                       Ls * (self.max_component / jnp.maximum(lm, 1e-30)),
                       Ls)
        pdf_u = 1.0 / (self.lambda_max - self.lambda_min)
        ratio = pdf_u / jnp.maximum(pdf, 1e-30)
        Ls = Ls * ratio * CIE_Y_INTEGRAL * weight[..., None]
        b = jnp.clip(((lam - self.lambda_min)
                      / (self.lambda_max - self.lambda_min)
                      * self.n_buckets).astype(jnp.int32),
                     0, self.n_buckets - 1)
        bsum = state.bucket_sums
        bw = state.bucket_weights
        for k in range(values.shape[-1]):
            bsum = bsum.at[pixel_id, b[..., k]].add(Ls[..., k])
            # the weight deposit carries the same uniform-pdf reweight so
            # bucketSums/weightSums estimates the bucket's MEAN radiance
            # exactly as the reference's uniform-sampling algebra does
            bw = bw.at[pixel_id, b[..., k]].add(weight * ratio[..., k])
        return state._replace(bucket_sums=bsum, bucket_weights=bw)

    def add_splats(self, state, pixel_id, L):
        bad = jnp.any(~jnp.isfinite(L), axis=-1)
        L = jnp.where(bad[..., None], 0.0, L)
        return state._replace(
            splat_sum=state.splat_sum.at[pixel_id].add(
                self.imaging_ratio * L))

    def image(self, state, splat_scale=0.0):
        w = jnp.maximum(state.weight_sum, 1e-12)[..., None]
        rgb = state.rgb_sum / w + splat_scale * state.splat_sum
        rgb = rgb @ self.sensor_matrix.T
        nx, ny = self.resolution
        return rgb.reshape(ny, nx, 3)

    def spectral_image(self, state):
        """(ny, nx, B) bucket radiance means (film.cpp:1180-1249
        GetImage spectral channels)."""
        w = jnp.maximum(state.bucket_weights, 1e-12)
        nx, ny = self.resolution
        return (state.bucket_sums / w).reshape(ny, nx, self.n_buckets)

    def spectral_channel_names(self):
        """EXR channel names, film.cpp:1186 convention ("%.3fnm")."""
        return tuple(
            "%.3fnm" % (self.lambda_min
                        + (i + 0.5) / self.n_buckets
                        * (self.lambda_max - self.lambda_min))
            for i in range(self.n_buckets))

