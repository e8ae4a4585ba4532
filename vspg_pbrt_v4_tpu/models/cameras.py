"""Cameras: batched ray generation (analog of ``src/pbrt/cameras.h``).

A camera is a small pytree of transforms + params; ``generate_rays`` maps a
batch of (pixel xy, film-sample u, lens u) draws to world-space rays — one
fused VPU pass over the whole wavefront, replacing per-ray GenerateRay calls
(cameras.h Perspective:345, Orthographic:288, Spherical:411).
"""

from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..utils import transform as tr
from ..utils.math import PI
from ..utils.sampling import sample_uniform_disk_concentric
from ..utils.vecmath import normalize, vec


@struct.dataclass
class PerspectiveCamera:
    camera_to_world: tr.Transform
    raster_to_camera: tr.Transform  # pixel coords -> camera-space near plane
    lens_radius: float = struct.field(pytree_node=False)
    focal_distance: float = struct.field(pytree_node=False)
    resolution: tuple = struct.field(pytree_node=False)  # (nx, ny)

    @staticmethod
    def make(camera_to_world, fov_deg, resolution, lens_radius=0.0, focal_distance=1e6,
             screen_window=None):
        nx, ny = resolution
        aspect = nx / ny
        if screen_window is None:
            if aspect > 1:
                screen = (-aspect, aspect, -1.0, 1.0)
            else:
                screen = (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)
        else:
            screen = screen_window
        cam_to_screen = tr.perspective(fov_deg)
        # raster(0..n) -> NDC(0..1) -> screen -> camera
        screen_to_raster = (
            tr.scale(nx, ny, 1.0)
            @ tr.scale(1.0 / (screen[1] - screen[0]), 1.0 / (screen[2] - screen[3]), 1.0)
            @ tr.translate(-screen[0], -screen[3], 0.0)
        )
        raster_to_screen = screen_to_raster.inverse()
        raster_to_camera = cam_to_screen.inverse() @ raster_to_screen
        return PerspectiveCamera(
            camera_to_world, raster_to_camera, float(lens_radius),
            float(focal_distance), (int(nx), int(ny)),
        )

    def sample_wi(self, p):
        """Importance connection from world point p to the (pinhole) camera
        (cameras.h PerspectiveCamera::SampleWi:310 semantics, in per-pixel
        raster measure).

        Returns (valid, pixel_id, wi, dist, We) with We = 1/(A_pix cos^3)
        such that a particle splat is alpha*f*|cos_y|*Tr*We/dist^2.
        """
        w2c = self.camera_to_world.inverse()
        p_cam = tr.apply_point(w2c, p)
        z = p_cam[..., 2]
        dist = jnp.linalg.norm(p_cam, axis=-1)
        valid = z > 1e-6
        p_raster = tr.apply_point(
            self.raster_to_camera.inverse(),
            p_cam / jnp.maximum(z, 1e-12)[..., None])
        nx, ny = self.resolution
        ix = jnp.floor(p_raster[..., 0]).astype(jnp.int32)
        iy = jnp.floor(p_raster[..., 1]).astype(jnp.int32)
        valid &= (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        pixel_id = jnp.clip(iy, 0, ny - 1) * nx + jnp.clip(ix, 0, nx - 1)
        # per-pixel film area on the z=1 plane
        c0 = tr.apply_point(self.raster_to_camera,
                            jnp.asarray([0.0, 0.0, 0.0]))
        c1 = tr.apply_point(self.raster_to_camera,
                            jnp.asarray([float(nx), float(ny), 0.0]))
        c0 = c0 / c0[2]
        c1 = c1 / c1[2]
        a_pix = jnp.abs((c1[0] - c0[0]) * (c1[1] - c0[1])) / (nx * ny)
        cos_t = z / jnp.maximum(dist, 1e-12)
        we = 1.0 / jnp.maximum(a_pix * cos_t**3, 1e-20)
        o_world = tr.apply_point(self.camera_to_world,
                                 jnp.zeros_like(p_cam))
        wi = (o_world - p) / jnp.maximum(dist, 1e-12)[..., None]
        return valid, pixel_id, wi, dist, we

    def generate_rays(self, p_raster, u_lens):
        """p_raster: (...,2) continuous pixel coords; u_lens: (...,2).

        Returns (o, d) world-space, d normalized. Weight is 1 (thin lens).
        """
        p_film = jnp.concatenate(
            [p_raster, jnp.zeros(p_raster.shape[:-1] + (1,))], axis=-1
        )
        p_cam = tr.apply_point(self.raster_to_camera, p_film)
        d_cam = normalize(p_cam)
        o_cam = jnp.zeros_like(d_cam)
        if self.lens_radius > 0:
            p_lens = self.lens_radius * sample_uniform_disk_concentric(u_lens)
            ft = self.focal_distance / d_cam[..., 2]
            p_focus = ft[..., None] * d_cam
            o_cam = jnp.concatenate(
                [p_lens, jnp.zeros(p_lens.shape[:-1] + (1,))], axis=-1
            )
            d_cam = normalize(p_focus - o_cam)
        o = tr.apply_point(self.camera_to_world, o_cam)
        d = normalize(tr.apply_vector(self.camera_to_world, d_cam))
        return o, d


@struct.dataclass
class OrthographicCamera:
    camera_to_world: tr.Transform
    raster_to_camera: tr.Transform
    resolution: tuple = struct.field(pytree_node=False)

    @staticmethod
    def make(camera_to_world, resolution, screen_window=(-1.0, 1.0, -1.0, 1.0)):
        nx, ny = resolution
        screen = screen_window
        cam_to_screen = tr.orthographic()
        screen_to_raster = (
            tr.scale(nx, ny, 1.0)
            @ tr.scale(1.0 / (screen[1] - screen[0]), 1.0 / (screen[2] - screen[3]), 1.0)
            @ tr.translate(-screen[0], -screen[3], 0.0)
        )
        raster_to_camera = cam_to_screen.inverse() @ screen_to_raster.inverse()
        return OrthographicCamera(camera_to_world, raster_to_camera, (int(nx), int(ny)))

    def generate_rays(self, p_raster, u_lens):
        p_film = jnp.concatenate(
            [p_raster, jnp.zeros(p_raster.shape[:-1] + (1,))], axis=-1
        )
        p_cam = tr.apply_point(self.raster_to_camera, p_film)
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p_cam.shape)
        o = tr.apply_point(self.camera_to_world, p_cam)
        d = normalize(tr.apply_vector(self.camera_to_world, d_cam))
        return o, d


@struct.dataclass
class SphericalCamera:
    """Equirectangular environment camera (cameras.h Spherical:411)."""

    camera_to_world: tr.Transform
    resolution: tuple = struct.field(pytree_node=False)

    def generate_rays(self, p_raster, u_lens):
        nx, ny = self.resolution
        u = p_raster[..., 0] / nx
        v = p_raster[..., 1] / ny
        theta = PI * v
        phi = 2.0 * PI * u
        d_cam = vec(
            jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)
        )
        o = tr.apply_point(self.camera_to_world, jnp.zeros_like(d_cam))
        d = normalize(tr.apply_vector(self.camera_to_world, d_cam))
        return o, d
