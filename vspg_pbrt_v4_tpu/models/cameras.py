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
    # shutter interval (cameras.h:131-149): ray time ~ U[open, close];
    # open == close == 0 disables motion blur
    shutter_open: float = struct.field(pytree_node=False, default=0.0)
    shutter_close: float = struct.field(pytree_node=False, default=0.0)

    @staticmethod
    def make(camera_to_world, fov_deg, resolution, lens_radius=0.0, focal_distance=1e6,
             screen_window=None, shutter_open=0.0, shutter_close=0.0):
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
            float(shutter_open), float(shutter_close),
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

    def pdf_we_dir(self, d_world):
        """Directional density of camera rays (cameras.h
        PerspectiveCamera::PDF_We:300 role): 1/(A cos^3 theta) in the
        full-film measure, zero outside the frustum. Used by BDPT MIS."""
        w2c = self.camera_to_world.inverse()
        d_cam = tr.apply_vector(w2c, d_world)
        cos_t = d_cam[..., 2] / jnp.maximum(
            jnp.linalg.norm(d_cam, axis=-1), 1e-12)
        valid = cos_t > 1e-6
        # raster position of the direction (project to z=1 plane)
        p_r = tr.apply_point(
            self.raster_to_camera.inverse(),
            d_cam / jnp.maximum(d_cam[..., 2], 1e-12)[..., None])
        nx, ny = self.resolution
        valid &= ((p_r[..., 0] >= 0) & (p_r[..., 0] < nx)
                  & (p_r[..., 1] >= 0) & (p_r[..., 1] < ny))
        # film area on the z=1 plane
        c0 = tr.apply_point(self.raster_to_camera, jnp.asarray([0.0, 0.0, 0.0]))
        c1 = tr.apply_point(self.raster_to_camera,
                            jnp.asarray([float(nx), float(ny), 0.0]))
        a_full = jnp.abs((c1[0] / c1[2] - c0[0] / c0[2])
                         * (c1[1] / c1[2] - c0[1] / c0[2]))
        pdf = 1.0 / jnp.maximum(a_full * cos_t**3, 1e-20)
        return jnp.where(valid, pdf, 0.0)

    @property
    def origin_world(self):
        return tr.apply_point(self.camera_to_world, jnp.zeros(3))

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


@struct.dataclass
class RealisticCamera:
    """Lens-system camera (cameras.h RealisticCamera:600): rays start on the
    physical film plane, pass through a sampled point on the rear lens
    element, and refract through every spherical interface of the lens
    description; vignetted rays get zero radiance weight.

    Convention: film on the optical axis at z=0, the camera looks down +z,
    interface apex positions z>0 increase toward the scene. The lens table
    rows are front(scene-side)-to-back like pbrt .dat lens files:
    [curvature_radius_mm, thickness_mm, eta, aperture_diameter_mm] (values
    here already converted to meters). generate_rays returns (o, d, weight)
    with the radiometric weight cos^4(theta) * A_rear / z_rear^2.
    """

    camera_to_world: tr.Transform
    radius: jnp.ndarray  # (E,) curvature radii (0 = aperture stop)
    z_apex: jnp.ndarray  # (E,) interface apex z (film at 0)
    eta_behind: jnp.ndarray  # (E,) IOR on the film side of each interface
    ap_radius: jnp.ndarray  # (E,) clear aperture radius
    film_w: float = struct.field(pytree_node=False)
    film_h: float = struct.field(pytree_node=False)
    resolution: tuple = struct.field(pytree_node=False)

    @staticmethod
    def make(camera_to_world, lens_rows, resolution, film_diag=0.035,
             aperture_diameter=None, film_distance=None):
        """lens_rows: (E,4) front-to-back [radius, thickness, eta,
        aperture_diameter] in meters; thickness = gap to the NEXT row
        (the last row's thickness is the rear-element-to-film gap unless
        film_distance overrides it)."""
        import numpy as np

        rows = np.asarray(lens_rows, np.float64)
        E = rows.shape[0]
        if aperture_diameter is not None:
            for i in range(E):
                if rows[i, 0] == 0:
                    rows[i, 3] = aperture_diameter
        thick = rows[:, 1].copy()
        if film_distance is not None:
            thick[-1] = film_distance
        # apex z: accumulate gaps from the film plane backwards
        z = np.zeros(E)
        acc = 0.0
        for i in range(E - 1, -1, -1):
            acc += thick[i]
            z[i] = acc
        eta = np.where(rows[:, 2] == 0, 1.0, rows[:, 2])
        nx, ny = resolution
        aspect = nx / ny
        film_h = film_diag / np.sqrt(1 + aspect**2)
        film_w = aspect * film_h
        # pbrt lens tables assume the scene toward -z; our axis points the
        # other way, which mirrors the curvature signs
        return RealisticCamera(
            camera_to_world,
            jnp.asarray(-rows[:, 0], jnp.float32),
            jnp.asarray(z, jnp.float32),
            jnp.asarray(eta, jnp.float32),
            jnp.asarray(rows[:, 3] / 2, jnp.float32),
            float(film_w), float(film_h), (int(nx), int(ny)),
        )

    @staticmethod
    def simple_lens(camera_to_world, resolution, focal=0.05,
                    aperture_diameter=0.01, focus_distance=2.0,
                    film_diag=0.035):
        """Built-in thin biconvex singlet (n=1.5, lensmaker R=f) focused at
        focus_distance via the thin-lens equation (fallback when no lens
        file is given)."""
        import numpy as np

        import numpy as np

        n = 1.5
        R = focal  # R1=-R2: thin-lens f = R for n=1.5
        t = 0.003

        def build(di):
            rows = [
                [R, t, n, aperture_diameter * 2.5],
                [-R, di, 0.0, aperture_diameter * 2.5],
            ]
            cam = RealisticCamera.make(camera_to_world, rows, resolution,
                                       film_diag=film_diag,
                                       aperture_diameter=None)
            return cam.replace(ap_radius=jnp.asarray(
                [aperture_diameter * 1.25, aperture_diameter / 2],
                jnp.float32))

        def axial_focus(di):
            """Trace center-film rays, return 1/z of the axis crossing
            (empirical autofocus — the role of FocusThickLens,
            cameras.cpp:498)."""
            cam = build(di)
            nx, ny = cam.resolution
            k = 16
            pr = jnp.tile(jnp.asarray([[nx / 2.0, ny / 2.0]]), (k, 1))
            u = jnp.stack([jnp.linspace(0.3, 0.7, k), jnp.full(k, 0.5)], -1)
            o, d, w = cam.generate_rays(pr, u)
            o, d, w = map(np.asarray, (o, d, w))
            ok = w > 0
            if not ok.any():
                return 0.0
            tx = -o[ok, 0] / np.where(np.abs(d[ok, 0]) < 1e-12, 1e-12,
                                      d[ok, 0])
            z = o[ok, 2] + tx * d[ok, 2]
            z = float(np.median(z))
            return 1.0 / z if z > 0 else -1.0

        target = 1.0 / max(focus_distance, focal * 1.05)
        d0, d1 = focal * 1.002, focal * 1.1
        f0 = axial_focus(d0) - target
        f1 = axial_focus(d1) - target
        for _ in range(8):  # secant iterations
            if abs(f1 - f0) < 1e-12:
                break
            d2 = d1 - f1 * (d1 - d0) / (f1 - f0)
            d2 = min(max(d2, focal * 1.0005), focal * 1.5)
            d0, f0 = d1, f1
            d1, f1 = d2, axial_focus(d2) - target
        return build(d1)

    @property
    def n_elements(self):
        return self.radius.shape[0]

    def generate_rays(self, p_raster, u_lens):
        nx, ny = self.resolution
        # film point (180-degree rotation: the lens inverts the image)
        fx = -(p_raster[..., 0] / nx - 0.5) * self.film_w
        fy = (p_raster[..., 1] / ny - 0.5) * self.film_h
        p_film = jnp.stack([fx, fy, jnp.zeros_like(fx)], -1)
        # sample the rear element disk
        rear_z = self.z_apex[-1]
        rear_r = self.ap_radius[-1]
        pl = rear_r * sample_uniform_disk_concentric(u_lens)
        p_rear = jnp.stack([pl[..., 0], pl[..., 1],
                            jnp.broadcast_to(rear_z, fx.shape)], -1)
        d = normalize(p_rear - p_film)
        o = p_film
        ok = jnp.ones(fx.shape, bool)
        n_cur = jnp.ones(fx.shape)  # air between film and rear element
        E = self.n_elements
        for i in range(E - 1, -1, -1):  # rear (film side) to front
            r = self.radius[i]
            za = self.z_apex[i]
            is_stop = r == 0
            # plane intersection for the stop
            t_plane = (za - o[..., 2]) / jnp.where(
                jnp.abs(d[..., 2]) < 1e-9, 1e-9, d[..., 2])
            # sphere: center on axis at za + r
            zc = za + r
            oc = o - jnp.stack([jnp.zeros_like(fx), jnp.zeros_like(fx),
                                jnp.broadcast_to(zc, fx.shape)], -1)
            b = jnp.sum(oc * d, -1)
            c = jnp.sum(oc * oc, -1) - r * r
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            # pbrt: use the closer/farther root depending on travel
            # direction and curvature sign (cameras.cpp IntersectSphere)
            # traveling toward +z, a cap whose center lies on the film side
            # (r < 0) is crossed at the far sphere root; r > 0 at the near
            use_far = (d[..., 2] > 0) ^ (r > 0)
            t_sph = jnp.where(use_far, -b + sq, -b - sq)
            t = jnp.where(is_stop, t_plane, t_sph)
            ok = ok & (jnp.where(is_stop, True, disc >= 0)) & (t > 1e-9)
            p = o + t[..., None] * d
            ok = ok & (p[..., 0] ** 2 + p[..., 1] ** 2
                       <= self.ap_radius[i] ** 2)
            # refract (skip at the stop)
            n_hit = normalize(p - jnp.stack(
                [jnp.zeros_like(fx), jnp.zeros_like(fx),
                 jnp.broadcast_to(zc, fx.shape)], -1))
            n_hit = jnp.where((jnp.sum(n_hit * d, -1) > 0)[..., None],
                              -n_hit, n_hit)
            # medium in front of interface i (scene side) = eta of row i-1's
            # gap; for the front element it is air
            n_next = self.eta_behind[i - 1] if i > 0 else jnp.float32(1.0)
            n_next = jnp.broadcast_to(n_next, fx.shape)
            # travelling film->scene we EXIT the glass whose IOR is
            # eta_behind[i]; incident medium is n_cur
            ratio = n_cur / jnp.where(is_stop, n_cur, n_next)
            cos_i = -jnp.sum(n_hit * d, -1)
            sin2_t = ratio**2 * jnp.maximum(1.0 - cos_i**2, 0.0)
            tir = sin2_t > 1.0
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            d_ref = normalize(ratio[..., None] * d
                              + (ratio * cos_i - cos_t)[..., None] * n_hit)
            d = jnp.where(is_stop, d, jnp.where(tir[..., None], d, d_ref))
            ok = ok & (is_stop | ~tir)
            o = p
            n_cur = jnp.where(is_stop, n_cur, n_next)
        # radiometric weight (cameras.cpp RealisticCamera::GenerateRay)
        d0 = normalize(p_rear - p_film)
        cos4 = d0[..., 2] ** 4
        area = jnp.pi * rear_r**2
        w = jnp.where(ok, cos4 * area / jnp.maximum(rear_z, 1e-9) ** 2, 0.0)
        o_w = tr.apply_point(self.camera_to_world, o)
        d_w = normalize(tr.apply_vector(self.camera_to_world, d))
        return o_w, d_w, w
