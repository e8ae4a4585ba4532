"""Graphics-state scene builder: directives -> render-ready Scene.

Analog of BasicSceneBuilder + BasicScene + RenderCPU's realization ordering
(scene.h:383, cpu/render.cpp:24-170): a CTM/attribute stack machine walks the
directive list, collecting shapes (with bound material / area light / medium
interface), lights, media, then builds the SoA Scene plus camera, film and
integrator configuration.

Supported surface: sphere, disk, trianglemesh (P/indices[/N]); materials:
diffuse, conductor, dielectric, thindielectric, diffusetransmission,
coateddiffuse/plastic, coatedconductor, mix; lights: point, spot, distant,
infinite (uniform + equal-area image), area "diffuse"; media: homogeneous,
uniformgrid. Unsupported types degrade with a warning rather than erroring
(mirroring pbrt's Warning+default behavior).
"""

from __future__ import annotations

import warnings
from typing import NamedTuple

import numpy as np

from ..models.cameras import OrthographicCamera, PerspectiveCamera, SphericalCamera
from ..models.film import RGBFilm
from ..models.integrators import volpath
from ..models.lights import Lights
from ..models.materials import (COATED_CONDUCTOR, COATED_DIFFUSE, CONDUCTOR,
                                DIELECTRIC, DIFFUSE, DIFFUSE_TRANS, MIX,
                                THIN_DIELECTRIC, Materials)
from ..models.media import GridMedium, Media
from ..models.shapes import Geometry
from ..models.textures import (CHECKER, CONSTANT, DOTS, IMAGE, MARBLE, SCALE,
                               WINDY, WRINKLED, Textures)
from ..models.textures import FBM as FBM_TEX
from ..models.textures import MIX as TEX_MIX
from ..models.textures import UV as UV_TEX
from ..utils import transform as tr
from .parser import ParameterDictionary


class RenderSetup(NamedTuple):
    scene: object  # volpath.Scene
    camera: object
    film: object
    integrator: str
    integrator_params: dict
    sampler: str
    spp: int
    camera_medium: int
    outfile: str


class _GState:
    def __init__(self):
        self.ctm = tr.identity()
        self.ctm_end = None  # end-keyframe CTM (None = static pair)
        self.material = 0
        self.area_light = None  # pending AreaLightSource params
        self.medium_in = -1
        self.medium_out = -1
        self.reverse = False

    def copy(self):
        g = _GState()
        g.__dict__.update(self.__dict__)
        g.ctm = self.ctm
        g.ctm_end = self.ctm_end
        return g


def build_render_setup(directives, spp_override=None, res_override=None):
    # async asset loading: start background loads of every referenced file
    # (PLY, images, volume grids) before the directive walk consumes them
    # (scene.cpp RunAsync imports; see scene/assets.py)
    from . import assets

    assets.prefetch(directives)
    st = _GState()
    stack = []
    world = False

    tris = []
    tri_meshes = []  # vectorized whole-mesh array bundles (big meshes)
    spheres = []
    boxes = []
    curves = []
    disks = []
    cylinders = []
    patches = []
    mats = [dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))]  # default material
    named_mats = {}
    measured_bank = []  # loaded measured-BRDF tables (MERL .binary)
    area_tris = []
    point_lights = []
    spot_lights = []
    gonio_lights = []
    proj_lights = []
    distant_lights = []
    env_L = None
    env_img = None
    portal_corners = [None]
    homog_media = []
    grid_media = []
    proc_media = []
    named_media = {}
    camera_directive = None
    cam_to_world = tr.identity()
    film_params = {}
    film_type = ["rgb"]
    integrator = "volpath"
    integrator_params = {}
    sampler = "independent"
    spp = 16
    accelerator = "bvh"
    filter_directive = None
    textures = []  # texture table rows
    tex_images = []  # loaded image arrays
    named_textures = {}
    ptex_rects_by_tex = {}  # texture id -> per-face atlas rects
    face_atlas_rects = {}  # material id -> per-face atlas rects

    def warn(msg, loc):
        warnings.warn(f"{loc}: {msg}")

    object_defs = {}
    defining_object = [None]
    named_coord_systems = {}
    inst_objects = []  # per-object object-space triangle lists
    inst_list = []  # instance records {obj, o2w[, o2w_end]}
    active_xf = ["all"]  # ActiveTransform member selection
    transform_times = [0.0, 1.0]  # TransformTimes start/end

    def handle_shape(d, p, st):
        def xf_pts(pts):
            import jax.numpy as jnp

            return np.asarray(tr.apply_point(st.ctm, jnp.asarray(pts, np.float32)))

        def xf_nrm(ns):
            import jax.numpy as jnp

            n = np.asarray(tr.apply_normal(st.ctm, jnp.asarray(ns, np.float32)))
            ln = np.linalg.norm(n, axis=-1, keepdims=True)
            return n / np.maximum(ln, 1e-20)

        stype = d.args[0]
        has_light = st.area_light is not None
        light_id = -1
        if has_light:
            lp = st.area_light[1]
            L_area = lp.get_rgb("L", np.asarray([1.0, 1, 1])) * lp.get_float("scale", 1.0)
            two = lp.get_bool("twosided", False)
        mat_id = st.material

        if stype == "sphere":
            r = p.get_float("radius", 1.0)
            c = xf_pts(np.zeros(3))
            if has_light:
                warn("sphere area light approximated by geometry only "
                     "(NEE samples triangles)", d.loc)
            spheres.append(dict(c=c, r=r, mat=mat_id, light=-1,
                                med_in=st.medium_in, med_out=st.medium_out))
        elif stype == "trianglemesh":
            P = p.get_floats("P")
            idx = p.get_ints("indices")
            if P is None or idx is None:
                from .parser import PbrtError

                raise PbrtError(
                    "trianglemesh requires \"P\" and \"indices\"", d.loc)
            P = P.reshape(-1, 3)
            idx = idx.reshape(-1, 3)
            Pw = xf_pts(P)
            N = p.get_floats("N")
            Nw = xf_nrm(N.reshape(-1, 3)) if N is not None else None
            UV = p.get_floats("uv")
            if UV is None:
                UV = p.get_floats("st")
            UV = UV.reshape(-1, 2) if UV is not None else None
            # ptex-style per-face texturing: when the bound material's
            # texture is a face atlas, each triangle's corners get that
            # face's atlas rect (face index = mesh triangle order,
            # faceIndex semantics of pbrt's PtexTexture)
            atlas_rects = face_atlas_rects.get(mat_id)
            if not has_light and atlas_rects is None:
                # vectorized path: whole mesh as one array bundle (no
                # per-triangle Python objects — production-size meshes)
                bund = dict(p0=Pw[idx[:, 0]], p1=Pw[idx[:, 1]],
                            p2=Pw[idx[:, 2]], mat=mat_id,
                            med_in=st.medium_in, med_out=st.medium_out)
                if Nw is not None:
                    bund.update(n0=Nw[idx[:, 0]], n1=Nw[idx[:, 1]],
                                n2=Nw[idx[:, 2]])
                if UV is not None:
                    bund.update(uv0=UV[idx[:, 0]], uv1=UV[idx[:, 1]],
                                uv2=UV[idx[:, 2]])
                tri_meshes.append(bund)
                return
            for t_i in range(idx.shape[0]):
                a, b, c3 = idx[t_i]
                if has_light:
                    light_id = len(area_tris)
                    area_tris.append(dict(p0=Pw[a], p1=Pw[b], p2=Pw[c3],
                                          L=L_area, twosided=two))
                trid = dict(p0=Pw[a], p1=Pw[b], p2=Pw[c3], mat=mat_id,
                            light=light_id if has_light else -1,
                            med_in=st.medium_in, med_out=st.medium_out)
                if Nw is not None:
                    trid.update(n0=Nw[a], n1=Nw[b], n2=Nw[c3])
                if atlas_rects is not None and t_i < len(atlas_rects):
                    u0, v0, u1, v1 = atlas_rects[t_i]
                    # face-local barycentric corners -> atlas rect
                    trid.update(uv0=(u1, v0), uv1=(u0, v1), uv2=(u0, v0))
                elif UV is not None:
                    trid.update(uv0=UV[a], uv1=UV[b], uv2=UV[c3])
                tris.append(trid)
                light_id = -1
        elif stype == "disk":
            h = p.get_float("height", 0.0)
            c = xf_pts(np.asarray([0.0, 0.0, h]))
            nrm = xf_nrm(np.asarray([[0.0, 0.0, 1.0]]))[0]
            disks.append(dict(c=c, n=nrm, r=p.get_float("radius", 1.0),
                              ri=p.get_float("innerradius", 0.0),
                              mat=mat_id, light=-1,
                              med_in=st.medium_in, med_out=st.medium_out))
            if has_light:
                warn("disk area light not supported for NEE; use "
                     "trianglemesh emitters", d.loc)
        elif stype == "cylinder":
            r = p.get_float("radius", 1.0)
            zmin = p.get_float("zmin", -1.0)
            zmax = p.get_float("zmax", 1.0)
            if p.get_float("phimax", 360.0) < 359.9:
                warn("cylinder phimax < 360 unsupported; full cylinder",
                     d.loc)
            c0 = xf_pts(np.asarray([0.0, 0.0, zmin]))
            c1 = xf_pts(np.asarray([0.0, 0.0, zmax]))
            ax = c1 - c0
            h = float(np.linalg.norm(ax))
            rx = xf_pts(np.asarray([r, 0.0, zmin])) - c0
            cylinders.append(dict(
                c=c0, a=ax / max(h, 1e-12), r=float(np.linalg.norm(rx)),
                h=h, mat=mat_id, light=-1,
                med_in=st.medium_in, med_out=st.medium_out))
            if has_light:
                warn("cylinder area light not supported for NEE", d.loc)
        elif stype == "loopsubdiv":
            # util/loopsubdiv.cpp LoopSubdivide: refine at build time
            from ..utils.loopsubdiv import subdivide

            P = p.get_floats("P").reshape(-1, 3)
            idx = p.get_ints("indices").reshape(-1, 3)
            levels = p.get_int("levels", 3)
            Pl, Fl, Nl = subdivide(P, idx, levels=levels)
            Pw = xf_pts(Pl)
            Nw = xf_nrm(Nl)
            if not has_light:
                tri_meshes.append(dict(
                    p0=Pw[Fl[:, 0]], p1=Pw[Fl[:, 1]], p2=Pw[Fl[:, 2]],
                    n0=Nw[Fl[:, 0]], n1=Nw[Fl[:, 1]], n2=Nw[Fl[:, 2]],
                    mat=mat_id, med_in=st.medium_in,
                    med_out=st.medium_out))
                return
            for t_i in range(Fl.shape[0]):
                a, b2, c3 = Fl[t_i]
                if has_light:
                    light_id = len(area_tris)
                    area_tris.append(dict(p0=Pw[a], p1=Pw[b2], p2=Pw[c3],
                                          L=L_area, twosided=two))
                tris.append(dict(p0=Pw[a], p1=Pw[b2], p2=Pw[c3],
                                 n0=Nw[a], n1=Nw[b2], n2=Nw[c3],
                                 mat=mat_id,
                                 light=light_id if has_light else -1,
                                 med_in=st.medium_in,
                                 med_out=st.medium_out))
                light_id = -1
        elif stype == "curve":
            # cubic Bezier curves (shapes.h Curve:1219; pbrt "curve" shape:
            # P = 4 (or 4+3k chained) control points, width/width0/width1)
            P = p.get_floats("P").reshape(-1, 3)
            w = p.get_float("width", 1.0)
            w0 = p.get_float("width0", w)
            w1 = p.get_float("width1", w)
            ctype = p.get_string("type", "flat")
            if ctype not in ("flat", "cylinder", "ribbon"):
                warn(f"curve type '{ctype}' unknown; flat", d.loc)
            n_seg_curves = max((P.shape[0] - 1) // 3, 1)
            Pw = xf_pts(P)
            for ci in range(n_seg_curves):
                cp = Pw[3 * ci:3 * ci + 4]
                if cp.shape[0] < 4:
                    break
                u_lo = ci / n_seg_curves
                u_hi = (ci + 1) / n_seg_curves
                curves.append(dict(
                    cp=cp,
                    width0=w0 + (w1 - w0) * u_lo,
                    width1=w0 + (w1 - w0) * u_hi,
                    n_segs=8, mat=mat_id, light=-1,
                    med_in=st.medium_in, med_out=st.medium_out))
            if has_light:
                warn("curve area light not supported", d.loc)
        elif stype in ("bilinearmesh", "bilinear"):
            P = p.get_floats("P").reshape(-1, 3)
            bidx = p.get_ints("indices")
            if bidx is None:
                bidx = np.arange(P.shape[0])
            bidx = np.asarray(bidx).reshape(-1, 4)
            Pw = xf_pts(P)
            for q_i in range(bidx.shape[0]):
                a, b2, c3, dd = bidx[q_i]
                # pbrt vertex order: p00 p10 p01 p11
                patches.append(dict(
                    p00=Pw[a], p10=Pw[b2], p01=Pw[c3], p11=Pw[dd],
                    mat=mat_id, light=-1,
                    med_in=st.medium_in, med_out=st.medium_out))
            if has_light:
                warn("bilinear-patch area light not supported for NEE; "
                     "use trianglemesh emitters", d.loc)
        elif stype == "plymesh":
            from . import assets

            fname = p.get_string("filename")
            mesh = assets.get_ply(fname) if fname else None
            if mesh is None:
                warn(f"plymesh '{fname}' could not be loaded; skipped",
                     d.loc)
            else:
                P = mesh["P"]
                idx = mesh["indices"]
                Pw = xf_pts(P)
                Nw = xf_nrm(mesh["N"]) if "N" in mesh else None
                UVm = mesh.get("uv")
                if not has_light:
                    bund = dict(p0=Pw[idx[:, 0]], p1=Pw[idx[:, 1]],
                                p2=Pw[idx[:, 2]], mat=mat_id,
                                med_in=st.medium_in, med_out=st.medium_out)
                    if Nw is not None:
                        bund.update(n0=Nw[idx[:, 0]], n1=Nw[idx[:, 1]],
                                    n2=Nw[idx[:, 2]])
                    if UVm is not None:
                        bund.update(uv0=UVm[idx[:, 0]], uv1=UVm[idx[:, 1]],
                                    uv2=UVm[idx[:, 2]])
                    tri_meshes.append(bund)
                    return
                for t_i in range(idx.shape[0]):
                    a, b, c3 = idx[t_i]
                    if has_light:
                        light_id = len(area_tris)
                        area_tris.append(dict(p0=Pw[a], p1=Pw[b],
                                              p2=Pw[c3], L=L_area,
                                              twosided=two))
                    trid = dict(p0=Pw[a], p1=Pw[b], p2=Pw[c3], mat=mat_id,
                                light=light_id if has_light else -1,
                                med_in=st.medium_in,
                                med_out=st.medium_out)
                    if Nw is not None:
                        trid.update(n0=Nw[a], n1=Nw[b], n2=Nw[c3])
                    tris.append(trid)
                    light_id = -1
        else:
            warn(f"shape '{stype}' unsupported; skipped", d.loc)


    def xf_pts(pts):
        import jax.numpy as jnp

        return np.asarray(tr.apply_point(st.ctm, jnp.asarray(pts, np.float32)))

    def xf_nrm(ns):
        import jax.numpy as jnp

        n = np.asarray(tr.apply_normal(st.ctm, jnp.asarray(ns, np.float32)))
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(ln, 1e-20)

    for d in directives:
        name = d.name
        p = ParameterDictionary(d.params)

        def _apply_xf(op, replace=False):
            # ActiveTransform semantics (parser.h ActiveTransform; the
            # CTM is conceptually a keyframe PAIR — ops apply to the
            # active member(s); a pair splits lazily on first non-All op)
            if active_xf[0] != "all" and st.ctm_end is None:
                st.ctm_end = st.ctm
            if active_xf[0] in ("all", "start"):
                st.ctm = op if replace else st.ctm @ op
            if st.ctm_end is not None and active_xf[0] in ("all", "end"):
                st.ctm_end = op if replace else st.ctm_end @ op

        if name == "LookAt":
            a = d.args
            _apply_xf(tr.look_at(a[0:3], a[3:6], a[6:9]).inverse())
        elif name == "Translate":
            _apply_xf(tr.translate(*d.args))
        elif name == "Scale":
            _apply_xf(tr.scale(*d.args))
        elif name == "Rotate":
            _apply_xf(tr.rotate(d.args[0], d.args[1:4]))
        elif name == "ActiveTransform":
            a0 = (d.args[0] if d.args else "All").lower()
            active_xf[0] = {"starttime": "start", "endtime": "end",
                            "all": "all"}.get(a0, "all")
        elif name == "TransformTimes":
            transform_times[0] = float(d.args[0])
            transform_times[1] = float(d.args[1])
        elif name in ("Transform", "ConcatTransform"):
            m = np.asarray(d.args, np.float32).reshape(4, 4).T  # column-major
            t = tr.from_matrix(m)
            _apply_xf(t, replace=(name == "Transform"))
        elif name == "Identity":
            _apply_xf(tr.identity(), replace=True)

        elif name == "Camera":
            camera_directive = (d.args[0], p)
            cam_to_world = st.ctm.inverse()
        elif name == "Film":
            film_params = p
            film_type[0] = d.args[0] if d.args else "rgb"
        elif name == "Sampler":
            sampler = d.args[0]
            spp = p.get_int("pixelsamples", 16)
        elif name == "Integrator":
            integrator = d.args[0]
            integrator_params = {k: v for k, v in d.params.items()}
        elif name in ("Filter", "PixelFilter"):
            filter_directive = (d.args[0] if d.args else "box", p)
        elif name == "Accelerator":
            # "bvh" (default) or "kdtree" (cpu/aggregates.h:76); the
            # aggregate type flows into Geometry.build below
            accelerator = d.args[0] if d.args else "bvh"
            if accelerator not in ("bvh", "kdtree"):
                warn(f"unknown accelerator '{accelerator}', using bvh",
                     d.loc)
                accelerator = "bvh"
        elif name == "ColorSpace":
            pass  # sRGB built-in

        elif name == "WorldBegin":
            world = True
            st = _GState()
        elif name == "AttributeBegin" or name == "TransformBegin":
            stack.append(st.copy())
        elif name == "AttributeEnd" or name == "TransformEnd":
            st = stack.pop()
        elif name == "ReverseOrientation":
            st.reverse = not st.reverse

        elif name == "Material":
            mtype = d.args[0] if d.args else ""
            if mtype in ("", "none", "interface"):
                st.material = -1  # medium interface / no BSDF
            else:
                mats.append(_make_material(mtype, p, warn, d.loc,
                                           named_textures, named_mats,
                                           measured_bank))
                st.material = len(mats) - 1
                tref = mats[-1].get("albedo_tex", -1)
                if tref in ptex_rects_by_tex:
                    face_atlas_rects[st.material] = ptex_rects_by_tex[tref]
        elif name == "MakeNamedMaterial":
            ptype = p.get_string("type", "diffuse")
            mats.append(_make_material(ptype, p, warn, d.loc, named_textures,
                                       named_mats, measured_bank))
            named_mats[d.args[0]] = len(mats) - 1
            tref = mats[-1].get("albedo_tex", -1)
            if tref in ptex_rects_by_tex:
                face_atlas_rects[len(mats) - 1] = ptex_rects_by_tex[tref]
        elif name == "NamedMaterial":
            st.material = named_mats.get(d.args[0], 0)

        elif name == "AreaLightSource":
            st.area_light = (d.args[0], p)

        elif name == "LightSource":
            ltype = d.args[0]
            scale = p.get_float("scale", 1.0)
            if ltype == "point":
                I = p.get_rgb("I", np.asarray([1.0, 1, 1])) * scale
                frm = p.get_point3("from", np.zeros(3))
                point_lights.append((xf_pts(frm), I))
            elif ltype == "spot":
                I = p.get_rgb("I", np.asarray([1.0, 1, 1])) * scale
                frm = p.get_point3("from", np.zeros(3))
                to = p.get_point3("to", np.asarray([0, 0, 1.0]))
                cone = p.get_float("coneangle", 30.0)
                delta = p.get_float("conedeltaangle", 5.0)
                dirv = xf_pts(to) - xf_pts(frm)
                spot_lights.append(dict(
                    p=xf_pts(frm), I=I, dir=dirv,
                    cos_total=float(np.cos(np.radians(cone))),
                    cos_start=float(np.cos(np.radians(cone - delta)))))
            elif ltype == "goniometric":
                I = p.get_rgb("I", np.asarray([1.0, 1, 1])) * scale
                fname = p.get_string("filename")
                try:
                    from .assets import get_image

                    img = get_image(fname)
                except Exception as ex:  # noqa: BLE001
                    warn(f"goniometric image '{fname}' failed ({ex}); "
                         "uniform", d.loc)
                    img = np.ones((2, 2, 3), np.float32)
                rot = np.asarray(st.ctm.m_inv, np.float32)[:3, :3]
                gonio_lights.append(dict(p=xf_pts(np.zeros(3)), I=I, img=img,
                                         rot=rot))
            elif ltype == "projection":
                I = p.get_rgb("I", np.asarray([1.0, 1, 1])) * scale
                fname = p.get_string("filename")
                try:
                    from .assets import get_image

                    img = get_image(fname)
                except Exception as ex:  # noqa: BLE001
                    warn(f"projection image '{fname}' failed ({ex}); "
                         "uniform", d.loc)
                    img = np.ones((2, 2, 3), np.float32)
                rot = np.asarray(st.ctm.m_inv, np.float32)[:3, :3]
                proj_lights.append(dict(p=xf_pts(np.zeros(3)), I=I, img=img,
                                        fov_deg=p.get_float("fov", 90.0),
                                        rot=rot))
            elif ltype == "distant":
                L = p.get_rgb("L", np.asarray([1.0, 1, 1])) * scale
                frm = p.get_point3("from", np.zeros(3))
                to = p.get_point3("to", np.asarray([0, 0, 1.0]))
                dirv = xf_pts(to) - xf_pts(frm)
                distant_lights.append((dirv, L))
            elif ltype == "infinite":
                fname = p.get_string("filename")
                if fname is not None:
                    from .assets import get_image

                    img = get_image(fname) * scale
                    if img.shape[0] != img.shape[1]:
                        from ..utils.envmap import latlong_to_equal_area

                        img = latlong_to_equal_area(img)
                    env_img = img
                else:
                    L = p.get_rgb("L", None)
                    if L is None:
                        L = p.get_rgb("radiance", np.asarray([1.0, 1, 1]))
                    env_L = L * scale
                prt = p.get_floats("portal")
                if prt is not None and len(prt) == 12:
                    portal_corners[0] = xf_pts(
                        np.asarray(prt, np.float32).reshape(4, 3))
            else:
                warn(f"light '{ltype}' unsupported; ignored", d.loc)

        elif name == "MakeNamedMedium":
            mname = d.args[0]
            mtype = p.get_string("type", "homogeneous")
            if mtype == "homogeneous":
                homog_media.append(dict(
                    sigma_a=p.get_rgb("sigma_a", np.asarray([1.0, 1, 1]))
                    * p.get_float("scale", 1.0),
                    sigma_s=p.get_rgb("sigma_s", np.asarray([1.0, 1, 1]))
                    * p.get_float("scale", 1.0),
                    Le=p.get_rgb("Le", np.zeros(3)),
                    g=p.get_float("g", 0.0),
                ))
                named_media[mname] = ("homog", len(homog_media) - 1)
            elif mtype in ("uniformgrid", "grid", "nanovdb"):
                gridfile = p.get_string("gridfile",
                                        p.get_string("filename", ""))
                if gridfile.endswith(".nvdb") or mtype == "nanovdb":
                    # raw NanoVDB (media.h:657 NanoVDBMedium; tools/nvdb.py)
                    from .assets import get_volume

                    dens, p0, p1 = get_volume(gridfile)
                    if p0 is None:
                        p0, p1 = np.zeros(3), np.ones(3)
                    dens = dens + p.get_float("densityoffset", 0.0)
                elif gridfile:
                    # npz from tools/nanovdb2grid (density+bmin+bmax)
                    z = np.load(gridfile)
                    dens = np.asarray(z["density"], np.float32)
                    p0 = np.asarray(z.get("bmin", np.zeros(3)), np.float32)
                    p1 = np.asarray(z.get("bmax", np.ones(3)), np.float32)
                else:
                    dens = p.get_floats("density")
                    nx = p.get_int("nx", 1)
                    ny = p.get_int("ny", 1)
                    nz = p.get_int("nz", 1)
                    p0 = p.get_point3("p0", np.zeros(3))
                    p1 = p.get_point3("p1", np.ones(3))
                    dens = dens.reshape(nz, ny, nx).transpose(2, 1, 0)  # pbrt order
                b0 = xf_pts(p0)
                b1 = xf_pts(p1)
                grid_media.append(GridMedium.make(
                    dens,
                    p.get_rgb("sigma_a", np.asarray([1.0, 1, 1])) * p.get_float("scale", 1.0),
                    p.get_rgb("sigma_s", np.asarray([1.0, 1, 1])) * p.get_float("scale", 1.0),
                    np.minimum(b0, b1), np.maximum(b0, b1),
                    g=p.get_float("g", 0.0),
                    maj_res=64 if gridfile else 16,  # media.cpp:252 vs :574
                    majorant_scale=p.get_float("majorantscale", 1.0),
                ))
                named_media[mname] = ("grid", len(grid_media) - 1)
            elif mtype == "rgbgrid":
                # per-voxel RGB coefficient grids (media.h RGBGridMedium:392)
                from ..models.media import RGBGridMedium

                nx = p.get_int("nx", 1)
                ny = p.get_int("ny", 1)
                nz = p.get_int("nz", 1)
                scale = p.get_float("scale", 1.0)

                def rgb_grid(key):
                    vals = p.get_floats(key)
                    if vals is None or vals.size == 0:
                        return np.zeros((nx, ny, nz, 3), np.float32)
                    return (vals.reshape(nz, ny, nx, 3)
                            .transpose(2, 1, 0, 3) * scale)

                p0 = xf_pts(p.get_point3("p0", np.zeros(3)))
                p1 = xf_pts(p.get_point3("p1", np.ones(3)))
                le = p.get_floats("Le")
                grid_media.append(RGBGridMedium.make(
                    rgb_grid("sigma_a"), rgb_grid("sigma_s"),
                    np.minimum(p0, p1), np.maximum(p0, p1),
                    Le=(le.reshape(nz, ny, nx, 3).transpose(2, 1, 0, 3)
                        if le is not None and le.size else None),
                    Le_scale=p.get_float("Lescale", 1.0),
                    g=p.get_float("g", 0.0),
                    majorant_scale=p.get_float("majorantscale", 1.0)))
                named_media[mname] = ("grid", len(grid_media) - 1)
            elif mtype == "cloud":
                from ..models.media import CloudMedium

                b0 = xf_pts(p.get_point3("p0", np.zeros(3)))
                b1 = xf_pts(p.get_point3("p1", np.ones(3)))
                scale = p.get_float("scale", 1.0)
                proc_media.append(CloudMedium.make(
                    sigma_a=p.get_rgb("sigma_a", np.asarray([1.0, 1, 1])) * scale,
                    sigma_s=p.get_rgb("sigma_s", np.asarray([1.0, 1, 1])) * scale,
                    g=p.get_float("g", 0.0),
                    p0=np.minimum(b0, b1), p1=np.maximum(b0, b1),
                    density=p.get_float("density", 1.0),
                    wispiness=p.get_float("wispiness", 1.0),
                    frequency=p.get_float("frequency", 5.0)))
                named_media[mname] = ("proc", len(proc_media) - 1)
            elif mtype == "earth":
                from ..models.media import EarthMedium

                b0 = xf_pts(p.get_point3("p0", -2 * np.ones(3)))
                b1 = xf_pts(p.get_point3("p1", 2 * np.ones(3)))
                hm = None
                hm_file = p.get_string("heightmap", "")
                if hm_file:
                    try:
                        from .assets import get_image

                        im = get_image(hm_file)
                        hm = im.mean(-1) if im.ndim == 3 else im
                    except Exception as ex:  # noqa: BLE001
                        warn(f"earth heightmap '{hm_file}' failed ({ex}); "
                             "constant shell", d.loc)
                proc_media.append(EarthMedium.make(
                    sigma_a_atm=p.get_rgb("sigma_a_atmosphere", np.ones(3)),
                    sigma_s_atm=p.get_rgb("sigma_s_atmosphere", np.ones(3)),
                    sigma_a_cloud=p.get_rgb("sigma_a_cloud", np.zeros(3)),
                    sigma_s_cloud=p.get_rgb("sigma_s_cloud", np.zeros(3)),
                    g=p.get_float("g", 0.0),
                    p0=np.minimum(b0, b1), p1=np.maximum(b0, b1),
                    center=xf_pts(p.get_point3("center", np.zeros(3))),
                    inner_r_atm=p.get_float("innerradius_atmosphere", 1.0),
                    inner_r_cloud=p.get_float("innerradius_cloud", 1.0),
                    outer_r_atm=p.get_float("outerradius_atmosphere", 1.0),
                    outer_r_cloud=p.get_float("outerradius_cloud", 1.0),
                    decay=p.get_float("decay", 1.0),
                    majorant_scale=p.get_float("majorantscale", 1.0),
                    density_offset=p.get_float("densityoffset", 0.0),
                    rotation_y=p.get_float("rotationy", 0.0),
                    heightmap=hm,
                    scale_atm=p.get_float("scale_atmosphere", 1.0),
                    scale_cloud=p.get_float("scale_cloud", 1.0)))
                named_media[mname] = ("proc", len(proc_media) - 1)
            else:
                warn(f"medium '{mtype}' unsupported; ignored "
                     "(nanovdb: convert offline with tools/nanovdb2grid)", d.loc)
        elif name == "MediumInterface":
            inside = d.args[0] if len(d.args) > 0 else ""
            outside = d.args[1] if len(d.args) > 1 else ""

            def mid(nm):
                if not nm or nm not in named_media:
                    return -1
                kind, idx = named_media[nm]
                if kind == "homog":
                    return idx
                return (10_000 if kind == "grid" else 20_000) + idx  # remap later

            st.medium_in = mid(inside)
            st.medium_out = mid(outside)

        elif name == "ObjectBegin":
            # record the definition CTM; shapes inside are captured with
            # their own state snapshots (scene.h ObjectBegin/ObjectInstance)
            defining_object[0] = d.args[0]
            object_defs[d.args[0]] = {"ctm0": st.ctm, "items": []}
            stack.append(st.copy())
        elif name == "ObjectEnd":
            defining_object[0] = None
            st = stack.pop()
        elif name == "ObjectInstance":
            od = object_defs.get(d.args[0])
            if od is None:
                warn(f"unknown object '{d.args[0]}'", d.loc)
            else:
                inv0 = od["ctm0"].inverse()
                # triangle-mesh-only objects use the two-level TLAS/BLAS
                # path (geometry stored once in object space; instance =
                # transform record — cpu/primitive.h:83 TransformedPrimitive).
                # Other shape types (and emissive objects, which pbrt also
                # rejects inside instances) fall back to flattening.
                tri_types = ("trianglemesh", "plymesh", "loopsubdiv")
                instanceable = bool(od["items"]) and all(
                    ds.args[0] in tri_types and sn.area_light is None
                    for ds, _, sn in od["items"])
                if instanceable:
                    if "inst_idx" not in od:
                        # first use: extract the object-space triangles by
                        # running the shape handler with ctm = inv0 o snap
                        saved = len(tris)
                        saved_m = len(tri_meshes)
                        for d_shape, p_shape, snap in od["items"]:
                            obj_st = snap.copy()
                            obj_st.ctm = inv0 @ snap.ctm
                            handle_shape(d_shape, p_shape, obj_st)
                        obj_tris = tris[saved:]
                        del tris[saved:]
                        # meshes captured through the vectorized path:
                        # expand into the per-tri form Instances.build takes
                        for b in tri_meshes[saved_m:]:
                            T = np.asarray(b["p0"]).shape[0]
                            for i in range(T):
                                trid = dict(
                                    p0=b["p0"][i], p1=b["p1"][i],
                                    p2=b["p2"][i], mat=b["mat"],
                                    med_in=b["med_in"],
                                    med_out=b["med_out"])
                                if "n0" in b:
                                    trid.update(n0=b["n0"][i],
                                                n1=b["n1"][i],
                                                n2=b["n2"][i])
                                if "uv0" in b:
                                    trid.update(uv0=b["uv0"][i],
                                                uv1=b["uv1"][i],
                                                uv2=b["uv2"][i])
                                obj_tris.append(trid)
                        del tri_meshes[saved_m:]
                        od["inst_idx"] = len(inst_objects)
                        inst_objects.append(obj_tris)
                    inst_list.append(dict(
                        obj=od["inst_idx"],
                        o2w=np.asarray(st.ctm.m, np.float64),
                        o2w_end=(np.asarray(st.ctm_end.m, np.float64)
                                 if st.ctm_end is not None else None)))
                else:
                    for d_shape, p_shape, snap in od["items"]:
                        inst = snap.copy()
                        # instance-to-world = CTM_at_instance o
                        # inverse(def CTM) o CTM_at_shape
                        inst.ctm = st.ctm @ inv0 @ snap.ctm
                        handle_shape(d_shape, p_shape, inst)
        elif name == "Shape":
            if defining_object[0] is not None:
                object_defs[defining_object[0]]["items"].append(
                    (d, p, st.copy()))
            elif (st.ctm_end is not None
                  and d.args[0] in ("trianglemesh", "plymesh", "loopsubdiv")
                  and st.area_light is None):
                # animated CTM -> implicit animated instance
                # (AnimatedPrimitive, cpu/primitive.h:103): capture the
                # shape in OBJECT space, instance carries both keyframes
                saved = len(tris)
                saved_m = len(tri_meshes)
                obj_st = st.copy()
                obj_st.ctm = tr.identity()
                obj_st.ctm_end = None
                handle_shape(d, p, obj_st)
                obj_tris = tris[saved:]
                del tris[saved:]
                for b in tri_meshes[saved_m:]:
                    T = np.asarray(b["p0"]).shape[0]
                    for i in range(T):
                        trid = dict(p0=b["p0"][i], p1=b["p1"][i],
                                    p2=b["p2"][i], mat=b["mat"],
                                    med_in=b["med_in"],
                                    med_out=b["med_out"])
                        if "n0" in b:
                            trid.update(n0=b["n0"][i], n1=b["n1"][i],
                                        n2=b["n2"][i])
                        if "uv0" in b:
                            trid.update(uv0=b["uv0"][i], uv1=b["uv1"][i],
                                        uv2=b["uv2"][i])
                        obj_tris.append(trid)
                del tri_meshes[saved_m:]
                if obj_tris:
                    inst_list.append(dict(
                        obj=len(inst_objects),
                        o2w=np.asarray(st.ctm.m, np.float64),
                        o2w_end=np.asarray(st.ctm_end.m, np.float64)))
                    inst_objects.append(obj_tris)
            else:
                if st.ctm_end is not None:
                    warn("animated transform on a non-instanceable shape "
                         "ignored (start keyframe used)", d.loc)
                handle_shape(d, p, st)
        elif name == "Texture":
            # Texture "name" "spectrum|float" "type" params
            tname, _ttype, tclass = d.args[0], d.args[1], d.args[2]
            row = None
            if tclass == "constant":
                row = dict(kind=CONSTANT, c0=tuple(p.get_rgb("value", np.ones(3))))
            elif tclass == "checkerboard" or tclass == "checker":
                row = dict(kind=CHECKER,
                           c0=tuple(p.get_rgb("tex1", np.ones(3))),
                           c1=tuple(p.get_rgb("tex2", np.zeros(3))),
                           uvscale=(p.get_float("uscale", 1.0),
                                    p.get_float("vscale", 1.0)))
            elif tclass == "imagemap":
                fname = p.get_string("filename")
                try:
                    from .assets import get_image

                    img = get_image(fname)
                    tex_images.append(img)
                    row = dict(kind=IMAGE, image_id=len(tex_images) - 1,
                               uvscale=(p.get_float("uscale", 1.0),
                                        p.get_float("vscale", 1.0)))
                except Exception as ex:  # noqa: BLE001
                    warn(f"imagemap '{fname}' failed to load ({ex}); "
                         "using constant", d.loc)
                    row = dict(kind=CONSTANT, c0=(0.5, 0.5, 0.5))
            elif tclass == "scale":
                inner_name = p.get_string("tex", "")
                row = dict(kind=SCALE,
                           c0=tuple(p.get_rgb("scale", np.ones(3))),
                           inner=named_textures.get(inner_name, -1))
            elif tclass == "mix":
                amt = p.get_float("amount", 0.5)
                row = dict(kind=TEX_MIX, c0=(amt, amt, amt),
                           inner=named_textures.get(
                               p.get_string("tex1", ""), -1),
                           inner2=named_textures.get(
                               p.get_string("tex2", ""), -1))
            elif tclass in ("fbm", "wrinkled", "windy", "marble"):
                kindmap = {"fbm": FBM_TEX, "wrinkled": WRINKLED,
                           "windy": WINDY, "marble": MARBLE}
                row = dict(kind=kindmap[tclass],
                           octaves=p.get_int("octaves", 8),
                           omega=p.get_float("roughness", 0.5),
                           scale=p.get_float("scale", 1.0),
                           variation=p.get_float("variation", 0.2))
            elif tclass == "dots":
                row = dict(kind=DOTS,
                           c0=tuple(p.get_rgb("outside", np.ones(3))),
                           c1=tuple(p.get_rgb("inside", np.zeros(3))),
                           uvscale=(p.get_float("uscale", 1.0),
                                    p.get_float("vscale", 1.0)))
            elif tclass == "bilerp":
                from ..models.textures import BILERP

                row = dict(kind=BILERP,
                           c0=tuple(p.get_rgb("v00", np.zeros(3))),
                           c1=tuple(p.get_rgb("v01", np.zeros(3))),
                           c2=tuple(p.get_rgb("v10", np.ones(3))),
                           c3=tuple(p.get_rgb("v11", np.ones(3))),
                           uvscale=(p.get_float("uscale", 1.0),
                                    p.get_float("vscale", 1.0)))
            elif tclass == "uv":
                row = dict(kind=UV_TEX)
            elif tclass == "ptex":
                # PtexTexture analog: faces baked into an atlas; the mesh
                # bound to the material gets per-face atlas uv rects
                # (models/textures.build_face_atlas)
                fname = p.get_string("filename")
                try:
                    from ..models.textures import (build_face_atlas,
                                                   load_face_textures)

                    atlas_img, rects = build_face_atlas(
                        load_face_textures(fname))
                    tex_images.append(atlas_img)
                    row = dict(kind=IMAGE, image_id=len(tex_images) - 1,
                               uvscale=(1.0, 1.0))
                    ptex_rects_by_tex[len(textures)] = rects
                except Exception as ex:  # noqa: BLE001
                    warn(f"ptex '{fname}' failed to load ({ex}); "
                         "using constant", d.loc)
                    row = dict(kind=CONSTANT, c0=(0.5, 0.5, 0.5))
            else:
                warn(f"texture type '{tclass}' unsupported; constant grey",
                     d.loc)
                row = dict(kind=CONSTANT, c0=(0.5, 0.5, 0.5))
            textures.append(row)
            named_textures[tname] = len(textures) - 1
        elif name == "CoordinateSystem":
            named_coord_systems[d.args[0]] = st.ctm
        elif name == "CoordSysTransform":
            if d.args[0] in named_coord_systems:
                st.ctm = named_coord_systems[d.args[0]]
            else:
                warn(f"unknown coordinate system '{d.args[0]}'", d.loc)
        elif name == "WorldEnd":
            pass
        else:
            warn(f"unknown directive '{name}' ignored", d.loc)

    # remap medium ids: homogeneous block | grids | procedurals
    n_h = len(homog_media)
    n_g = len(grid_media)

    def remap(mid):
        if mid >= 20_000:
            return n_h + n_g + (mid - 20_000)
        if mid >= 10_000:
            return n_h + (mid - 10_000)
        return mid

    for lst in (tris, spheres, boxes, disks, *inst_objects):
        for it in lst:
            it["med_in"] = remap(it["med_in"])
            it["med_out"] = remap(it["med_out"])
    for b in tri_meshes:
        b["med_in"] = remap(b["med_in"])
        b["med_out"] = remap(b["med_out"])

    geometry = Geometry.build(triangles=tris, spheres=spheres, boxes=boxes,
                              disks=disks, cylinders=cylinders,
                              patches=patches, curves=curves,
                              tri_meshes=tri_meshes,
                              accelerator=accelerator,
                              instanced=(dict(objects=inst_objects,
                                              instances=inst_list)
                                         if inst_list else None))
    materials = Materials.build(
        mats, measured_tables=(np.stack(measured_bank)
                               if measured_bank else None))
    tex_bank = Textures.build(textures, tex_images) if textures else None
    media = Media.make(homogeneous=homog_media or None, grids=tuple(grid_media),
                       procedurals=tuple(proc_media))
    # world radius from geometry extent
    pts = []
    for lst, keys in ((tris, ("p0", "p1", "p2")), (spheres, ("c",))):
        for it in lst:
            for k in keys:
                pts.append(np.asarray(it[k], np.float32))
    for it in inst_list:
        pts.append(np.asarray(it["o2w"], np.float32)[:3, 3])
    for b in tri_meshes:
        if np.asarray(b["p0"]).shape[0]:
            for k in ("p0", "p1", "p2"):
                pts.append(np.abs(np.asarray(b[k], np.float32)).max(0))
    world_r = 2.0 * float(np.abs(np.asarray(pts)).max()) if pts else 100.0
    lsampler = "uniform"
    if "lightsampler" in integrator_params:
        lsampler = str(integrator_params["lightsampler"][1][0])
    lights = Lights.make(
        point_p=[pl[0] for pl in point_lights] or None,
        point_I=[pl[1] for pl in point_lights] or None,
        distant_dir=[dl[0] for dl in distant_lights] or None,
        distant_L=[dl[1] for dl in distant_lights] or None,
        area_tris=area_tris or None,
        env_L=env_L, env_img=env_img, world_radius=max(world_r, 10.0),
        sampler=lsampler, spots=spot_lights or None,
        gonios=gonio_lights or None, projections=proj_lights or None,
    )
    if portal_corners[0] is not None and (env_L is not None
                                          or env_img is not None):
        from ..models.portal_light import PortalLight
        from ..utils.vecmath import equal_area_sphere_to_square

        if env_img is not None:
            import jax.numpy as jnp

            S = env_img.shape[0]
            eimg = np.asarray(env_img, np.float32)

            def env_fn(dirs):
                sq = np.asarray(equal_area_sphere_to_square(
                    jnp.asarray(dirs, jnp.float32)))
                ix = np.clip((sq[:, 0] * S).astype(int), 0, S - 1)
                iy = np.clip((sq[:, 1] * S).astype(int), 0, S - 1)
                return eimg[iy, ix]
        else:
            const = np.asarray(env_L, np.float32)

            def env_fn(dirs):
                return np.broadcast_to(const, (len(dirs), 3))

        lights = lights.replace(portal=PortalLight.make(
            env_fn, portal_corners[0], res=128))
    scene = volpath.Scene(geometry, materials, media, lights, tex_bank)

    # film + camera
    nx = res_override[0] if res_override else (
        film_params.get_int("xresolution", 1280) if film_params else 1280)
    ny = res_override[1] if res_override else (
        film_params.get_int("yresolution", 720) if film_params else 720)
    outfile = (film_params.get_string("filename", "out.exr")
               if film_params else "out.exr")
    from ..models.filters import Filter

    if filter_directive is not None:
        fname, fp = filter_directive
        fname = {"triangle": "triangle", "gaussian": "gaussian",
                 "mitchell": "mitchell", "box": "box"}.get(fname, "box")
        film_filter = Filter.make(fname, radius=fp.get_float("xradius", None),
                                  sigma=fp.get_float("sigma", 0.5))
    else:
        film_filter = Filter.make("box")
    if film_type[0] == "spectral":
        # per-wavelength-bucket film (film.h SpectralFilm:498; channel
        # naming film.cpp:1186); forces the N=4 spectral render mode
        from ..models.film import SpectralFilm

        film = SpectralFilm.make(
            (nx, ny), filter=film_filter,
            n_buckets=film_params.get_int("nbuckets", 16),
            lambda_min=film_params.get_float("lambdamin", 360.0),
            lambda_max=film_params.get_float("lambdamax", 830.0))
    else:
        if film_type[0] not in ("rgb", "gbuffer"):
            warnings.warn(f"film '{film_type[0]}' unsupported; using rgb")
        film = RGBFilm.make((nx, ny), filter=film_filter)
    ctype, cp = camera_directive if camera_directive else ("perspective", None)
    if ctype == "perspective":
        fov = cp.get_float("fov", 90.0) if cp else 90.0
        # shutter interval normalized into TransformTimes space: ray
        # time 0 = transform start keyframe, 1 = end (cameras.h:131-149)
        tt0, tt1 = transform_times
        tspan = max(tt1 - tt0, 1e-9)
        sh_o = ((cp.get_float("shutteropen", 0.0) - tt0) / tspan
                if cp else 0.0)
        sh_c = ((cp.get_float("shutterclose", 0.0) - tt0) / tspan
                if cp else 0.0)
        camera = PerspectiveCamera.make(
            cam_to_world, fov, (nx, ny),
            lens_radius=cp.get_float("lensradius", 0.0) if cp else 0.0,
            focal_distance=cp.get_float("focaldistance", 1e6) if cp else 1e6,
            shutter_open=min(sh_o, sh_c), shutter_close=max(sh_o, sh_c))
    elif ctype == "orthographic":
        camera = OrthographicCamera.make(cam_to_world, (nx, ny))
    elif ctype == "spherical":
        camera = SphericalCamera(cam_to_world, (nx, ny))
    elif ctype == "realistic":
        from ..models.cameras import RealisticCamera

        lensfile = cp.get_string("lensfile") if cp else None
        ap = cp.get_float("aperturediameter", 1.0) / 1000.0 if cp else 1e-3
        focus = cp.get_float("focusdistance", 10.0) if cp else 10.0
        if lensfile:
            rows = []
            with open(lensfile) as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if line:
                        vals = [float(v) for v in line.split()]
                        # .dat files are in mm
                        rows.append([vals[0] / 1000, vals[1] / 1000,
                                     vals[2], vals[3] / 1000])
            camera = RealisticCamera.make(cam_to_world, rows, (nx, ny),
                                          aperture_diameter=ap)
        else:
            camera = RealisticCamera.simple_lens(
                cam_to_world, (nx, ny), aperture_diameter=ap,
                focus_distance=focus)
    else:
        warnings.warn(f"camera '{ctype}' unsupported; using perspective")
        camera = PerspectiveCamera.make(cam_to_world, 90.0, (nx, ny))

    # camera medium: inside any grid/homog container? conservatively vacuum
    return RenderSetup(scene, camera, film, integrator, integrator_params,
                       sampler, spp_override or spp, -1, outfile)


def _make_material(mtype, p: ParameterDictionary, warn, loc,
                   named_textures=None, named_mats=None, measured_bank=None):
    named_textures = named_textures or {}

    def tex_of(pname):
        if pname in p.params and p.params[pname][0] == "texture":
            return named_textures.get(str(p.params[pname][1][0]), -1)
        return -1

    if mtype == "diffuse":
        t = tex_of("reflectance")
        if t >= 0:
            return dict(type=DIFFUSE, albedo=(1.0, 1.0, 1.0), albedo_tex=t)
        return dict(type=DIFFUSE,
                    albedo=tuple(p.get_rgb("reflectance", np.asarray([0.5] * 3))))
    if mtype == "conductor":
        refl = p.get_rgb("reflectance", None)
        if refl is None:
            refl = np.asarray([0.9, 0.7, 0.4])  # generic metal F0
        return dict(type=CONDUCTOR, albedo=tuple(refl),
                    roughness=p.get_float("roughness", 0.0))
    if mtype == "dielectric":
        return dict(type=DIELECTRIC, eta=p.get_float("eta", 1.5),
                    roughness=p.get_float("roughness", 0.0))
    if mtype == "thindielectric":
        return dict(type=THIN_DIELECTRIC, eta=p.get_float("eta", 1.5))
    if mtype == "diffusetransmission":
        return dict(type=DIFFUSE_TRANS,
                    albedo=tuple(p.get_rgb("reflectance", np.asarray([0.25] * 3))),
                    albedo2=tuple(p.get_rgb("transmittance", np.asarray([0.25] * 3))))
    if mtype in ("coateddiffuse", "plastic"):
        t = tex_of("reflectance")
        return dict(type=COATED_DIFFUSE,
                    albedo=tuple(p.get_rgb("reflectance", np.asarray([0.5] * 3))),
                    roughness=p.get_float("roughness", 0.0),
                    eta=p.get_float("interface.eta", p.get_float("eta", 1.5)),
                    albedo_tex=t)
    if mtype == "coatedconductor":
        refl = p.get_rgb("conductor.reflectance", None)
        if refl is None:
            refl = np.asarray([0.9, 0.7, 0.4])
        return dict(type=COATED_CONDUCTOR, albedo=tuple(refl),
                    roughness=p.get_float("conductor.roughness", 0.01),
                    roughness2=p.get_float("interface.roughness",
                                           p.get_float("roughness", 0.0)),
                    eta=p.get_float("interface.eta", 1.5))
    if mtype == "cooktorrance":
        # fork addition (materials.h:555, CookTorranceMaterial::Create at
        # materials.cpp:303): reflectance default 0.5, eta default 1.5,
        # roughness default 0 (clamped to 0.001 in the bxdf)
        from ..models.materials import COOK_TORRANCE

        t = tex_of("reflectance")
        rough = p.get_float("roughness", 0.0)
        rough = max(p.get_float("uroughness", rough),
                    p.get_float("vroughness", rough))
        return dict(type=COOK_TORRANCE,
                    albedo=tuple(p.get_rgb("reflectance",
                                           np.asarray([0.5] * 3))),
                    roughness=rough, eta=p.get_float("eta", 1.5),
                    albedo_tex=t)
    if mtype == "subsurface":
        # materials.h SubsurfaceMaterial -> SUBSURFACE rows: mfp from
        # sigma_a/sigma_s if given (d ~ 1/sigma_t'), else mfp directly
        from ..models.materials import SUBSURFACE

        sig_s = p.get_rgb("sigma_s", None)
        sig_a2 = p.get_rgb("sigma_a", None)
        g_ = p.get_float("g", 0.0)
        scale_ = p.get_float("scale", 1.0)
        if sig_s is not None and sig_a2 is not None:
            sig_sp = np.asarray(sig_s) * (1.0 - g_) * scale_
            sig_t = sig_sp + np.asarray(sig_a2) * scale_
            A = sig_sp / np.maximum(sig_t, 1e-6)
            d_mfp = 1.0 / np.maximum(sig_t, 1e-6)
        else:
            A = np.asarray(p.get_rgb("reflectance", np.asarray([0.5] * 3)))
            d_mfp = np.asarray(p.get_rgb("mfp", np.asarray([1.0] * 3)))
        return dict(type=SUBSURFACE, albedo=tuple(A), albedo2=tuple(d_mfp),
                    eta=p.get_float("eta", 1.33))
    if mtype == "hair":
        # bxdfs.h HairBxDF parameters (materials.h HairMaterial): sigma_a
        # directly, or from reflectance, else brown-ish eumelanin default
        from ..models.materials import HAIR, hair_sigma_a_from_reflectance

        beta_m = p.get_float("beta_m", 0.3)
        beta_n = p.get_float("beta_n", 0.3)
        sig = p.get_rgb("sigma_a", None)
        if sig is None:
            refl = p.get_rgb("reflectance", p.get_rgb("color", None))
            if refl is not None:
                sig = hair_sigma_a_from_reflectance(refl, beta_n)
            else:
                ce = p.get_float("eumelanin", 1.3)
                cp2 = p.get_float("pheomelanin", 0.0)
                sig = (ce * np.asarray([0.419, 0.697, 1.37])
                       + cp2 * np.asarray([0.187, 0.4, 1.05]))
        return dict(type=HAIR, albedo2=tuple(np.asarray(sig, np.float64)),
                    eta=p.get_float("eta", 1.55),
                    roughness=beta_m, roughness2=beta_n,
                    mix_amount=float(np.radians(p.get_float("alpha", 2.0))))
    if mtype == "mix":
        names = [str(s) for s in p.params.get(
            "materials", ("string", []))[1]]
        if len(names) == 2 and named_mats is not None:
            # amount = probability of the SECOND material
            # (materials.h MixMaterial::ChooseMaterial)
            return dict(type=MIX,
                        mix_m1=named_mats.get(names[1], 0),
                        mix_m2=named_mats.get(names[0], 0),
                        mix_amount=p.get_float("amount", 0.5))
        warn("mix material needs two named materials; using diffuse", loc)
        return dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))
    if mtype == "measured":
        # materials.h Measured:909 — tabulated BRDF from "string filename"
        # (MERL .binary layout; materials.cpp MeasuredMaterial)
        fn = p.get_string("filename", None)
        if fn is None or measured_bank is None:
            warn('measured material needs "string filename"; using diffuse',
                 loc)
            return dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))
        from ..models.materials import MEASURED, load_merl_brdf

        try:
            tbl = load_merl_brdf(str(fn))
        except Exception as e:
            warn(f"measured BRDF '{fn}' failed to load ({e}); using diffuse",
                 loc)
            return dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))
        measured_bank.append(tbl)
        return dict(type=MEASURED, meas_id=len(measured_bank) - 1)
    warn(f"material '{mtype}' unsupported; using diffuse", loc)
    return dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))
