"""Command-line renderer (analog of ``src/pbrt/cmd/pbrt.cpp``).

    python -m vspg_pbrt_v4_tpu scene.pbrt [options]

Mirrors the reference CLI surface (cmd/pbrt.cpp:99-230) where applicable:
--spp, --seed, --outfile, --quiet, --stats, --mse-reference-image (per-wave
MSE CSV), --time render budget, --volMajScale, --disable-pixel-jitter is
implicit in samplers. Integrator selection and its parameters come from the
scene file (`Integrator "volpath"|"guidedpath"|"guidedvolpath"|
"guidedvolpathvspg" ...`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vspg_pbrt_v4_tpu",
                                 description="TPU-native pbrt+VSPG renderer")
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--spp", type=int, default=None, help="samples per pixel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outfile", default=None)
    ap.add_argument("--resolution", default=None, help="WxH override")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--spp-per-pass", type=int, default=4)
    ap.add_argument("--time", type=float, default=None,
                    help="render time budget in seconds (wave loop stops)")
    ap.add_argument("--mse-reference-image", default=None)
    ap.add_argument("--maxdepth", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--display-server", default=None,
                    help="tev host[:port] for live image streaming")
    ap.add_argument("--write-partial-images", action="store_true")
    ap.add_argument("--checkpoint", default=None,
                    help="npz path: save per-wave; resume if it exists")
    ap.add_argument("--store-guiding-cache", default=None)
    ap.add_argument("--load-guiding-cache", default=None,
                    help="pre-trained field npz (disables training)")
    ap.add_argument("--guiding-gbuffer", action="store_true",
                    help="write the guiding-cache-id falsecolor EXR next "
                         "to the image (GuidedGBufferFilm, film.h:413)")
    ap.add_argument("--pixelstats", action="store_true",
                    help="write per-pixel stats heatmaps next to the image")
    ap.add_argument("--log-level", default="warning",
                    choices=["verbose", "warning", "error", "fatal"],
                    help="diagnostic level (util/log.h --log-level)")
    ap.add_argument("--log-file", default=None,
                    help="mirror log lines to a file")
    ap.add_argument("--volMajScale", type=float, default=None,
                    help="global volume majorant scale override "
                         "(options.h:58 volumeMajorantScale)")
    ap.add_argument("--interactive", action="store_true",
                    help="interactive terminal rendering: wasdqe/arrow "
                         "camera motion, progressive accumulation "
                         "(cmd/pbrt.cpp:59, util/gui.h:27)")
    ap.add_argument("--max-waves", type=int, default=None,
                    help="stop --interactive after N waves (scripted use)")
    ap.add_argument("--debugstart", default=None, metavar="X,Y,S",
                    help="deterministically replay one pixel sample and "
                         "print its radiance (cpu/integrators.cpp:77-95)")
    ap.add_argument("--pixelmaterial", default=None, metavar="X,Y",
                    help="trace the center camera ray of pixel (x,y) and "
                         "print every intersection's position, normal, "
                         "material and media (cpu/render.cpp:110-161)")
    args = ap.parse_args(argv)

    from .utils import log

    log.set_level(args.log_level)
    if args.log_file:
        log.set_file(args.log_file)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .models.integrators import guided_volpath as gvp
    from .models.integrators import volpath, vspg
    from .scene import build_render_setup, parse_pbrt_file
    from .utils.image import mse as mse_np
    from .utils.image import read_image, write_exr, write_png

    t0 = time.perf_counter()
    res_override = None
    if args.resolution:
        w, h = args.resolution.lower().split("x")
        res_override = (int(w), int(h))
    from .scene.parser import PbrtError

    try:
        directives = parse_pbrt_file(args.scene)
        setup = build_render_setup(directives, spp_override=args.spp,
                                   res_override=res_override)
    except PbrtError as e:
        # util/error.h ErrorExit: '<file>:<line>: error' diagnostic, no
        # traceback
        print(f"error: {e}", file=sys.stderr)
        return 1
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if not args.quiet:
        g = setup.scene.geometry
        print(f"[scene] {g.n_tri} tris, {g.n_sph} spheres, "
              f"{setup.scene.lights.n_lights} lights, integrator "
              f"{setup.integrator}, {setup.spp} spp", file=sys.stderr)

    if args.volMajScale is not None:
        # global majorant override (cmd/pbrt.cpp:208 --volMajScale):
        # scales every grid medium's majorant table and every procedural
        # medium's majorant_scale — sampling pdfs adapt, estimators stay
        # unbiased (a majorant is any upper bound)
        s = float(args.volMajScale)
        media = setup.scene.media
        grids = tuple(gm.replace(majorant=gm.majorant * s)
                      for gm in media.grids)
        procs = tuple(
            pm.replace(majorant_scale=pm.majorant_scale * s)
            if hasattr(pm, "majorant_scale") else pm  # CloudMedium: exact
            for pm in media.procedurals)
        setup = setup._replace(scene=setup.scene._replace(
            media=media.replace(grids=grids, procedurals=procs)))

    if args.pixelstats:
        from .models.integrators import extras

        stats_img = extras.render_pixel_stats(
            setup.scene, setup.camera, setup.film, spp=min(setup.spp, 16),
            seed=args.seed, camera_medium=setup.camera_medium)
        base = (args.outfile or setup.outfile or "out.exr").rsplit(".", 1)[0]
        write_exr(base + "_stats.exr", np.asarray(stats_img),
                  ("depth", "alive", "lum"))
        if not args.quiet:
            print(f"[pixelstats] {base}_stats.exr", file=sys.stderr)

    if args.pixelmaterial:
        x, y = (int(v) for v in args.pixelmaterial.split(","))
        return _pixel_material_probe(setup, x, y)

    if args.debugstart:
        # single-sample replay: the stateless counter RNG makes any
        # (pixel, sample) pair exactly reproducible in isolation
        import jax.numpy as jnp

        x, y, s = (int(v) for v in args.debugstart.split(","))
        nx, _ = setup.film.resolution
        pid = jnp.asarray([y * nx + x], jnp.int32)
        st, _ = volpath.start_camera_paths(
            setup.camera, setup.film, jnp.uint32(args.seed),
            jnp.uint32(s), pid, setup.camera_medium)
        cfg = volpath.VolPathConfig(
            max_depth=args.maxdepth or 32)
        st = volpath.trace_paths(setup.scene, cfg, st)
        L = np.asarray(st.L)[0]
        print(f"[debugstart] pixel ({x},{y}) sample {s}: "
              f"L = ({L[0]:.6g}, {L[1]:.6g}, {L[2]:.6g})")
        return 0

    from .scene.parser import ParameterDictionary

    ip = ParameterDictionary(setup.integrator_params)
    max_depth = args.maxdepth or ip.get_int("maxdepth", 32)
    import numpy as _np

    from .models.materials import SUBSURFACE as _SSS

    has_sss = bool((_np.asarray(setup.scene.materials.mat_type) == _SSS).any())
    from .models.film import SpectralFilm as _SpectralFilm

    is_spectral_film = isinstance(setup.film, _SpectralFilm)
    _spec_state = [None]  # SpectralFilm state held for the bucket EXR
    cfg = volpath.VolPathConfig(max_depth=max_depth, sss=has_sss,
                                spectral=is_spectral_film)

    ref = read_image(args.mse_reference_image) if args.mse_reference_image else None
    mse_log = []

    name = setup.integrator
    spp_per_pass = max(1, min(args.spp_per_pass, setup.spp))

    out = args.outfile or setup.outfile

    if args.interactive:
        # util/gui.h:27 GUI + pbrt.cpp:127 interactive loop, terminal
        # edition: each wave renders spp_per_pass samples through the
        # fastest available backend (megakernel when the scene supports
        # it), the GUI accumulates and polls camera keys.
        from .utils import gui as _gui

        diag = 2.0 * float(setup.scene.lights.world_radius) \
            if float(setup.scene.lights.world_radius) < 1e4 else 4.0
        ui = _gui.GUI(out or args.scene, setup.film.resolution,
                      scene_diag=max(diag, 1e-3))

        def render_one_wave(cam, wave):
            return np.asarray(volpath.render_persistent(
                setup.scene, cam, setup.film, spp=spp_per_pass, cfg=cfg,
                seed=args.seed + wave * 7919,
                camera_medium=setup.camera_medium))

        try:
            img = _gui.interactive_loop(ui, setup.camera, render_one_wave,
                                        spp_per_pass=spp_per_pass,
                                        max_waves=args.max_waves)
        finally:
            ui.close()
        if out and img is not None:  # --max-waves 0 renders nothing
            from .utils.image import write_image

            write_image(out, np.asarray(img))
        return 0

    progressive = (args.time is not None or args.display_server
                   or args.write_partial_images or args.checkpoint)
    if progressive and name in ("volpath", "path", "simplevolpath"):
        from .utils.progress import ProgressReporter
        from .utils.display import TevClient

        tev = None
        if args.display_server:
            host, _, port = args.display_server.partition(":")
            tev = TevClient(host or "127.0.0.1", int(port) if port else 14158)
            ny, nx = setup.film.resolution[1], setup.film.resolution[0]
            tev.create_image(out, nx, ny)

        resume = None
        if args.checkpoint:
            import os as _os

            from .utils.checkpoint import load_render_state, save_render_state

            if _os.path.exists(args.checkpoint):
                st0, spp0, _ = load_render_state(args.checkpoint)
                resume = (st0, spp0)
                if not args.quiet:
                    print(f"[resume] {spp0} spp from {args.checkpoint}",
                          file=sys.stderr)

        ck_state = {}

        reporter = ProgressReporter(
            setup.spp if args.time is None else 0,
            quiet=args.quiet or args.time is not None)

        # CHECK context: a failure mid-render names the wave to replay
        # (CheckCallbackScope pattern, cpu/integrators.cpp:99-104)
        wave_state = {"wave": 0, "spp": 0}
        log.register_check_callback(
            lambda: f"rendering wave {wave_state['wave']} "
                    f"({wave_state['spp']} spp done) — replay with "
                    f"--debugstart x,y,s")

        def cb(wave, spp_done, image_fn, _state=None):
            wave_state["wave"], wave_state["spp"] = wave, spp_done
            log.verbose("wave %d done (%d spp)", wave, spp_done)
            reporter.count = 0
            reporter.update(spp_done)
            if tev is not None and tev.connected:
                tev.update_image(out, image_fn())
            if args.write_partial_images:
                write_exr(f"{out}.partial.exr", image_fn())
            if ref is not None:
                mse_log.append((spp_done, mse_np(image_fn(), ref)))
            ck_state["spp"] = spp_done

        img, spp_done, fstate = volpath.render_progressive(
            setup.scene, setup.camera, setup.film, cfg=cfg, seed=args.seed,
            camera_medium=setup.camera_medium, spp_per_pass=spp_per_pass,
            max_spp=setup.spp if args.time is None else 1 << 20,
            time_budget=args.time, sampler=setup.sampler, wave_callback=cb,
            resume_state=resume)
        if args.checkpoint:
            save_render_state(args.checkpoint, fstate, spp_done, args.seed)
        reporter.done()
        img = np.asarray(img)
        if not args.quiet:
            print(f"[budget] rendered {spp_done} spp", file=sys.stderr)
        setup = setup._replace(spp=spp_done)
    elif name == "ao":
        from .models.integrators import extras

        img = np.asarray(extras.render_ao(
            setup.scene, setup.camera, setup.film, spp=setup.spp,
            radius=ip.get_float("maxdistance", 1e6), seed=args.seed,
            spp_per_pass=spp_per_pass))
    elif name == "randomwalk":
        from .models.integrators import extras

        img = np.asarray(extras.render_randomwalk(
            setup.scene, setup.camera, setup.film, spp=setup.spp,
            seed=args.seed, spp_per_pass=spp_per_pass, cfg=cfg))
    elif name == "simplepath":
        from .models.integrators import extras

        img = np.asarray(extras.render_simplepath(
            setup.scene, setup.camera, setup.film, spp=setup.spp,
            seed=args.seed, spp_per_pass=spp_per_pass, cfg=cfg))
    elif name == "sppm":
        from .models.integrators import sppm

        img = np.asarray(sppm.render(
            setup.scene, setup.camera, setup.film, iterations=setup.spp,
            cfg=cfg, seed=args.seed,
            scfg=sppm.SPPMConfig(
                max_depth=ip.get_int("maxdepth", 5),
                initial_radius=ip.get_float("radius", 0.2),
                photons_per_iter=ip.get_int("photonsperiteration", 0))))
    elif name == "lightpath":
        from .models.integrators import lightpath

        img = np.asarray(lightpath.render(
            setup.scene, setup.camera, setup.film, spp=setup.spp, cfg=cfg,
            seed=args.seed, light_medium=setup.camera_medium,
            spp_per_pass=spp_per_pass))
    elif name == "bdpt":
        from .models.integrators import bdpt

        img = np.asarray(bdpt.render(
            setup.scene, setup.camera, setup.film, spp=setup.spp,
            max_depth=ip.get_int("maxdepth", 5), seed=args.seed))
    elif name == "mlt":
        from .models.integrators import mlt

        img = np.asarray(mlt.render(
            setup.scene, setup.camera, setup.film,
            mutations_per_pixel=ip.get_int("mutationsperpixel", 100),
            max_depth=ip.get_int("maxdepth", 5),
            n_chains=ip.get_int("chains", 1000),
            n_bootstrap=ip.get_int("bootstrapsamples", 16384),
            sigma=ip.get_float("sigma", 0.01),
            large_step_probability=ip.get_float("largestepprobability", 0.3),
            seed=args.seed))
    elif name == "simplevolpath":
        from .models.integrators import extras

        img = np.asarray(extras.render_simplevolpath(
            setup.scene, setup.camera, setup.film, spp=setup.spp,
            seed=args.seed, spp_per_pass=spp_per_pass, cfg=cfg,
            camera_medium=setup.camera_medium))
    elif name in ("volpath", "path"):
        if is_spectral_film:
            # SpectralFilm: drive passes into a held film state so the
            # per-bucket accumulators survive for the spectral EXR
            fstate = setup.film.init_state()
            for w in range(max(setup.spp // spp_per_pass, 1)):
                fstate, _ = volpath.render_pass(
                    setup.scene, setup.camera, setup.film, fstate, cfg,
                    np.uint32(args.seed), np.int32(w),
                    setup.camera_medium, spp_per_pass, setup.sampler,
                    setup.spp)
            _spec_state[0] = fstate
            img = np.asarray(setup.film.image(fstate))
        else:
            img = volpath.render(setup.scene, setup.camera, setup.film,
                                 spp=setup.spp, cfg=cfg, seed=args.seed,
                                 camera_medium=setup.camera_medium,
                                 spp_per_pass=spp_per_pass,
                                 sampler=setup.sampler)
            img = np.asarray(img)
    elif name in ("guidedpath", "guidedvolpath"):
        gopt = gvp.GuidingOptions(
            mode="ris" if ip.get_string("guidingtype", "ris") == "ris" else "mis",
            surface_guiding=ip.get_bool("surfaceguiding", True),
            volume_guiding=ip.get_bool("volumeguiding", True),
        )
        img, _ = gvp.render_guided(setup.scene, setup.camera, setup.film,
                                   spp=setup.spp, cfg=cfg, gopt=gopt,
                                   seed=args.seed,
                                   camera_medium=setup.camera_medium,
                                   spp_per_pass=spp_per_pass)
        img = np.asarray(img)
    elif name == "guidedvolpathvspg":
        gopt = gvp.GuidingOptions(
            mode="ris" if ip.get_string("guidingtype", "ris") == "ris" else "mis",
            surface_guiding=ip.get_bool("surfaceguiding", True),
            volume_guiding=ip.get_bool("volumeguiding", True),
        )
        vopt = vspg.VSPGOptions(
            guide_vsp=ip.get_bool("vspguiding", True),
            guide_primary_vsp=ip.get_bool("vspprimaryguiding", True),
            guide_secondary_vsp=ip.get_bool("vspsecondaryguiding", True),
            # reference scheme: "nds" + bool collisionProbabilityBias = NDS+
            # (guidedvolpathvspgintegrator.cpp:1293-1300)
            sampling_method=(
                "nds+"
                if (ip.get_string("vspsamplingmethod", "resampling").lower()
                    == "nds"
                    and ip.get_bool("collisionProbabilityBias", False))
                else ip.get_string("vspsamplingmethod", "resampling").lower()),
            vsp_mis_ratio=ip.get_float("vspmisratio", 0.5),
            vsp_criterion=ip.get_string("vspcriterion", "variance"),
            guide_rr=ip.get_bool("guidedrr", True),
            # OIDN-analog learned denoiser for the image-space guiding
            # buffer: "unet" trains per scene (guiding/denoiser.py)
            denoiser=ip.get_string("isgbdenoiser", "atrous"),
        )
        field0, train = None, True
        if args.load_guiding_cache:
            from .models.guiding.field import load_field

            field0, train = load_field(args.load_guiding_cache), False
        img, field, _ = vspg.render_vspg(setup.scene, setup.camera, setup.film,
                                         spp=setup.spp, cfg=cfg, gopt=gopt,
                                         vopt=vopt, seed=args.seed,
                                         camera_medium=setup.camera_medium,
                                         spp_per_pass=spp_per_pass,
                                         field=field0, train=train)
        if args.store_guiding_cache:
            from .models.guiding.field import save_field

            save_field(field, args.store_guiding_cache)
        if args.guiding_gbuffer:
            from .models.integrators import extras as _ex

            gb_rgb, _gb_id = _ex.render_guiding_gbuffer(
                setup.scene, setup.camera, setup.film, field)
            base = (args.outfile or setup.outfile or "out.exr").rsplit(".", 1)[0]
            write_exr(base + "_guiding_ids.exr", np.asarray(gb_rgb))
            if not args.quiet:
                print(f"[guiding-gbuffer] {base}_guiding_ids.exr",
                      file=sys.stderr)
        img = np.asarray(img)
    else:
        print(f"integrator '{name}' not supported; falling back to volpath",
              file=sys.stderr)
        img = np.asarray(volpath.render(setup.scene, setup.camera, setup.film,
                                        spp=setup.spp, cfg=cfg, seed=args.seed,
                                        spp_per_pass=spp_per_pass))

    dt = time.perf_counter() - t0
    if out.endswith(".png"):
        write_png(out, img)
    else:
        write_exr(out, img)
    if is_spectral_film and _spec_state[0] is not None:
        # per-bucket spectral EXR next to the image (film.cpp:1174-1249
        # WriteImage: RGB channels + "%.3fnm" bucket channels)
        sp = np.asarray(setup.film.spectral_image(_spec_state[0]))
        base = out.rsplit(".", 1)[0]
        write_exr(base + "_spectrum.exr", sp,
                  setup.film.spectral_channel_names())
        if not args.quiet:
            print(f"[spectral] {base}_spectrum.exr "
                  f"({setup.film.n_buckets} buckets)", file=sys.stderr)
    if ref is not None:
        mse_log.append((setup.spp, mse_np(img, ref)))
        for s, m in mse_log:
            print(f"MSE,{s},{m:.6g}")
    if not args.quiet:
        npaths = img.shape[0] * img.shape[1] * setup.spp
        print(f"[done] {out}  {dt:.1f}s  {npaths/dt/1e6:.2f} Mpaths/s",
              file=sys.stderr)
    if args.stats:
        print(json.dumps({"seconds": dt, "spp": setup.spp,
                          "resolution": list(img.shape[:2])}), file=sys.stderr)
    return 0


def _pixel_material_probe(setup, x, y, max_depth=16):
    """`--pixelmaterial x,y` (cpu/render.cpp:110-161): trace the center
    camera ray of one pixel and print each intersection's world-space
    position, normals, camera distance, material family + parameters and
    interface media. Interface hits (mat_id == -1, pure medium
    boundaries) are reported and skipped through, like the reference's
    'Ignoring interface material' warning."""
    import jax.numpy as jnp

    from .models import materials as M
    from .ops.intersect import offset_ray_origin

    _FAM = {M.DIFFUSE: "diffuse", M.CONDUCTOR: "conductor",
            M.DIELECTRIC: "dielectric", M.DIFFUSE_TRANS: "diffusetransmission",
            M.THIN_DIELECTRIC: "thindielectric",
            M.COATED_DIFFUSE: "coateddiffuse",
            M.COATED_CONDUCTOR: "coatedconductor", M.MIX: "mix",
            M.HAIR: "hair", M.SUBSURFACE: "subsurface",
            M.MEASURED: "measured", M.COOK_TORRANCE: "cooktorrance"}

    nx, ny = setup.film.resolution
    if not (0 <= x < nx and 0 <= y < ny):
        print(f"error: pixel ({x},{y}) outside film {nx}x{ny}",
              file=sys.stderr)
        return 1
    p_raster = jnp.asarray([[x + 0.5, y + 0.5]], jnp.float32)
    rays = setup.camera.generate_rays(p_raster, jnp.asarray([[0.5, 0.5]]))
    o, d = rays[0], rays[1]
    cam_o = np.asarray(o)[0]
    mats = setup.scene.materials
    depth = 1
    any_hit = False
    for _ in range(max_depth):
        h = setup.scene.geometry.intersect(o, d, jnp.full(o.shape[:-1],
                                                          jnp.inf))
        if not bool(np.asarray(h.hit)[0]):
            if not any_hit:
                print("error: no geometry visible at specified pixel.",
                      file=sys.stderr)
                return 1
            break
        any_hit = True
        p = np.asarray(h.p)[0]
        n = np.asarray(h.n)[0]
        ns = np.asarray(h.ns)[0]
        mid = int(np.asarray(h.mat_id)[0])
        mi, mo = int(np.asarray(h.med_in)[0]), int(np.asarray(h.med_out)[0])
        if mid < 0:
            print(f"(interface hit at t={float(np.asarray(h.t)[0]):.6g}, "
                  f"media in/out = {mi}/{mo} — skipping)")
        else:
            dist = float(np.linalg.norm(p - cam_o))
            print(f"Intersection depth {depth}")
            print(f"World-space p: [ {p[0]:.6g}, {p[1]:.6g}, {p[2]:.6g} ]")
            print(f"World-space n: [ {n[0]:.6g}, {n[1]:.6g}, {n[2]:.6g} ]")
            print(f"World-space ns: [ {ns[0]:.6g}, {ns[1]:.6g}, "
                  f"{ns[2]:.6g} ]")
            print(f"Distance from camera: {dist:.6g}")
            fam = _FAM.get(int(np.asarray(mats.mat_type)[mid]),
                           f"type{int(np.asarray(mats.mat_type)[mid])}")
            alb = np.asarray(mats.albedo)[mid]
            print(f"Material[{mid}]: {fam} albedo=({alb[0]:.4g}, "
                  f"{alb[1]:.4g}, {alb[2]:.4g}) "
                  f"eta={float(np.asarray(mats.eta)[mid]):.4g} "
                  f"roughness={float(np.asarray(mats.roughness)[mid]):.4g}")
            if mi >= 0 or mo >= 0:
                print(f"MediumInterface: inside={mi} outside={mo}")
            print()
            depth += 1
        # continue straight through (SpawnRay(ray.d), render.cpp:157);
        # offset_ray_origin signs the epsilon toward d itself
        o = offset_ray_origin(h.p, h.n, d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
