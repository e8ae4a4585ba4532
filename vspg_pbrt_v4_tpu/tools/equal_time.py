"""Equal-time / equal-sample integrator comparison harness.

The paper's evaluation protocol (SURVEY.md §6; vspg-rendering-scripts):
render a high-spp reference with the baseline integrator, then give every
competitor the same wall-clock (or sample) budget and report relMSE.

    python -m vspg_pbrt_v4_tpu.tools.equal_time scene.pbrt \
        --integrators volpath guidedvolpath guidedvolpathvspg \
        --budget 30 --ref-spp 1024

Outputs one JSON line per competitor: {integrator, spp, seconds, relmse,
mse} — ready for plotting or regression tracking.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def render_with(setup, integrator, spp, cfg, seed, time_budget=None):
    """Render `setup`'s scene with an explicit integrator override."""
    import numpy as np

    from ..models.integrators import guided_volpath as gvp
    from ..models.integrators import volpath, vspg

    t0 = time.perf_counter()
    if integrator in ("volpath", "path", "simplevolpath"):
        if time_budget is not None:
            img, spp_done, _ = volpath.render_progressive(
                setup.scene, setup.camera, setup.film, cfg=cfg, seed=seed,
                camera_medium=setup.camera_medium, spp_per_pass=4,
                max_spp=1 << 20, time_budget=time_budget)
        else:
            img = volpath.render(setup.scene, setup.camera, setup.film,
                                 spp=spp, cfg=cfg, seed=seed,
                                 camera_medium=setup.camera_medium,
                                 spp_per_pass=min(4, spp))
            spp_done = spp
    elif integrator in ("guidedpath", "guidedvolpath"):
        img, _ = gvp.render_guided(setup.scene, setup.camera, setup.film,
                                   spp=spp, cfg=cfg, seed=seed,
                                   camera_medium=setup.camera_medium,
                                   spp_per_pass=min(4, spp))
        spp_done = spp
    elif integrator == "guidedvolpathvspg":
        img, _, _ = vspg.render_vspg(setup.scene, setup.camera, setup.film,
                                     spp=spp, cfg=cfg, seed=seed,
                                     camera_medium=setup.camera_medium,
                                     spp_per_pass=min(4, spp))
        spp_done = spp
    else:
        raise SystemExit(f"unsupported integrator '{integrator}'")
    img = np.asarray(img)
    return img, spp_done, time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="equal_time")
    ap.add_argument("scene")
    ap.add_argument("--integrators", nargs="+",
                    default=["volpath", "guidedvolpathvspg"])
    ap.add_argument("--budget", type=float, default=None,
                    help="seconds per competitor (equal-time mode)")
    ap.add_argument("--spp", type=int, default=64,
                    help="competitor spp (equal-sample mode)")
    ap.add_argument("--ref-spp", type=int, default=512)
    ap.add_argument("--maxdepth", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resolution", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from ..models.integrators import volpath
    from ..scene import build_render_setup, parse_pbrt_file
    from ..models.film import relmse as relmse_fn

    res = None
    if args.resolution:
        w, h = args.resolution.lower().split("x")
        res = (int(w), int(h))
    setup = build_render_setup(parse_pbrt_file(args.scene),
                               res_override=res)
    cfg = volpath.VolPathConfig(max_depth=args.maxdepth)

    ref, _, t_ref = render_with(setup, "volpath", args.ref_spp, cfg,
                                seed=args.seed + 777)
    print(f"# reference: volpath {args.ref_spp}spp in {t_ref:.1f}s",
          file=sys.stderr)
    for integ in args.integrators:
        img, spp_done, secs = render_with(
            setup, integ, args.spp, cfg, seed=args.seed,
            time_budget=args.budget)
        rel = float(relmse_fn(img, ref))
        mse = float(np.mean((img - ref) ** 2))
        print(json.dumps({"integrator": integ, "spp": int(spp_done),
                          "seconds": round(secs, 3),
                          "relmse": rel, "mse": mse}))


if __name__ == "__main__":
    main()
