"""Round-4 probe: where does the VSPG kernel's per-sample cost go on the
pyro64 equal-time scene?

Measures (all 128^2, warm best-of-2, single launch):
  A. volpath megakernel throughput (the equal-time competitor)
  B. VSPG kernel, full bench config (RIS + variance + guided RR)
  C. VSPG kernel, guide_secondary off (no per-walk-start field VSP query)
  D. VSPG kernel, volume_guiding off (no vMF scatter block use; field
     query still runs -> isolates vMF math vs field fetch)
  E. VSPG kernel, guide_primary+secondary off (pure delta walks inside
     the vspg kernel body -> isolates the resampling/prepass cost)
Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

import jax
import numpy as np

os.makedirs("/root/.jax_bench_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from vspg_pbrt_v4_tpu.models.film import RGBFilm  # noqa: E402
from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp  # noqa: E402
from vspg_pbrt_v4_tpu.models.integrators import volpath, vspg  # noqa: E402

res, spp = 128, 64
scene = bench._pyro_cloud_scene()
camera = bench._camera(res)
film = RGBFilm.make((res, res))
cfg = volpath.VolPathConfig(max_depth=64, max_events=256,
                            max_collisions=4096)


def timed(fn, n=2):
    jax.device_get(fn(0)[0, 0])
    best = np.inf
    for s in range(1, n + 1):
        t0 = time.perf_counter()
        jax.device_get(fn(s)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, dt):
    mp = res * res * spp / dt / 1e6
    print(json.dumps({"probe": name, "dt_s": round(dt, 3),
                      "mpaths": round(mp, 3)}), flush=True)
    return mp


# A: volpath kernel
dt = timed(lambda s: volpath.render_persistent(
    scene, camera, film, spp=spp, cfg=cfg, seed=s, lanes_per_pixel=1))
report("A_volpath", dt)

# train once (shared field/isgb for all VSPG variants)
gopt = gvp.GuidingOptions(mode="ris", field_res=8, record_depth=6,
                          min_train_weight=16.0)
vopt = vspg.VSPGOptions(vsp_criterion="variance")
t0 = time.perf_counter()
_, field, isgb = vspg.render_vspg(
    scene, camera, film, spp=32, cfg=cfg, gopt=gopt, vopt=vopt, seed=0,
    spp_per_pass=4, use_pallas=False)
jax.device_get(field.volume.weights[0, 0])
print(json.dumps({"probe": "train_8x4_xla", "dt_s": round(
    time.perf_counter() - t0, 1)}), flush=True)


def vspg_run(vo, name):
    def go(s):
        img, _, _ = vspg.render_vspg(
            scene, camera, film, spp=spp, cfg=cfg, gopt=gopt, vopt=vo,
            seed=s + 100, spp_per_pass=spp, field=field, isgb=isgb,
            train=False)
        return img
    report(name, timed(go))


vspg_run(vopt, "B_vspg_full")
vspg_run(vopt._replace(guide_secondary_vsp=False), "C_no_secondary_vsp")

gopt_nv = gopt._replace(volume_guiding=False)


def vspg_run_g(go_, vo, name):
    def go(s):
        img, _, _ = vspg.render_vspg(
            scene, camera, film, spp=spp, cfg=cfg, gopt=go_, vopt=vo,
            seed=s + 100, spp_per_pass=spp, field=field, isgb=isgb,
            train=False)
        return img
    report(name, timed(go))


vspg_run_g(gopt_nv, vopt, "D_no_volume_guiding")
vspg_run_g(gopt_nv, vopt._replace(guide_vsp=False, guide_rr=False),
           "E_no_guiding_at_all")
print("done", flush=True)
