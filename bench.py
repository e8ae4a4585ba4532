"""Benchmark: BASELINE config 1 — homogeneous HG fog box, 256x256 @ 64 spp.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: camera paths per second on one chip (Mpaths/sec/chip).

Timing notes for this environment: the axon remote backend's
block_until_ready does NOT synchronize; only a host fetch (device_get)
does. We time warm runs with device_get and report the best of 3 (the
remote relay adds large run-to-run queueing noise).

vs_baseline: estimated 64-thread CPU pbrt-v4 volpath throughput on this
scene (~5 Mpaths/s; the reference repo publishes no numbers, BASELINE.md).
"""

import json
import time

import jax
import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.utils import transform as tr

CPU_PBRT_BASELINE_MPATHS = 5.0


def main():
    res = 256
    spp = 64
    scene = volpath.make_fog_box_scene(
        [0.05, 0.05, 0.05], [0.5, 0.6, 0.7], g=0.3,
        env_L=[0.1, 0.12, 0.15], point=((0.0, 0.8, 0.0), (5.0, 5.0, 5.0)),
    )
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res)
    )
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=32, max_events=128)

    def run(seed, spp_):
        # persistent wavefront: dead lanes reseed immediately (~2.8x the
        # wave-drain driver at equal sample count)
        img = volpath.render_persistent(scene, camera, film, spp=spp_,
                                        cfg=cfg, seed=seed,
                                        lanes_per_pixel=1)
        return jax.device_get(img)  # true sync on axon

    run(0, 8)  # compile + warm
    best = np.inf
    for i in range(3):
        t0 = time.perf_counter()
        img = run(i + 1, spp)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    assert np.isfinite(img).all()

    n_paths = res * res * spp
    mpaths = n_paths / best / 1e6
    print(json.dumps({
        "metric": "volpath_fogbox_256x256x64spp",
        "value": round(mpaths, 3),
        "unit": "Mpaths/sec/chip",
        "vs_baseline": round(mpaths / CPU_PBRT_BASELINE_MPATHS, 3),
    }))


if __name__ == "__main__":
    main()
