"""Benchmark: BASELINE config 1 — homogeneous HG fog box, 256x256 @ 64 spp.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is camera paths traced per second on one chip (Mpaths/sec/chip).

vs_baseline compares against an estimated 64-thread CPU pbrt-v4 volpath
throughput on the same scene (~5 Mpaths/s; the reference repo publishes no
numbers — BASELINE.md — so this is the driver's north-star denominator).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
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

    # warmup/compile
    img = volpath.render(scene, camera, film, spp=1, cfg=cfg, seed=0)
    img.block_until_ready()

    t0 = time.perf_counter()
    img = volpath.render(scene, camera, film, spp=spp, cfg=cfg, seed=1)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    n_paths = res * res * spp
    mpaths_per_sec = n_paths / dt / 1e6
    print(json.dumps({
        "metric": "volpath_fogbox_256x256x64spp",
        "value": round(mpaths_per_sec, 3),
        "unit": "Mpaths/sec/chip",
        "vs_baseline": round(mpaths_per_sec / CPU_PBRT_BASELINE_MPATHS, 3),
    }))


if __name__ == "__main__":
    main()
