"""vspg_pbrt_v4_tpu — a TPU-native (JAX/XLA/Pallas) physically based renderer.

A from-scratch re-design of pbrt-v4 + "Volume Scattering Probability Guiding"
(SIGGRAPH Asia 2024; reference C++ implementation kehanxuuu/vspg-pbrt-v4) for
TPU hardware. The recursive CPU integrators of the reference become wavefront
SoA path-state arrays stepped under `jax.lax` control flow; free-flight
sampling, BVH traversal and majorant-DDA are branchless vectorized kernels;
multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` over a ray axis.

Layout
  utils/     math, vecmath, transforms, spectra, RNG, sampling warps, image IO
  ops/       compute kernels: intersection, BVH, DDA, tracking, compaction
  models/    scene objects (cameras, film, lights, materials, media, shapes)
             and integrators (path, volpath, guided*) + the guiding field
  parallel/  device-mesh sharding of the render loop
"""

__version__ = "0.1.0"
