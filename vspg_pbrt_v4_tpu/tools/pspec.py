"""pspec — sampler Fourier power-spectrum analysis (cmd/pspec.cpp analog).

    python -m vspg_pbrt_v4_tpu.tools.pspec --sampler paddedsobol --spp 256 \
        --outfile spec.exr

Averages |FFT|^2 of many independent 2D point sets drawn from a sampler's
first dimension pair; blue-noise-like samplers show the characteristic
low-energy ring around DC.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def power_spectrum(kind, spp, res=128, n_sets=64, seed=0):
    import jax.numpy as jnp

    from ..models.samplers import LaneSampler

    acc = np.zeros((res, res))
    for s in range(n_sets):
        pid = jnp.full((spp,), s, jnp.uint32)
        smp = LaneSampler.start(seed, pid, jnp.arange(spp, dtype=jnp.uint32),
                                kind=kind, spp=spp)
        _, u2 = smp.get_2d()
        pts = np.asarray(u2)
        grid = np.zeros((res, res))
        xi = np.minimum((pts[:, 0] * res).astype(int), res - 1)
        yi = np.minimum((pts[:, 1] * res).astype(int), res - 1)
        np.add.at(grid, (yi, xi), 1.0)
        f = np.fft.fftshift(np.fft.fft2(grid / spp))
        acc += np.abs(f) ** 2
    acc /= n_sets
    acc[res // 2, res // 2] = 0  # remove DC for display
    return acc


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pspec")
    ap.add_argument("--sampler", default="independent")
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--nsets", type=int, default=64)
    ap.add_argument("--outfile", required=True)
    args = ap.parse_args(argv)
    spec = power_spectrum(args.sampler, args.spp, args.resolution, args.nsets)
    from ..utils.image import write_exr, write_png

    img = np.repeat(spec[..., None], 3, -1).astype(np.float32)
    if args.outfile.endswith(".png"):
        write_png(args.outfile, img / max(img.max(), 1e-8))
    else:
        write_exr(args.outfile, img)
    print(f"wrote {args.outfile}; mean power {spec.mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
