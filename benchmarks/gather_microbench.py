"""Microbenchmark: per-lane table-gather strategies inside a Pallas TPU
kernel.

The grid/field megakernels (ops/pallas_volpath.py, ops/pallas_vspg.py) are
bound by per-lane random table lookups (PERF.md "the 64^3 wall"): Mosaic's
only vector gather is jnp.take_along_axis on a (S,128) operand with lane
indices < 128, so a lookup from a (C,128)-word VMEM table costs a fori_loop
"chunk sweep" over up to C chunks. This measures that sweep against an
MXU-based alternative:

  one-hot matmul gather:  rows = onehot(c_idx) (L,C) @ table (C,128) on the
  MXU, then pick the column either with a second one-hot reduction or with
  the supported per-row take_along_axis. Cost is C*L*128 MACs regardless of
  index spread — no chunk loop, no dynamic window.

Run:  python benchmarks/gather_microbench.py [sweep|matmul|matmul_ta] [C...]
Prints one line per (variant, C): microseconds per lookup event per block
of 1024 lanes, and the implied lookup rate.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # sublanes per block: lanes = SUB*128 = 1024
EVENTS = 64  # dependent lookup events per lane per kernel


def _mix(x):
    # cheap integer hash to derandomize indices between events
    x = (x ^ (x >> 4)) * jnp.int32(277803737)
    return x ^ (x >> 11)


def _kernel(table_ref, seed_ref, out_ref, *, variant, C):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    idx0 = _mix(lanes * 131 + subl * 7919 + seed_ref[0])

    def lookup_sweep(c_idx, l_idx):
        zf = jnp.zeros((SUB, 128), jnp.float32)

        def body(cc, acc):
            row = table_ref[cc]
            chunk = jnp.broadcast_to(row[None, :], (SUB, 128))
            g = jnp.take_along_axis(chunk, l_idx, axis=1)
            return jnp.where(c_idx == cc, g, acc)

        lo = jnp.min(c_idx)
        hi = jnp.max(c_idx)
        return jax.lax.fori_loop(lo, hi + 1, body, zf)

    def lookup_matmul(c_idx, l_idx, use_ta):
        cflat = c_idx.reshape(SUB * 128, 1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        oh = (cflat == iota_c).astype(jnp.bfloat16)  # (L, C)
        rows = jnp.dot(oh, table_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # (L, 128)
        lflat = l_idx.reshape(SUB * 128, 1)
        if use_ta:
            v = jnp.take_along_axis(rows, lflat, axis=1)  # (L, 1)
        else:
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            ohl = (lflat == iota_l).astype(jnp.float32)
            v = jnp.sum(rows * ohl, axis=1, keepdims=True)
        return v.reshape(SUB, 128)

    def step(i, carry):
        idx, acc = carry
        word = idx & (C * 128 - 1)
        c_idx = (word >> 7) & (C - 1)
        l_idx = word & 127
        if variant == "sweep":
            v = lookup_sweep(c_idx, l_idx)
        elif variant == "matmul":
            v = lookup_matmul(c_idx, l_idx, use_ta=False)
        else:
            v = lookup_matmul(c_idx, l_idx, use_ta=True)
        # next index depends on the gathered value: no hoisting
        idx = _mix(idx + v.astype(jnp.int32) + i)
        return idx, acc + v

    _, acc = jax.lax.fori_loop(0, EVENTS, step, (idx0,
                                                 jnp.zeros((SUB, 128),
                                                           jnp.float32)))
    out_ref[:] = acc


def run(variant, C, reps=3):
    table = np.abs(np.random.default_rng(0).normal(
        size=(C, 128))).astype(np.float32)
    kern = functools.partial(_kernel, variant=variant, C=C)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((SUB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)
    t = np.asarray(table)
    out = jax.device_get(jfn(t, np.asarray([1], np.int32)))  # compile+warm
    assert np.isfinite(out).all()
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(t, np.asarray([r + 2], np.int32))[0, 0])
        best = min(best, time.perf_counter() - t0)
    us_per_event = best / EVENTS * 1e6
    rate = SUB * 128 * EVENTS / best / 1e6
    print(f"{variant:10s} C={C:5d} ({C*128:7d} f32)  "
          f"{us_per_event:9.2f} us/event/block  "
          f"{rate:9.2f} Mlookups/s", flush=True)


if __name__ == "__main__":
    variants = [v for v in sys.argv[1:] if not v.isdigit()] or [
        "sweep", "matmul", "matmul_ta"]
    sizes = [int(s) for s in sys.argv[1:] if s.isdigit()] or [32, 256, 2048]
    for v in variants:
        for C in sizes:
            try:
                run(v, C)
            except Exception as e:
                print(f"{v:10s} C={C:5d}  FAILED: {str(e)[:160]}",
                      flush=True)
