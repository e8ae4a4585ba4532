"""Microbenchmark: per-lane table-gather strategies inside a Pallas TPU
kernel.

The grid/field megakernels (ops/pallas_volpath.py, ops/pallas_vspg.py) are
bound by per-lane random table lookups (PERF.md "the 64^3 wall"): Mosaic's
only vector gather is jnp.take_along_axis on a (S,128) operand with lane
indices < 128, so a lookup from a (C,128)-word VMEM table costs a fori_loop
"chunk sweep" over up to C chunks. This measures that sweep against an
MXU-based alternative with NO lane reshapes/transposes (both crash Mosaic):

  matmul_sub: per sublane s (static unroll), build onehot OH (C,128) via a
  sublane-iota == c_idx[s] broadcast compare, G = T_t (128,C) @ OH (C,128)
  on the MXU so column l of G is lane l's table row, then pick the row
  element with a second (128,128) onehot multiply + sublane reduction.
  Cost is 8*128*C*128 MACs per event per 1024-lane block, independent of
  index spread — no chunk loop, no dynamic window, no per-chunk
  take_along_axis (measured ~215 cycles/chunk, the real sweep cost).

Timing is slope-based: t(E_hi) - t(E_lo) over the event-count difference,
cancelling the ~tens-of-ms relay launch floor.

Run:  python benchmarks/gather_microbench.py [variants...] [C...]
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
E_LO, E_HI = 512, 8192


def _mix(x):
    # cheap integer hash to derandomize indices between events
    x = (x ^ (x >> 4)) * jnp.int32(277803737)
    return x ^ (x >> 11)


def _kernel(table_ref, tt_ref, seed_ref, out_ref, *, variant, C, events):
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

    iota_c_col = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    iota_s_col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def lookup_matmul_sub(c_idx, l_idx):
        cols = []
        for s in range(SUB):
            c_s = c_idx[s:s + 1, :]  # (1,128)
            oh = (iota_c_col == c_s).astype(jnp.bfloat16)  # (C,128)
            # G[j,l] = table[c_idx[s,l], j]
            g = jnp.dot(tt_ref[:], oh,
                        preferred_element_type=jnp.float32)  # (128,128)
            ohl = (iota_s_col == l_idx[s:s + 1, :]).astype(jnp.float32)
            cols.append(jnp.sum(g * ohl, axis=0, keepdims=True))  # (1,128)
        return jnp.concatenate(cols, axis=0)  # (SUB,128)

    def step(i, carry):
        idx, acc = carry
        word = idx & (C * 128 - 1)
        c_idx = (word >> 7) & (C - 1)
        l_idx = word & 127
        if variant == "sweep":
            v = lookup_sweep(c_idx, l_idx)
        else:
            v = lookup_matmul_sub(c_idx, l_idx)
        # next index depends on the gathered value: no hoisting
        idx = _mix(idx + v.astype(jnp.int32) + i)
        return idx, acc + v

    _, acc = jax.lax.fori_loop(0, events, step,
                               (idx0, jnp.zeros((SUB, 128), jnp.float32)))
    out_ref[:] = acc


def make_fn(variant, C, events, interpret=False):
    kern = functools.partial(_kernel, variant=variant, C=C, events=events)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((SUB, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _tables(C):
    t = np.abs(np.random.default_rng(0).normal(
        size=(C, 128))).astype(np.float32)
    t = t.astype(jnp.bfloat16).astype(np.float32)  # bf16-exact values
    return t, np.ascontiguousarray(t.T).astype(jnp.bfloat16)


def run(variant, C, reps=5):
    table, tt = _tables(C)

    def timed(events):
        jfn = jax.jit(make_fn(variant, C, events))
        out = jax.device_get(jfn(table, tt, np.asarray([1], np.int32)))
        assert np.isfinite(out).all()
        best = np.inf
        for r in range(reps):
            t0 = time.perf_counter()
            jax.device_get(jfn(table, tt, np.asarray([r + 2], np.int32))[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    slope = (timed(E_HI) - timed(E_LO)) / (E_HI - E_LO)
    us = slope * 1e6
    rate = SUB * 128 / max(slope, 1e-12) / 1e6
    print(f"{variant:12s} C={C:5d} ({C*128:7d} f32)  "
          f"{us:9.2f} us/event/block  {rate:9.2f} Mlookups/s", flush=True)


if __name__ == "__main__":
    variants = [v for v in sys.argv[1:] if not v.isdigit()] or [
        "sweep", "matmul_sub"]
    sizes = [int(s) for s in sys.argv[1:] if s.isdigit()] or [32, 256, 2048]
    for v in variants:
        for C in sizes:
            try:
                run(v, C)
            except Exception as e:
                print(f"{v:12s} C={C:5d}  FAILED: {str(e)[:200]}",
                      flush=True)
