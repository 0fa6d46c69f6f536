"""Probe: per-plane unpack+dot pipelining vs the monolithic schedule.

The decode kernel's bound is the sign materialization: 8 byte-planes are
unpacked (VPU stores) into s_ref, THEN one dot reads them (MXU).  With
the dot split into 8 per-plane partial dots on two alternating scratch
slabs, Mosaic can overlap plane p's MXU read with plane p+1's VPU
stores.  Byte-plane p holds rows [4nw*p, 4nw*(p+1)) of S — contiguous
sublane slabs — so z = sum_p y[:, rows_p] . S_p exactly.

Measures, at the 7B qkv decode tile (K=4096, TN=512, M=16):
  mono  — current schedule (unpack all planes, one dot)
  plane — 8 per-plane dots, single slab (serialized WAR hazard)
  plane2 — 8 per-plane dots, two alternating slabs (pipelined)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.utils.benchmark import bench_op  # noqa

M, K, TN = 16, 4096, 512
NW = K // 32


def _plane(w, p):
    msk = jnp.uint32(0x01010101)
    bits = (pltpu.bitcast(w, jnp.uint32) >> p) & msk
    return pltpu.bitcast(msk + bits * jnp.uint32(0xFE), jnp.int8)


def kern_mono(w_ref, y_ref, o_ref, s_ref):
    for p in range(8):
        s_ref[pl.ds(p * 4 * NW, 4 * NW), :] = _plane(w_ref[:], p)
    o_ref[:] = jax.lax.dot_general(
        y_ref[:], s_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def kern_plane(w_ref, y_ref, o_ref, s_ref):
    acc = jnp.zeros((M, TN), jnp.float32)
    for p in range(8):
        s_ref[:] = _plane(w_ref[:], p)
        y_p = y_ref[:, p * 4 * NW:(p + 1) * 4 * NW]
        acc = acc + jax.lax.dot_general(
            y_p, s_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def kern_plane2(w_ref, y_ref, o_ref, s0_ref, s1_ref):
    acc = jnp.zeros((M, TN), jnp.float32)
    slabs = (s0_ref, s1_ref)
    for p in range(8):
        s = slabs[p % 2]
        s[:] = _plane(w_ref[:], p)
        y_p = y_ref[:, p * 4 * NW:(p + 1) * 4 * NW]
        acc = acc + jax.lax.dot_general(
            y_p, s[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def run(name, kernel, scratches):
    # y rows must be PERMUTED so plane p rows match y slices; for timing
    # purposes content doesn't matter
    w = jnp.zeros((NW, TN), jnp.int32)
    y = jnp.ones((M, K), jnp.bfloat16)

    def call(y, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
            scratch_shapes=scratches,
        )(w, y)

    s = bench_op(call, y, w, iters_lo=32, iters_hi=256, reps=5,
                 perturb_arg=0)
    full = s * (K * 11008 * 3.02 / (K * TN))  # scale tile -> 7B all-proj
    print(f"{name:8s}: {s*1e6:8.2f} us/tile  (~{full*1e3*32:.2f} ms/step "
          f"extrapolated)", flush=True)


if __name__ == "__main__":
    run("mono", kern_mono, [pltpu.VMEM((K, TN), jnp.int8)])
    run("plane", kern_plane, [pltpu.VMEM((4 * NW, TN), jnp.int8)])
    run("plane2", kern_plane2, [pltpu.VMEM((4 * NW, TN), jnp.int8),
                                pltpu.VMEM((4 * NW, TN), jnp.int8)])
