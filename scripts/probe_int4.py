"""Probes for the next decode-kernel push (VERDICT r1 item 1).

A. Pallas per-dispatch overhead: marginal cost of a trivially small
   kernel call inside a fori_loop — bounds what call-merging could save
   (the 7B flat decode step dispatches 4 kernels x 32 layers).
B. int4 sign operand: can Mosaic store int4 tiles and feed the MXU a
   bf16 x int4 dot?  If so the unpacked-sign VMEM traffic halves — the
   binding resource for decode at small batch (PERF.md).
C. Same-shape comparison: unpack+dot with int8 tile vs int4 tile at the
   7B qkv geometry.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.utils.benchmark import bench_op  # noqa


def probe_dispatch_overhead():
    """Marginal per-call cost of a minimal pallas kernel in a fori chain."""
    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    x = jnp.ones((16, 512), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, v: tiny(v), x)
        return run

    r64, r256 = chain(64), chain(256)
    float(jnp.sum(r64(x).astype(jnp.float32)))
    float(jnp.sum(r256(x).astype(jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(r256(x).astype(jnp.float32)))
        t_hi = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(r64(x).astype(jnp.float32)))
        t_lo = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / 192)
    ts.sort()
    print(f"A per-dispatch overhead: {ts[2]*1e6:.1f} us "
          f"(x128 calls = {ts[2]*128*1e3:.2f} ms/step)", flush=True)


def probe_int4_support():
    """Does a bf16 x int4 (or int8-upcast-from-int4) dot compile?"""
    try:
        y = jnp.ones((16, 128), jnp.bfloat16)
        s = jnp.ones((128, 128), jnp.int4)
        out = jax.lax.dot_general(
            y, s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        print("B xla bf16xint4 dot: OK", float(out.sum()), flush=True)
    except Exception as e:
        print(f"B xla bf16xint4 dot: NO ({type(e).__name__}: "
              f"{str(e)[:100]})", flush=True)

    # pallas: store int4 scratch, dot from it
    def k4(w_ref, y_ref, o_ref, s_ref):
        bits = w_ref[:]                       # int8 0/1 bits [K, TN]
        s_ref[:] = (1 - 2 * bits).astype(jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            y_ref[:], s_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    try:
        K, TN = 1024, 256
        w = jnp.zeros((K, TN), jnp.int8)
        y = jnp.ones((16, K), jnp.bfloat16)
        out = pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((16, TN), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, TN), jnp.int4)],
        )(w, y)
        print("B pallas int4 scratch+dot: OK", float(out.sum()), flush=True)
    except Exception as e:
        print(f"B pallas int4 scratch+dot: NO ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


def probe_unpack_dot(dtype_name: str):
    """7B qkv geometry: unpack packed words into (int8|int4) tile + dot."""
    from onebit_tpu.kernels.bitlinear_pallas import _unpack_planes

    K, TN, M = 4096, 512, 16
    nw = K // 32

    def kernel(w_ref, y_ref, o_ref, s_ref, s4_ref):
        _unpack_planes(w_ref[:], s_ref, nw, "sgn")
        if dtype_name == "int4":
            s4_ref[:] = s_ref[:].astype(jnp.int4)
            s = s4_ref[:]
        else:
            s = s_ref[:]
        o_ref[:] = jax.lax.dot_general(
            y_ref[:], s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    w = jnp.zeros((nw, TN), jnp.int32)
    y = jnp.ones((M, K), jnp.bfloat16)

    def call(w, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, TN), jnp.int8),
                            pltpu.VMEM((K, TN), jnp.int4)],
        )(w, y)

    try:
        s = bench_op(call, w, y, iters_lo=16, iters_hi=64, reps=5,
                     perturb_arg=1)
        print(f"C unpack+dot [{dtype_name}]: {s*1e6:.1f} us/tile", flush=True)
    except Exception as e:
        print(f"C unpack+dot [{dtype_name}]: NO ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    which = set(os.environ.get("ONEBIT_PROBE_WHICH", "a,b,c").split(","))
    if "a" in which:
        probe_dispatch_overhead()
    if "b" in which:
        probe_int4_support()
    if "c" in which:
        probe_unpack_dot("int8")
        probe_unpack_dot("int4")
