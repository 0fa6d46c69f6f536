"""Large-M (prefill/eval) kernel tile sweep at the 7B projection shapes.

The ppl-eval forward runs at ~58% of the projection-FLOP roofline
(scripts/probe_prefill.py).  This isolates the large-M kernel
(kernels/bitlinear_pallas._call_large_m) at the three 7B shapes and sweeps
(tm, tn) via the ONEBIT_LARGEM_TM/TN overrides, reporting achieved
TFLOP/s so the in-model gap can be attributed (kernel efficiency vs
out-of-kernel work).

Env: ONEBIT_SWEEP_M (2048), ONEBIT_SWEEP_TM / ONEBIT_SWEEP_TN (csv lists).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.utils.benchmark import bench_op  # noqa

SHAPES = [  # (K, N) of the 7B projections
    (4096, 4096),    # q/k/v/o
    (4096, 11008),   # gate/up
    (11008, 4096),   # down
]


def main():
    m = int(os.environ.get("ONEBIT_SWEEP_M", "2048"))
    tms = [int(t) for t in
           os.environ.get("ONEBIT_SWEEP_TM", "128,256,512").split(",")]
    tns = [int(t) for t in
           os.environ.get("ONEBIT_SWEEP_TN", "256,512,1024").split(",")]
    key = jax.random.PRNGKey(0)

    for k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, k * n))
        x = jax.random.normal(kx, (m, k), jnp.bfloat16)
        packed = jax.random.randint(kw, (k // 32, n),
                                    jnp.iinfo(jnp.int32).min,
                                    jnp.iinfo(jnp.int32).max, jnp.int32)
        g = jnp.ones((k,), jnp.bfloat16)
        h = jnp.ones((n,), jnp.float32)
        flops = 2.0 * m * k * n
        print(f"shape [{m},{k}]x[{k},{n}]:", flush=True)
        for tm in tms:
            for tn in tns:
                if n % tn or m % tm:
                    continue
                # the overrides are read per call inside _call_large_m, so
                # no module reload is needed
                os.environ["ONEBIT_LARGEM_TM"] = str(tm)
                os.environ["ONEBIT_LARGEM_TN"] = str(tn)
                from onebit_tpu.kernels.bitlinear_pallas import (
                    bitlinear_packed_raw)

                def run(xx):
                    return bitlinear_packed_raw(xx, packed, g, h)

                try:
                    sec = bench_op(run, x, iters_lo=4, iters_hi=16, reps=3)
                except Exception as e:
                    print(f"  tm={tm:4d} tn={tn:4d}: FAIL "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                print(f"  tm={tm:4d} tn={tn:4d}: {sec*1e6:8.1f} us  "
                      f"{flops/sec/1e12:6.1f} TFLOP/s "
                      f"({flops/sec/197e12*100:4.1f}% peak)", flush=True)


if __name__ == "__main__":
    main()
