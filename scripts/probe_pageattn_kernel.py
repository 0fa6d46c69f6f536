"""Isolate the native paged-attention kernel's cost on TPU.

1. standalone: kernel on a 7B-sized pool, not in any loop
2. in-loop: same call inside a fori_loop whose carry includes the pool
   (the decode step's structure) with a scatter write per iteration
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.kernels.paged_attention import paged_attention_flat  # noqa
from onebit_tpu.utils.benchmark import bench_op  # noqa


def main():
    L, nkv, ps, hd = 32, 32, 16, 128
    B, mp = 16, 16
    P = B * mp + 1
    nh = nkv
    kp = jnp.zeros((L, P, nkv, ps, hd), jnp.bfloat16)
    vp = jnp.zeros((L, P, nkv, ps, hd), jnp.bfloat16)
    q = jnp.ones((B, nh, hd), jnp.bfloat16)
    tables = (jnp.arange(B * mp, dtype=jnp.int32).reshape(B, mp) + 1)
    lengths = jnp.full((B,), 250, jnp.int32)

    for ppb in (4, 8, 16):
        s = bench_op(
            lambda q, kp, vp: paged_attention_flat(
                q, kp, vp, lengths=lengths, page_indices=tables,
                layer=jnp.int32(3), pages_per_block=ppb),
            q, kp, vp, iters_lo=4, iters_hi=32, reps=3, perturb_arg=0)
        print(f"1 standalone kernel ppb={ppb:2d}:  {s*1e3:8.3f} ms/call",
              flush=True)

    @jax.jit
    def loop(q, kp, vp):
        def body(i, carry):
            kp, vp, acc = carry
            kp = kp.at[i, 5, :, 3].set(q[0].astype(kp.dtype))
            ctx = paged_attention_flat(q, kp, vp, lengths=lengths,
                                       page_indices=tables, layer=i)
            return (kp, vp, acc + ctx)

        kp, vp, acc = jax.lax.fori_loop(
            0, L, body, (kp, vp, jnp.zeros((B, nh, hd), jnp.float32)))
        return acc

    def sync(o):
        return float(jnp.sum(o))

    sync(loop(q, kp, vp))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(loop(q, kp, vp))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"2 in-loop (L={L} iters + scatter): {ts[1]*1e3:8.2f} ms total "
          f"= {ts[1]/L*1e3:6.3f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
