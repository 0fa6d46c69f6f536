"""Per-layer paged decode attention: native kernel vs XLA gather path.

Drives engine/paged.py's _paged_attend (the exact serving dispatch) at 7B
serving geometry across page sizes, bf16 and INT8 pools, to price the
round-4 MXU-oriented kernel rewrite against the gather default.

ONEBIT_PROBE_PS: comma list of page sizes (default "16,64,256").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.engine.paged import _paged_attend, _quantize_kv_int8  # noqa
from onebit_tpu.utils.benchmark import bench_op  # noqa


def main():
    L, nkv, hd = 32, 32, 128
    B = int(os.environ.get("ONEBIT_PROBE_B", "16"))
    T = int(os.environ.get("ONEBIT_PROBE_T", "256"))
    nh = nkv
    key = jax.random.PRNGKey(0)

    for ps in [int(x) for x in
               os.environ.get("ONEBIT_PROBE_PS", "16,64,256").split(",")]:
        mp = T // ps
        P = B * mp + 1
        kp = jax.random.normal(key, (L, P, nkv, ps, hd), jnp.bfloat16)
        vp = kp * 0.5
        kq, ks = _quantize_kv_int8(kp)
        vq, vs = _quantize_kv_int8(vp)
        q = jax.random.normal(key, (B, nh, hd), jnp.bfloat16)
        tables = (jnp.arange(B * mp, dtype=jnp.int32).reshape(B, mp) + 1)
        lengths = jnp.full((B,), T - 6, jnp.int32)

        for quant in (False, True):
            leaves = (kq, ks, vq, vs) if quant else (kp, vp)
            for use_kernel in (False, True):
                def f(q, *lv):
                    return _paged_attend(
                        q, lv, quant, use_kernel, lengths, tables,
                        jnp.int32(3), jnp.bfloat16, hd)
                try:
                    s = bench_op(f, q, *leaves, iters_lo=8, iters_hi=64,
                                 reps=3, perturb_arg=0)
                except Exception as e:   # noqa: BLE001
                    print(f"ps={ps:3d} quant={int(quant)} "
                          f"kernel={int(use_kernel)}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                print(f"ps={ps:3d} quant={int(quant)} "
                      f"kernel={int(use_kernel)}: {s*1e6:9.1f} us/layer "
                      f"(x32 = {s*32*1e3:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
