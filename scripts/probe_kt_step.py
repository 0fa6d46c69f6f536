"""Full decode step with the fused transposed-K attention kernel vs the
XLA int8 / bf16 paths at deep context (VERDICT r2 item 4 integration).

decode_step_flat on QuantKVCacheKT routes attention through
kernels/kv_attention._kernel_kt (raw s8 MXU operands, scalar-prefetched
layer index); attention-only measured 3.62 ms vs 4.64 ms XLA at 7B b=4
T=2048 (scripts/probe_kv_kernel.py).  This probe times the INTEGRATED
step end-to-end.  Run ON THE REAL TPU; serialize with other TPU jobs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from onebit_tpu.model.bitllama import (decode_step_flat, fuse_for_decode,
                                           init_kv_cache)
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import (init_quant_kv_cache,
                                           init_quant_kv_cache_kt,
                                           init_quant_kv_cache_kt4)
    from onebit_tpu.utils.benchmark import bench_fn_with_state
    from onebit_tpu.utils.randinit import host_random_packed_params

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "4"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "2048"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "16"))
    which = os.environ.get("ONEBIT_PROBE_WHICH", "kt,int8,bf16").split(",")
    config = BitLlamaConfig.named(size)

    _log(f"params ({size}) b={batch} T={max_len}")
    params = fuse_for_decode(host_random_packed_params(config), config)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    ids = jnp.zeros((batch, 1), jnp.int32)

    def make(cache0):
        def step(p, state):
            cache, idx = state
            _, cache = decode_step_flat(p, cache, ids, idx, config,
                                        impl="pallas",
                                        compute_dtype=jnp.bfloat16)
            return cache, idx + 1
        return step, (cache0, jnp.int32(max_len - iters - 1))

    for name, mk in (
            ("KT4 fused-kernel int4", lambda: init_quant_kv_cache_kt4(
                config, batch, max_len)),
            ("KT fused-kernel int8", lambda: init_quant_kv_cache_kt(
                config, batch, max_len)),
            ("int8 (XLA attn)", lambda: init_quant_kv_cache(
                config, batch, max_len)),
            ("bf16 flat", lambda: init_kv_cache(config, batch, max_len,
                                                jnp.bfloat16))):
        key = name.split()[0].lower().replace("int8", "int8").replace(
            "kt", "kt").replace("bf16", "bf16")
        if key not in which:
            continue
        _log(name)
        step, state = make(mk())
        sec = bench_fn_with_state(step, state, iters_lo=0, iters_hi=iters,
                                  reps=3, const=params)
        print(f"{name}: {sec*1e3:.2f} ms/step ({batch/sec:.0f} tok/s)",
              flush=True)


if __name__ == "__main__":
    main()
