"""Price the engine's ragged KT decode step against the flat probe step.

The deep-context serving row measured the quantized-KV ENGINE slower than
bf16 (191.9 vs 219.8 tok/s) while the flat-step probe has KT at 378 vs
260 — something in the ragged step (per-row scatters? scan carry?) eats
the kernel's win.  Times one step of each path at 7B b=4 T=2304:

  A. ragged_decode_step, dense bf16 cache (vector row_pos scatters)
  B. ragged_decode_step, QuantKVCacheKT   (vector row_pos + fused kernel)
  C. decode_step_flat,   QuantKVCacheKT   (scalar pos, the probe path)
  D. B's XLA write set alone (quantize + the three .at[].set x32 layers)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model.bitllama import (decode_step_flat, fuse_for_decode,  # noqa
                                        init_kv_cache)
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.model.kv_cache import init_quant_kv_cache_kt, quantize_kv  # noqa
from onebit_tpu.model.ragged_decode import ragged_decode_step  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    b = int(os.environ.get("ONEBIT_PROBE_B", "4"))
    T = int(os.environ.get("ONEBIT_PROBE_T", "2304"))
    which = os.environ.get("ONEBIT_PROBE_WHICH", "ABCD")
    config = BitLlamaConfig.named(size)
    params = jax.device_put(fuse_for_decode(host_random_packed_params(config),
                                            config))
    jax.block_until_ready(params)
    ids = jnp.ones((b,), jnp.int32)
    row_pos = jnp.full((b,), T - 8, jnp.int32)
    active = jnp.ones((b,), bool)
    rows = jnp.arange(b)
    kw = dict(config=config, impl="pallas", compute_dtype=jnp.bfloat16)

    if "A" in which:
        def stepA(p, cache):
            return ragged_decode_step(p, cache, ids[:, None], row_pos, active,
                                      **kw)[1]
        s = bench_fn_with_state(stepA, init_kv_cache(config, b, T,
                                                     dtype=jnp.bfloat16),
                                iters_lo=4, iters_hi=20, reps=3,
                                const=params)
        print(f"A ragged dense bf16 : {s*1e3:7.2f} ms/step", flush=True)

    if "B" in which:
        def stepB(p, cache):
            return ragged_decode_step(p, cache, ids[:, None], row_pos, active,
                                      **kw)[1]
        s = bench_fn_with_state(stepB, init_quant_kv_cache_kt(config, b, T),
                                iters_lo=4, iters_hi=20, reps=3,
                                const=params)
        print(f"B ragged KT quant   : {s*1e3:7.2f} ms/step", flush=True)

    if "C" in which:
        pos = jnp.int32(T - 8)

        def stepC(p, cache):
            return decode_step_flat(p, cache, ids[:, None], pos, **kw)[1]
        s = bench_fn_with_state(stepC, init_quant_kv_cache_kt(config, b, T),
                                iters_lo=4, iters_hi=20, reps=3,
                                const=params)
        print(f"C flat KT quant     : {s*1e3:7.2f} ms/step", flush=True)

    if "D" in which:
        nkv, hd = config.num_key_value_heads, config.head_dim
        kv = jnp.ones((b, 1, nkv, hd), jnp.bfloat16)

        def stepD(p, cache):
            def body(i, leaves):
                k_qt, k_st, v_q, v_s = leaves
                nkq, nks = quantize_kv(kv)
                nvq, nvs = quantize_kv(kv)
                k_st = k_st.at[i, rows, :, row_pos].set(nks[:, 0])
                v_q = v_q.at[i, rows, row_pos].set(nvq[:, 0])
                v_s = v_s.at[i, rows, row_pos].set(nvs[:, 0])
                # the aliased in-kernel K write is excluded: D isolates
                # the XLA scatter set (k_qt passes through untouched)
                return (k_qt, k_st, v_q, v_s)

            leaves = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                       tuple(cache))
            return type(cache)(*leaves)
        s = bench_fn_with_state(stepD, init_quant_kv_cache_kt(config, b, T),
                                iters_lo=4, iters_hi=20, reps=3,
                                const=params)
        print(f"D scatter set alone : {s*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
