"""INT8 vs bf16 KV cache decode cost at long context (VERDICT r1 item 5).

The quantized cache exists to cut decode attention HBM traffic in half;
this measures that it actually does: full 7B decode-step cost with a bf16
cache vs the INT8 cache (direct int8 attention, scales folded —
``model.bitllama._attention_quant``) at a context where cache reads
dominate (max_len 2048: bf16 cache reads ~8.6 GB/step at batch 8, ~10x
the packed-weight stream).

Run ON THE REAL TPU.  Serialize with other TPU jobs.

Env: ONEBIT_BENCH_SIZE (llama2-7b), ONEBIT_BENCH_BATCH (8),
ONEBIT_BENCH_MAXLEN (2048), ONEBIT_SCAN_ITERS (16).
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
    from onebit_tpu.model.bitllama import decode_step_flat, init_kv_cache
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import init_quant_kv_cache
    from onebit_tpu.utils.benchmark import bench_fn_with_state
    from onebit_tpu.utils.randinit import host_random_packed_params

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "8"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "2048"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "16"))
    config = BitLlamaConfig.named(size)

    _log(f"params ({size})")
    params = host_random_packed_params(config)
    from onebit_tpu.model.bitllama import fuse_for_decode
    params = fuse_for_decode(params, config)
    params = jax.device_put(params)
    jax.block_until_ready(params)

    ids = jnp.zeros((batch, 1), jnp.int32)

    def make_step(cache0):
        def step(p, state):
            cache, idx = state
            logits, cache = decode_step_flat(p, cache, ids, idx, config,
                                             impl="pallas",
                                             compute_dtype=jnp.bfloat16)
            return cache, idx + 1
        return step, (cache0, jnp.int32(max_len - iters - 1))

    results = {}
    # lazy cache construction: both caches at once OOM a 16 GB chip
    # (bf16 8.6 GB + int8 4.8 GB + params)
    for name, mk in (
            ("bf16", lambda: init_kv_cache(config, batch, max_len,
                                           jnp.bfloat16)),
            ("int8", lambda: init_quant_kv_cache(config, batch, max_len))):
        _log(f"compiling + timing {name} cache (max_len={max_len})")
        step, state = make_step(mk())
        sec = bench_fn_with_state(step, state, iters_lo=0, iters_hi=iters,
                                  reps=3, const=params)
        results[name] = sec
        del step, state
        print(f"{name}: {sec*1e3:.2f} ms/step  "
              f"({batch/sec:.1f} tok/s, batch {batch}, ctx {max_len})",
              flush=True)

    L, nkv, hd = (config.num_hidden_layers, config.num_key_value_heads,
                  config.head_dim)
    bf16_bytes = 2 * batch * max_len * nkv * hd * 2 * L
    int8_bytes = bf16_bytes // 2 + 2 * batch * max_len * nkv * 4 * L
    print(f"cache read/step: bf16 {bf16_bytes/1e9:.2f} GB, "
          f"int8 {int8_bytes/1e9:.2f} GB; "
          f"speedup {results['bf16']/results['int8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
