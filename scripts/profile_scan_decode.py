"""True device-side decode-step cost: N steps scanned inside ONE program.

The dispatch-chained bench (bench.py round 1) pays ~1-2 ms of tunnel RPC
per step; the serving engine amortizes that via block decode (lax.scan of
decode steps in one program).  This measures the scanned per-step cost —
the honest device throughput number.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model.bitllama import decode_step, init_kv_cache  # noqa
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def _log(msg):
    import time
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "8"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "256"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "32"))
    fuse = os.environ.get("ONEBIT_FUSE", "0") == "1"
    config = BitLlamaConfig.named(size)
    _log(f"generating params ({size})")
    params = host_random_packed_params(config)
    if fuse:
        from onebit_tpu.model.bitllama import fuse_for_decode
        params = fuse_for_decode(params, config)
    _log("pushing params to device")
    params = jax.device_put(params)
    jax.block_until_ready(params)
    float(jnp.sum(jax.tree.leaves(params)[0].astype(jnp.float32)))  # fetch
    _log("params on device; building cache + program")
    cache = init_kv_cache(config, batch, max_len, dtype=jnp.bfloat16)
    ids = jnp.zeros((batch, 1), jnp.int32)

    if os.environ.get("ONEBIT_DECODE_FLAT", "0") == "1":
        from onebit_tpu.model.bitllama import decode_step_flat as _step_fn
    else:
        _step_fn = decode_step

    def step(p, state):
        cache, idx = state
        logits, cache = _step_fn(p, cache, ids, idx, config,
                                 impl="pallas", compute_dtype=jnp.bfloat16)
        return cache, idx + 1

    # iters_lo=0: ONE scan program (7B-scale programs cost many minutes of
    # device-side compile each); the fixed ~30 ms fetch amortized over
    # `iters` steps underestimates throughput by ~1 ms/iters per step.
    _log(f"compiling + warming scan program (iters={iters})")
    sec = bench_fn_with_state(step, (cache, jnp.int32(0)),
                              iters_lo=0, iters_hi=iters, reps=3,
                              const=params)
    _log("measurement done")
    variant = os.environ.get("ONEBIT_UNPACK_VARIANT", "sgn")
    print(f"scanned decode: {sec*1e3:.2f} ms/step -> {batch/sec:.0f} tok/s "
          f"({size}, batch {batch}, fuse={fuse}, variant={variant})")


if __name__ == "__main__":
    main()
