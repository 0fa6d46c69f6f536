"""Isolate serving-path decode cost vs the raw flat decode step.

Times, with the scanned marginal methodology (utils/benchmark):
  1. decode_step_flat (shared cache index)   — bench.py's headline step
  2. ragged_decode_step (per-row positions)  — the engine's dense hot step
  3. ragged_decode_block n_steps dispatch    — what serving actually calls
  4. paged_decode_step (flat pool)           — the paged engine hot step

Env: ONEBIT_BENCH_SIZE (llama2-7b), ONEBIT_PROBE_BATCH (16),
ONEBIT_PROBE_MAXLEN (256), ONEBIT_PROBE_WHICH (csv of 1,2,3,4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_PROBE_BATCH", "16"))
    max_len = int(os.environ.get("ONEBIT_PROBE_MAXLEN", "256"))
    which = set(os.environ.get("ONEBIT_PROBE_WHICH", "1,2,3,4").split(","))

    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)
    from onebit_tpu.model.bitllama import fuse_for_decode, init_kv_cache
    params = fuse_for_decode(params, config)
    ids = jnp.zeros((batch, 1), jnp.int32)

    if "1" in which:
        from onebit_tpu.model.bitllama import decode_step_flat
        cache = init_kv_cache(config, batch, max_len)

        def step1(p, state):
            cache, idx = state
            _, cache = decode_step_flat(p, cache, ids, idx, config,
                                        impl="pallas")
            return cache, idx + 1

        s = bench_fn_with_state(step1, (cache, jnp.int32(0)), iters_lo=0,
                                iters_hi=32, reps=3, const=params)
        print(f"1 decode_step_flat      b{batch}: {s*1e3:8.2f} ms/step "
              f"{batch/s:8.1f} tok/s", flush=True)

    if "2" in which:
        from onebit_tpu.model.ragged_decode import ragged_decode_step
        cache = init_kv_cache(config, batch, max_len)
        active = jnp.ones((batch,), bool)

        def step2(p, state):
            cache, pos = state
            _, cache = ragged_decode_step(p, cache, ids, pos, active,
                                          config, impl="pallas")
            return cache, pos + 1

        pos0 = jnp.zeros((batch,), jnp.int32)
        s = bench_fn_with_state(step2, (cache, pos0), iters_lo=0,
                                iters_hi=32, reps=3, const=params)
        print(f"2 ragged_decode_step    b{batch}: {s*1e3:8.2f} ms/step "
              f"{batch/s:8.1f} tok/s", flush=True)

    if "3" in which:
        from onebit_tpu.engine.sampler import SamplingConfig
        from onebit_tpu.model.ragged_decode import ragged_decode_block
        cache = init_kv_cache(config, batch, max_len)
        active = jnp.ones((batch,), bool)
        sampling = SamplingConfig(greedy=True)
        n_steps = 16
        tok = jnp.ones((batch,), jnp.int32)
        budget = jnp.full((batch,), 10_000, jnp.int32)
        key = jax.random.PRNGKey(0)

        def block(p, state):
            cache, pos = state
            _, _, cache, _, _ = ragged_decode_block(
                p, cache, tok, pos, active, budget, key, config,
                sampling=sampling, n_steps=n_steps, impl="pallas")
            return cache, pos + n_steps

        pos0 = jnp.zeros((batch,), jnp.int32)
        s = bench_fn_with_state(block, (cache, pos0), iters_lo=0,
                                iters_hi=4, reps=3, const=params)
        per = s / n_steps
        print(f"3 ragged_block(n=16)    b{batch}: {per*1e3:8.2f} ms/step "
              f"{batch/per:8.1f} tok/s", flush=True)

    if "4" in which:
        from onebit_tpu.engine.paged import (init_paged_kv_cache,
                                             paged_decode_step)
        ps = 16
        mpp = -(-max_len // ps)
        P = batch * mpp + 1
        quant = os.environ.get("ONEBIT_PROBE_QUANT", "0") == "1"
        cache = init_paged_kv_cache(config, P, ps, quantized=quant)
        tables = (jnp.arange(batch * mpp, dtype=jnp.int32)
                  .reshape(batch, mpp) + 1)

        def step4(p, state):
            cache, lens = state
            _, cache = paged_decode_step(p, cache, ids, lens, tables,
                                         config, impl="pallas")
            return cache, lens + 1

        lens0 = jnp.zeros((batch,), jnp.int32)
        s = bench_fn_with_state(step4, (cache, lens0), iters_lo=0,
                                iters_hi=32, reps=3, const=params)
        print(f"4 paged_decode_step     b{batch}: {s*1e3:8.2f} ms/step "
              f"{batch/s:8.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
