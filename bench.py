"""Benchmark: OneBit LLaMA-7B packed decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is the reference's inference strategy — unpack the whole sign
matrix every forward then dense matmul (bitnet.py:98-115) — expressed in XLA
("xla" impl).  "value" is decode tokens/s with the best available impl
(fused Pallas kernel when present, else the same XLA path → vs_baseline 1.0).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _bench_decode(config, params, impl: str, batch: int, steps: int,
                  max_len: int) -> float:
    from onebit_tpu.model.bitllama import decode_step, init_kv_cache

    cache = init_kv_cache(config, batch, max_len, dtype=jnp.bfloat16)
    ids = jnp.zeros((batch, 1), jnp.int32)

    def step(params, cache, ids, idx):
        return decode_step(params, cache, ids, idx, config, impl=impl,
                           compute_dtype=jnp.bfloat16)

    # warmup/compile
    logits, cache = step(params, cache, ids, jnp.int32(0))
    jax.block_until_ready(logits)

    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        logits, cache = step(params, cache, ids, jnp.int32(i))
    jax.block_until_ready(logits)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "8"))
    steps = int(os.environ.get("ONEBIT_BENCH_STEPS", "64"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "256"))

    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.model.config import BitLlamaConfig

    config = BitLlamaConfig.named(size)
    params = init_params(config, jax.random.PRNGKey(0), mode="packed")
    # model params in bf16 except packed planes
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    on_tpu = jax.default_backend() != "cpu"
    baseline_tps = _bench_decode(config, params, "xla", batch, steps, max_len)
    if on_tpu:
        try:
            fused_tps = _bench_decode(config, params, "pallas", batch, steps,
                                      max_len)
        except Exception as e:  # pallas path not available yet
            print(f"# pallas path unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)
            fused_tps = None
    else:
        fused_tps = None

    value = fused_tps if fused_tps is not None else baseline_tps
    print(json.dumps({
        "metric": f"decode tokens/s/chip OneBit {size} (batch {batch})",
        "value": round(value, 2),
        "unit": "tokens/s",
        "vs_baseline": round(value / baseline_tps, 3),
    }))


if __name__ == "__main__":
    main()
