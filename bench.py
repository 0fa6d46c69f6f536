"""Benchmark: OneBit LLaMA packed decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is the reference's inference strategy — unpack the whole sign
matrix every forward then dense matmul (bitnet.py:98-115) — expressed in XLA
("xla" impl on packed weights).  "value" is decode tokens/s with the fused
Pallas kernel.  Timing uses marginal-cost methodology (see
onebit_tpu.utils.benchmark): decode steps chained in one jit via lax.scan,
host-fetch sync, cost = (T(hi_steps) - T(lo_steps)) / (hi - lo), which
cancels the tunnel's fixed RPC round trip.
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp

# persistent compile cache: the 7B scan program costs minutes to compile
# through the remote tunnel; cache hits make reruns fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def _bench_decode(config, params, impl: str, batch: int, max_len: int,
                  iters_lo: int = 0, iters_hi: int = 48) -> float:
    from onebit_tpu.model.bitllama import decode_step, init_kv_cache
    from onebit_tpu.utils.benchmark import bench_step_dispatch

    cache = init_kv_cache(config, batch, max_len, dtype=jnp.bfloat16)
    ids = jnp.zeros((batch, 1), jnp.int32)

    # decode_step is itself jitted; chaining it directly avoids re-lowering
    # the model into an outer program (minutes for 7B via remote compile)
    def step(state):
        cache, idx = state
        logits, cache = decode_step(params, cache, ids, idx, config,
                                    impl=impl, compute_dtype=jnp.bfloat16)
        return cache, idx + 1

    sec_per_step = bench_step_dispatch(
        step, (cache, jnp.int32(0)),
        iters_lo=max(iters_lo, 8), iters_hi=iters_hi)
    return batch / sec_per_step


def _make_params(config, seed=0):
    from onebit_tpu.utils.randinit import host_random_packed_params

    return host_random_packed_params(config, seed)


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "8"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "256"))

    from onebit_tpu.model.config import BitLlamaConfig

    config = BitLlamaConfig.named(size)
    on_tpu = jax.default_backend() != "cpu"
    best_impl = "pallas" if on_tpu else "xla"

    # Full-model throughput with the fused kernel (the headline number).
    # fuse_for_decode concatenates q/k/v and gate/up along N so each decode
    # step dispatches 4 projection kernels per layer instead of 7 — the
    # per-call overhead dominates at small batch (scripts/profile_decode.py).
    print(f"# bench phase 1: full {size} {best_impl}", file=sys.stderr,
          flush=True)
    params = _make_params(config)
    if best_impl == "pallas" and not os.environ.get("ONEBIT_BENCH_NO_FUSE"):
        from onebit_tpu.model.bitllama import fuse_for_decode
        params = fuse_for_decode(params, config)
    try:
        value = _bench_decode(config, params, best_impl, batch, max_len)
    except Exception as e:
        print(f"# pallas path failed, falling back to xla: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        best_impl = "xla"
        params = _make_params(config)
        value = _bench_decode(config, params, "xla", batch, max_len)
    del params

    # vs_baseline (the reference's unpack-every-forward strategy in XLA)
    # measured on a depth-reduced model: per-layer cost is uniform, so the
    # ratio is depth-invariant while compile time stays bounded.
    if best_impl == "pallas" and not os.environ.get(
            "ONEBIT_BENCH_SKIP_BASELINE"):
        small = BitLlamaConfig.named(
            size, num_hidden_layers=min(2, config.num_hidden_layers))
        sparams = _make_params(small)
        print("# bench phase 2: small pallas", file=sys.stderr, flush=True)
        fused_s = _bench_decode(small, sparams, "pallas", batch, max_len)
        print("# bench phase 3: small xla baseline", file=sys.stderr,
              flush=True)
        base_s = _bench_decode(small, sparams, "xla", batch, max_len)
        vs_baseline = fused_s / base_s
    else:
        vs_baseline = 1.0

    print(json.dumps({
        "metric": f"decode tokens/s/chip OneBit {size} (batch {batch})",
        "value": round(value, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
