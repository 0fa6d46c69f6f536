"""KV dtype ladder at deep context: bf16 / fp8 / int8 / int4 attention cost.

Follow-up to probe_longctx_parts.py: int8 attention measures ~1.9 ms above
its HBM floor (VPU dequant); int4 halves the bytes, fp8 drops the scale
math.  Attention-only, all layers, 7B b=4 T=2048 — the deep-context
decode regime (VERDICT r2 item 4).

Run ON THE REAL TPU; serialize with other TPU jobs.
"""

import functools
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
    from onebit_tpu.model import bitllama
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.utils.benchmark import bench_fn_with_state

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "4"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "2048"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "16"))
    config = BitLlamaConfig.named(size)
    L = config.num_hidden_layers
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    q0 = jax.device_put(jnp.ones((batch, 1, nh, hd), jnp.bfloat16) * 0.01)
    mask = jnp.ones((batch, 1, 1, max_len), bool)

    def plain_loop(q, cache):
        """cache = (k, v) any dtype, cast to q.dtype at use."""
        k_all, v_all = cache

        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            ctx = bitllama._attention(q, pick(k_all).astype(q.dtype),
                                      pick(v_all).astype(q.dtype), mask,
                                      num_kv_groups=nh // nkv)
            return acc + ctx.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((batch, 1, nh, hd), jnp.float32))

    def scaled_loop(q, cache):
        """cache = (k_q, k_s, v_q, v_s): int8/int4 values + scales."""
        k_q, k_s, v_q, v_s = cache

        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            ctx = bitllama._attention_quant(
                q, pick(k_q), pick(k_s), pick(v_q), pick(v_s), mask,
                num_kv_groups=nh // nkv)
            return acc + ctx.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((batch, 1, nh, hd), jnp.float32))

    shape = (L, batch, max_len, nkv, hd)
    sshape = (L, batch, max_len, nkv)

    cases = [
        ("bf16", plain_loop,
         lambda: (jnp.zeros(shape, jnp.bfloat16),
                  jnp.zeros(shape, jnp.bfloat16))),
        ("fp8 ", plain_loop,
         lambda: (jnp.zeros(shape, jnp.float8_e4m3fn),
                  jnp.zeros(shape, jnp.float8_e4m3fn))),
        ("int8", scaled_loop,
         lambda: (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32),
                  jnp.zeros(shape, jnp.int8),
                  jnp.zeros(sshape, jnp.float32))),
        ("int4", scaled_loop,
         lambda: (jnp.zeros(shape, jnp.int4), jnp.zeros(sshape, jnp.float32),
                  jnp.zeros(shape, jnp.int4),
                  jnp.zeros(sshape, jnp.float32))),
        ("int4/bf16s", scaled_loop,
         lambda: (jnp.zeros(shape, jnp.int4),
                  jnp.zeros(sshape, jnp.bfloat16),
                  jnp.zeros(shape, jnp.int4),
                  jnp.zeros(sshape, jnp.bfloat16))),
    ]
    for name, fn, mk in cases:
        _log(name)
        try:
            cache = jax.device_put(mk())
            jax.block_until_ready(cache)

            def step(c, q):
                out = fn(q, c)
                return (q + out[:, :, :, :1].mean() * 0).astype(q.dtype)

            sec = bench_fn_with_state(step, q0, iters_lo=0, iters_hi=iters,
                                      reps=3, const=cache)
            print(f"{name}: {sec*1e3:.2f} ms  (attention-only, all {L} "
                  f"layers, b={batch} T={max_len})", flush=True)
            del cache
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
