"""Fused quantized-KV attention kernel vs XLA int8 path, on-chip timing.

7B-geometry attention-only, all 32 layers, b=4 T=2048 — the regime where
the XLA path measures 4.60 ms against a 2.7 ms HBM floor
(scripts/probe_longctx_parts.py).  Run ON THE REAL TPU; serialize.
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
    from onebit_tpu.kernels.kv_attention import kv_attention_decode
    from onebit_tpu.model import bitllama
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.utils.benchmark import bench_fn_with_state

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "4"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "2048"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "16"))
    t_blk = int(os.environ.get("ONEBIT_KV_TBLK", "512"))
    config = BitLlamaConfig.named(size)
    L = config.num_hidden_layers
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    q0 = jax.device_put(jnp.ones((batch, nh, hd), jnp.bfloat16) * 0.01)
    lengths = jnp.full((batch,), max_len, jnp.int32)
    shape = (L, batch, max_len, nkv, hd)
    sshape = (L, batch, max_len, nkv)
    cache = jax.device_put((jnp.ones(shape, jnp.int8),
                            jnp.ones(sshape, jnp.float32) * 0.01,
                            jnp.ones(shape, jnp.int8),
                            jnp.ones(sshape, jnp.float32) * 0.01))
    jax.block_until_ready(cache)

    def kernel_loop(c, q):
        k_q, k_s, v_q, v_s = c

        def body(i, acc):
            ctx = kv_attention_decode(q, k_q, k_s, v_q, v_s, lengths, i,
                                      inv_scale=1.0, t_blk=t_blk)
            return acc + ctx.astype(jnp.float32)
        out = jax.lax.fori_loop(0, L, body,
                                jnp.zeros((batch, nh, hd), jnp.float32))
        return (q + out[:, :, :1].mean() * 0).astype(q.dtype)

    def xla_loop(c, q):
        k_q, k_s, v_q, v_s = c
        mask = jnp.ones((batch, 1, 1, max_len), bool)

        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            ctx = bitllama._attention_quant(
                q[:, None], pick(k_q), pick(k_s), pick(v_q), pick(v_s),
                mask, num_kv_groups=nh // nkv)[:, 0]
            return acc + ctx.astype(jnp.float32)
        out = jax.lax.fori_loop(0, L, body,
                                jnp.zeros((batch, nh, hd), jnp.float32))
        return (q + out[:, :, :1].mean() * 0).astype(q.dtype)

    def kt_loop(c, q):
        from onebit_tpu.kernels.kv_attention import kv_attention_decode_kt
        k_qt, k_st, v_q, v_s = c

        def body(i, acc):
            ctx = kv_attention_decode_kt(q, k_qt, k_st, v_q, v_s, lengths,
                                         i, inv_scale=1.0, t_blk=t_blk)
            return acc + ctx.astype(jnp.float32)
        out = jax.lax.fori_loop(0, L, body,
                                jnp.zeros((batch, nh, hd), jnp.float32))
        return (q + out[:, :, :1].mean() * 0).astype(q.dtype)

    if os.environ.get("ONEBIT_KV_VARIANT", "kt") == "kt":
        kt_cache = jax.device_put((
            jnp.ones((L, batch, nkv, hd, max_len), jnp.int8),
            jnp.ones((L, batch, nkv, max_len), jnp.float32) * 0.01,
            cache[2], cache[3]))
        jax.block_until_ready(kt_cache)
        _log("kernel-kt")
        try:
            sec = bench_fn_with_state(kt_loop, q0, iters_lo=0,
                                      iters_hi=iters, reps=3,
                                      const=kt_cache)
            print(f"kernel-kt: {sec*1e3:.2f} ms  (attention-only, {L} "
                  f"layers, b={batch} T={max_len}, t_blk={t_blk})",
                  flush=True)
        except Exception as e:
            print(f"kernel-kt: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        del kt_cache

    cases = (("kernel", kernel_loop), ("xla   ", xla_loop))
    if os.environ.get("ONEBIT_KV_SKIP_V1"):
        cases = ()
    for name, fn in cases:
        _log(name)
        try:
            sec = bench_fn_with_state(fn, q0, iters_lo=0, iters_hi=iters,
                                      reps=3, const=cache)
            print(f"{name}: {sec*1e3:.2f} ms  (attention-only, {L} layers, "
                  f"b={batch} T={max_len}, t_blk={t_blk})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
