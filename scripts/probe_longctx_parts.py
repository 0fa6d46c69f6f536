"""Where do the deep-context decode milliseconds go? (VERDICT r2 item 4)

Decomposes the 7B ctx-2048 batch-4 INT8-KV decode step (measured 11.87 ms
round 2) into:
  A. full decode_step_flat (reproduction)
  B. attention-only over the int8 cache (all layers) — KV read + softmax
  B2. same but bf16 cache — the cast-materialization control
  B3. int8 attention via MIXED-DTYPE dot_general (bf16 q x s8 cache,
      preferred f32) — does XLA avoid materializing a bf16 copy of the
      2.15 GB cache when we skip the explicit astype?
  C. projections-only (no attention) — the width-invariant unpack floor

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
    from onebit_tpu.model.bitllama import (_project_flat, _project_qkv_flat,
                                           _project_gateup_flat,
                                           decode_step_flat, fuse_for_decode,
                                           init_kv_cache)
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import init_quant_kv_cache
    from onebit_tpu.utils.benchmark import bench_fn_with_state
    from onebit_tpu.utils.randinit import host_random_packed_params

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_BENCH_BATCH", "4"))
    max_len = int(os.environ.get("ONEBIT_BENCH_MAXLEN", "2048"))
    iters = int(os.environ.get("ONEBIT_SCAN_ITERS", "16"))
    config = BitLlamaConfig.named(size)
    L = config.num_hidden_layers
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    _log(f"params ({size}) b={batch} T={max_len}")
    params = fuse_for_decode(host_random_packed_params(config), config)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    ids = jnp.zeros((batch, 1), jnp.int32)

    # ---- A: full step ----
    def make_full(cache0):
        def step(p, state):
            cache, idx = state
            _, cache = decode_step_flat(p, cache, ids, idx, config,
                                        impl="pallas",
                                        compute_dtype=jnp.bfloat16)
            return cache, idx + 1
        return step, (cache0, jnp.int32(max_len - iters - 1))

    _log("A: full int8 step")
    step, state = make_full(init_quant_kv_cache(config, batch, max_len))
    a = bench_fn_with_state(step, state, iters_lo=0, iters_hi=iters, reps=3,
                            const=params)
    print(f"A  full int8 step: {a*1e3:.2f} ms ({batch/a:.0f} tok/s)",
          flush=True)

    # ---- B family: attention-only over the full cache, all layers ----
    q0 = jax.device_put(jnp.ones((batch, 1, nh, hd), jnp.bfloat16) * 0.01)
    mask = jnp.ones((batch, 1, 1, max_len), bool)

    def attn_quant_loop(q, cache):
        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            ctx = bitllama._attention_quant(
                q, pick(cache.k_q), pick(cache.k_s), pick(cache.v_q),
                pick(cache.v_s), mask, num_kv_groups=nh // nkv)
            return acc + ctx.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((batch, 1, nh, hd), jnp.float32))

    def attn_bf16_loop(q, cache):
        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            ctx = bitllama._attention(q, pick(cache.k).astype(q.dtype),
                                      pick(cache.v).astype(q.dtype), mask,
                                      num_kv_groups=nh // nkv)
            return acc + ctx.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((batch, 1, nh, hd), jnp.float32))

    def attn_mixed_loop(q, cache):
        """int8 cache as a DIRECT mixed-dtype dot operand (no astype)."""
        def body(i, acc):
            pick = functools.partial(jax.lax.dynamic_index_in_dim, index=i,
                                     axis=0, keepdims=False)
            k_q, k_s = pick(cache.k_q), pick(cache.k_s)
            v_q, v_s = pick(cache.v_q), pick(cache.v_s)
            b, s, nh_, hd_ = q.shape
            qg = q.reshape(b, s, nkv, nh_ // nkv, hd_)
            # bngh,btnh->bngt as per-n dot_general batches: fold b,n into
            # batch dims; contract hd
            qq = jnp.moveaxis(qg[:, 0], 1, 1)          # [b, nkv, g, hd]
            kk = jnp.moveaxis(k_q, 2, 1)               # [b, nkv, t, hd]
            scores = jax.lax.dot_general(
                qq, kk, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)    # [b, nkv, g, t]
            scores = scores * jnp.moveaxis(k_s, 1, 2)[:, :, None, :]
            scores = scores * (hd_ ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            pv = (probs * jnp.moveaxis(v_s, 1, 2)[:, :, None, :]
                  ).astype(jnp.bfloat16)               # [b, nkv, g, t]
            vv = jnp.moveaxis(v_q, 2, 1)               # [b, nkv, t, hd]
            ctx = jax.lax.dot_general(
                pv, vv, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)    # [b, nkv, g, hd]
            return acc + ctx.reshape(b, 1, nh_, hd_)
        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros((batch, 1, nh, hd), jnp.float32))

    for name, fn, mk in (
            ("B  int8 attn (astype)", attn_quant_loop,
             lambda: init_quant_kv_cache(config, batch, max_len)),
            ("B3 int8 attn (mixed dot)", attn_mixed_loop,
             lambda: init_quant_kv_cache(config, batch, max_len)),
            ("B2 bf16 attn", attn_bf16_loop,
             lambda: init_kv_cache(config, batch, max_len, jnp.bfloat16))):
        _log(name)
        cache = mk()

        def step(c, q):
            out = fn(q, c)
            # carry a data dependency through q so iterations chain
            return (q + out[:, :, :, :1].mean() * 0).astype(q.dtype)

        sec = bench_fn_with_state(step, q0, iters_lo=0, iters_hi=iters,
                                  reps=3, const=cache)
        print(f"{name}: {sec*1e3:.2f} ms", flush=True)
        del cache

    # ---- C: projections only (unpack floor) ----
    hx0 = jax.device_put(jnp.ones((batch, 1, config.hidden_size),
                                  jnp.bfloat16) * 0.01)

    def stepc(p, x):
        layers = p["layers"]

        def body(i, x):
            q, k, v = _project_qkv_flat(x, layers, i, "pallas", nkv * hd)
            attn = _project_flat((q + k + v)[..., :nh * hd], layers,
                                 "o_proj", i, "pallas")
            x = x + attn
            g, u = _project_gateup_flat(x, layers, i, "pallas",
                                        config.intermediate_size)
            return x + _project_flat(jax.nn.silu(g) * u, layers,
                                     "down_proj", i, "pallas")
        return jax.lax.fori_loop(0, L, body, x)

    _log("C: projections only")
    sec = bench_fn_with_state(stepc, hx0, iters_lo=0, iters_hi=iters, reps=3,
                              const=params)
    print(f"C  projections only: {sec*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
