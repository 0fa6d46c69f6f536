"""Decompose the ragged decode step's non-projection time (round 5).

The headline floor model attributes ~6.9 ms of the 7.62 ms b8 step
(PERF.md "Headline reconciliation"); this probe measures the residual by
ablation: the SAME step body with components removed, scanned with the
marginal methodology.  Each variant stays a realistic program (data
dependencies preserved through the cache carry).

Variants: full | nolmhead | noattn | nonorm | projonly.
Env: ONEBIT_BENCH_SIZE (llama2-7b), ONEBIT_PROBE_BATCH (8),
ONEBIT_PROBE_MAXLEN (256).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model import bitllama  # noqa
from onebit_tpu.model.bitllama import (  # noqa
    _project_flat, _project_gateup_flat, _project_qkv_flat, init_kv_cache)
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.model.rope import apply_rope, rope_cos_sin  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def make_step(config, variant, b, max_len, impl="pallas",
              compute_dtype=jnp.bfloat16):
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    ids = jnp.zeros((b, 1), jnp.int32)
    active = jnp.ones((b,), bool)

    do_attn = variant not in ("noattn", "projonly")
    do_norm = variant not in ("nonorm", "projonly")
    do_lmhead = variant not in ("nolmhead", "projonly")

    def step(params, state):
        cache, pos = state
        layers = params["layers"]
        x = params["embed_tokens"][ids].astype(compute_dtype)
        cos, sin = rope_cos_sin(pos[:, None], hd, config.rope_theta,
                                config.rope_scaling,
                                config.max_position_embeddings,
                                seq_len=max_len, dtype=compute_dtype)
        kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        mask = (kj <= pos[:, None, None, None]) & active[:, None, None,
                                                         None]
        rows = jnp.arange(b)

        def body(i, carry):
            x, k_all, v_all = carry
            residual = x
            if do_norm:
                hx = bitllama.rms_norm(
                    x, jax.lax.dynamic_index_in_dim(
                        layers["input_layernorm"], i, 0, keepdims=False),
                    config.rms_norm_eps)
            else:
                hx = x
            q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
            q = q.reshape(b, 1, nh, hd)
            k = k.reshape(b, 1, nkv, hd)
            v = v.reshape(b, 1, nkv, hd)
            if do_norm:
                q, k = apply_rope(q, k, cos, sin)
            k_all = k_all.at[i, rows, pos].set(k[:, 0].astype(k_all.dtype))
            v_all = v_all.at[i, rows, pos].set(v[:, 0].astype(v_all.dtype))
            if variant == "kattn":
                # fused Pallas decode attention over the bf16 stacked
                # pools (kv_attention_decode, quant=False): streams
                # [T_BLK, nkv, hd] tiles with a scalar-prefetched layer
                # index instead of the XLA masked-einsum path
                from onebit_tpu.kernels.kv_attention import (
                    kv_attention_decode)
                ctx = kv_attention_decode(
                    q[:, 0], k_all, None, v_all, None, pos + 1, i)[:, None]
            elif variant == "pickonly":
                # layer-slice reads without the attention math: isolates
                # the cost of materializing pick(cache, i) per layer
                cv = jax.lax.dynamic_index_in_dim(v_all, i, 0,
                                                  keepdims=False)
                ck = jax.lax.dynamic_index_in_dim(k_all, i, 0,
                                                  keepdims=False)
                red = jnp.mean(cv.astype(q.dtype), axis=1) + \
                    jnp.mean(ck.astype(q.dtype), axis=1)
                ctx = q + red[:, None, :nh]
            elif do_attn:
                ck = jax.lax.dynamic_index_in_dim(k_all, i, 0,
                                                  keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(v_all, i, 0,
                                                  keepdims=False)
                ctx = bitllama._attention(
                    q, ck.astype(q.dtype), cv.astype(q.dtype), mask,
                    num_kv_groups=config.num_kv_groups)
            else:
                ctx = q[:, :, :nh]
            attn_out = _project_flat(ctx.reshape(b, 1, nh * hd), layers,
                                     "o_proj", i, impl)
            x = residual + attn_out
            residual = x
            if do_norm:
                hx = bitllama.rms_norm(
                    x, jax.lax.dynamic_index_in_dim(
                        layers["post_attention_layernorm"], i, 0,
                        keepdims=False), config.rms_norm_eps)
            else:
                hx = x
            gate, up = _project_gateup_flat(hx, layers, i, impl,
                                            config.intermediate_size)
            mlp = _project_flat(jax.nn.silu(gate) * up, layers,
                                "down_proj", i, impl)
            return (residual + mlp, k_all, v_all)

        x, nk, nv = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                      (x, cache.k, cache.v))
        if do_lmhead:
            x = bitllama.rms_norm(x, params["final_norm"],
                                  config.rms_norm_eps)
            out = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                             preferred_element_type=jnp.float32)
        else:
            out = x
        # carry data dependency without sampling
        nxt = jnp.sum(out[:, 0], axis=-1).astype(jnp.int32) % 7
        return (bitllama.KVCache(k=nk, v=nv), pos + 1 + 0 * nxt)

    return step


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    b = int(os.environ.get("ONEBIT_PROBE_BATCH", "8"))
    max_len = int(os.environ.get("ONEBIT_PROBE_MAXLEN", "256"))
    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)
    from onebit_tpu.model.bitllama import fuse_for_decode
    params = fuse_for_decode(params, config)

    variants = os.environ.get(
        "ONEBIT_PROBE_VARIANTS",
        "full,nolmhead,noattn,nonorm,projonly").split(",")
    for variant in variants:
        cache = init_kv_cache(config, b, max_len)
        step = make_step(config, variant, b, max_len)
        import functools
        jstep = jax.jit(functools.partial(step))
        s = bench_fn_with_state(jstep, (cache, jnp.zeros((b,), jnp.int32)),
                                iters_lo=0, iters_hi=32, reps=3,
                                const=params)
        print(f"{variant:9s}: {s*1e3:7.3f} ms/step {b/s:8.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
