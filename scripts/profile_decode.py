"""Decode-step time breakdown at LLaMA-2-7B geometry, batch 8.

Attributes the measured full decode-step cost (bench.py) to its parts:
the 7 per-layer bitlinear projections (x32 layers), attention over the KV
cache, and the lm_head matmul.  Also times hypothetical fused-projection
shapes (qkv concat, gate+up concat) to size the win from fewer, larger
kernel calls.

Run ON THE REAL TPU (no JAX_PLATFORMS=cpu).  Serialize with other TPU jobs.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.core.packing import pack_signs_device  # noqa: E402
from onebit_tpu.kernels.bitlinear_pallas import (  # noqa: E402
    bitlinear_packed_pallas)
from onebit_tpu.utils.benchmark import bench_op  # noqa: E402

B = 8
D = 4096
I = 11008
V = 32000
NKV, HD = 32, 128
L = 32
MAXLEN = 256


def bench_bitlinear(m, k, n, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = np.sign(np.random.default_rng(0).standard_normal((n, k))) + 0.0
    packed = jnp.asarray(pack_signs_device(jnp.asarray(w, jnp.float32)))
    g = jnp.ones((k,), jnp.float32)
    h = jnp.ones((n,), jnp.float32)
    fn = jax.jit(lambda x: bitlinear_packed_pallas(x, packed, g, h))
    t = bench_op(fn, x, iters_lo=16, iters_hi=128, reps=3)
    gelem = n * k / t / 1e9
    print(f"{label:22s} [{m:5d},{k:5d}]x[{k:5d},{n:5d}]  {t*1e6:8.1f} us"
          f"   {gelem:7.1f} Gsign/s", flush=True)
    return t


def bench_attn():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, 1, 32, HD), jnp.bfloat16)
    k = jax.random.normal(key, (B, MAXLEN, NKV, HD), jnp.bfloat16)
    v = jax.random.normal(key, (B, MAXLEN, NKV, HD), jnp.bfloat16)
    mask = jnp.ones((B, 1, 1, MAXLEN), bool)
    from onebit_tpu.model.bitllama import _attention
    fn = jax.jit(functools.partial(_attention, num_kv_groups=1))
    t = bench_op(fn, q, k, v, mask, iters_lo=16, iters_hi=128, reps=3)
    print(f"{'attention (ctx 256)':22s} {'':23s}  {t*1e6:8.1f} us", flush=True)
    return t


def bench_lm_head():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, D), jnp.bfloat16)
    w = jax.random.normal(key, (V, D), jnp.bfloat16)
    fn = jax.jit(lambda x: jnp.matmul(x, w.T,
                                      preferred_element_type=jnp.float32))
    t = bench_op(fn, x, iters_lo=16, iters_hi=128, reps=3)
    print(f"{'lm_head bf16':22s} [{B:5d},{D:5d}]x[{D:5d},{V:5d}]"
          f"  {t*1e6:8.1f} us", flush=True)
    return t


def bench_cache_update():
    """dynamic_update_slice + mask cost proxy: one layer's KV append."""
    k = jnp.zeros((B, MAXLEN, NKV, HD), jnp.bfloat16)
    new = jnp.ones((B, 1, NKV, HD), jnp.bfloat16)

    def fn(k):
        return jax.lax.dynamic_update_slice_in_dim(k, new, 7, axis=1)

    t = bench_op(jax.jit(fn), k, iters_lo=16, iters_hi=128, reps=3)
    print(f"{'kv append (1 of k/v)':22s} {'':23s}  {t*1e6:8.1f} us",
          flush=True)
    return t


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    t_qkvo = bench_bitlinear(B, D, D, "q/k/v/o_proj")
    t_gateup = bench_bitlinear(B, D, I, "gate/up_proj")
    t_down = bench_bitlinear(B, I, D, "down_proj")
    t_qkv_f = bench_bitlinear(B, D, 3 * D, "fused qkv")
    t_gu_f = bench_bitlinear(B, D, 2 * I, "fused gate+up")
    t_attn = bench_attn()
    t_lm = bench_lm_head()
    t_kv = bench_cache_update()

    per_layer = 4 * t_qkvo + 2 * t_gateup + t_down
    total = L * (per_layer + t_attn + 2 * t_kv) + t_lm
    per_layer_f = 2 * t_qkvo + t_qkv_f + t_gu_f + t_down
    total_f = L * (per_layer_f + t_attn + 2 * t_kv) + t_lm
    print(f"\nper-layer bitlinear   : {per_layer*1e6:8.1f} us "
          f"(x{L} = {per_layer*L*1e3:.2f} ms)")
    print(f"attention x{L}         : {t_attn*L*1e3:8.2f} ms")
    print(f"kv append x{L}x2       : {2*t_kv*L*1e3:8.2f} ms")
    print(f"lm_head               : {t_lm*1e3:8.2f} ms")
    print(f"SUM (current shapes)  : {total*1e3:8.2f} ms "
          f"-> {B/total:.0f} tok/s")
    print(f"SUM (fused qkv/gu)    : {total_f*1e3:8.2f} ms "
          f"-> {B/total_f:.0f} tok/s")


if __name__ == "__main__":
    main()
