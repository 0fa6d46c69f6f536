"""Split the flat paged-attention kernel cost: fetch-only vs full.

Same BlockSpec structure as kernels/paged_attention.py but the kernel
body only touches one element per block — isolates the Mosaic pipeline
fetch cost from the attention compute.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.utils.benchmark import bench_op  # noqa


def fetch_only(q, kp, vp, tables, lengths, layer, ppb):
    b, nh, hd = q.shape
    L, P, nkv, ps, _ = kp.shape
    mp = tables.shape[1]
    nb = -(-mp // ppb)

    def kernel(layer_ref, len_ref, tbl_ref, q_ref, *refs):
        page_refs = refs[:2 * ppb]
        o_ref = refs[2 * ppb]
        acc = q_ref[0].astype(jnp.float32)
        for r in page_refs:
            acc = acc + r[0, 0, :, 0, :].astype(jnp.float32)
        o_ref[0] = acc

    def page_spec(j):
        def idx(bb, cc, layer_ref, len_ref, tbl_ref):
            jj = jnp.minimum(cc * ppb + j, mp - 1)
            return (layer_ref[0], tbl_ref[bb * mp + jj], 0, 0, 0)
        return pl.BlockSpec((1, 1, nkv, ps, hd), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, nh, hd), lambda bb, cc, *p: (bb, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = []
    for j in range(ppb):
        in_specs += [page_spec(j), page_spec(j)]
        operands += [kp, vp]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nh, hd), lambda bb, cc, *p: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(lengths, jnp.int32),
      jnp.asarray(tables, jnp.int32).reshape(-1),
      q, *operands)


def main():
    L, nkv, ps, hd = 32, 32, 16, 128
    B, mp = 16, 16
    P = B * mp + 1
    kp = jnp.zeros((L, P, nkv, ps, hd), jnp.bfloat16)
    vp = jnp.zeros((L, P, nkv, ps, hd), jnp.bfloat16)
    q = jnp.ones((B, nkv, hd), jnp.bfloat16)
    tables = (jnp.arange(B * mp, dtype=jnp.int32).reshape(B, mp) + 1)
    lengths = jnp.full((B,), 250, jnp.int32)

    for ppb in (8, 16):
        s = bench_op(
            functools.partial(fetch_only, tables=tables, lengths=lengths,
                              layer=jnp.int32(3), ppb=ppb),
            q, kp, vp, iters_lo=4, iters_hi=32, reps=3, perturb_arg=0)
        print(f"fetch-only ppb={ppb:2d}:  {s*1e3:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
