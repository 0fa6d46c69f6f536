"""Probe: decode-kernel schedule sweep for round 2.

Hypothesis from profile_decode.py: per-grid-step cost dominates the
small-M (decode) kernel — unpack rate scales with the N-tile width
(tn=512: 1.7 Telem/s, 256: 0.9, 128: 0.67).  Sweep:

1. tn up to 4096 (the old 4 MB VMEM cap assumed a bf16 s_ref; it is int8).
2. unpack variant: sgn (±1 int8, 4 VPU ops/4 elem) vs b01 (0/1 bits,
   2 ops/4 elem) with the ``z = rowsum(y) - 2*(y·B)`` epilogue correction.
3. segment-fused shapes (qkv: ns=3, gate+up: ns=2) sharing one unpack.

Run ON THE REAL TPU.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.core.packing import pack_signs_device  # noqa: E402
from onebit_tpu.utils.benchmark import bench_op  # noqa: E402

EPS = 1e-5
M_PAD = 16


def _unpack_sgn(words, s_ref, nw):
    w = pltpu.bitcast(words, jnp.uint32)
    msk = jnp.uint32(0x01010101)
    for p in range(8):
        bits = (w >> p) & msk
        t = msk + bits * jnp.uint32(0xFE)
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)


def _unpack_b01(words, s_ref, nw):
    w = pltpu.bitcast(words, jnp.uint32)
    msk = jnp.uint32(0x01010101)
    for p in range(8):
        bits = (w >> p) & msk
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(bits, jnp.int8)


def _kernel(x_ref, g_ref, packed_ref, h_ref, out_ref, acc_ref, y_ref, s_ref,
            *, tn, k, ns, seg_n, variant):
    """N-grid decode kernel, ns segments of seg_n outputs each.

    y_ref [ns*M_PAD, k] holds x*g_j per segment; each grid step's N-tile
    lies in segment ni*tn // seg_n.
    """
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        for j in range(ns):
            y_ref[pl.ds(j * M_PAD, M_PAD), :] = x_ref[:] * g_ref[j, :][None, :]

    if variant == "sgn":
        _unpack_sgn(packed_ref[:], s_ref, nw)
    else:
        _unpack_b01(packed_ref[:], s_ref, nw)

    seg = ni * tn // seg_n  # traced; segments align with tn grid
    y = y_ref[pl.ds(seg * M_PAD, M_PAD), :]
    z = jax.lax.dot_general(
        y, s_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if variant == "b01":
        rs = jnp.sum(y.astype(jnp.float32), axis=1, keepdims=True)
        z = rs - 2.0 * z
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        # per-segment LN epilogue
        n_all = acc_ref.shape[1]
        outs = []
        for j in range(ns):
            a = acc_ref[:, j * seg_n:(j + 1) * seg_n]
            mean = jnp.mean(a, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(a - mean), axis=1, keepdims=True)
            outs.append((a - mean) * jax.lax.rsqrt(var + EPS))
        out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype) \
            if ns > 1 else outs[0].astype(out_ref.dtype)


def run_case(m, k, seg_n, ns, tn, variant, label):
    n = seg_n * ns
    if n % tn or (tn > seg_n and tn % seg_n) or (tn < seg_n and seg_n % tn):
        return None
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M_PAD, k), jnp.bfloat16)
    w = np.sign(np.random.default_rng(0).standard_normal((n, k))) + 0.0
    packed = jnp.asarray(pack_signs_device(jnp.asarray(w, jnp.float32)))
    g = jnp.ones((ns, k), jnp.bfloat16)
    h = jnp.ones((1, n), jnp.float32)

    kern = functools.partial(_kernel, tn=tn, k=k, ns=ns, seg_n=seg_n,
                             variant=variant)
    fn = pl.pallas_call(
        kern,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((M_PAD, k), lambda ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, k), lambda ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 32, tn), lambda ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_PAD, n), lambda ni: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_PAD, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((M_PAD, n), jnp.float32),
            pltpu.VMEM((ns * M_PAD, k), jnp.bfloat16),
            pltpu.VMEM((k, tn), jnp.int8),
        ],
    )
    jf = jax.jit(lambda x: fn(x, g, packed, h))
    try:
        t = bench_op(jf, x, iters_lo=16, iters_hi=128, reps=3)
    except Exception as e:
        print(f"{label:28s} tn={tn:5d} {variant}: FAIL "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    rate = n * k / t / 1e9
    print(f"{label:28s} tn={tn:5d} {variant}: {t*1e6:8.1f} us "
          f"{rate:8.1f} Gsign/s", flush=True)
    return t


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    shapes = [
        ("q-proj",   4096, 4096, 1),
        ("qkv-fused", 4096, 4096, 3),
        ("gate+up-fused", 4096, 11008, 2),
        ("down", 11008, 4096, 1),
    ]
    best = {}
    for label, k, seg_n, ns in shapes:
        for variant in ("sgn", "b01"):
            for tn in (512, 1024, 2048, 4096, 5504, 11008):
                if tn > seg_n:
                    continue
                if k * tn > 64 * 1024 * 1024:  # s_ref VMEM guard
                    continue
                t = run_case(M_PAD, k, seg_n, ns, tn, variant, label)
                if t is not None:
                    cur = best.get(label)
                    if cur is None or t < cur[0]:
                        best[label] = (t, tn, variant)
    print("\nbest:")
    tot = 0.0
    for label, (t, tn, variant) in best.items():
        print(f"  {label:28s} {t*1e6:8.1f} us  (tn={tn}, {variant})")
    if all(x in best for x in
           ("qkv-fused", "q-proj", "gate+up-fused", "down")):
        per_layer = (best["qkv-fused"][0] + best["q-proj"][0]
                     + best["gate+up-fused"][0] + best["down"][0])
        print(f"\nper-layer (qkv + o + gate/up + down): {per_layer*1e6:.1f} us"
              f" -> x32 = {per_layer*32*1e3:.2f} ms")


if __name__ == "__main__":
    main()
