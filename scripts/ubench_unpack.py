"""Microbenchmark: unpack-strategy shootout for the small-M (decode) kernel.

Each variant computes LayerNorm(((x*g) . sign(W)^T) * h) at decode batch
sizes from int32-packed sign words, with a different device bit layout and
in-VMEM materialization strategy:

* current   : round-1 bitplane layout, 32 plane stores of +-1 bf16
              (3 ops + int->bf16 convert per element).
* pair      : pair-plane layout, 16 iterations; two bf16 +-1 built per
              32-bit lane via (w << (15-q)) & 0x80008000 | 0x3F803F80
              then sublane bitcast (3 ops / 2 elements).
* b01_i8    : byte-plane layout, 8 iterations; raw 0/1 bits as int8 via
              (w >> p) & 0x01010101 (2 ops / 4 elements); activations
              quantized per-row to int8; int8 MXU dot; epilogue
              y = (sum(xq) - 2u) * h then LN (activation scale and the
              1-2b correction both cancel/fold into the epilogue).
* b01_mixed : same 0/1 int8 bits, but mixed bf16 x int8 dot (exact bf16
              activations, no quantization), epilogue S - 2u.
* sgn_mixed : byte-plane +-1 int8 (4 ops / 4 elements), mixed bf16 dot.
* fp8       : byte-plane sign bits ORed into e4m3 +-1 (3 ops / 4
              elements), e4m3 x e4m3 dot with per-row-scaled activations
              (scale cancels in LN).

Run on TPU: python scripts/ubench_unpack.py
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from onebit_tpu.utils.benchmark import bench_op  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

EPS = 1e-5
M = int(__import__("os").environ.get("UB_M", "8"))


# ---------------------------------------------------------------------------
# pack layouts (numpy; layout chosen to invert Mosaic's sublane bitcast order)
# ---------------------------------------------------------------------------

def pack_bitplane_t(w):
    """Round-1 layout but transposed: words [K/32, N]; bit b of word i =
    element b*(K/32) + i. (for the `current` variant, K-major)"""
    n, k = w.shape
    bits = (w < 0).astype(np.uint32).T  # [K, N]
    nw = k // 32
    b = bits.reshape(32, nw, n)  # col j = b*nw + i
    sh = np.arange(32, dtype=np.uint32)[:, None, None]
    return (b << sh).sum(0, dtype=np.uint32).astype(np.int32)  # [K/32, N]


def pack_pairplane_t(w):
    """words [K/32, N]; bit (16c + q) of word i = element q*(K/16) + 2i + c."""
    n, k = w.shape
    bits = (w < 0).astype(np.uint32).T  # [K, N]
    b = bits.reshape(16, k // 32, 2, n)  # [q, i, c, n]
    q = np.arange(16, dtype=np.uint32)[:, None, None, None]
    c = np.arange(2, dtype=np.uint32)[None, None, :, None]
    return (b << (16 * c + q)).sum((0, 2), dtype=np.uint32).astype(np.int32)


def pack_byteplane_t(w):
    """words [K/32, N]; bit (8c + p) of word i = element p*(K/8) + 4i + c."""
    n, k = w.shape
    bits = (w < 0).astype(np.uint32).T  # [K, N]
    b = bits.reshape(8, k // 32, 4, n)  # [p, i, c, n]
    p = np.arange(8, dtype=np.uint32)[:, None, None, None]
    c = np.arange(4, dtype=np.uint32)[None, None, :, None]
    return (b << (8 * c + p)).sum((0, 2), dtype=np.uint32).astype(np.int32)


# ---------------------------------------------------------------------------
# kernels: grid over n tiles, acc [M, N] VMEM scratch, LN epilogue at last
# ---------------------------------------------------------------------------

def _epilogue(acc, h_all, out_ref, extra=None):
    a = acc * h_all
    mean = jnp.mean(a, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(a - mean), axis=1, keepdims=True)
    out_ref[:] = ((a - mean) * jax.lax.rsqrt(var + EPS)).astype(out_ref.dtype)


def _k_current(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, y_ref, s_ref,
               *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g_ref[:]

    w = w_ref[:]  # [K/32, TN] int32 (K-major transposed bitplane)
    for b in range(32):
        plane = (((w << (31 - b)) >> 31) | 1)
        s_ref[pl.ds(b * nw, nw), :] = plane.astype(s_ref.dtype)
    z = jax.lax.dot_general(y_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


def _k_pair(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, y_ref, s_ref,
            *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g_ref[:]

    w = pltpu.bitcast(w_ref[:], jnp.uint32)
    hi = jnp.uint32(0x80008000)
    one = jnp.uint32(0x3F803F80)
    for q in range(16):
        t = ((w << (15 - q)) & hi) | one
        s_ref[pl.ds(q * 2 * nw, 2 * nw), :] = pltpu.bitcast(t, jnp.bfloat16)
    z = jax.lax.dot_general(y_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


def _unpack_b01(w_u32, s_ref, nw):
    msk = jnp.uint32(0x01010101)
    for p in range(8):
        t = (w_u32 >> p) & msk
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)


def _k_b01_i8(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, xq_ref, s_ref,
              *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y = (x_ref[:] * g_ref[:]).astype(jnp.float32)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        scale = 127.0 / jnp.maximum(amax, 1e-30)
        xq_ref[:] = jnp.round(y * scale).astype(jnp.int8)

    _unpack_b01(pltpu.bitcast(w_ref[:], jnp.uint32), s_ref, nw)
    u = jax.lax.dot_general(xq_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sq = jnp.sum(xq_ref[:].astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:, pl.ds(ni * tn, tn)] = (
        (sq - 2 * u).astype(jnp.float32) * h_ref[:])

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


def h_ref_all(h_ref):
    return h_ref[:]


def _k_b01_mixed(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, y_ref, s_ref,
                 *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g_ref[:]

    _unpack_b01(pltpu.bitcast(w_ref[:], jnp.uint32), s_ref, nw)
    u = jax.lax.dot_general(y_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.sum(y_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:, pl.ds(ni * tn, tn)] = (s - 2.0 * u) * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


def _k_sgn_mixed(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, y_ref, s_ref,
                 *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g_ref[:]

    w = pltpu.bitcast(w_ref[:], jnp.uint32)
    msk = jnp.uint32(0x01010101)
    ones = jnp.uint32(0x01010101)
    for p in range(8):
        bits = (w >> p) & msk
        # byte = 1 + 254*b = 0x01 (b=0) / 0xFF = -1 (b=1); no cross-byte carry
        t = ones + bits * jnp.uint32(0xFE)
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)
    z = jax.lax.dot_general(y_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


def _k_fp8(x_ref, g_ref, w_ref, h_ref, out_ref, acc_ref, xq_ref, s_ref,
           *, tn, k):
    ni = pl.program_id(0)
    nw = k // 32

    @pl.when(ni == 0)
    def _():
        y = (x_ref[:] * g_ref[:]).astype(jnp.float32)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        scale = 256.0 / jnp.maximum(amax, 1e-30)  # map into +-256 (e4m3 ~448)
        xq_ref[:] = (y * scale).astype(jnp.float8_e4m3fn)

    w = pltpu.bitcast(w_ref[:], jnp.uint32)
    sgn = jnp.uint32(0x80808080)
    onef8 = jnp.uint32(0x38383838)  # e4m3 +1.0 in each byte
    for p in range(8):
        t = ((w << (7 - p)) & sgn) | onef8
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(
            t, jnp.float8_e4m3fn)
    u = jax.lax.dot_general(xq_ref[:], s_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[:, pl.ds(ni * tn, tn)] = u * h_ref[:]

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        _epilogue(acc_ref[:], 1.0, out_ref)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

VARIANTS = {
    "current":   (pack_bitplane_t, _k_current, jnp.bfloat16, 16),
    "pair":      (pack_pairplane_t, _k_pair, jnp.bfloat16, 16),
    "b01_i8":    (pack_byteplane_t, _k_b01_i8, jnp.int8, 32),
    "b01_mixed": (pack_byteplane_t, _k_b01_mixed, jnp.int8, 16),
    "sgn_mixed": (pack_byteplane_t, _k_sgn_mixed, jnp.int8, 16),
    "fp8":       (pack_byteplane_t, _k_fp8, jnp.float8_e4m3fn, 32),
}


def make_call(name, n, k, tn=256):
    pack_fn, kern, sdtype, m_align = VARIANTS[name]
    m_pad = max(M, m_align) if M % m_align else M
    m_pad = ((M + m_align - 1) // m_align) * m_align
    x_dtype = jnp.bfloat16
    xq_shape = ((m_pad, k), jnp.int8) if name == "b01_i8" else (
        ((m_pad, k), jnp.float8_e4m3fn) if name == "fp8"
        else ((m_pad, k), x_dtype))
    kernel = functools.partial(kern, tn=tn, k=k)

    @jax.jit
    def call(x, packed, g, h):
        x2 = jnp.pad(x, ((0, m_pad - M), (0, 0))).astype(x_dtype)
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((m_pad, k), lambda ni: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda ni: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 32, tn), lambda ni: (0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda ni: (0, ni),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, n), lambda ni: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((m_pad, n), jnp.float32),
                pltpu.VMEM(*xq_shape),
                pltpu.VMEM((k, tn), sdtype),
            ],
        )(x2, g.reshape(1, k).astype(x_dtype), packed,
          h.reshape(1, n).astype(jnp.float32))[:M]

    return call


def reference(x, wsign, g, h):
    y = (x.astype(jnp.float32) * g) @ wsign.T.astype(jnp.float32)
    a = y * h
    mean = a.mean(1, keepdims=True)
    var = ((a - mean) ** 2).mean(1, keepdims=True)
    return (a - mean) / np.sqrt(var + EPS)


def make_repo_call(n, k):
    """The committed kernel (K-major device layout) as the baseline."""
    from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_pallas

    @jax.jit
    def call(x, packed, g, h):
        return bitlinear_packed_pallas(x, packed, g, h)
    return call


def main():
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (11008, 4096), (4096, 11008)]
    per_layer = {"4096x4096": 4, "11008x4096": 2, "4096x11008": 1}
    results = {v: {} for v in VARIANTS}

    for n, k in shapes:
        wsign = np.where(rng.standard_normal((n, k)) < 0, -1.0, 1.0)
        g = rng.standard_normal(k).astype(np.float32) * 0.1 + 1.0
        h = rng.standard_normal(n).astype(np.float32) * 0.1 + 1.0
        x = (rng.standard_normal((M, k)) * 0.5).astype(np.float32)
        ref = reference(x, wsign, g, h)
        xb = jnp.asarray(x, jnp.bfloat16)
        gj, hj = jnp.asarray(g), jnp.asarray(h)

        # the committed kernel as baseline
        from onebit_tpu.core.packing import pack_signs_device
        packed_repo = pack_signs_device(jnp.asarray(wsign))
        call_repo = make_repo_call(n, k)
        out = np.asarray(call_repo(xb, packed_repo, gj, hj))
        err = np.abs(out - ref).max()
        t = bench_op(call_repo, xb, packed_repo, gj, hj,
                     iters_lo=8, iters_hi=64, reps=3)
        results.setdefault("repo", {})[f"{n}x{k}"] = (t, err)
        print(f"{'repo':10s} {n}x{k}: {t*1e6:9.1f} us  max_err {err:.4f}",
              flush=True)

        for name in VARIANTS:
            pack_fn = VARIANTS[name][0]
            packed = jnp.asarray(pack_fn(wsign))
            tn = 256 if k <= 4096 else 128
            try:
                call = make_call(name, n, k, tn=tn)
                out = np.asarray(call(xb, packed, gj, hj))
                err = np.abs(out - ref).max()
                t = bench_op(call, xb, packed, gj, hj,
                             iters_lo=8, iters_hi=64, reps=3)
                results[name][f"{n}x{k}"] = (t, err)
                print(f"{name:10s} {n}x{k}: {t*1e6:9.1f} us  max_err {err:.4f}",
                      flush=True)
            except Exception as e:
                print(f"{name:10s} {n}x{k}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                results[name][f"{n}x{k}"] = (float("inf"), float("nan"))

    print("\n--- projected 7B decode-step linear time (32 layers) ---")
    for name, r in results.items():
        tot = 32 * sum(per_layer[s] * r[s][0] for s in r) * 1e3
        print(f"{name:10s}: {tot:7.2f} ms -> {M / (tot/1e3):7.0f} tok/s "
              f"(linears only)")


if __name__ == "__main__":
    main()
