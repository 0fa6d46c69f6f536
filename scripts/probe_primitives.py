"""Probe Mosaic/TPU primitive behavior needed for fast unpack kernels.

Checks (on the real device):
1. pltpu.bitcast semantics: int32 [S, L] -> bfloat16 / int8: output shape and
   element order (which axis expands, interleave order).
2. int8 x int8 dot_general with preferred_element_type=int32 inside pallas.
3. fp8 (e4m3) dot support inside pallas.
Run: python scripts/probe_primitives.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def probe_bitcast(dtype, name):
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], dtype)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    # guess output shapes
    factor = 32 // jnp.dtype(dtype).itemsize // 8
    for shape in [(8 * factor, 128), (8, 128 * factor)]:
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            out = np.asarray(out)
            print(f"bitcast int32->{name}: out shape {shape} OK")
            # find where word (0,1) = 1 landed: halves of value 1
            v = np.asarray(x).view(np.dtype(dtype).str if dtype != jnp.bfloat16
                                   else np.uint16)
            # report out[0:4, 0:4] and out[:, :] location of known pattern
            if dtype == jnp.int8:
                # word value 1 -> bytes (1,0,0,0) little endian
                locs = np.argwhere(out == 1)[:6]
                print("  int8==1 locations (from words 1):", locs.tolist())
                locs3 = np.argwhere(out == 2)[:3]
                print("  int8==2 locations (from words 2):", locs3.tolist())
            else:
                u = out.view(np.uint16)
                locs = np.argwhere(u == 1)[:6]
                print("  lowhalf==1 locations:", locs.tolist())
                locs3 = np.argwhere(u == 2)[:3]
                print("  lowhalf==2 locations:", locs3.tolist())
            return shape
        except Exception as e:
            print(f"bitcast int32->{name} shape {shape} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}")
    return None


def probe_dot(adt, bdt, pref, name):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pref)

    try:
        a = jnp.ones((128, 256), adt)
        b = jnp.ones((256, 128), bdt)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), pref),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        print(f"dot {name}: OK, out[0,0]={out[0, 0]}")
        return True
    except Exception as e:
        print(f"dot {name} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe_bitcast(jnp.bfloat16, "bf16")
    probe_bitcast(jnp.int8, "int8")
    try:
        probe_bitcast(jnp.float8_e4m3fn, "e4m3")
    except Exception as e:
        print("e4m3 bitcast setup failed:", e)
    probe_dot(jnp.int8, jnp.int8, jnp.int32, "int8xint8->int32")
    probe_dot(jnp.bfloat16, jnp.int8, jnp.float32, "bf16xint8->f32")
    probe_dot(jnp.float8_e4m3fn, jnp.float8_e4m3fn, jnp.float32,
              "e4m3xe4m3->f32")
    probe_dot(jnp.bfloat16, jnp.bfloat16, jnp.float32, "bf16xbf16->f32")
