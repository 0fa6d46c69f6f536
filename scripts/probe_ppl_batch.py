"""Eval-window throughput: direct vs streaming-chunked CE, batch sweep.

probe_prefill.py found batch-4 full-forward windows WORSE per token than
batch-1, partly from the [B,S,V] fp32 logits (+ log_softmax) the direct
nll path materializes.  This measures the actual ppl hot loop
(eval/ppl._window_nll vs _window_nll_chunked) at 2048-token windows.

Env: ONEBIT_BENCH_SIZE (llama2-7b), ONEBIT_PPL_SEQ (2048),
ONEBIT_PPL_BATCHES (1,4), ONEBIT_PPL_CHUNK (4096), ONEBIT_PPL_DTYPE
(bf16|f32).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.eval.ppl import _window_nll, _window_nll_chunked  # noqa
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    seq = int(os.environ.get("ONEBIT_PPL_SEQ", "2048"))
    batches = [int(b) for b in
               os.environ.get("ONEBIT_PPL_BATCHES", "1,4").split(",")]
    vc = int(os.environ.get("ONEBIT_PPL_CHUNK", "4096"))
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("ONEBIT_PPL_DTYPE", "bf16")]

    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)

    for b in batches:
        for name, fn in (("direct ", None), ("chunked", vc)):
            def step(p, state):
                win, acc = state
                if fn is None:
                    nll = _window_nll(p, win, config, impl="pallas",
                                      compute_dtype=dtype)
                else:
                    nll = _window_nll_chunked(p, win, config, impl="pallas",
                                              compute_dtype=dtype,
                                              vocab_chunk=fn)
                # data dependency: fold the nll back into the window
                w2 = win.at[:, 0].set(nll.astype(jnp.int32) % 17)
                return (w2, acc + jnp.sum(nll))

            win0 = jnp.zeros((b, seq), jnp.int32)
            sec = bench_fn_with_state(step, (win0, jnp.float32(0)),
                                      iters_lo=0, iters_hi=6, reps=3,
                                      const=params)
            print(f"batch {b} {name}: {sec*1e3:8.1f} ms/call "
                  f"({b*seq/sec:7.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
