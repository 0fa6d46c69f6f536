"""Prefill/eval throughput breakdown at 7B (large-M kernel frontier).

Times the full-sequence forward (the ppl-eval hot loop) at 2048-token
windows and locates the gap to the MXU roofline (~135 ms of projection
FLOPs per window at v5e peak).

Env: ONEBIT_BENCH_SIZE, ONEBIT_PREFILL_BATCH (1), ONEBIT_PREFILL_SEQ
(2048), ONEBIT_PROBE_WHICH (csv of legs).
  1 forward (flash attention)
  2 forward (einsum attention)
  4 batch 4 (amortization)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def main():
    from onebit_tpu.model.bitllama import forward

    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_PREFILL_BATCH", "1"))
    seq = int(os.environ.get("ONEBIT_PREFILL_SEQ", "2048"))
    which = set(os.environ.get("ONEBIT_PROBE_WHICH", "1,2,4").split(","))

    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)

    def run(name, b, **kw):
        ids0 = jnp.zeros((b, seq), jnp.int32)

        def step(p, state):
            ids, acc = state
            logits = forward(p, ids, config, impl="pallas", **kw)
            if isinstance(logits, tuple):
                logits = logits[0]
            # data dependency: next ids derive from the output
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (ids.at[:, 0].set(nxt), acc + 1)

        sec = bench_fn_with_state(step, (ids0, jnp.int32(0)), iters_lo=0,
                                  iters_hi=8, reps=3, const=params)
        print(f"{name}: {sec*1e3:8.1f} ms/window "
              f"({b*seq/sec:7.0f} tok/s)", flush=True)

    if "1" in which:
        run("1 forward flash         ", batch)
    if "2" in which:
        run("2 forward einsum-attn   ", batch, use_flash=False)
    if "4" in which:
        run("4 forward flash batch 4 ", 4)


if __name__ == "__main__":
    main()
