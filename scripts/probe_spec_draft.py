"""Speculative-round cost with a CHEAP sliced draft at 7B geometry.

PERF.md's earlier number (312 tok/s self-draft) measured the machinery
ceiling with a FULL-size draft through the engine (6 dispatches + host
sync per round).  This probe measures the DEVICE cost of one speculative
round (engine/speculative.spec_decode_round) with a 2-layer draft built by
the train/draft.py recipe, scan-chained in one program (marginal-cost
methodology, utils/benchmark).  Throughput is then
``B * (1 + E[a]) / t_round`` — reported for the whole acceptance range,
since E[a] depends on the distilled draft's quality, which random weights
cannot exhibit.

Env: ONEBIT_BENCH_SIZE (llama2-7b), ONEBIT_SPEC_BATCH (8),
ONEBIT_SPEC_NDRAFT (4), ONEBIT_SPEC_LAYERS (2), ONEBIT_SPEC_MAXLEN (256).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.model.bitllama import fuse_for_decode, init_kv_cache  # noqa
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.model.ragged_decode import ragged_decode_step  # noqa
from onebit_tpu.engine.speculative import spec_decode_round  # noqa
from onebit_tpu.train.draft import build_draft  # noqa
from onebit_tpu.utils.benchmark import bench_fn_with_state  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    b = int(os.environ.get("ONEBIT_SPEC_BATCH", "8"))
    n_draft = int(os.environ.get("ONEBIT_SPEC_NDRAFT", "4"))
    d_layers = int(os.environ.get("ONEBIT_SPEC_LAYERS", "2"))
    max_len = int(os.environ.get("ONEBIT_SPEC_MAXLEN", "256"))

    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)
    d_config, d_params = build_draft(params, config, d_layers)
    params = fuse_for_decode(params, config)
    d_params = fuse_for_decode(d_params, d_config)

    active = jnp.ones((b,), bool)
    budget = jnp.full((b,), 10 ** 6, jnp.int32)

    # -- plain decode step (the bar to beat) --------------------------------
    def plain_step(p, state):
        cache, tok, pos = state
        logits, cache = ragged_decode_step(p, cache, tok[:, None], pos,
                                           active, config, impl="pallas")
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (cache, nxt, pos + 1)

    t_cache = init_kv_cache(config, b, max_len)
    tok0 = jnp.zeros((b,), jnp.int32)
    pos0 = jnp.full((b,), 8, jnp.int32)
    sec_plain = bench_fn_with_state(
        plain_step, (t_cache, tok0, pos0), iters_lo=0, iters_hi=24, reps=3,
        const=params)
    print(f"plain decode: {sec_plain*1e3:7.2f} ms/step "
          f"({b/sec_plain:7.0f} tok/s)", flush=True)

    # -- speculative round with the sliced draft ----------------------------
    def spec_step(ps, state):
        tp, dp = ps
        t_cache, d_cache, tok, pos = state
        emitted, n_emit, new_tok, new_pos, t_cache, d_cache = \
            spec_decode_round(tp, dp, t_cache, d_cache, tok, pos, active,
                              budget, config, d_config, n_draft=n_draft,
                              impl="pallas")
        return (t_cache, d_cache, new_tok, new_pos)

    t_cache = init_kv_cache(config, b, max_len)
    d_cache = init_kv_cache(d_config, b, max_len)
    # random weights accept ~0 proposals → ~1 token/round; size max_len for
    # worst-case full acceptance anyway
    iters = min(24, (max_len - 16) // (n_draft + 1))
    sec = bench_fn_with_state(
        spec_step, (t_cache, d_cache, tok0, pos0), iters_lo=0,
        iters_hi=iters, reps=3, const=(params, d_params))
    print(f"spec round ({d_layers}-layer draft, n={n_draft}): "
          f"{sec*1e3:7.2f} ms/round", flush=True)
    overhead = sec / sec_plain
    print(f"round cost = {overhead:.2f}x a plain step -> break-even "
          f"E[a] = {overhead - 1:.2f} accepted/round", flush=True)
    for a10 in range(0, 10 * n_draft + 1, 10):
        ea = a10 / 10
        tput = b * (1 + ea) / sec
        mark = " <- plain" if abs(ea - (overhead - 1)) < 0.5 else ""
        print(f"  E[a]={ea:3.1f}: {tput:7.0f} tok/s "
              f"({tput*sec_plain/b:4.2f}x plain){mark}", flush=True)


if __name__ == "__main__":
    main()
