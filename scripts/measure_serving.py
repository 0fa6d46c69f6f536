"""End-to-end serving throughput at 7B on one chip (VERDICT r1 item 2).

Drives the continuous-batching engine exactly as a deployment would —
fused decode projections, multi-step device decode blocks, optional paged
INT8 KV — and reports steady-state tokens/s over wall clock, to compare
against the raw decode rate from bench.py (target: >= 0.8x).

Methodology: all requests admitted up front (prefill excluded from the
timed window by warming with a first round), then timed over the decode
phase.  Each decode block is one device program of ``block_steps`` steps,
so per-block host/tunnel overhead is amortized 1/block_steps.

Env: ONEBIT_BENCH_SIZE, ONEBIT_SERVE_BATCH (16), ONEBIT_SERVE_TOKENS (96),
ONEBIT_SERVE_BLOCK (16), ONEBIT_SERVE_PAGED (1), ONEBIT_SERVE_FUSE (1),
ONEBIT_SERVE_PAGE (16), ONEBIT_SERVE_MAXLEN (256).

ONEBIT_SERVE_SPEC=1 measures greedy speculative decoding with the target
as its own draft (random weights give ~zero cross-model acceptance, so
self-draft is the honest machinery ceiling: every round emits
n_draft+1 tokens for one draft-scan + one verify program).
ONEBIT_SERVE_NDRAFT (4) sets the proposals per round.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from onebit_tpu.engine.batching import ContinuousBatchingEngine  # noqa
from onebit_tpu.engine.sampler import SamplingConfig  # noqa
from onebit_tpu.model.config import BitLlamaConfig  # noqa
from onebit_tpu.utils.randinit import host_random_packed_params  # noqa


def run_round(eng, n_req, prompt_len, max_new):
    import numpy as np
    rng = np.random.default_rng(0)
    uids = [eng.add_request(rng.integers(1, 1000, prompt_len).tolist(),
                            max_new_tokens=max_new) for _ in range(n_req)]
    t0 = time.perf_counter()
    ntok_before = eng.total_tokens
    eng.run()
    dt = time.perf_counter() - t0
    ntok = eng.total_tokens - ntok_before
    return ntok, dt, uids


def main():
    size = os.environ.get("ONEBIT_BENCH_SIZE", "llama2-7b")
    batch = int(os.environ.get("ONEBIT_SERVE_BATCH", "16"))
    tokens = int(os.environ.get("ONEBIT_SERVE_TOKENS", "96"))
    block = int(os.environ.get("ONEBIT_SERVE_BLOCK", "16"))
    paged = os.environ.get("ONEBIT_SERVE_PAGED", "1") == "1"
    fuse = os.environ.get("ONEBIT_SERVE_FUSE", "1") == "1"
    spec = os.environ.get("ONEBIT_SERVE_SPEC", "0") == "1"
    n_draft = int(os.environ.get("ONEBIT_SERVE_NDRAFT", "4"))
    page = int(os.environ.get("ONEBIT_SERVE_PAGE", "16"))
    max_len = int(os.environ.get("ONEBIT_SERVE_MAXLEN", "256"))
    # dense quantized-KV engine — the deep-context serving configuration
    # (no paging).  "1"/"int8" = transposed-K int8 fused kernel;
    # "int4" = nibble-packed pools (the 2x-capacity option)
    kvq_env = os.environ.get("ONEBIT_SERVE_KVQ", "0")
    kvq = {"0": False, "1": True, "int8": True, "int4": "int4"}[kvq_env]
    if paged and kvq_env == "int4":
        raise SystemExit("ONEBIT_SERVE_KVQ=int4 requires ONEBIT_SERVE_"
                         "PAGED=0 (int4 pools are dense-engine only; "
                         "paged runs always use int8 pages)")
    prompt_len = int(os.environ.get("ONEBIT_SERVE_PROMPT", "16"))
    pipeline = os.environ.get("ONEBIT_SERVE_PIPELINE", "0") == "1"

    config = BitLlamaConfig.named(size)
    params = host_random_packed_params(config)
    if fuse:
        from onebit_tpu.model.bitllama import fuse_for_decode
        params = fuse_for_decode(params, config)

    if spec:
        eng = ContinuousBatchingEngine(
            params, config, max_batch=batch, max_len=max_len,
            sampling=SamplingConfig(greedy=True), impl="pallas",
            compute_dtype=jnp.bfloat16, draft_params=params,
            draft_config=config, n_draft=n_draft)
        block = f"spec(n={n_draft})"
        paged = False
    else:
        eng = ContinuousBatchingEngine(
            params, config, max_batch=batch, max_len=max_len,
            sampling=SamplingConfig(greedy=True), impl="pallas",
            compute_dtype=jnp.bfloat16, paged=paged,
            quantized_kv=(paged or kvq), page_size=page,
            block_steps=block, pipeline_blocks=pipeline)

    print(f"# warmup round (compiles prefill + decode block)",
          file=sys.stderr, flush=True)
    run_round(eng, batch, min(prompt_len, 16), 8)

    if prompt_len > 64:
        # deep-context mode: report the DECODE rate net of prefill (long
        # prompts would otherwise dominate wall clock) — a 1-token round
        # measures prefill+roundtrip, subtracted from the full round
        print("# prefill-only round", file=sys.stderr, flush=True)
        run_round(eng, batch, prompt_len, 1)        # compile full shapes
        _, dt_p, _ = run_round(eng, batch, prompt_len, 1)
        print("# timed round", file=sys.stderr, flush=True)
        ntok, dt, _ = run_round(eng, batch, prompt_len, tokens)
        rate = (ntok - batch) / max(dt - dt_p, 1e-9)
        print(f"serving decode (net of prefill): {ntok - batch} tokens in "
              f"{dt - dt_p:.2f}s -> {rate:.1f} tok/s "
              f"({size}, batch {batch}, prompt {prompt_len}, block {block}, "
              f"paged={paged}, kvq={kvq or paged}, page={page}, "
              f"fuse={fuse})")
        return

    print(f"# timed round", file=sys.stderr, flush=True)
    ntok, dt, _ = run_round(eng, batch, prompt_len, tokens)
    rate = ntok / dt
    print(f"serving: {ntok} tokens in {dt:.2f}s -> {rate:.1f} tok/s "
          f"({size}, batch {batch}, block {block}, paged={paged}, "
          f"kvq={kvq or paged}, page={page}, fuse={fuse})")


if __name__ == "__main__":
    main()
