"""Engine feature-matrix unification: TP × paged × prefix-cache × quant KV,
and speculative × paged.

VERDICT r2 item 1: these combinations were pairwise-excluded in round 2;
now they are the SAME code paths (engine/paged.py cores through the
PagedProj strategy seam), so greedy output must be token-exact against the
single-device dense engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.engine.sampler import SamplingConfig
from onebit_tpu.model.bitllama import init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.parallel.mesh import create_mesh

PROMPTS = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [3, 1, 4, 1, 5]]


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent"))
    return config, params


@pytest.fixture(scope="module")
def want(tiny):
    """Reference output: the single-device DENSE engine, greedy."""
    config, params = tiny
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    uids = [ref.add_request(list(p), max_new_tokens=8) for p in PROMPTS]
    out = ref.run()
    return [out[u] for u in uids]


def _run(engine, prompts=PROMPTS, n_new=8):
    uids = [engine.add_request(list(p), max_new_tokens=n_new)
            for p in prompts]
    out = engine.run()
    return [out[u] for u in uids]


def test_tp_paged_matches_dense(tiny, want):
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8,
                                   tp_mesh=create_mesh((1, 2)))
    assert _run(eng) == want


def test_tp_paged_prefix_cache_matches(tiny, want):
    config, params = tiny
    # shared prefix across requests → cache hits on the TP-sharded pool
    shared = [7, 7, 7, 7, 7, 7, 7, 7, 2]
    config_, params_ = tiny
    ref = ContinuousBatchingEngine(params_, config_, max_batch=2,
                                   max_len=32, compute_dtype=jnp.float32)
    prompts = [shared + [i] for i in range(3)]
    want_shared = _run(ref, prompts)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, prefix_cache=True,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng, prompts)
    assert got == want_shared
    assert eng.prefix_hits > 0          # sharing actually happened


def test_tp_paged_block_matches(tiny, want):
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8, block_steps=4,
                                   tp_mesh=create_mesh((1, 2)))
    assert _run(eng) == want


@pytest.mark.slow
def test_tp_paged_quantized_kv_runs(tiny):
    # int8 pages change numerics (not token-exact vs bf16/f32 by design):
    # assert the TP-quantized engine completes and matches the
    # SINGLE-DEVICE quantized paged engine token-for-token
    config, params = tiny
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8, quantized_kv=True)
    want_q = _run(ref)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8, quantized_kv=True,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng)
    assert [len(g) for g in got] == [len(w) for w in want_q]
    assert got == want_q


def test_tp_paged_warmup(tiny):
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8, prefix_cache=True,
                                   tp_mesh=create_mesh((1, 2)))
    eng.warmup(buckets=[32])
    assert eng.total_tokens == 0 and not eng.has_work()


# ---------------------------------------------------------------------------
# speculative × paged (single-device): the round-2 "paged draft cache not
# implemented" exclusion, lifted — target on pages, draft dense
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_spec_paged_matches_dense(tiny, want):
    config, params = tiny
    draft_config = BitLlamaConfig.named("tiny", num_hidden_layers=1)
    draft = pack_model_params(
        init_params(draft_config, jax.random.PRNGKey(3), mode="latent"))
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=8, draft_params=draft,
                                   draft_config=draft_config, n_draft=2)
    # greedy speculative decoding is token-identical to plain greedy
    # decode for ANY draft — including through the paged verify path
    assert _run(eng) == want


def test_spec_paged_prefix_cache(tiny):
    """spec × paged × prefix-cache: all three compose."""
    config, params = tiny
    draft_config = BitLlamaConfig.named("tiny", num_hidden_layers=1)
    draft = pack_model_params(
        init_params(draft_config, jax.random.PRNGKey(3), mode="latent"))
    shared = [7, 7, 7, 7, 7, 7, 7, 7, 2]
    prompts = [shared + [i] for i in range(3)]
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want_shared = _run(ref, prompts)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, prefix_cache=True,
                                   draft_params=draft,
                                   draft_config=draft_config, n_draft=2)
    got = _run(eng, prompts)
    assert got == want_shared
    assert eng.prefix_hits > 0


def test_paged_verify_window_matches_stepwise(tiny):
    """paged_verify_window logits == W sequential paged_decode_steps."""
    from onebit_tpu.engine.paged import (init_paged_kv_cache,
                                         paged_decode_step,
                                         paged_verify_window)
    config, params = tiny
    b, w, ps = 2, 3, 4
    tables = jnp.asarray(
        np.arange(1, 1 + b * 8, dtype=np.int32).reshape(b, 8))
    lengths = jnp.asarray([5, 2], jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (b, w), 0,
                                config.vocab_size)

    def fresh():
        return init_paged_kv_cache(config, 1 + b * 8, ps,
                                   dtype=jnp.float32)

    # seed both caches with identical prefill-ish content: replay the
    # prompt tokens one at a time through paged_decode_step
    seed = jax.random.randint(jax.random.PRNGKey(8), (b, 6), 0,
                              config.vocab_size)
    cache_a, cache_b = fresh(), fresh()
    for t in range(6):
        pos = jnp.minimum(jnp.full((b,), t, jnp.int32), lengths)
        la, cache_a = paged_decode_step(
            params, cache_a, seed[:, t:t + 1], pos, tables, config,
            impl="xla", compute_dtype=jnp.float32)
        lb, cache_b = paged_decode_step(
            params, cache_b, seed[:, t:t + 1], pos, tables, config,
            impl="xla", compute_dtype=jnp.float32)

    win_logits, _ = paged_verify_window(
        params, cache_a, tokens, lengths, tables, config, impl="xla",
        compute_dtype=jnp.float32)
    step_logits = []
    for i in range(w):
        lg, cache_b = paged_decode_step(
            params, cache_b, tokens[:, i:i + 1], lengths + i, tables,
            config, impl="xla", compute_dtype=jnp.float32)
        step_logits.append(lg[:, 0])
    np.testing.assert_allclose(np.asarray(win_logits),
                               np.stack(step_logits, axis=1),
                               rtol=2e-5, atol=2e-5)
