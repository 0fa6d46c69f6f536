"""Speculative decoding: output must be IDENTICAL to plain greedy decode
for any draft model — the draft changes speed, never tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.engine.sampler import SamplingConfig
from onebit_tpu.model.bitllama import init_kv_cache, init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


@pytest.fixture(scope="module")
def draft():
    # a DIFFERENT tiny model (different seed → frequent rejections)
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(7), mode="latent")
    return config, params


def _plain(params, config, prompts, max_new):
    eng = ContinuousBatchingEngine(params, config, max_batch=4, max_len=64,
                                   compute_dtype=jnp.float32)
    uids = [eng.add_request(p, max_new_tokens=max_new) for p in prompts]
    out = eng.run()
    return [out[u] for u in uids]


def _spec(params, config, dparams, dconfig, prompts, max_new, n_draft):
    eng = ContinuousBatchingEngine(
        params, config, max_batch=4, max_len=64, compute_dtype=jnp.float32,
        draft_params=dparams, draft_config=dconfig, n_draft=n_draft)
    uids = [eng.add_request(p, max_new_tokens=max_new) for p in prompts]
    out = eng.run()
    return [out[u] for u in uids]


def test_spec_equals_plain_greedy(tiny, draft):
    """Mismatching draft: emitted tokens still exactly match plain decode."""
    config, params = tiny
    dconfig, dparams = draft
    prompts = [[5, 17, 42, 9], [100, 3], [7, 8, 9, 10, 11]]
    want = _plain(params, config, prompts, 8)
    got = _spec(params, config, dparams, dconfig, prompts, 8, n_draft=3)
    assert got == want


def test_spec_with_self_draft_full_acceptance(tiny):
    """Draft == target: every proposal accepted, n_draft+1 tokens/round."""
    config, params = tiny
    prompts = [[5, 17, 42, 9]]
    want = _plain(params, config, prompts, 9)
    eng = ContinuousBatchingEngine(
        params, config, max_batch=2, max_len=64, compute_dtype=jnp.float32,
        draft_params=params, draft_config=config, n_draft=2)
    uid = eng.add_request(prompts[0], max_new_tokens=9)
    rounds = 0
    eng._admit()
    while eng.has_work():
        eng.step()
        rounds += 1
    # 9 tokens: 1 from prefill + 8 from spec rounds of 3 → ceil(8/3) = 3
    assert rounds <= 3 + 1
    assert eng.finished[uid].generated == want[0]


def test_spec_respects_budget_and_varied_lengths(tiny, draft):
    """Per-row budgets differ; every row stops exactly at its budget."""
    config, params = tiny
    dconfig, dparams = draft
    eng = ContinuousBatchingEngine(
        params, config, max_batch=4, max_len=64, compute_dtype=jnp.float32,
        draft_params=dparams, draft_config=dconfig, n_draft=4)
    budgets = [1, 5, 2]
    prompts = [[5, 17], [100, 3, 4], [7]]
    uids = [eng.add_request(p, max_new_tokens=b)
            for p, b in zip(prompts, budgets)]
    out = eng.run()
    plain = ContinuousBatchingEngine(params, config, max_batch=4, max_len=64,
                                     compute_dtype=jnp.float32)
    uids_p = [plain.add_request(p, max_new_tokens=b)
              for p, b in zip(prompts, budgets)]
    out_p = plain.run()
    for u, up, b in zip(uids, uids_p, budgets):
        assert len(out[u]) <= b
        assert out[u] == out_p[up]


def test_spec_eos_on_device(tiny, draft):
    """A row whose target emits EOS mid-window stops at the EOS token."""
    config, params = tiny
    dconfig, dparams = draft
    # find a prompt whose greedy continuation contains EOS early, by
    # scanning plain decode outputs; if none, synthesize via config eos
    prompts = [[5, 17, 42, 9]]
    plain = _plain(params, config, prompts, 8)[0]
    got = _spec(params, config, dparams, dconfig, prompts, 8, n_draft=3)[0]
    assert got == plain
    if config.eos_token_id in plain:
        cut = plain.index(config.eos_token_id)
        assert got[cut] == config.eos_token_id
        assert len(got) == cut + 1


def test_spec_warmup(tiny, draft):
    """warmup AOT-compiles the spec round without touching state."""
    config, params = tiny
    dconfig, dparams = draft
    eng = ContinuousBatchingEngine(
        params, config, max_batch=2, max_len=64, compute_dtype=jnp.float32,
        draft_params=dparams, draft_config=dconfig, n_draft=2)
    eng.warmup([32])
    assert eng.total_tokens == 0 and not eng.has_work()


def test_spec_config_validation(tiny):
    config, params = tiny
    with pytest.raises(ValueError, match="draft_config"):
        ContinuousBatchingEngine(params, config, draft_params=params)
    # paged + speculative is ALLOWED: the target verifies on its paged
    # pool (paged_verify_window) while the draft keeps a dense cache
    eng = ContinuousBatchingEngine(params, config, draft_params=params,
                                   draft_config=config, paged=True)
    assert eng.paged and eng.draft_params is not None
    # non-greedy + speculative is ALLOWED: routes through the
    # rejection-sampling round (spec_decode_round_sampled)
    eng = ContinuousBatchingEngine(
        params, config, draft_params=params, draft_config=config,
        sampling=SamplingConfig(greedy=False, temperature=1.0))
    assert eng.draft_params is not None
    with pytest.raises(ValueError, match="block_steps"):
        ContinuousBatchingEngine(params, config, draft_params=params,
                                 draft_config=config, block_steps=4)


def test_verify_window_matches_stepwise(tiny):
    """ragged_verify_window logits == W sequential ragged_decode_steps."""
    from onebit_tpu.model.ragged_decode import (ragged_decode_step,
                                                ragged_verify_window)

    config, params = tiny
    b, w = 2, 3
    tokens = jnp.asarray([[5, 17, 42], [100, 3, 9]], jnp.int32)
    row_pos = jnp.asarray([4, 2], jnp.int32)
    active = jnp.ones(b, bool)

    cache = init_kv_cache(config, b, 32, dtype=jnp.float32)
    # seed the caches with identical pre-existing content
    k0 = jax.random.normal(jax.random.PRNGKey(1), cache.k.shape)
    v0 = jax.random.normal(jax.random.PRNGKey(2), cache.v.shape)
    cache = cache.__class__(k=k0, v=v0)
    cache2 = cache.__class__(k=k0, v=v0)

    win_logits, win_cache = ragged_verify_window(
        params, cache, tokens, row_pos, active, config,
        compute_dtype=jnp.float32)

    step_logits = []
    pos = row_pos
    for i in range(w):
        lg, cache2 = ragged_decode_step(
            params, cache2, tokens[:, i:i + 1], pos, active, config,
            compute_dtype=jnp.float32)
        step_logits.append(lg[:, 0])
        pos = pos + 1
    step_logits = jnp.stack(step_logits, axis=1)

    np.testing.assert_allclose(np.asarray(win_logits),
                               np.asarray(step_logits), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(win_cache.k),
                               np.asarray(cache2.k), rtol=1e-5, atol=1e-5)


def test_sampled_spec_accepts_all_when_draft_is_target(tiny):
    """draft == target => p/q = 1 => every proposal accepted: each round
    emits exactly n_draft+1 tokens (before EOS/budget clamps)."""
    from onebit_tpu.engine.sampler import SamplingConfig
    from onebit_tpu.engine.speculative import spec_decode_round_sampled

    config, params = tiny
    b, n = 3, 4
    cache_t = init_kv_cache(config, b, 64, dtype=jnp.float32)
    cache_d = init_kv_cache(config, b, 64, dtype=jnp.float32)
    tok = jnp.asarray([5, 9, 11], jnp.int32)
    pos = jnp.asarray([2, 1, 3], jnp.int32)
    active = jnp.ones(b, bool)
    budget = jnp.full((b,), 100, jnp.int32)
    sampling = SamplingConfig(temperature=0.9, top_k=0, top_p=1.0)
    emitted, n_emit, new_next, new_pos, _, _, _ = spec_decode_round_sampled(
        params, params, cache_t, cache_d, tok, pos, active, budget,
        jax.random.PRNGKey(0), config, config, n_draft=n,
        sampling=sampling, compute_dtype=jnp.float32)
    n_emit = np.asarray(n_emit)
    emitted = np.asarray(emitted)
    eos = config.eos_token_id
    for r in range(b):
        # full acceptance unless an accepted token IS eos (clamped)
        if eos not in emitted[r, :n_emit[r]]:
            assert n_emit[r] == n + 1, (r, n_emit[r], emitted[r])
    assert (np.asarray(new_pos) == np.asarray(pos) + n_emit).all()


@pytest.mark.slow
def test_sampled_spec_marginal_distribution(tiny):
    """The FIRST token a sampled spec round emits follows the target's
    warped sampling distribution exactly (rejection-sampling guarantee),
    even with an unrelated draft model.  Empirical TV-distance check."""
    from onebit_tpu.engine.sampler import SamplingConfig, warp_logits
    from onebit_tpu.engine.speculative import spec_decode_round_sampled
    from onebit_tpu.model.ragged_decode import ragged_decode_step

    config = BitLlamaConfig.named("tiny", vocab_size=64)
    target = init_params(config, jax.random.PRNGKey(0), mode="latent")
    draft = init_params(config, jax.random.PRNGKey(7), mode="latent")

    b = 64                       # rows share context -> 64 samples/round
    cache_t = init_kv_cache(config, b, 16, dtype=jnp.float32)
    cache_d = init_kv_cache(config, b, 16, dtype=jnp.float32)
    tok = jnp.full((b,), 5, jnp.int32)
    pos = jnp.zeros((b,), jnp.int32)
    active = jnp.ones(b, bool)
    budget = jnp.full((b,), 100, jnp.int32)
    sampling = SamplingConfig(temperature=1.2, top_k=0, top_p=1.0)

    # exact target distribution for the first emitted token
    logits, _ = ragged_decode_step(target, cache_t, tok[:, None], pos,
                                   active, config,
                                   compute_dtype=jnp.float32)
    p_exact = np.asarray(jax.nn.softmax(
        warp_logits(logits[0, 0], sampling)))

    counts = np.zeros(64)
    rounds = 120                 # 7680 samples
    for t in range(rounds):
        emitted, n_emit, *_ = spec_decode_round_sampled(
            target, draft, cache_t, cache_d, tok, pos, active, budget,
            jax.random.PRNGKey(1000 + t), config, config, n_draft=3,
            sampling=sampling, compute_dtype=jnp.float32)
        first = np.asarray(emitted)[:, 0]
        assert (np.asarray(n_emit) >= 1).all()
        np.add.at(counts, first, 1)
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - p_exact).sum()
    # TV noise floor for 7680 samples over 64 tokens is ~0.04
    assert tv < 0.08, f"TV distance {tv:.3f} (expected < 0.08)"


def test_sampled_spec_engine_end_to_end(tiny):
    """Non-greedy speculative engine completes requests with the right
    lengths (distribution exactness is covered above)."""
    config, params = tiny
    draft = init_params(config, jax.random.PRNGKey(3), mode="latent")
    eng = ContinuousBatchingEngine(
        params, config, max_batch=2, max_len=64,
        compute_dtype=jnp.float32, draft_params=draft, draft_config=config,
        n_draft=3, sampling=SamplingConfig(greedy=False, temperature=0.8),
        seed=11)
    uids = [eng.add_request([5, 17, 42], max_new_tokens=7),
            eng.add_request([9, 4], max_new_tokens=5)]
    out = eng.run()
    eos = config.eos_token_id
    for uid, cap in zip(uids, (7, 5)):
        toks = out[uid]
        assert 0 < len(toks) <= cap
        assert all(0 <= t < config.vocab_size for t in toks)
        if len(toks) < cap:
            assert toks[-1] == eos


def test_spec_paged_full_capacity_row(tiny, draft):
    """End-to-end: a row that exactly fills max_len under the paged spec
    engine still matches the plain dense engine token for token."""
    config, params = tiny
    dconfig, dparams = draft
    max_len = 32
    prompt = [5, 17, 42, 9]
    max_new = max_len - len(prompt)          # fills capacity exactly
    want = _plain(params, config, [prompt], max_new)[0]
    eng = ContinuousBatchingEngine(
        params, config, max_batch=2, max_len=max_len,
        compute_dtype=jnp.float32, paged=True, page_size=8,
        draft_params=dparams, draft_config=dconfig, n_draft=3)
    uid = eng.add_request(prompt, max_new_tokens=max_new)
    out = eng.run()
    assert out[uid] == want


def test_verify_window_overshoot_writes_null_page(tiny):
    """ADVICE r3 regression: a verify window whose tail positions run past
    the row's page table must route those writes to the reserved null
    page 0 — clamping them to the last REAL page wraps slot = pos % ps
    and overwrites live K/V the same round attends to."""
    from onebit_tpu.engine.paged import (init_paged_kv_cache,
                                         paged_verify_window)

    config, params = tiny
    ps, n_real = 8, 4                       # capacity 32 positions
    cache = init_paged_kv_cache(config, n_real + 1, ps, dtype=jnp.float32)
    # sentinel-fill every pool slot so any unexpected write is visible
    cache = cache.__class__(*(jnp.full_like(a, 7.0) for a in cache))
    table = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    # W=4 window at length 29 writes positions 29..32; 32 >= capacity
    tokens = jnp.asarray([[5, 17, 42, 9]], jnp.int32)
    _, new_cache = paged_verify_window(
        params, cache, tokens, jnp.asarray([29], jnp.int32), table, config,
        compute_dtype=jnp.float32)
    # positions 29..31 legitimately land in page 4 slots 5..7; slots 0..4
    # of page 4 (positions 24..28) must keep their sentinel values — the
    # pre-fix clamp sent position 32 to page 4 slot 0
    live = np.asarray(new_cache.k_pages[:, 4, :, :5, :])
    np.testing.assert_array_equal(live, np.full_like(live, 7.0))
