"""Prefix caching: shared prompt pages reproduce uncached outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.model.bitllama import init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def _run(config, params, prompts, max_new=5, **kw):
    # max_batch=1: admissions are sequential, so later requests can hit
    # pages the earlier ones registered (same-ROUND batched admissions
    # deliberately do not share — registration happens at the batched
    # prefill flush to keep page writes dispatched before any reader)
    eng = ContinuousBatchingEngine(params, config, max_batch=1, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, **kw)
    uids = [eng.add_request(p, max_new_tokens=max_new) for p in prompts]
    out = eng.run()
    return [out[u] for u in uids], eng


def test_shared_prompt_matches_uncached(tiny):
    """Two requests with the SAME 10-token prompt: the second reuses the
    first's full pages and produces identical tokens."""
    config, params = tiny
    prompt = [5, 17, 42, 9, 3, 2, 7, 11, 13, 19]
    ref, _ = _run(config, params, [prompt, prompt])
    got, eng = _run(config, params, [prompt, prompt], prefix_cache=True)
    assert got == ref
    # (plen-1)//ps = 9//4 = 2 full pages reused by the second request
    assert eng.prefix_hits == 2
    assert eng.metrics()["prefix_cache_entries"] == 2


def test_partial_prefix_share(tiny):
    """Prompts sharing only the first page reuse exactly that page."""
    config, params = tiny
    a = [5, 17, 42, 9, 3, 2, 7, 11, 13]
    b = [5, 17, 42, 9, 99, 98, 97, 96, 95]   # diverges in page 1
    ref, _ = _run(config, params, [a, b])
    got, eng = _run(config, params, [a, b], prefix_cache=True)
    assert got == ref
    assert eng.prefix_hits == 1


def test_cache_survives_request_completion(tiny):
    """Pages published to the cache outlive their request; a later
    request still hits them, and refcounts balance at the end."""
    config, params = tiny
    prompt = [5, 17, 42, 9, 3, 2, 7, 11, 13, 19]
    eng = ContinuousBatchingEngine(params, config, max_batch=1, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, prefix_cache=True)
    u1 = eng.add_request(prompt, max_new_tokens=4)
    out1 = eng.run()[u1]
    u2 = eng.add_request(prompt, max_new_tokens=4)
    out2 = eng.run()[u2]
    assert out1 == out2
    assert eng.prefix_hits == 2
    # all request pages released; only the 2 cached pages remain held
    held = len(eng._prefix_map)
    assert len(eng.allocator.free) == eng.total_pages - held
    for page in eng._prefix_map.values():
        assert eng.allocator.refcount[page] == 1


def test_eviction_under_pressure(tiny):
    """When the pool runs short, LRU cache-only pages are evicted and
    admission proceeds instead of deadlocking."""
    config, params = tiny
    # pool sized for ~2 concurrent sequences; distinct prompts fill the
    # cache, then more distinct prompts force eviction
    eng = ContinuousBatchingEngine(params, config, max_batch=1, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, num_pages=9,
                                   prefix_cache=True)
    prompts = [[i, i + 1, i + 2, i + 3, i + 4, i + 5] for i in
               (10, 20, 30, 40)]
    outs = {}
    for p in prompts:
        uid = eng.add_request(p, max_new_tokens=3)
        outs[uid] = eng.run()[uid]
    assert all(len(v) == 3 for v in outs.values())
    # compare against uncached
    ref_eng = ContinuousBatchingEngine(
        params, config, max_batch=1, max_len=32,
        compute_dtype=jnp.float32, paged=True, page_size=4, num_pages=9)
    for p, got in zip(prompts, outs.values()):
        uid = ref_eng.add_request(p, max_new_tokens=3)
        assert ref_eng.run()[uid] == got


def test_hit_pages_survive_eviction_pressure(tiny):
    """Admission pins hit pages BEFORE eviction runs: a cached prefix
    whose owner finished (refcount 1) must not be evicted out from under
    the request that is hitting it (regression: reproduced KeyError)."""
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=1, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, num_pages=16,
                                   prefix_cache=True)
    prompt_a = [5, 17, 42, 9, 3, 2, 7, 11]      # 2 full pages cached
    u1 = eng.add_request(prompt_a, max_new_tokens=3)
    out1 = eng.run()[u1]
    # a fat request drains most of the pool, forcing eviction pressure
    u2 = eng.add_request(list(range(100, 124)), max_new_tokens=8)
    eng.run()
    # re-send A's prompt: its cached pages are refcount-1 (evictable) at
    # lookup time; the pin must protect them through _evict_prefix
    u3 = eng.add_request(prompt_a, max_new_tokens=3)
    out3 = eng.run()[u3]
    assert out3 == out1


def test_same_round_duplicates_share_via_round_deferral(tiny):
    """Identical prompts submitted together (max_batch >= 2): the second
    defers one scheduler round, then HITS the first one's registered
    pages instead of duplicating prefill + pool space."""
    config, params = tiny
    prompt = [5, 17, 42, 9, 3, 2, 7, 11, 13, 19]
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, prefix_cache=True)
    uids = [eng.add_request(prompt, max_new_tokens=5) for _ in range(2)]
    out = eng.run()
    assert out[uids[0]] == out[uids[1]]
    assert eng.prefix_hits == 2      # (plen-1)//ps pages reused

    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4)
    ruids = [ref.add_request(prompt, max_new_tokens=5) for _ in range(2)]
    rout = ref.run()
    assert out[uids[0]] == rout[ruids[0]]
