"""Paged KV cache decode == dense-cache decode, with scrambled page tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.paged import (
    PageAllocator,
    init_paged_kv_cache,
    paged_decode_step,
)
from onebit_tpu.model.bitllama import (
    decode_step,
    init_kv_cache,
    init_params,
)
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def test_paged_matches_dense_decode(tiny):
    """Token-by-token decode through pages (non-contiguous page table)
    equals the dense preallocated cache."""
    config, params = tiny
    B, S, ps = 2, 10, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                             config.vocab_size)

    dense = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    paged = init_paged_kv_cache(config, num_pages=16, page_size=ps,
                                dtype=jnp.float32)
    # deliberately scrambled page assignment per row
    alloc = PageAllocator(16)
    tables = np.zeros((B, 4), np.int32)
    order = [alloc.alloc() for _ in range(8)]
    np.random.default_rng(0).shuffle(order)
    tables[0] = order[:4]
    tables[1] = order[4:]
    tables = jnp.asarray(tables)

    for t in range(S):
        dl, dense = decode_step(params, dense, ids[:, t:t + 1], jnp.int32(t),
                                config, compute_dtype=jnp.float32)
        pl_, paged = paged_decode_step(
            params, paged, ids[:, t:t + 1],
            jnp.full((B,), t, jnp.int32), tables, config,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(pl_), np.asarray(dl),
                                   rtol=3e-4, atol=3e-4, err_msg=f"t={t}")


def test_paged_ragged_lengths(tiny):
    """Rows at different lengths decode correctly in one paged step."""
    config, params = tiny
    B, ps = 2, 4
    paged = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                                dtype=jnp.float32)
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    # row 0 gets 3 tokens, row 1 gets 1 token (pad steps masked via lengths)
    prompts = [[5, 6, 7], [9]]
    # feed row-wise token-by-token with per-row lengths
    lengths = [0, 0]
    for t in range(3):
        toks = [prompts[0][t] if t < 3 else 0,
                prompts[1][t] if t < 1 else 0]
        step_lens = jnp.asarray([min(t, 3), min(t, 1)], jnp.int32)
        logits, paged = paged_decode_step(
            params, paged, jnp.asarray([[toks[0]], [toks[1]]]),
            step_lens, tables, config, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_page_allocator():
    a = PageAllocator(5)
    pages = [a.alloc() for _ in range(4)]
    assert 0 not in pages and len(set(pages)) == 4
    with pytest.raises(RuntimeError, match="out of KV pages"):
        a.alloc()
    a.release(pages[:2])
    assert a.alloc() in pages[:2]


def test_paged_engine_matches_dense_engine(tiny):
    """Continuous batching with paged KV == dense-slot engine output."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine

    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3], [7, 8, 9, 10, 11]]

    dense = ContinuousBatchingEngine(params, config, max_batch=2,
                                     max_len=64,
                                     compute_dtype=jnp.float32)
    uids_d = [dense.add_request(p, max_new_tokens=5) for p in prompts]
    out_d = dense.run()

    pg = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                  compute_dtype=jnp.float32, paged=True,
                                  page_size=4)
    uids_p = [pg.add_request(p, max_new_tokens=5) for p in prompts]
    out_p = pg.run()
    for ud, up in zip(uids_d, uids_p):
        assert out_d[ud] == out_p[up], (out_d[ud], out_p[up])
    # all pages returned to the pool
    assert len(pg.allocator.free) == pg.cache.num_pages - 1


def test_quantized_pages_close_to_float(tiny):
    """INT8 pages track float pages closely (top-1 agreement)."""
    config, params = tiny
    B, S, ps = 2, 8, 4
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0,
                             config.vocab_size)
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    fp = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                             dtype=jnp.float32)
    q8 = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                             quantized=True)
    for t in range(S):
        lens = jnp.full((B,), t, jnp.int32)
        lf, fp = paged_decode_step(params, fp, ids[:, t:t + 1], lens,
                                   tables, config,
                                   compute_dtype=jnp.float32)
        lq, q8 = paged_decode_step(params, q8, ids[:, t:t + 1], lens,
                                   tables, config,
                                   compute_dtype=jnp.float32)
        assert (np.asarray(lf[:, 0]).argmax(-1) ==
                np.asarray(lq[:, 0]).argmax(-1)).all(), f"t={t}"
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                                   rtol=0.25, atol=0.25)


def test_quantized_paged_engine(tiny):
    """Engine with quantized pages produces the same greedy tokens."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine

    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3]]
    dense = ContinuousBatchingEngine(params, config, max_batch=2,
                                     max_len=64, compute_dtype=jnp.float32)
    out_d = None
    uids = [dense.add_request(p, max_new_tokens=4) for p in prompts]
    out_d = dense.run()

    q8 = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                  compute_dtype=jnp.float32, paged=True,
                                  page_size=4, quantized_kv=True)
    uids_q = [q8.add_request(p, max_new_tokens=4) for p in prompts]
    out_q = q8.run()
    for ud, uq in zip(uids, uids_q):
        # prefill attention is float in both paths → first sampled token
        # matches exactly; later tokens may diverge from int8 KV rounding
        assert out_q[uq][0] == out_d[ud][0]
        assert len(out_q[uq]) == len(out_d[ud])


def test_paged_chunked_prefill_engine(tiny):
    """Paged engine with chunked prefill matches the dense engine."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine

    config, params = tiny
    prompts = [[5, 17, 42, 9, 3, 2, 7], [100, 3]]
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32)
    uids_r = [ref.add_request(p, max_new_tokens=5) for p in prompts]
    out_r = ref.run()
    chk = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32, paged=True,
                                   page_size=4, prefill_chunk_size=4)
    uids_c = [chk.add_request(p, max_new_tokens=5) for p in prompts]
    out_c = chk.run()
    for ur, uc in zip(uids_r, uids_c):
        assert out_r[ur] == out_c[uc]


def test_paged_engine_with_fused_decode_params(tiny):
    """Paged engine output identical with fuse_for_decode params."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine
    from onebit_tpu.model.bitllama import (fuse_for_decode, init_params,
                                           pack_model_params)
    from onebit_tpu.model.config import BitLlamaConfig

    config = BitLlamaConfig.named("tiny", num_key_value_heads=4)  # MHA
    packed = pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent"))
    fused = fuse_for_decode(packed, config)
    assert "qkv_proj" in fused["layers"]

    prompts = [[5, 17, 42, 9], [100, 3]]
    outs = {}
    for name, p in (("packed", packed), ("fused", fused)):
        eng = ContinuousBatchingEngine(p, config, max_batch=2, max_len=64,
                                       compute_dtype=jnp.float32,
                                       paged=True, page_size=4)
        uids = [eng.add_request(pr, max_new_tokens=5) for pr in prompts]
        got = eng.run()
        outs[name] = [got[u] for u in uids]
    assert outs["packed"] == outs["fused"]


def test_fp8_pages_close_to_float(tiny):
    """FP8 (e4m3 direct-cast) pages track float pages (top-1 agreement)."""
    config, params = tiny
    B, S, ps = 2, 8, 4
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0,
                             config.vocab_size)
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    fp = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                             dtype=jnp.float32)
    f8 = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                             quantized="fp8")
    assert f8.k_pages.dtype == jnp.float8_e4m3fn
    for t in range(S):
        lens = jnp.full((B,), t, jnp.int32)
        lf, fp = paged_decode_step(params, fp, ids[:, t:t + 1], lens,
                                   tables, config,
                                   compute_dtype=jnp.float32)
        l8, f8 = paged_decode_step(params, f8, ids[:, t:t + 1], lens,
                                   tables, config,
                                   compute_dtype=jnp.float32)
        assert (np.asarray(lf[:, 0]).argmax(-1) ==
                np.asarray(l8[:, 0]).argmax(-1)).all(), f"t={t}"
        np.testing.assert_allclose(np.asarray(l8), np.asarray(lf),
                                   rtol=0.35, atol=0.35)


def test_fp8_paged_engine(tiny):
    """End-to-end engine with fp8 pages produces the float engine's greedy
    completions on short prompts."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine
    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3]]
    outs = {}
    for name, qkv in (("float", False), ("fp8", "fp8")):
        eng = ContinuousBatchingEngine(params, config, max_batch=2,
                                       max_len=64,
                                       compute_dtype=jnp.float32,
                                       paged=True, page_size=4,
                                       quantized_kv=qkv)
        uids = [eng.add_request(p, max_new_tokens=4) for p in prompts]
        got = eng.run()
        outs[name] = [got[u] for u in uids]
    assert outs["float"] == outs["fp8"]
