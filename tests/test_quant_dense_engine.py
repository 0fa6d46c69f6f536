"""Dense quantized-KV serving engine (QuantKVCacheKT + fused kernel).

VERDICT r3 item 1: the fused append+attend quantized-KV path must be
reachable through the serving engine — ``ContinuousBatchingEngine(
quantized_kv=True)`` without ``paged`` runs ``ragged_decode_step`` on the
transposed-K int8 pools, routing the per-token hot step through
``kernels.kv_attention.kv_attention_append_kt`` with per-row positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.model.bitllama import decode_step_flat, init_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.kv_cache import (
    init_quant_kv_cache_kt,
    kt_from_quant,
    quantize_kv,
)
from onebit_tpu.model.ragged_decode import prefill_rows, ragged_decode_step


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def test_ragged_step_kt_matches_flat_kt(tiny):
    """All rows at the same position: the ragged KT step (per-row fused
    kernel) equals decode_step_flat on the same KT cache."""
    config, params = tiny
    b, max_len = 2, 128
    cache_r = init_quant_kv_cache_kt(config, b, max_len)
    cache_f = init_quant_kv_cache_kt(config, b, max_len)
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(1, config.vocab_size, (b, 1)), jnp.int32)
    active = jnp.ones(b, bool)
    for step in range(3):
        pos = jnp.full((b,), step, jnp.int32)
        lr, cache_r = ragged_decode_step(params, cache_r, toks, pos, active,
                                         config, compute_dtype=jnp.float32)
        lf, cache_f = decode_step_flat(params, cache_f, toks,
                                       jnp.int32(step), config,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                                   rtol=1e-5, atol=1e-5, err_msg=f"s{step}")
        for a, b_ in zip(cache_r, cache_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        toks = jnp.argmax(lf[:, -1:], -1).astype(jnp.int32)


def test_prefill_rows_kt_pool_contents(tiny):
    """KT prefill writes exactly quantize_kv of what dense prefill writes
    (attention inside the prefill itself stays full precision)."""
    from onebit_tpu.model.bitllama import init_kv_cache
    from onebit_tpu.model.kv_cache import QuantKVCache

    config, params = tiny
    r, s_pad, max_len = 2, 8, 32
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(1, config.vocab_size, (r, s_pad)),
                      jnp.int32)
    lengths = jnp.asarray([8, 5], jnp.int32)
    rows = jnp.asarray([0, 1], jnp.int32)

    dense = init_kv_cache(config, r, max_len, dtype=jnp.float32)
    lg_d, dense = prefill_rows(params, dense, ids, lengths, rows, config,
                               compute_dtype=jnp.float32)
    kt = init_quant_kv_cache_kt(config, r, max_len)
    lg_k, kt = prefill_rows(params, kt, ids, lengths, rows, config,
                            compute_dtype=jnp.float32)
    # prefill logits are identical: both attend the fresh fp K/V
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_d),
                               rtol=1e-5, atol=1e-5)
    # pool contents == quantize_kv of the dense cache (exact int8 match)
    kq, ks = quantize_kv(dense.k[:, :, :s_pad])
    vq, vs = quantize_kv(dense.v[:, :, :s_pad])
    want = kt_from_quant(QuantKVCache(
        k_q=kq, k_s=ks, v_q=vq, v_s=vs))
    np.testing.assert_array_equal(
        np.asarray(kt.k_qt[:, :, :, :, :s_pad]), np.asarray(want.k_qt))
    np.testing.assert_array_equal(
        np.asarray(kt.v_q[:, :, :s_pad]), np.asarray(want.v_q))
    np.testing.assert_allclose(
        np.asarray(kt.k_st[:, :, :, :s_pad]), np.asarray(want.k_st),
        rtol=1e-6)


@pytest.mark.parametrize("max_len", [64, 128])
def test_quant_dense_engine_vs_dense(tiny, max_len):
    """Engine with quantized_kv (no paged) matches the bf16 dense engine
    on the established int8-KV tolerance: first sampled token exact (the
    prefill attends full precision in both), same completion lengths.
    max_len=128 routes decode through the fused append+attend kernel
    (interpret mode on CPU); 64 exercises the XLA fallback."""
    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3]]
    dense = ContinuousBatchingEngine(params, config, max_batch=2,
                                     max_len=max_len,
                                     compute_dtype=jnp.float32)
    uids_d = [dense.add_request(p, max_new_tokens=6) for p in prompts]
    out_d = dense.run()

    q8 = ContinuousBatchingEngine(params, config, max_batch=2,
                                  max_len=max_len,
                                  compute_dtype=jnp.float32,
                                  quantized_kv=True)
    from onebit_tpu.model.kv_cache import QuantKVCacheKT
    assert isinstance(q8.cache, QuantKVCacheKT)
    uids_q = [q8.add_request(p, max_new_tokens=6) for p in prompts]
    out_q = q8.run()
    for ud, uq in zip(uids_d, uids_q):
        assert out_q[uq][0] == out_d[ud][0]
        assert len(out_q[uq]) == len(out_d[ud])


def test_quant_dense_engine_ragged_admission(tiny):
    """Rows admitted at different times (ragged per-row positions through
    the fused kernel) complete with valid tokens; a request that matches
    an already-finished one reproduces its output (cache isolation)."""
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True, seed=3)
    u1 = eng.add_request([5, 17, 42, 9], max_new_tokens=6)
    # stagger: run a couple of steps before admitting the second request
    eng.step()
    eng.step()
    u2 = eng.add_request([100, 3, 7], max_new_tokens=5)
    u3 = eng.add_request([5, 17, 42, 9], max_new_tokens=6)
    while eng.has_work():
        eng.step()
    out = {u: r.generated for u, r in eng.finished.items()}
    assert len(out[u1]) <= 6 and len(out[u2]) <= 5
    assert all(0 <= t < config.vocab_size
               for toks in out.values() for t in toks)
    # identical prompt admitted later → identical greedy output
    assert out[u3] == out[u1]


def test_quant_dense_engine_block_steps(tiny):
    """block_steps > 1 drives ragged_decode_block over the KT cache —
    token-identical to the per-step quant dense engine."""
    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3]]
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True)
    uids_r = [ref.add_request(p, max_new_tokens=6) for p in prompts]
    out_r = ref.run()
    blk = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True, block_steps=3)
    uids_b = [blk.add_request(p, max_new_tokens=6) for p in prompts]
    out_b = blk.run()
    for ur, ub in zip(uids_r, uids_b):
        assert out_b[ub] == out_r[ur]


def test_quant_dense_engine_chunked_prefill(tiny):
    """Chunked prefill into the KT cache is chunk-size invariant: the
    same quantized pool state ⇒ token-identical greedy output."""
    config, params = tiny
    prompts = [[5, 17, 42, 9, 3, 2, 7, 11, 13, 1], [100, 3, 8]]
    outs = []
    for chunk in (4, 16):
        eng = ContinuousBatchingEngine(
            params, config, max_batch=2, max_len=64,
            compute_dtype=jnp.float32, quantized_kv=True,
            prefill_chunk_size=chunk)
        uids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
        got = eng.run()
        outs.append([got[u] for u in uids])
    assert outs[0] == outs[1]


def test_quant_dense_engine_speculative(tiny):
    """Speculative decoding over the quantized dense target (verify via
    the scale-folded XLA path, plain decode via the fused kernel) emits
    the plain quant engine's greedy tokens."""
    config, params = tiny
    draft = init_params(config, jax.random.PRNGKey(7), mode="latent")
    prompts = [[5, 17, 42, 9], [100, 3]]
    plain = ContinuousBatchingEngine(params, config, max_batch=2,
                                     max_len=64, compute_dtype=jnp.float32,
                                     quantized_kv=True)
    uids_p = [plain.add_request(p, max_new_tokens=6) for p in prompts]
    out_p = plain.run()
    spec = ContinuousBatchingEngine(
        params, config, max_batch=2, max_len=64, compute_dtype=jnp.float32,
        quantized_kv=True, draft_params=draft, draft_config=config,
        n_draft=3)
    uids_s = [spec.add_request(p, max_new_tokens=6) for p in prompts]
    out_s = spec.run()
    for up, us in zip(uids_p, uids_s):
        assert out_s[us] == out_p[up]


def test_quant_dense_engine_warmup(tiny):
    config, params = tiny
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=64,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True)
    eng.warmup([32])
    assert eng.total_tokens == 0 and not eng.has_work()


def test_quant_dense_engine_validation(tiny):
    config, params = tiny
    with pytest.raises(ValueError, match="fp8"):
        ContinuousBatchingEngine(params, config, quantized_kv="fp8")
    # int4 is non-chunked and non-speculative (engine flag preconditions;
    # TP x int4 IS supported since round 5 — tests/test_tp_engine.py)
    with pytest.raises(ValueError, match="int4"):
        ContinuousBatchingEngine(params, config, quantized_kv="int4",
                                 prefill_chunk_size=4)
    with pytest.raises(ValueError, match="int4"):
        ContinuousBatchingEngine(params, config, quantized_kv="int4",
                                 draft_params=params, draft_config=config)
    # paged pools have no int4 path — must raise, not silently build int8
    # pages (init_paged_kv_cache treats any truthy value as int8)
    with pytest.raises(ValueError, match="int4"):
        ContinuousBatchingEngine(params, config, paged=True,
                                 quantized_kv="int4")


# -- int4 (nibble-packed) engine: the capacity option -----------------------


def test_ragged_step_kt4_matches_flat_kt4(tiny):
    """All rows at the same position: the ragged KT4 step (per-row fused
    kernel + per-row V-nibble RMW) equals decode_step_flat on the same
    int4 cache (VERDICT r4 item 3: kt4 through the engine path)."""
    from onebit_tpu.model.kv_cache import init_quant_kv_cache_kt4

    config, params = tiny
    b, max_len = 2, 256   # % 256 == 0 → the fused kt4 kernel path
    cache_r = init_quant_kv_cache_kt4(config, b, max_len)
    cache_f = init_quant_kv_cache_kt4(config, b, max_len)
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(1, config.vocab_size, (b, 1)), jnp.int32)
    active = jnp.ones(b, bool)
    for step in range(3):
        pos = jnp.full((b,), step, jnp.int32)
        lr, cache_r = ragged_decode_step(params, cache_r, toks, pos, active,
                                         config, compute_dtype=jnp.float32)
        lf, cache_f = decode_step_flat(params, cache_f, toks,
                                       jnp.int32(step), config,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                                   rtol=1e-5, atol=1e-5, err_msg=f"s{step}")
        for a, b_ in zip(cache_r, cache_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        toks = jnp.argmax(lf[:, -1:], -1).astype(jnp.int32)


def test_int4_engine_first_token_and_invariance(tiny):
    """quantized_kv='int4': the first sampled token matches the dense
    engine exactly (prefill attends full precision in both), and the
    greedy output is max_len-invariant — 64 (XLA unpack/repack fallback)
    and 256 (fused kt4 kernel) produce identical tokens."""
    from onebit_tpu.model.kv_cache import QuantKVCacheKT4

    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3]]
    dense = ContinuousBatchingEngine(params, config, max_batch=2,
                                     max_len=64,
                                     compute_dtype=jnp.float32)
    uids_d = [dense.add_request(p, max_new_tokens=6) for p in prompts]
    out_d = dense.run()

    outs = []
    for max_len in (64, 256):
        q4 = ContinuousBatchingEngine(params, config, max_batch=2,
                                      max_len=max_len,
                                      compute_dtype=jnp.float32,
                                      quantized_kv="int4")
        assert isinstance(q4.cache, QuantKVCacheKT4)
        uids = [q4.add_request(p, max_new_tokens=6) for p in prompts]
        got = q4.run()
        outs.append([got[u] for u in uids])
    for (ud, got4) in zip(uids_d, outs[0]):
        assert got4[0] == out_d[ud][0]
        assert len(got4) == len(out_d[ud])
    assert outs[0] == outs[1]


def test_int4_engine_capacity_2x(tiny):
    """The advertised capacity claim: an int4 engine at max_len=2T holds
    its KV pools in the SAME bytes as the int8 engine at T — and actually
    serves a request that needs the doubled context."""
    config, params = tiny
    t = 64
    q8 = ContinuousBatchingEngine(params, config, max_batch=2, max_len=t,
                                  compute_dtype=jnp.float32,
                                  quantized_kv=True)
    q4 = ContinuousBatchingEngine(params, config, max_batch=2,
                                  max_len=2 * t,
                                  compute_dtype=jnp.float32,
                                  quantized_kv="int4")
    val_bytes = lambda c: sum(                                # noqa: E731
        a.nbytes for a in c if a.dtype == jnp.int8)
    assert val_bytes(q4.cache) == val_bytes(q8.cache)
    # a request too long for the int8 engine fits the int4 one
    long_prompt = list(range(1, t + 1))
    with pytest.raises(ValueError, match="max_len"):
        q8.add_request(long_prompt, max_new_tokens=t)
    q4.add_request(long_prompt, max_new_tokens=8)
    out = q4.run()
    assert all(len(v) == 8 for v in out.values())
