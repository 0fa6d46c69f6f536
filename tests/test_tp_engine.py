"""TP continuous-batching engine == single-device engine, token-exact.

The TP backend (engine/tp_backend.py) swaps the engine's device programs
for shard_map tensor-parallel variants; the host scheduler is unchanged,
so with greedy sampling the generated sequences must match the
single-device engine exactly — including staggered admission (more
requests than slots → ragged per-row positions).
"""

import jax
import jax.numpy as jnp
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.model.bitllama import init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.parallel.mesh import create_mesh

PROMPTS = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [3, 1, 4, 1, 5]]


def _mk():
    config = BitLlamaConfig.named("tiny")
    params = pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent"))
    return config, params


def _run(engine, prompts, n_new=8):
    uids = [engine.add_request(list(p), max_new_tokens=n_new)
            for p in prompts]
    out = engine.run()
    return [out[u] for u in uids]


def test_tp_engine_matches_single_device():
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


def test_tp_engine_block_decode_matches():
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, block_steps=4,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


def test_tp_engine_warmup_mp2():
    config, params = _mk()   # tiny: 4 heads, 2 kv heads → mp=2 max for kv
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   tp_mesh=create_mesh((1, 2)))
    eng.warmup(buckets=[32])
    got = _run(eng, PROMPTS[:2])
    assert all(len(g) >= 1 for g in got)


def test_tp_engine_chunked_prefill_matches():
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   prefill_chunk_size=4,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


def test_tp_engine_rejects_unsupported_combos():
    # the one remaining tp_mesh exclusion: NON-GREEDY speculative
    # (the rejection-sampling round needs gathered target distributions)
    from onebit_tpu.engine.sampler import SamplingConfig
    config, params = _mk()
    mesh = create_mesh((1, 2))
    draft = pack_model_params(
        init_params(BitLlamaConfig.named("tiny", num_hidden_layers=1),
                    jax.random.PRNGKey(1), mode="latent"))
    with pytest.raises(ValueError, match="greedy"):
        ContinuousBatchingEngine(
            params, config, tp_mesh=mesh, draft_params=draft,
            sampling=SamplingConfig(greedy=False, temperature=0.7),
            draft_config=BitLlamaConfig.named("tiny", num_hidden_layers=1))


def test_tp_engine_rejects_indivisible_heads():
    # tiny has 2 kv heads: a model axis of 4 cannot split them
    config, params = _mk()
    with pytest.raises(ValueError, match="heads not divisible"):
        ContinuousBatchingEngine(params, config,
                                 tp_mesh=create_mesh((1, 4)))


def test_tp_engine_speculative_matches():
    """TP x speculative (the last feature-matrix exclusion, lifted):
    greedy spec rounds through the TP program == plain single-device
    greedy engine, token-exact (self-draft: acceptance is high but the
    guarantee holds for ANY draft)."""
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   draft_params=params, draft_config=config,
                                   n_draft=3, tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


@pytest.mark.slow
def test_tp_engine_speculative_paged_matches():
    """TP x paged x speculative: the full stack in one engine."""
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32, paged=True,
                                   draft_params=params, draft_config=config,
                                   n_draft=3, tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


def test_tp_spec_rejects_non_greedy():
    from onebit_tpu.engine.sampler import SamplingConfig
    config, params = _mk()
    with pytest.raises(ValueError, match="greedy"):
        ContinuousBatchingEngine(
            params, config, max_batch=2, max_len=32,
            sampling=SamplingConfig(greedy=False, temperature=1.0),
            draft_params=params, draft_config=config,
            tp_mesh=create_mesh((1, 2)))


# -- TP x dense quantized-KV (round 5: the last engine-matrix exclusion) ----


def test_tp_engine_quant_kv_matches_single_device():
    """TP dense quantized-KV engine == single-device quantized engine,
    token-exact (VERDICT r4 item 2).  max_len=32 routes decode through
    the XLA fallback inside the shard_map body — the sharding proof; the
    kernel-path cell below covers the fused kernel."""
    config, params = _mk()
    from onebit_tpu.model.kv_cache import QuantKVCacheKT
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True,
                                   tp_mesh=create_mesh((1, 2)))
    assert isinstance(eng.cache, QuantKVCacheKT)
    got = _run(eng, PROMPTS)
    assert got == want


def test_tp_engine_quant_kv_kernel_path():
    """max_len=128: the fused append+attend kernel runs (interpret mode)
    INSIDE the shard_map body on nkv/mp local heads — still token-exact
    vs the single-device quantized engine, and block_steps composes."""
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2,
                                   max_len=128, compute_dtype=jnp.float32,
                                   quantized_kv=True)
    want = _run(ref, PROMPTS[:2], n_new=4)
    eng = ContinuousBatchingEngine(params, config, max_batch=2,
                                   max_len=128, compute_dtype=jnp.float32,
                                   quantized_kv=True, block_steps=2,
                                   tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS[:2], n_new=4)
    assert got == want


def test_tp_engine_quant_kv_speculative_matches():
    """TP x speculative x dense quantized-KV: the verify window runs over
    the head-sharded int8 pools — greedy output still token-exact vs the
    plain single-device quantized engine."""
    config, params = _mk()
    ref = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True)
    want = _run(ref, PROMPTS)
    eng = ContinuousBatchingEngine(params, config, max_batch=2, max_len=32,
                                   compute_dtype=jnp.float32,
                                   quantized_kv=True,
                                   draft_params=params, draft_config=config,
                                   n_draft=3, tp_mesh=create_mesh((1, 2)))
    got = _run(eng, PROMPTS)
    assert got == want


@pytest.mark.slow
def test_tp_engine_int4_matches_single_device():
    """TP x int4 (round 5 tail): the nibble-packed pools head-sharded
    over the model axis — token-exact vs the single-device int4 engine
    on both the fallback (max_len 64) and fused-kernel (256) paths."""
    config, params = _mk()
    from onebit_tpu.model.kv_cache import QuantKVCacheKT4
    for max_len in (64, 256):
        ref = ContinuousBatchingEngine(params, config, max_batch=2,
                                       max_len=max_len,
                                       compute_dtype=jnp.float32,
                                       quantized_kv="int4")
        want = _run(ref, PROMPTS[:2], n_new=4)
        eng = ContinuousBatchingEngine(params, config, max_batch=2,
                                       max_len=max_len,
                                       compute_dtype=jnp.float32,
                                       quantized_kv="int4",
                                       tp_mesh=create_mesh((1, 2)))
        assert isinstance(eng.cache, QuantKVCacheKT4)
        got = _run(eng, PROMPTS[:2], n_new=4)
        assert got == want, max_len
