import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.model.bitllama import (
    decode_step,
    forward,
    init_kv_cache,
    init_params,
    pack_model_params,
)
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def test_forward_shapes(tiny):
    config, params = tiny
    ids = jnp.arange(2 * 16).reshape(2, 16) % config.vocab_size
    logits = forward(params, ids, config, compute_dtype=jnp.float32)
    assert logits.shape == (2, 16, config.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_packed_matches_latent_forward(tiny):
    """Packing the sign matrices must not change the forward (signs exact)."""
    config, params = tiny
    packed = pack_model_params(params)
    ids = jnp.arange(2 * 8).reshape(2, 8) % config.vocab_size
    a = forward(params, ids, config, compute_dtype=jnp.float32)
    b = forward(packed, ids, config, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_decode_matches_forward(tiny):
    """Incremental decode with KV cache == full forward, step by step."""
    config, params = tiny
    B, S = 2, 10
    ids = (jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                              config.vocab_size))
    full = forward(params, ids, config, compute_dtype=jnp.float32)

    cache = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    # prefill first 6 tokens in one call, then decode one at a time
    logits_p, cache = decode_step(params, cache, ids[:, :6], jnp.int32(0),
                                  config, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :6]),
                               rtol=2e-4, atol=2e-4)
    for t in range(6, S):
        logits_t, cache = decode_step(params, cache, ids[:, t:t + 1],
                                      jnp.int32(t), config,
                                      compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(full[:, t]),
            rtol=2e-4, atol=2e-4, err_msg=f"step {t}")


def test_padding_mask(tiny):
    """Padded key positions must not influence logits of valid queries."""
    config, params = tiny
    ids_a = jnp.asarray([[5, 6, 7, 8, 0, 0]])
    ids_b = jnp.asarray([[5, 6, 7, 8, 9, 9]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    la = forward(params, ids_a, config, attention_mask=mask,
                 compute_dtype=jnp.float32)
    lb = forward(params, ids_b, config, attention_mask=mask,
                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la[:, :4]), np.asarray(lb[:, :4]),
                               rtol=1e-5, atol=1e-5)


def test_output_hidden_states(tiny):
    config, params = tiny
    ids = jnp.arange(8).reshape(1, 8)
    logits, hs = forward(params, ids, config, compute_dtype=jnp.float32,
                         output_hidden_states=True)
    assert len(hs) == config.num_hidden_layers + 1
    assert hs[0].shape == (1, 8, config.hidden_size)


def test_rope_scaling_configs():
    for rs in ({"type": "linear", "factor": 2.0},
               {"type": "dynamic", "factor": 2.0}):
        config = BitLlamaConfig.named("tiny", rope_scaling=dict(rs))
        params = init_params(config, jax.random.PRNGKey(2), mode="latent")
        ids = jnp.arange(4).reshape(1, 4)
        logits = forward(params, ids, config, compute_dtype=jnp.float32)
        assert bool(jnp.all(jnp.isfinite(logits)))


def test_quantized_kv_cache_decode(tiny):
    """INT8 KV cache decode tracks the full-precision forward closely."""
    from onebit_tpu.model.kv_cache import init_quant_kv_cache

    config, params = tiny
    B, S = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(5), (B, S), 0,
                             config.vocab_size)
    full = forward(params, ids, config, compute_dtype=jnp.float32)

    cache = init_quant_kv_cache(config, B, max_len=16)
    logits_p, cache = decode_step(params, cache, ids[:, :8], jnp.int32(0),
                                  config, compute_dtype=jnp.float32)
    # int8 quantization error: compare softmax-relevant top-1 agreement and
    # close logits
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :8]),
                               rtol=0.2, atol=0.2)
    assert (np.asarray(logits_p[:, -1]).argmax(-1) ==
            np.asarray(full[:, 7]).argmax(-1)).all()
    for t in range(8, S):
        logits_t, cache = decode_step(params, cache, ids[:, t:t + 1],
                                      jnp.int32(t), config,
                                      compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits_t)).all()


def test_left_padding_positions(tiny):
    """Left-padded rows produce the same logits as unpadded (fix: RoPE
    positions derive from the attention-mask cumsum)."""
    config, params = tiny
    ids = jnp.asarray([[7, 8, 9, 10]])
    ref = forward(params, ids, config, compute_dtype=jnp.float32)

    padded = jnp.asarray([[0, 0, 7, 8, 9, 10]])
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1]])
    got = forward(params, padded, config, attention_mask=mask,
                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got[:, 2:]), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
