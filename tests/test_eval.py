import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.eval.loglikelihood import loglikelihood
from onebit_tpu.eval.ppl import perplexity
from onebit_tpu.model.bitllama import forward, init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def test_ppl_uniform_model(tiny):
    """With a zeroed lm_head, logits are uniform → ppl == vocab_size."""
    config, params = tiny
    uniform = dict(params)
    uniform["lm_head"] = jnp.zeros_like(params["lm_head"])
    tokens = np.random.default_rng(0).integers(0, config.vocab_size, 4 * 64)
    ppl = perplexity(uniform, config, tokens, seqlen=64, batch_size=2)
    np.testing.assert_allclose(ppl, config.vocab_size, rtol=1e-4)


def test_ppl_matches_manual(tiny):
    """ppl equals the reference formula computed by hand from logits."""
    config, params = tiny
    seqlen, nsamples = 32, 3
    tokens = np.random.default_rng(1).integers(
        0, config.vocab_size, seqlen * nsamples + 7)  # trailing remainder cut
    got = perplexity(params, config, tokens, seqlen=seqlen, batch_size=2)

    windows = tokens[:nsamples * seqlen].reshape(nsamples, seqlen)
    nll_sum = 0.0
    for w in windows:
        logits = np.asarray(forward(params, jnp.asarray(w)[None], config,
                                    compute_dtype=jnp.float32))[0]
        logp = jax.nn.log_softmax(jnp.asarray(logits[:-1]), axis=-1)
        ll = np.take_along_axis(np.asarray(logp), w[1:, None], axis=-1)[:, 0]
        nll_sum += -ll.mean() * seqlen     # mean over seqlen-1, × seqlen
    want = np.exp(nll_sum / (nsamples * seqlen))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ppl_limit(tiny):
    config, params = tiny
    tokens = np.random.default_rng(2).integers(0, config.vocab_size, 8 * 32)
    a = perplexity(params, config, tokens[:2 * 32], seqlen=32)
    b = perplexity(params, config, tokens, seqlen=32, limit=2)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_loglikelihood_matches_direct(tiny):
    """Batched/bucketed scoring == naive per-request scoring."""
    config, params = tiny
    rng = np.random.default_rng(3)
    reqs = []
    for _ in range(7):
        nc = int(rng.integers(1, 20))
        nk = int(rng.integers(1, 6))
        reqs.append((rng.integers(0, config.vocab_size, nc).tolist(),
                     rng.integers(0, config.vocab_size, nk).tolist()))
    got = loglikelihood(params, config, reqs, batch_size=3)

    for (ctx, cont), (ll, greedy) in zip(reqs, got):
        toks = np.asarray(ctx + cont)
        logits = np.asarray(forward(params, jnp.asarray(toks)[None], config,
                                    compute_dtype=jnp.float32))[0]
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(
            logits[:-1].astype(np.float32)), axis=-1))
        labels = toks[1:]
        pos = np.arange(len(labels))
        cmask = pos >= (len(toks) - len(cont) - 1)
        want_ll = float(np.take_along_axis(
            logp, labels[:, None], axis=-1)[:, 0][cmask].sum())
        want_greedy = bool(np.all(
            (logp.argmax(-1) == labels)[cmask]))
        np.testing.assert_allclose(ll, want_ll, rtol=1e-4, atol=1e-4)
        assert greedy == want_greedy


def test_loglikelihood_empty_context(tiny):
    config, params = tiny
    out = loglikelihood(params, config, [([], [5, 6])], batch_size=2)
    assert np.isfinite(out[0][0])


def test_ppl_chunked_matches_direct(tiny):
    """Streaming vocab-chunked CE (online logsumexp, no [B,S,V] logits)
    equals the direct log_softmax path — including a chunk size that does
    not divide the vocab (pad columns masked out of the lse)."""
    config, params = tiny
    tokens = np.random.default_rng(1).integers(0, config.vocab_size, 4 * 32)
    want = perplexity(params, config, tokens, seqlen=32, batch_size=2)
    for vc in (128, 200, config.vocab_size):
        got = perplexity(params, config, tokens, seqlen=32, batch_size=2,
                         vocab_chunk=vc)
        np.testing.assert_allclose(got, want, rtol=1e-5)
