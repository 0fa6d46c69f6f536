"""Beam search (engine/beam.py): the HF GenerationMixin beam path.

Oracle tests on a tiny random model: beam=1 must equal greedy decoding,
and a beam wide enough to enumerate every prefix must find the global
maximum-loglikelihood continuation (brute force over all sequences).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.beam import beam_generate
from onebit_tpu.engine.generate import generate
from onebit_tpu.engine.sampler import SamplingConfig
from onebit_tpu.model.bitllama import forward, init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig(
        vocab_size=32, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, eos_token_id=1)
    params = init_params(config, jax.random.PRNGKey(7), mode="packed")
    return config, params


def test_beam1_equals_greedy(tiny):
    config, params = tiny
    prompts = [[5, 9, 3], [7, 2]]
    greedy = generate(params, config, prompts, max_new_tokens=6,
                      sampling=SamplingConfig(greedy=True), eos_id=-1)
    beams = beam_generate(params, config, prompts, num_beams=1,
                          max_new_tokens=6, eos_id=-1, length_penalty=0.0)
    for g, b in zip(greedy, beams):
        assert b[0][0] == g, (b[0][0], g)


def _brute_force_best(params, config, prompt, steps, vocab):
    """Exhaustive max-loglikelihood continuation via full forwards."""
    best, best_ll = None, -np.inf
    for cont in itertools.product(range(vocab), repeat=steps):
        ids = jnp.asarray([list(prompt) + list(cont)], jnp.int32)
        logits = np.asarray(forward(params, ids, config,
                                    compute_dtype=jnp.float32))
        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        ll = sum(float(logp[0, len(prompt) - 1 + i, cont[i]])
                 for i in range(steps))
        if ll > best_ll:
            best, best_ll = list(cont), ll
    return best, best_ll


@pytest.mark.slow
def test_beam_finds_global_optimum(tiny):
    config, params = tiny
    prompt = [5, 9, 3]
    steps, vocab = 3, config.vocab_size
    # beam width >= vocab^(steps-1) makes the search exhaustive
    res = beam_generate(params, config, [prompt], num_beams=vocab,
                        max_new_tokens=steps, eos_id=-1, length_penalty=0.0,
                        compute_dtype=jnp.float32)
    # with lp=0 the penalized score IS the total loglikelihood
    # (len**0 == 1), so compare against brute force
    best, best_ll = _brute_force_best(params, config, prompt, steps, vocab)
    got_toks, got_score = res[0][0]
    # beam = vocab with 2K candidates cannot drop the optimum for steps<=3
    assert got_toks == best or got_score >= best_ll - 1e-4, \
        (got_toks, best, got_score, best_ll)
    assert got_score == pytest.approx(best_ll, abs=2e-3)


def test_beam_eos_truncates_and_scores(tiny):
    config, params = tiny
    res = beam_generate(params, config, [[4, 6]], num_beams=4,
                        max_new_tokens=8, eos_id=1, length_penalty=1.0,
                        num_return_sequences=4)
    for toks, score in res[0]:
        assert 1 <= len(toks) <= 8
        assert np.isfinite(score)
        if 1 in toks:  # truncated AT the eos
            assert toks.index(1) == len(toks) - 1
    # results sorted best-first
    scores = [s for _, s in res[0]]
    assert scores == sorted(scores, reverse=True)


def test_num_return_sequences_validation(tiny):
    config, params = tiny
    with pytest.raises(ValueError):
        beam_generate(params, config, [[1, 2]], num_beams=2,
                      num_return_sequences=3)
