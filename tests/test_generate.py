import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.generate import generate
from onebit_tpu.engine.sampler import SamplingConfig, sample_token
from onebit_tpu.model.bitllama import forward, init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def _greedy_reference(params, config, prompt, n):
    """Greedy decode by repeated full forward (no cache) — ground truth."""
    toks = list(prompt)
    out = []
    for _ in range(n):
        logits = np.asarray(forward(params, jnp.asarray(toks)[None], config,
                                    compute_dtype=jnp.float32))
        nxt = int(logits[0, -1].argmax())
        toks.append(nxt)
        out.append(nxt)
        if nxt == config.eos_token_id:
            break
    return out


def test_greedy_matches_full_forward(tiny):
    config, params = tiny
    prompt = [5, 17, 42, 9]
    want = _greedy_reference(params, config, prompt, 8)
    got = generate(params, config, [prompt], max_new_tokens=8,
                   sampling=SamplingConfig(greedy=True),
                   compute_dtype=jnp.float32)[0]
    assert got[:len(want)] == want


def test_ragged_batch_matches_single(tiny):
    """Left-padded ragged batch rows decode identically to solo runs."""
    config, params = tiny
    prompts = [[5, 17, 42, 9], [100, 3], [77, 8, 1, 2, 3, 4, 5]]
    batch = generate(params, config, prompts, max_new_tokens=6,
                     sampling=SamplingConfig(greedy=True),
                     compute_dtype=jnp.float32)
    for p, row in zip(prompts, batch):
        solo = generate(params, config, [p], max_new_tokens=6,
                        sampling=SamplingConfig(greedy=True),
                        compute_dtype=jnp.float32)[0]
        assert row == solo, (p, row, solo)


def test_sampler_top_k():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0]])
    key = jax.random.PRNGKey(0)
    for i in range(5):
        tok = sample_token(logits, jax.random.fold_in(key, i),
                           SamplingConfig(temperature=1.0, top_k=2))
        assert int(tok[0]) in (2, 3)


def test_sampler_top_p():
    # one dominant token: top_p=0.5 keeps only it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    for i in range(5):
        tok = sample_token(logits, jax.random.PRNGKey(i),
                           SamplingConfig(temperature=1.0, top_p=0.5))
        assert int(tok[0]) == 0


def test_sampler_greedy():
    logits = jnp.asarray([[0.1, 5.0, -2.0]])
    tok = sample_token(logits, jax.random.PRNGKey(0),
                       SamplingConfig(greedy=True))
    assert int(tok[0]) == 1
