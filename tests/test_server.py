"""HTTP serving front-end: /generate (sync + streaming) and /metrics."""

import http.client
import json

import jax
import jax.numpy as jnp
import pytest

from onebit_tpu.engine.batching import ContinuousBatchingEngine
from onebit_tpu.engine.generate import generate
from onebit_tpu.engine.sampler import SamplingConfig
from onebit_tpu.engine.server import EngineServer
from onebit_tpu.model.bitllama import init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def served():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    engine = ContinuousBatchingEngine(params, config, max_batch=2,
                                      max_len=64,
                                      compute_dtype=jnp.float32)
    server = EngineServer(engine)
    port = server.start()
    yield config, params, port
    server.stop()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_generate_matches_lockstep(served):
    config, params, port = served
    prompt = [5, 17, 42, 9]
    want = generate(params, config, [prompt], max_new_tokens=6,
                    sampling=SamplingConfig(greedy=True),
                    compute_dtype=jnp.float32)[0]
    resp = _post(port, "/generate", {"prompt": prompt,
                                     "max_new_tokens": 6})
    assert resp.status == 200
    got = json.loads(resp.read())
    assert got["tokens"] == want


def test_streaming_tokens(served):
    config, params, port = served
    prompt = [7, 8, 9]
    resp = _post(port, "/generate", {"prompt": prompt,
                                     "max_new_tokens": 5, "stream": True})
    assert resp.status == 200
    chunks = [json.loads(line) for line in
              resp.read().decode().strip().splitlines() if line.strip()]
    final = chunks[-1]
    assert final["done"] is True
    streamed = [c["token"] for c in chunks[:-1]]
    assert streamed == final["tokens"]
    assert 1 <= len(streamed) <= 5

    want = generate(params, config, [prompt], max_new_tokens=5,
                    sampling=SamplingConfig(greedy=True),
                    compute_dtype=jnp.float32)[0]
    assert final["tokens"] == want


def test_concurrent_requests_and_metrics(served):
    import concurrent.futures
    config, params, port = served
    prompts = [[5, 17, 42, 9], [100, 3], [7, 8, 9, 10, 11]]
    want = generate(params, config, prompts, max_new_tokens=4,
                    sampling=SamplingConfig(greedy=True),
                    compute_dtype=jnp.float32)

    def go(p):
        r = _post(port, "/generate", {"prompt": p, "max_new_tokens": 4})
        return json.loads(r.read())["tokens"]

    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        got = list(ex.map(go, prompts))
    assert got == want

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    m = json.loads(conn.getresponse().read())
    assert m["completed_requests"] >= 3
    assert m["total_tokens"] >= 3 * 4
    assert m["queue_depth"] == 0


def test_bad_request(served):
    _, _, port = served
    resp = _post(port, "/generate", {"nonsense": 1})
    assert resp.status == 400
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
