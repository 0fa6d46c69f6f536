"""Host-side (numpy) random param generation.

On-device ``jax.random`` init compiles one program per array — minutes of
remote-compile latency through the axon tunnel for a full model.  Benchmarks
and compile checks generate params on host and ``device_put`` instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.model.bitllama import _proj_dims
from onebit_tpu.model.config import BitLlamaConfig


def host_random_packed_params(config: BitLlamaConfig, seed: int = 0,
                              dtype=jnp.bfloat16):
    """Random packed-inference params, generated with numpy."""
    rng = np.random.default_rng(seed)
    L, d, v = (config.num_hidden_layers, config.hidden_size,
               config.vocab_size)

    def f(*shape):
        return jax.device_put(
            (rng.standard_normal(shape) * config.initializer_range)
            .astype(np.float32)).astype(dtype)

    def ones(*shape):
        return jax.device_put(np.ones(shape, np.float32)).astype(dtype)

    params = {
        "embed_tokens": f(v, d), "lm_head": f(v, d),
        "final_norm": ones(d),
        "layers": {
            "input_layernorm": ones(L, d),
            "post_attention_layernorm": ones(L, d),
        },
    }
    for name, (out, inp) in _proj_dims(config).items():
        words = rng.integers(-2 ** 31, 2 ** 31 - 1, (L, inp // 32, out),
                             dtype=np.int64).astype(np.int32)
        params["layers"][name] = BitLinearWeights(
            weight_scale=ones(L, out), input_factor=ones(L, inp),
            packed=jax.device_put(words))
    return params
