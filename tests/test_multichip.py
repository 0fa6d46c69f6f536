"""Multi-chip simulation on the 8-device virtual CPU mesh.

TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
the same shardings that run on a pod slice compile and execute here.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model.bitllama import forward, init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.parallel.mesh import DATA_AXIS, create_mesh
from onebit_tpu.parallel.sharding import shard_params


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_forward_matches_single_device():
    """TP+DP sharded forward must equal the unsharded forward."""
    config = BitLlamaConfig.named("tiny")
    params = pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent"))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 12), 0,
                             config.vocab_size)
    ref = forward(params, ids, config, compute_dtype=jnp.float32)

    mesh = create_mesh((4, 2))
    sparams = shard_params(params, mesh)
    sids = jax.device_put(ids, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(DATA_AXIS)))
    got = forward(sparams, sids, config, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
