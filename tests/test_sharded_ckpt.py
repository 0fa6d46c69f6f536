"""Sharded checkpoint format (ckpt/sharded.py): save → direct-to-mesh
restore round trip on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.ckpt.sharded import is_sharded_ckpt, load_sharded, save_sharded
from onebit_tpu.model.bitllama import init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module", params=["latent", "packed"])
def tree(request):
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode=request.param)
    if request.param == "packed":
        params = pack_model_params(params)
    return config, params


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_host(tree, tmp_path):
    config, params = tree
    path = str(tmp_path / "ck")
    save_sharded(path, config, params)
    assert is_sharded_ckpt(path)
    out = load_sharded(path)
    assert out["config"] == config
    _assert_trees_equal(out["params"], params)


def test_roundtrip_direct_to_mesh(tree, tmp_path):
    """Restore with a mesh: arrays come back already TP-placed and
    bit-identical."""
    config, params = tree
    path = str(tmp_path / "ck")
    save_sharded(path, config, params)
    mesh = create_mesh((2, 4))
    out = load_sharded(path, mesh=mesh)
    _assert_trees_equal(out["params"], params)
    lm = out["params"]["lm_head"]
    assert not isinstance(lm.sharding, jax.sharding.SingleDeviceSharding)
    # model-axis sharded on the vocab axis per parallel/sharding.py
    assert lm.sharding.spec[0] == "model"


def test_dtype_override(tree, tmp_path):
    config, params = tree
    path = str(tmp_path / "ck")
    save_sharded(path, config, params)
    mesh = create_mesh((2, 4))
    out = load_sharded(path, mesh=mesh, dtype_override=jnp.bfloat16)
    assert out["params"]["embed_tokens"].dtype == jnp.bfloat16
    layers = out["params"]["layers"]
    q = layers["q_proj"]
    if q.packed is not None:
        assert q.packed.dtype == jnp.int32          # ints untouched
    assert q.weight_scale.dtype == jnp.bfloat16


def test_sharded_train_state_roundtrip(tmp_path):
    """Sharded (orbax) train-state save → template-guided restore with
    device placements intact; resume-equivalence with the npz path."""
    from onebit_tpu.train.run_kd import load_train_state, save_train_state
    from onebit_tpu.train.trainer import TrainConfig, init_train_state
    from onebit_tpu.parallel.sharding import shard_params

    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(3), mode="latent")
    mesh = create_mesh((2, 4))
    state = init_train_state(shard_params(params, mesh), TrainConfig())

    p1 = str(tmp_path / "sharded")
    save_train_state(p1, state, sharded=True)
    got = load_train_state(p1, state)
    _assert_trees_equal(got, state)
    assert got.params["lm_head"].sharding == state.params["lm_head"].sharding

    p2 = str(tmp_path / "npz")
    save_train_state(p2, state)             # default npz path still works
    got2 = load_train_state(p2, state)
    _assert_trees_equal(got2, state)
