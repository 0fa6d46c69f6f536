"""Checkpoint interchange tests: reference HF formats ↔ native pytree."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from onebit_tpu.ckpt.hf_reader import (
    detect_ckpt_kind,
    load_hf_state_dict,
    load_reference_checkpoint,
)
from onebit_tpu.ckpt.writer import (
    export_reference_int8,
    load_native,
    save_native,
)
from onebit_tpu.core.packing import pack_signs_int8_np
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.model.bitllama import forward, init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def _write_reference_torch_ckpt(path, config, kind):
    """Fabricate a reference-layout checkpoint with torch.save."""
    os.makedirs(path, exist_ok=True)
    config.save_json(os.path.join(path, "config.json"))
    rng = np.random.default_rng(0)
    d, i, v = config.hidden_size, config.intermediate_size, config.vocab_size
    kv = config.num_key_value_heads * config.head_dim
    dims = {"q_proj": (d, d), "k_proj": (kv, d), "v_proj": (kv, d),
            "o_proj": (d, d), "gate_proj": (i, d), "up_proj": (i, d),
            "down_proj": (d, i)}
    parent = {"q_proj": "self_attn", "k_proj": "self_attn",
              "v_proj": "self_attn", "o_proj": "self_attn",
              "gate_proj": "mlp", "up_proj": "mlp", "down_proj": "mlp"}
    sd = {
        "model.embed_tokens.weight": torch.randn(v, d),
        "lm_head.weight": torch.randn(v, d),
        "model.norm.weight": torch.ones(d),
    }
    for li in range(config.num_hidden_layers):
        pre = f"model.layers.{li}"
        sd[f"{pre}.input_layernorm.weight"] = torch.ones(d)
        sd[f"{pre}.post_attention_layernorm.weight"] = torch.ones(d)
        for name, (out, inp) in dims.items():
            key = f"{pre}.{parent[name]}.{name}"
            w = rng.standard_normal((out, inp)).astype(np.float32)
            if kind == "llama":
                sd[f"{key}.weight"] = torch.from_numpy(w)
                continue
            sd[f"{key}.weight_scale"] = torch.from_numpy(
                np.abs(rng.standard_normal(out)).astype(np.float32))
            sd[f"{key}.input_factor"] = torch.from_numpy(
                np.abs(rng.standard_normal(inp)).astype(np.float32))
            if kind == "packed":
                sd[f"{key}.weight"] = torch.from_numpy(
                    pack_signs_int8_np(np.sign(w)))
            else:
                sd[f"{key}.weight"] = torch.from_numpy(np.sign(w) * 0.01)
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    return sd


@pytest.mark.parametrize("kind", ["latent", "packed", "llama"])
def test_load_reference_kinds(tmp_path, kind):
    config = BitLlamaConfig.named("tiny")
    sd = _write_reference_torch_ckpt(str(tmp_path), config, kind)
    loaded = load_reference_checkpoint(str(tmp_path))
    assert loaded["kind"] == kind
    params = loaded["params"]
    ids = jnp.arange(8).reshape(1, 8)
    logits = forward(params, ids, loaded["config"],
                     compute_dtype=jnp.float32)
    assert bool(jnp.all(jnp.isfinite(logits)))
    if kind == "llama":
        assert isinstance(params["layers"]["q_proj"], LinearWeights)
    if kind == "packed":
        # packed weights re-packed exactly: sign matrix round-trips
        from onebit_tpu.core.packing import (unpack_signs_device,
                                             unpack_signs_int8_np)
        ref_dense = unpack_signs_int8_np(
            sd["model.layers.0.self_attn.q_proj.weight"].numpy())
        got_dense = np.asarray(unpack_signs_device(
            params["layers"]["q_proj"].packed[0], dtype=jnp.float32))
        np.testing.assert_array_equal(got_dense, ref_dense)


def test_packed_reference_forward_matches_latent(tmp_path, tiny):
    """export to reference int8 → read back → identical forward."""
    config, params = tiny
    packed = pack_model_params(params)
    ids = jnp.arange(10).reshape(1, 10)
    want = forward(packed, ids, config, compute_dtype=jnp.float32)

    path = str(tmp_path / "ref_export")
    export_reference_int8(path, config, packed)
    loaded = load_reference_checkpoint(path)
    # value vectors default to 1.0 in init; weights are what matters
    got = forward(loaded["params"], ids, loaded["config"],
                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_native_roundtrip(tmp_path, tiny):
    config, params = tiny
    packed = pack_model_params(params)
    path = str(tmp_path / "native")
    save_native(path, config, packed)
    loaded = load_native(path)
    ids = jnp.arange(6).reshape(1, 6)
    a = forward(packed, ids, config, compute_dtype=jnp.float32)
    b = forward(loaded["params"], ids, loaded["config"],
                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_native_roundtrip_latent(tmp_path, tiny):
    config, params = tiny
    path = str(tmp_path / "native_latent")
    save_native(path, config, params)
    loaded = load_native(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["layers"]["q_proj"].latent),
        np.asarray(params["layers"]["q_proj"].latent))


def test_load_sharded_bin_checkpoint(tmp_path):
    """Multi-shard pytorch_model-0000x-of-0000N.bin dirs load correctly."""
    config = BitLlamaConfig.named("tiny")
    sd = _write_reference_torch_ckpt(str(tmp_path), config, "latent")
    # split the single bin into two shards
    os.remove(os.path.join(tmp_path, "pytorch_model.bin"))
    keys = sorted(sd)
    half = len(keys) // 2
    torch.save({k: sd[k] for k in keys[:half]},
               os.path.join(tmp_path, "pytorch_model-00001-of-00002.bin"))
    torch.save({k: sd[k] for k in keys[half:]},
               os.path.join(tmp_path, "pytorch_model-00002-of-00002.bin"))
    loaded = load_reference_checkpoint(str(tmp_path))
    assert loaded["kind"] == "latent"
    ids = jnp.arange(6).reshape(1, 6)
    logits = forward(loaded["params"], ids, loaded["config"],
                     compute_dtype=jnp.float32)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_load_safetensors_checkpoint(tmp_path):
    """safetensors-format reference checkpoints load (convert bin → st)."""
    from safetensors.numpy import save_file
    config = BitLlamaConfig.named("tiny")
    sd = _write_reference_torch_ckpt(str(tmp_path), config, "packed")
    os.remove(os.path.join(tmp_path, "pytorch_model.bin"))
    save_file({k: v.numpy() for k, v in sd.items()},
              os.path.join(tmp_path, "model.safetensors"))
    loaded = load_reference_checkpoint(str(tmp_path))
    assert loaded["kind"] == "packed"
