"""Full-model numerical parity vs an independent torch implementation.

This torch model is written fresh from the architecture definition (LLaMA
decoder with OneBit linears: x*g → linear(sign W) → *h → LayerNorm, RMSNorm
pre-norms, RoPE, causal attention, SiLU-gated MLP) — the same math the
reference implements — and serves as the bit-exactness anchor for the whole
JAX forward (SURVEY.md §7 phase 0: "golden tests ... jnp forward vs
formula").  fp32 everywhere; agreement is expected to ~1e-4 (op-order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from onebit_tpu.model.bitllama import forward, init_params
from onebit_tpu.model.config import BitLlamaConfig

torch.manual_seed(0)


def torch_rope_cos_sin(positions, head_dim, theta=10000.0):
    inv = 1.0 / (theta ** (torch.arange(0, head_dim, 2).float() / head_dim))
    freqs = positions.float()[:, None] * inv[None, :]
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def torch_rotate_half(x):
    h = x.shape[-1] // 2
    return torch.cat([-x[..., h:], x[..., :h]], dim=-1)


def torch_bitlinear(x, w, g, h):
    y = F.linear(x * g, torch.sign(w)) * h
    return F.layer_norm(y, (y.shape[-1],))


def torch_bitllama_forward(params_np, ids_np, config):
    """Independent torch forward over the stacked JAX param arrays."""
    L = config.num_hidden_layers
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    groups = nh // nkv
    t = lambda key: torch.from_numpy(np.asarray(params_np[key]))
    lt = lambda name, i: torch.from_numpy(
        np.asarray(params_np["layers"][name].latent[i]))
    lg = lambda name, i: torch.from_numpy(
        np.asarray(params_np["layers"][name].input_factor[i]))
    lh = lambda name, i: torch.from_numpy(
        np.asarray(params_np["layers"][name].weight_scale[i]))
    ln = lambda name, i: torch.from_numpy(
        np.asarray(params_np["layers"][name][i]))

    ids = torch.from_numpy(ids_np)
    x = t("embed_tokens")[ids]
    b, s, d = x.shape
    pos = torch.arange(s)
    cos, sin = torch_rope_cos_sin(pos, hd, config.rope_theta)

    def rms(x, w):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + config.rms_norm_eps) * w

    mask = torch.tril(torch.ones(s, s, dtype=torch.bool))
    for i in range(L):
        res = x
        hx = rms(x, ln("input_layernorm", i))
        q = torch_bitlinear(hx, lt("q_proj", i), lg("q_proj", i),
                            lh("q_proj", i)).view(b, s, nh, hd)
        k = torch_bitlinear(hx, lt("k_proj", i), lg("k_proj", i),
                            lh("k_proj", i)).view(b, s, nkv, hd)
        v = torch_bitlinear(hx, lt("v_proj", i), lg("v_proj", i),
                            lh("v_proj", i)).view(b, s, nkv, hd)
        q = q * cos[None, :, None, :] + torch_rotate_half(q) * sin[None, :, None, :]
        k = k * cos[None, :, None, :] + torch_rotate_half(k) * sin[None, :, None, :]
        # GQA: expand kv heads
        k = k.repeat_interleave(groups, dim=2)
        v = v.repeat_interleave(groups, dim=2)
        qt = q.permute(0, 2, 1, 3)
        kt = k.permute(0, 2, 1, 3)
        vt = v.permute(0, 2, 1, 3)
        scores = qt @ kt.transpose(-1, -2) / (hd ** 0.5)
        scores = scores.masked_fill(~mask, float("-inf"))
        ctx = (scores.softmax(-1) @ vt).permute(0, 2, 1, 3).reshape(b, s, -1)
        x = res + torch_bitlinear(ctx, lt("o_proj", i), lg("o_proj", i),
                                  lh("o_proj", i))
        res = x
        hx = rms(x, ln("post_attention_layernorm", i))
        gate = torch_bitlinear(hx, lt("gate_proj", i), lg("gate_proj", i),
                               lh("gate_proj", i))
        up = torch_bitlinear(hx, lt("up_proj", i), lg("up_proj", i),
                             lh("up_proj", i))
        x = res + torch_bitlinear(F.silu(gate) * up, lt("down_proj", i),
                                  lg("down_proj", i), lh("down_proj", i))

    x = rms(x, t("final_norm"))
    return x @ t("lm_head").T


def test_full_model_matches_torch():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    # randomize value vectors so g/h paths are actually exercised
    import numpy as _np
    rng = _np.random.default_rng(7)
    layers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj"):
        w = layers[name]
        layers[name] = w._replace(
            weight_scale=jnp.asarray(_np.abs(rng.standard_normal(
                w.weight_scale.shape)).astype(_np.float32)),
            input_factor=jnp.asarray(_np.abs(rng.standard_normal(
                w.input_factor.shape)).astype(_np.float32)))
    params = dict(params, layers=layers)

    ids = np.random.default_rng(1).integers(
        0, config.vocab_size, (2, 12)).astype(np.int64)
    ours = np.asarray(forward(params, jnp.asarray(ids.astype(np.int32)),
                              config, compute_dtype=jnp.float32))

    theirs = torch_bitllama_forward(params, ids, config).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
