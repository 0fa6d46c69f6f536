"""Golden tests: jnp BitLinear math vs an independent torch implementation
of the reference formula (bitnet.py:58-68), plus STE gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from onebit_tpu.core.bitlinear import (
    bitlinear_fwd,
    bitlinear_train_fwd,
    layernorm_noaffine,
    sign_ste,
)
from onebit_tpu.core.packing import pack_signs_device
from onebit_tpu.kernels.bitlinear import BitLinearWeights, bitlinear_apply


def _torch_bitlinear(x, w, g, h, bias=None):
    """Reference math in torch: x*g -> linear(sign(w)) -> *h -> LN(no affine)."""
    x = torch.from_numpy(x)
    inp = x * torch.from_numpy(g)
    out = F.linear(inp, torch.sign(torch.from_numpy(w)))
    out = out * torch.from_numpy(h)
    out = F.layer_norm(out, (out.shape[-1],))
    if bias is not None:
        out = out + torch.from_numpy(bias)
    return out.numpy()


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_bitlinear_fwd_matches_torch():
    x = _rand((4, 96), 0)
    w = _rand((64, 96), 1)
    g = _rand((96,), 2)
    h = _rand((64,), 3)
    ref = _torch_bitlinear(x, w, g, h)
    got = bitlinear_fwd(jnp.asarray(x), jnp.sign(jnp.asarray(w)),
                        jnp.asarray(g), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_bitlinear_fwd_with_bias():
    x = _rand((3, 32), 4)
    w = _rand((16, 32), 5)
    g = _rand((32,), 6)
    h = _rand((16,), 7)
    b = _rand((16,), 8)
    ref = _torch_bitlinear(x, w, g, h, b)
    got = bitlinear_fwd(jnp.asarray(x), jnp.sign(jnp.asarray(w)),
                        jnp.asarray(g), jnp.asarray(h), bias=jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_packed_apply_matches_dense():
    x = _rand((5, 128), 10)
    w = _rand((64, 128), 11)
    g = _rand((128,), 12)
    h = _rand((64,), 13)
    sign_w = jnp.sign(jnp.asarray(w))
    dense = bitlinear_apply(
        jnp.asarray(x),
        BitLinearWeights(weight_scale=jnp.asarray(h), input_factor=jnp.asarray(g),
                         dense_sign=sign_w), impl="xla")
    packed = bitlinear_apply(
        jnp.asarray(x),
        BitLinearWeights(weight_scale=jnp.asarray(h), input_factor=jnp.asarray(g),
                         packed=pack_signs_device(jnp.asarray(w))), impl="xla")
    np.testing.assert_allclose(np.asarray(dense), np.asarray(packed),
                               rtol=1e-6, atol=1e-6)


def test_sign_ste_gradient():
    """Backward = upstream * (1.001 - tanh(w)^2)  (reference bitnet.py:21-23)."""
    w = jnp.asarray(_rand((17,), 20))
    g = jnp.asarray(_rand((17,), 21))
    _, vjp = jax.vjp(sign_ste, w)
    (dw,) = vjp(g)
    expect = np.asarray(g) * (1.001 - np.tanh(np.asarray(w)) ** 2)
    np.testing.assert_allclose(np.asarray(dw), expect, rtol=1e-6, atol=1e-6)


def test_sign_ste_grad_vs_torch_autograd():
    w_np = _rand((8, 24), 22)
    x_np = _rand((4, 24), 23)
    g_np = _rand((24,), 24)
    h_np = _rand((8,), 25)

    # torch: full reference-style QAT forward with autograd STE
    class SignSTEF(torch.autograd.Function):
        @staticmethod
        def forward(ctx, inp):
            ctx.save_for_backward(inp)
            return torch.sign(inp)

        @staticmethod
        def backward(ctx, grad_output):
            (inp,) = ctx.saved_tensors
            return grad_output * (1.001 - torch.tanh(inp) ** 2)

    wt = torch.from_numpy(w_np.copy()).requires_grad_(True)
    gt = torch.from_numpy(g_np.copy()).requires_grad_(True)
    ht = torch.from_numpy(h_np.copy()).requires_grad_(True)
    xt = torch.from_numpy(x_np)
    out = F.linear(xt * gt, SignSTEF.apply(wt)) * ht
    out = F.layer_norm(out, (out.shape[-1],))
    loss_t = (out ** 2).sum()
    loss_t.backward()

    def loss_fn(w, g, h):
        y = bitlinear_train_fwd(jnp.asarray(x_np), w, g, h)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(w_np), jnp.asarray(g_np), jnp.asarray(h_np))
    np.testing.assert_allclose(np.asarray(grads[0]), wt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[1]), gt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[2]), ht.grad.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_layernorm_matches_torch():
    x = _rand((6, 50), 30)
    ref = F.layer_norm(torch.from_numpy(x), (50,)).numpy()
    got = layernorm_noaffine(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
