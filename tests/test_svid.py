import jax.numpy as jnp
import numpy as np

from onebit_tpu.core.bitlinear import bitlinear_fwd
from onebit_tpu.core.svid import rank1_power, svid, svid_latent_init


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_rank1_power_matches_svd():
    a = np.abs(_rand((40, 64), 0))
    h, g = rank1_power(jnp.asarray(a), num_iters=100)
    u, s, vt = np.linalg.svd(a, full_matrices=False)
    # best rank-1 approximation error must match the SVD truncation error
    approx = np.outer(np.asarray(h), np.asarray(g))
    best = s[0] * np.outer(u[:, 0], vt[0])
    np.testing.assert_allclose(
        np.linalg.norm(a - approx), np.linalg.norm(a - best), rtol=1e-4)


def test_svid_factors_nonnegative_and_sign_exact():
    w = _rand((32, 48), 1)
    r = svid(w, method="power")
    assert np.all(np.asarray(r.weight_scale) >= 0)
    assert np.all(np.asarray(r.input_factor) >= 0)
    np.testing.assert_array_equal(np.asarray(r.sign_w), np.sign(w))


def test_svid_nmf_close_to_power():
    """NMF multiplicative updates find the same rank-1 subspace (up to the
    forward-invariant scalar split between h and g)."""
    a = np.abs(_rand((24, 36), 2)) + 0.01
    hp, gp = rank1_power(jnp.asarray(a), num_iters=200)
    from onebit_tpu.core.svid import rank1_nmf
    hn, gn = rank1_nmf(jnp.asarray(a), num_iters=500)
    ap = np.outer(np.asarray(hp), np.asarray(gp))
    an = np.outer(np.asarray(hn), np.asarray(gn))
    np.testing.assert_allclose(ap, an, rtol=5e-2, atol=5e-3)


def test_svid_matches_sklearn_nmf_forward():
    """Forward output with our SVID factors ≈ forward with sklearn NMF factors
    (the reference initializer, build_start_ckpt.py:21-34). LayerNorm makes
    the forward invariant to the scalar split, so outputs should agree."""
    sklearn = __import__("sklearn.decomposition", fromlist=["NMF"])
    w = _rand((48, 64), 3)
    a = np.abs(w)
    nmf = sklearn.NMF(n_components=1, init="random", random_state=0, max_iter=500)
    W_nmf = nmf.fit_transform(a)
    H = nmf.components_
    g_ref, h_ref = H[0, :], W_nmf[:, 0]

    r = svid(w, method="power")
    x = _rand((4, 64), 4)
    out_ref = bitlinear_fwd(jnp.asarray(x), jnp.sign(jnp.asarray(w)),
                            jnp.asarray(g_ref), jnp.asarray(h_ref))
    out_ours = bitlinear_fwd(jnp.asarray(x), r.sign_w,
                             r.input_factor, r.weight_scale)
    np.testing.assert_allclose(np.asarray(out_ours), np.asarray(out_ref),
                               rtol=2e-2, atol=2e-2)


def test_latent_init_scale():
    w = _rand((8, 32), 5)
    latent, h, g = svid_latent_init(w)
    np.testing.assert_allclose(np.asarray(latent), np.sign(w) * 0.01)
