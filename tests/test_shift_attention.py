import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.kernels.shift_attention import shift_short_attention


def _naive_causal(q, k, v):
    b, s, nh, hd = q.shape
    scores = np.einsum("bsnh,btnh->bnst", q, k) / np.sqrt(hd)
    mask = np.tril(np.ones((s, s), bool))
    scores = np.where(mask[None, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bnst,btnh->bsnh", probs, v)


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_single_group_equals_full_attention():
    """group_size == seq: unshifted heads see exact causal attention."""
    b, s, nh, hd = 1, 8, 4, 16
    q, k, v = (_rand((b, s, nh, hd), i) for i in range(3))
    out = np.asarray(shift_short_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), group_size=s))
    ref = _naive_causal(q, k, v)
    # first half of heads is never shifted → exact match
    np.testing.assert_allclose(out[:, :, :nh // 2], ref[:, :, :nh // 2],
                               rtol=1e-4, atol=1e-4)


def test_groups_are_block_local():
    """With 2 groups, an unshifted-head query in group 0 is unaffected by
    changes to group-1 keys/values."""
    b, s, nh, hd = 1, 8, 4, 8
    q, k, v = (_rand((b, s, nh, hd), 10 + i) for i in range(3))
    out1 = np.asarray(shift_short_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), group_size=4))
    k2, v2 = k.copy(), v.copy()
    k2[:, 4:] += 5.0
    v2[:, 4:] -= 3.0
    out2 = np.asarray(shift_short_attention(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), group_size=4))
    np.testing.assert_allclose(out1[:, :4, :nh // 2], out2[:, :4, :nh // 2],
                               rtol=1e-5, atol=1e-5)
    # group 1 outputs DO change
    assert not np.allclose(out1[:, 4:, :nh // 2], out2[:, 4:, :nh // 2])


def test_shifted_heads_cross_boundaries():
    """The shifted half mixes information across group boundaries."""
    b, s, nh, hd = 1, 8, 4, 8
    q, k, v = (_rand((b, s, nh, hd), 20 + i) for i in range(3))
    out1 = np.asarray(shift_short_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), group_size=4))
    v2 = v.copy()
    v2[:, 3] += 10.0  # last token of group 0
    out2 = np.asarray(shift_short_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v2), group_size=4))
    # shifted heads of tokens in (shifted) group spanning positions 2..5
    # see position 3 → outputs at position 4/5 shifted heads change
    assert not np.allclose(out1[:, 4:6, nh // 2:], out2[:, 4:6, nh // 2:])


def test_invalid_group():
    q = jnp.zeros((1, 6, 2, 4))
    with pytest.raises(ValueError, match="divisible"):
        shift_short_attention(q, q, q, group_size=4)


def test_dummy_lm():
    from onebit_tpu.eval.dummy import DummyLM
    lm = DummyLM()
    lls = lm.loglikelihood([([1], [2]), ([3], [4, 5])])
    assert len(lls) == 2 and all(-1 <= v <= 0 for v, _ in lls)
    assert lm.greedy_until([([1], ["x"])]) == ["lol"]
