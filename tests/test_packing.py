import pytest
import jax.numpy as jnp
import numpy as np

from onebit_tpu.core.packing import (
    bitplane_to_canonical,
    canonical_to_bitplane,
    int8_bytes_to_words_np,
    pack_signs,
    pack_signs_bitplane,
    pack_signs_int8_np,
    unpack_signs,
    unpack_signs_bitplane,
    unpack_signs_int8_np,
    words_to_int8_bytes_np,
)


def _random_signs(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1.0, 1.0], np.float32), size=shape)


def test_pack_unpack_roundtrip():
    s = _random_signs((16, 256))
    words = pack_signs(s)
    assert words.shape == (16, 8)
    assert words.dtype == jnp.int32
    back = unpack_signs(words, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(back), s)


def test_pack_axis0():
    s = _random_signs((64, 5))
    words = pack_signs(s, axis=0)
    assert words.shape == (2, 5)
    back = unpack_signs(words, dtype=jnp.float32, axis=0)
    np.testing.assert_array_equal(np.asarray(back), s)


def test_pack_from_arbitrary_floats():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    words = pack_signs(w)
    back = np.asarray(unpack_signs(words, dtype=jnp.float32))
    np.testing.assert_array_equal(back, np.where(w < 0, -1.0, 1.0))


def test_int8_reference_convention():
    """Byte packing matches the reference scripts' exact convention."""
    # Reference fp16_to_int8 (convert_llama_to_infer_ckpt.py:7-15) in numpy:
    s = _random_signs((4, 40))
    int_tensor = ((0 - s + 1) / 2).astype(np.uint8)
    reshaped = int_tensor.reshape(int_tensor.shape[0], -1, 8)
    multiplier = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)
    ref_packed = (reshaped * multiplier).sum(-1).astype(np.uint8).view(np.int8)
    ours = pack_signs_int8_np(s)
    np.testing.assert_array_equal(ours, ref_packed)
    # and the reference unpacker inverts it
    np.testing.assert_array_equal(unpack_signs_int8_np(ours), s)


def test_int8_to_words_view_equivalence():
    """int32-word format is a pure little-endian view of the int8 format."""
    s = _random_signs((8, 128))
    bytes_ = pack_signs_int8_np(s)
    words_from_bytes = int8_bytes_to_words_np(bytes_)
    words_direct = np.asarray(pack_signs(s))
    np.testing.assert_array_equal(words_from_bytes, words_direct)
    np.testing.assert_array_equal(words_to_int8_bytes_np(words_direct), bytes_)


def test_bitplane_roundtrip():
    s = _random_signs((16, 256), seed=7)
    words = pack_signs_bitplane(s)
    assert words.shape == (16, 8)
    back = unpack_signs_bitplane(words, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(back), s)


def test_bitplane_is_permutation_of_canonical():
    """Same bits, different order: conversion is exact both ways."""
    s = _random_signs((8, 96), seed=8)
    canon = pack_signs(s)
    bp = pack_signs_bitplane(s)
    np.testing.assert_array_equal(np.asarray(canonical_to_bitplane(canon)),
                                  np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(bitplane_to_canonical(bp)),
                                  np.asarray(canon))


def test_bitplane_layout_definition():
    """Element j lives in word j % nw at bit j // nw."""
    k, nw = 64, 2
    s = _random_signs((1, k), seed=9)
    words = np.asarray(pack_signs_bitplane(s)).view(np.uint32)
    for j in range(k):
        bit = (words[0, j % nw] >> (j // nw)) & 1
        assert bit == (1 if s[0, j] < 0 else 0), j


def test_unpack_dtypes():
    s = _random_signs((4, 64))
    words = pack_signs(s)
    for dt in (jnp.bfloat16, jnp.float32, jnp.int8):
        back = np.asarray(unpack_signs(words, dtype=dt)).astype(np.float32)
        np.testing.assert_array_equal(back, s)


@pytest.mark.slow
def test_fuzz_roundtrips():
    """Property fuzz: pack/unpack identities across random shapes for all
    three layouts (canonical int32, bitplane, reference int8)."""
    rng = np.random.default_rng(123)
    for _ in range(25):
        rows = int(rng.integers(1, 20))
        cols = int(rng.integers(1, 12)) * 32
        s = rng.choice(np.array([-1.0, 1.0], np.float32),
                       size=(rows, cols))
        np.testing.assert_array_equal(
            np.asarray(unpack_signs(pack_signs(s), dtype=jnp.float32)), s)
        np.testing.assert_array_equal(
            np.asarray(unpack_signs_bitplane(pack_signs_bitplane(s),
                                             dtype=jnp.float32)), s)
        np.testing.assert_array_equal(
            unpack_signs_int8_np(pack_signs_int8_np(s)), s)
        # cross-layout conversions are involutions
        canon = pack_signs(s)
        np.testing.assert_array_equal(
            np.asarray(bitplane_to_canonical(canonical_to_bitplane(canon))),
            np.asarray(canon))
