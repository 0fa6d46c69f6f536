"""Sign-bit packing/unpacking for OneBit weights.

A OneBit linear layer stores ``sign(W) in {-1,+1}^{out x in}`` losslessly as
packed bits.  The bit convention (kept byte-compatible with the reference
packer, scripts/convert_llama_to_infer_ckpt.py:7-15 and the reference
unpacker transformers/src/transformers/models/bitnet.py:98-110) is:

* bit value ``b = (1 - s) / 2``  (sign ``+1 -> 0``, ``-1 -> 1``)
* LSB-first within each word: element ``i`` of a row lands in word
  ``i // word_bits`` at bit position ``i % word_bits``.

The reference packs 8 signs per *int8* byte.  The TPU-native canonical format
packs 32 signs per **int32 word** — the natural lane dtype on TPU — and the
two layouts are *pure memory views* of each other: an int32 word is exactly 4
consecutive reference bytes interpreted little-endian.  Converters between
the two formats are therefore exact and free.

All functions here are pure jnp (jit-friendly) unless suffixed ``_np``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

WORD_BITS = 32
_BYTE_BITS = 8


# ---------------------------------------------------------------------------
# Canonical int32-word format
# ---------------------------------------------------------------------------

def pack_signs(w, axis: int = -1):
    """Pack signs of ``w`` along ``axis`` into int32 words (32 signs/word).

    ``w`` may be any real array; only ``sign(w)`` is consulted, with the
    convention that ``w >= 0`` packs as bit 0 (sign +1) and ``w < 0`` packs
    as bit 1 (sign -1).  The packed axis length must be a multiple of 32.

    Returns an int32 array whose ``axis`` dimension is ``w.shape[axis]//32``.
    """
    w = jnp.asarray(w)
    if axis != -1 and axis != w.ndim - 1:
        w = jnp.moveaxis(w, axis, -1)
    n = w.shape[-1]
    if n % WORD_BITS != 0:
        raise ValueError(f"packed axis length {n} not a multiple of {WORD_BITS}")
    bits = (w < 0).astype(jnp.uint32)  # b = (1 - s) / 2
    bits = bits.reshape(*w.shape[:-1], n // WORD_BITS, WORD_BITS)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32).astype(jnp.int32)
    if axis != -1 and axis != words.ndim - 1:
        words = jnp.moveaxis(words, -1, axis)
    return words


def unpack_signs(words, dtype=jnp.bfloat16, axis: int = -1):
    """Unpack int32 sign words back to a dense ±1 array along ``axis``."""
    words = jnp.asarray(words)
    if axis != -1 and axis != words.ndim - 1:
        words = jnp.moveaxis(words, axis, -1)
    u = words.astype(jnp.uint32)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = (u[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(*words.shape[:-1], words.shape[-1] * WORD_BITS)
    signs = (1 - 2 * bits.astype(jnp.int32)).astype(dtype)  # s = 1 - 2b
    if axis != -1 and axis != signs.ndim - 1:
        signs = jnp.moveaxis(signs, -1, axis)
    return signs


# ---------------------------------------------------------------------------
# Reference int8 format (8 signs/byte) — for checkpoint interchange
# ---------------------------------------------------------------------------

def pack_signs_int8_np(w: np.ndarray) -> np.ndarray:
    """Pack signs into the reference's int8 byte format (numpy, last axis).

    Matches scripts/convert_llama_to_infer_ckpt.py:7-15: ``b=(1-s)/2``,
    LSB-first within each byte, output shape ``[..., in//8]`` int8.
    """
    w = np.asarray(w)
    n = w.shape[-1]
    if n % _BYTE_BITS != 0:
        raise ValueError(f"last axis {n} not a multiple of 8")
    bits = (w < 0).astype(np.uint8).reshape(*w.shape[:-1], n // _BYTE_BITS, _BYTE_BITS)
    mult = (1 << np.arange(_BYTE_BITS, dtype=np.uint8)).astype(np.uint8)
    packed = (bits * mult).sum(-1).astype(np.uint8)
    return packed.view(np.int8)


def unpack_signs_int8_np(packed: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Unpack the reference int8 byte format to dense ±1 (numpy)."""
    u = np.asarray(packed).view(np.uint8)
    shifts = np.arange(_BYTE_BITS, dtype=np.uint8)
    bits = (u[..., None] >> shifts) & np.uint8(1)
    bits = bits.reshape(*u.shape[:-1], u.shape[-1] * _BYTE_BITS)
    return (1 - 2 * bits.astype(np.int8)).astype(dtype)


# ---------------------------------------------------------------------------
# Bitplane-interleaved device layout (TPU-native)
# ---------------------------------------------------------------------------
#
# The canonical LSB-first layout puts 32 *consecutive* elements in one word,
# which forces a lane-expanding reshape on unpack that Mosaic cannot lower
# efficiently.  The device layout instead interleaves: with ``nw = K/32``
# words per row, dense element ``j`` lives in word ``j % nw`` at bit
# ``j // nw`` (bit-plane ``b`` covers elements ``[b*nw, (b+1)*nw)``).
# In-kernel unpack is then a lane tile-repeat plus static shifts — measured
# ~20x faster than unpacking the canonical layout on v5e.  The two layouts
# are pure bit permutations of each other; conversion happens once at
# checkpoint load/pack time.

def pack_signs_bitplane(w, axis: int = -1):
    """Pack signs into the TPU device layout (int32, bitplane-interleaved)."""
    w = jnp.asarray(w)
    if axis != -1 and axis != w.ndim - 1:
        w = jnp.moveaxis(w, axis, -1)
    n = w.shape[-1]
    if n % WORD_BITS != 0:
        raise ValueError(f"packed axis length {n} not a multiple of {WORD_BITS}")
    nw = n // WORD_BITS
    bits = (w < 0).astype(jnp.uint32).reshape(*w.shape[:-1], WORD_BITS, nw)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)[:, None]
    words = jnp.sum(bits << shifts, axis=-2, dtype=jnp.uint32).astype(jnp.int32)
    if axis != -1 and axis != words.ndim - 1:
        words = jnp.moveaxis(words, -1, axis)
    return words


def unpack_signs_bitplane(words, dtype=jnp.bfloat16, axis: int = -1):
    """Unpack the bitplane device layout back to dense ±1."""
    words = jnp.asarray(words)
    if axis != -1 and axis != words.ndim - 1:
        words = jnp.moveaxis(words, axis, -1)
    u = words.astype(jnp.uint32)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)[:, None]
    bits = (u[..., None, :] >> shifts) & jnp.uint32(1)  # [..., 32, nw]
    bits = bits.reshape(*words.shape[:-1], words.shape[-1] * WORD_BITS)
    signs = (1 - 2 * bits.astype(jnp.int32)).astype(dtype)
    if axis != -1 and axis != signs.ndim - 1:
        signs = jnp.moveaxis(signs, -1, axis)
    return signs


def pack_signs_device(w):
    """Pack ``w [..., out, in]`` into THE device layout: K-major
    **byte-plane** words ``[..., in//32, out]`` int32.

    Bit assignment (with ``nw = in//32``): dense in-index
    ``k = p*(4*nw) + 4*i + c`` lives in word row ``i`` at bit ``8*c + p``
    (byte ``c``, byte-plane ``p``).  Chosen to invert the TPU's int32→int8
    sublane bitcast order (byte ``c`` of int32 sublane ``i`` lands at int8
    sublane ``4*i + c``, verified by scripts/probe_primitives.py), so the
    Pallas kernel materializes a **±1 int8** sign tile with 2 VPU ops + one
    bitcast per 4 elements — ``(w >> p) & 0x01010101`` then
    ``0x01010101 + bits * 0xFE`` — feeding the MXU's mixed bf16×int8 dot
    directly (kernels/bitlinear_pallas.py; measured fastest of 6 strategies
    in scripts/ubench_unpack.py, ~1.6x the int32-bitplane layout at 7B
    decode shapes and faster than bf16×bf16 even at prefill M=512).
    """
    w = jnp.asarray(w)
    *lead, n_out, k = w.shape
    if k % WORD_BITS != 0:
        raise ValueError(f"in-axis length {k} not a multiple of {WORD_BITS}")
    nw = k // WORD_BITS
    bits = jnp.swapaxes((w < 0).astype(jnp.uint32), -1, -2)  # [..., in, out]
    b = bits.reshape(*lead, 8, nw, 4, n_out)     # k = p*(4nw) + 4i + c
    p = jnp.arange(8, dtype=jnp.uint32)[:, None, None, None]
    c = jnp.arange(4, dtype=jnp.uint32)[None, None, :, None]
    words = jnp.sum(b << (8 * c + p), axis=(-4, -2),
                    dtype=jnp.uint32).astype(jnp.int32)      # [..., nw, out]
    return words


def unpack_signs_device(words, dtype=jnp.bfloat16):
    """Unpack the device layout ``[..., in//32, out]`` → dense ±1
    ``[..., out, in]`` (inverse of :func:`pack_signs_device`)."""
    words = jnp.asarray(words)
    *lead, nw, n_out = words.shape
    u = words.astype(jnp.uint32)
    p = jnp.arange(8, dtype=jnp.uint32)[:, None, None, None]
    c = jnp.arange(4, dtype=jnp.uint32)[None, None, :, None]
    bits = (u[..., None, :, None, :] >> (8 * c + p)) & jnp.uint32(1)
    bits = bits.reshape(*lead, nw * WORD_BITS, n_out)        # [..., in, out]
    signs = (1 - 2 * bits.astype(jnp.int32)).astype(dtype)
    return jnp.swapaxes(signs, -1, -2)


def canonical_to_bitplane(words):
    """Convert canonical int32 words → device bitplane layout (lossless)."""
    return pack_signs_bitplane(unpack_signs(words, dtype=jnp.int8))


def bitplane_to_canonical(words):
    """Convert device bitplane layout → canonical int32 words (lossless)."""
    return pack_signs(unpack_signs_bitplane(words, dtype=jnp.int8))


def int8_bytes_to_words_np(packed_int8: np.ndarray) -> np.ndarray:
    """Reinterpret reference int8 packed rows as canonical int32 words.

    Exact view: word ``w`` = bytes ``4w..4w+3`` little-endian, so LSB-first
    bit ``j`` of the word is element ``32w + j`` — identical element order to
    the reference byte layout.
    """
    a = np.ascontiguousarray(packed_int8)
    if a.shape[-1] % 4 != 0:
        raise ValueError("byte axis must be a multiple of 4 to view as int32")
    return a.view(np.dtype("<i4")).reshape(*a.shape[:-1], a.shape[-1] // 4)


def words_to_int8_bytes_np(words: np.ndarray) -> np.ndarray:
    """Inverse of :func:`int8_bytes_to_words_np` (exact view)."""
    a = np.ascontiguousarray(words).astype(np.dtype("<i4"), copy=False)
    return a.view(np.int8).reshape(*a.shape[:-1], a.shape[-1] * 4)
