"""Vectorized bit/byte/dibit packing.

The reference implements these as scalar loops (m17_bit_utils.cpp:5-187).
Here every conversion is a reshape + shift over a trailing axis so it
batches over any leading dimensions and fuses into surrounding XLA ops.

All "bit" arrays use MSB-first ordering within a byte/word to match the
wire format (m17_bit_utils.cpp:5-18 unpacks 0x80 first).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BYTE_SHIFTS = np.arange(7, -1, -1, dtype=np.int32)          # MSB first
_DIBIT_SHIFTS = np.arange(6, -2, -2, dtype=np.int32)


def bytes_to_bits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., N] uint8 -> [..., 8N] bits (0/1, uint8). MSB first.

    Reference: pack_8_to_1 (m17_bit_utils.cpp:5-18).
    """
    b = (x[..., :, None].astype(jnp.int32) >> _BYTE_SHIFTS) & 1
    return b.reshape(*x.shape[:-1], x.shape[-1] * 8).astype(jnp.uint8)


def bits_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 8N] bits -> [..., N] uint8. MSB first.

    Reference: pack_1_to_8 (m17_bit_utils.cpp:26-32).
    """
    n = x.shape[-1] // 8
    b = x.reshape(*x.shape[:-1], n, 8).astype(jnp.int32)
    return jnp.sum(b << _BYTE_SHIFTS, axis=-1).astype(jnp.uint8)


def bits_to_dibits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 2N] bits -> [..., N] dibits (first bit is the MSB).

    Reference: pack_1_to_2 (m17_bit_utils.cpp:19-25).
    """
    n = x.shape[-1] // 2
    b = x.reshape(*x.shape[:-1], n, 2).astype(jnp.int32)
    return ((b[..., 0] << 1) | b[..., 1]).astype(jnp.uint8)


def dibits_to_bits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., N] dibits -> [..., 2N] bits."""
    b = jnp.stack([(x >> 1) & 1, x & 1], axis=-1)
    return b.reshape(*x.shape[:-1], x.shape[-1] * 2).astype(jnp.uint8)


def bytes_to_dibits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., N] uint8 -> [..., 4N] dibits. MSB pair first.

    Reference: pack_16_to_2 / pack_24_to_2 (m17_bit_utils.cpp:48-85).
    """
    d = (x[..., :, None].astype(jnp.int32) >> _DIBIT_SHIFTS) & 0x3
    return d.reshape(*x.shape[:-1], x.shape[-1] * 4).astype(jnp.uint8)


def word_to_bytes(word, nbytes: int):
    """Big-endian split of integer word(s) into nbytes bytes.

    Reference: pack_48_to_8 / pack_24_to_8 / pack_16_to_8
    (m17_bit_utils.cpp:33-74).

    Host-side (numpy): words wider than 32 bits (48-bit addresses) do not
    fit JAX's default uint32; on device, multi-byte fields are carried as
    byte arrays instead of scalars.
    """
    word = np.asarray(word, dtype=np.uint64)
    shifts = np.arange(nbytes - 1, -1, -1, dtype=np.uint64) * np.uint64(8)
    return ((word[..., None] >> shifts) & np.uint64(0xFF)).astype(np.uint8)


def bytes_to_word(x) -> np.ndarray:
    """Big-endian combine of [..., N] bytes into an integer word (host-side).

    Reference: pack_8_to_48 / pack_8_to_24 / pack_8_to_16
    (m17_bit_utils.cpp:100-131).
    """
    x = np.asarray(x)
    n = x.shape[-1]
    shifts = np.arange(n - 1, -1, -1, dtype=np.uint64) * np.uint64(8)
    return np.sum(x.astype(np.uint64) << shifts, axis=-1)


def word_to_bytes_device(word: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """Device-side big-endian split for words up to 32 bits
    (Golay codewords, frame numbers, CRCs)."""
    shifts = np.arange(nbytes - 1, -1, -1, dtype=np.uint32) * np.uint32(8)
    return ((word[..., None].astype(jnp.uint32) >> shifts) & 0xFF).astype(jnp.uint8)


def bytes_to_word_device(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side big-endian combine for words up to 32 bits."""
    n = x.shape[-1]
    shifts = np.arange(n - 1, -1, -1, dtype=np.uint32) * np.uint32(8)
    return jnp.sum(x.astype(jnp.uint32) << shifts, axis=-1)


def bytes_to_u12x4(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] bytes -> [..., 4] 12-bit words (LICH chunk partition).

    Reference: pack_8_to_12_x4 (m17_bit_utils.cpp:133-151).
    """
    x = x.astype(jnp.int32)
    w0 = (x[..., 0] << 4) | (x[..., 1] >> 4)
    w1 = ((x[..., 1] & 0xF) << 8) | x[..., 2]
    w2 = (x[..., 3] << 4) | (x[..., 4] >> 4)
    w3 = ((x[..., 4] & 0xF) << 8) | x[..., 5]
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def u12x4_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] 12-bit words -> [..., 6] bytes.

    Reference: pack_12_to_8_x4x6 (m17_bit_utils.cpp:152-172).
    """
    x = x.astype(jnp.int32)
    out = jnp.stack(
        [
            x[..., 0] >> 4,
            ((x[..., 0] & 0xF) << 4) | (x[..., 1] >> 8),
            x[..., 1] & 0xFF,
            x[..., 2] >> 4,
            ((x[..., 2] & 0xF) << 4) | (x[..., 3] >> 8),
            x[..., 3] & 0xFF,
        ],
        axis=-1,
    )
    return out.astype(jnp.uint8)


def hard_decision_word(soft: jnp.ndarray) -> jnp.ndarray:
    """[..., N] soft bits -> integer word, MSB first; >= 0 decodes as 1.

    Reference: hard_decode_24_bits (m17_bit_utils.cpp:180-187).
    """
    n = soft.shape[-1]
    bits = (soft >= 0).astype(jnp.uint32)
    shifts = np.arange(n - 1, -1, -1, dtype=np.uint32)
    return jnp.sum(bits << shifts, axis=-1)
