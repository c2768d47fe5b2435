"""Bit/byte (un)packing and repacking as pure JAX ops.

Replaces the reference's repack_bits_bb / packed-to-unpacked blocks
(SURVEY.md §2b "Constellations & (de)mapping": gr-blocks/gr-digital repack
machinery).  All MSB-first, matching tests/golden/golden_ofdm.py
bytes_to_bits/bits_to_bytes.
"""

from __future__ import annotations

import jax.numpy as jnp


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 array (..., n) -> bit array (..., n*8), MSB of each byte first."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """Bit array (..., n*8) -> uint8 array (..., n), MSB-first."""
    n = bits.shape[-1] // 8
    b = bits[..., : n * 8].reshape(*bits.shape[:-1], n, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.uint32)).astype(jnp.uint8)
    return (b * weights).sum(axis=-1).astype(jnp.uint8)


def bits_to_uint(bits: jnp.ndarray, width: int) -> jnp.ndarray:
    """MSB-first bit vector (..., width) -> unsigned integer."""
    w = (1 << jnp.arange(width - 1, -1, -1, dtype=jnp.uint32))
    return (bits[..., :width].astype(jnp.uint32) * w).sum(axis=-1)


def uint_to_bits(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Unsigned integer -> MSB-first bit vector (..., width)."""
    shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.uint32)
    return ((x[..., None].astype(jnp.uint32) >> shifts) & 1).astype(jnp.uint8)


def group_bits(bits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Bit stream (..., n*k) -> symbol values (..., n), MSB-first within
    each k-bit group (cf. repack_bits_bb 1->k)."""
    n = bits.shape[-1] // k
    g = bits[..., : n * k].reshape(*bits.shape[:-1], n, k).astype(jnp.uint32)
    w = (1 << jnp.arange(k - 1, -1, -1, dtype=jnp.uint32))
    return (g * w).sum(axis=-1)


def ungroup_bits(vals: jnp.ndarray, k: int) -> jnp.ndarray:
    """Symbol values (..., n) -> bit stream (..., n*k), MSB-first."""
    bits = uint_to_bits(vals, k)
    return bits.reshape(*vals.shape[:-1], vals.shape[-1] * k)
