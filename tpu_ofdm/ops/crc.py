"""CRC32 (IEEE 802.3) and CRC8 as pure JAX ops.

TPU-native equivalent of the reference's crc32_bb block and the CRC8 inside
packet_header_ofdm (SURVEY.md §2b "Header/payload machinery",
gr-digital/lib/crc32_bb_impl.cc / packet_header_ofdm.cc, unverified paths).
The byte-serial table loop becomes a lax.scan with a 256-entry lookup; for
masked variable-length payloads inside static shapes, bytes beyond `length`
leave the register untouched.

Conventions match zlib.crc32 (reflected, init/xorout 0xFFFFFFFF) and the
golden model's crc8 (poly 0x07, init 0, MSB-first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _crc32_table_np() -> np.ndarray:
    poly = 0xEDB88320
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if (c & 1) else (c >> 1)
        table[i] = c
    return table


def crc32(data: jnp.ndarray, length: jnp.ndarray | int | None = None) -> jnp.ndarray:
    """CRC32 of uint8 array `data` (1-D).  If `length` is given, only the
    first `length` bytes participate (static shape, masked update)."""
    table = jnp.asarray(_crc32_table_np())
    n = data.shape[0]
    if length is None:
        length = n
    length = jnp.asarray(length, dtype=jnp.uint32)

    def step(reg, ib):
        i, b = ib
        nxt = table[(reg ^ b.astype(jnp.uint32)) & 0xFF] ^ (reg >> 8)
        return jnp.where(i < length, nxt, reg), None

    idx = jnp.arange(n, dtype=jnp.uint32)
    reg, _ = jax.lax.scan(step, jnp.uint32(0xFFFFFFFF), (idx, data))
    return reg ^ jnp.uint32(0xFFFFFFFF)


def append_crc32_bytes(crc: jnp.ndarray) -> jnp.ndarray:
    """CRC32 value -> 4 little-endian bytes (matches golden append_crc32)."""
    shifts = jnp.arange(0, 32, 8, dtype=jnp.uint32)
    return ((crc[..., None] >> shifts) & 0xFF).astype(jnp.uint8)


def check_crc32(data: jnp.ndarray, wire_len: jnp.ndarray | int) -> jnp.ndarray:
    """True iff data[:wire_len-4] has CRC32 == data[wire_len-4:wire_len]
    (little-endian).  `data` is a fixed-capacity uint8 buffer."""
    wire_len = jnp.asarray(wire_len, dtype=jnp.int32)
    body_len = jnp.maximum(wire_len - 4, 0)
    got = crc32(data, body_len)
    tail = data[body_len + jnp.arange(4)].astype(jnp.uint32)  # gather, clamped
    want = (tail << jnp.arange(0, 32, 8, dtype=jnp.uint32)).sum()
    return (got == want) & (wire_len >= 4)


def crc8_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """CRC-8 poly 0x07, init 0, over an MSB-first bit vector (static length)."""
    def step(reg, b):
        fb = ((reg >> 7) ^ b.astype(jnp.uint32)) & 1
        reg = ((reg << 1) & 0xFF) ^ jnp.where(fb == 1, jnp.uint32(0x07), jnp.uint32(0))
        return reg, None

    reg, _ = jax.lax.scan(step, jnp.uint32(0), bits.astype(jnp.uint32))
    return reg
