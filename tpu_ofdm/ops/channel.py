"""Channel models for loopback testing.

TPU-native equivalent of channels::channel_model (SURVEY.md §2b,
gr-channels/lib/channel_model_impl.cc, unverified path): AWGN + carrier
frequency offset + static phase + multipath FIR + integer timing offset.
Pure-functional with an explicit PRNG key (deterministic-seed fake channel,
mirroring the reference's use of channel_model as the test fixture,
SURVEY.md §4 "Fixtures/fakes").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(key: jax.Array, x: jnp.ndarray, snr_db: float,
         signal_power: jnp.ndarray | float | None = None) -> jnp.ndarray:
    """Add complex white Gaussian noise at the given SNR (dB).  If
    signal_power is None it is measured from x."""
    if signal_power is None:
        signal_power = jnp.mean(jnp.abs(x) ** 2)
    noise_pow = signal_power / (10.0 ** (snr_db / 10.0))
    kr, ki = jax.random.split(key)
    shape = x.shape
    noise = (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))
    return (x + noise * jnp.sqrt(noise_pow / 2.0)).astype(jnp.complex64)


def apply_cfo(x: jnp.ndarray, cfo_subcarriers: float, fft_len: int,
              phase: float = 0.0) -> jnp.ndarray:
    """Multiply by exp(j (2 pi cfo n / N + phase)) along the last axis."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ph = 2.0 * jnp.pi * cfo_subcarriers * n / fft_len + phase
    return (x * jnp.exp(1j * ph)).astype(jnp.complex64)


def multipath(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR multipath: y[n] = sum_k taps[k] x[n-k], same length as x."""
    taps = jnp.asarray(taps, dtype=jnp.complex64)
    k = taps.shape[0]
    xp = jnp.concatenate([jnp.zeros((*x.shape[:-1], k - 1), x.dtype), x], axis=-1)
    # correlation with reversed taps == convolution
    y = jnp.convolve(xp.reshape(-1), taps, mode="valid") if x.ndim == 1 else None
    if y is None:
        flat = xp.reshape(-1, xp.shape[-1])
        y = jax.vmap(lambda v: jnp.convolve(v, taps, mode="valid"))(flat)
        y = y.reshape(*x.shape[:-1], -1)
    return y[..., : x.shape[-1]].astype(jnp.complex64)


def timing_offset(x: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Prepend `delay` zero samples (static shift; grows the array)."""
    if delay == 0:
        return x
    z = jnp.zeros((*x.shape[:-1], delay), dtype=x.dtype)
    return jnp.concatenate([z, x], axis=-1)


def channel_model(
    key: jax.Array,
    x: jnp.ndarray,
    snr_db: float | None = None,
    cfo: float = 0.0,
    fft_len: int = 64,
    taps: jnp.ndarray | None = None,
    delay: int = 0,
    phase: float = 0.0,
) -> jnp.ndarray:
    """Composite channel: multipath -> CFO/phase -> delay -> AWGN.

    Order matches the golden model's channel() so tests can cross-validate.
    SNR is measured against the CLEAN input power (pre-channel), like golden.
    """
    sig_pow = jnp.mean(jnp.abs(x) ** 2)
    y = x
    if taps is not None:
        y = multipath(y, taps)
    y = apply_cfo(y, cfo, fft_len, phase)
    y = timing_offset(y, delay)
    if snr_db is not None:
        y = awgn(key, y, snr_db, signal_power=sig_pow)
    return y
