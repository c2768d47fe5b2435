"""Fused Pallas PSD kernel vs the golden-matched XLA chain.

Interpret mode on CPU (the CI story for every Pallas kernel, cf.
test_kernels_pfb.py); the real-TPU lane (test_tpu.py) re-runs the compiled
kernel on device.  spectrum.psd.psd_frames' XLA branch is pinned to the
golden model by test_spectrum.py, so matching it transitively matches
tests/golden/golden_ofdm.log_pwr_fft (SURVEY.md §2b "logpwrfft PSD chain").
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels import psd as kpsd
from tpu_ofdm.spectrum.psd import psd_frames


def _rand(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)


@pytest.mark.parametrize("fft_len", [128, 256, 512, 1024])
def test_fused_psd_matches_xla(fft_len):
    assert kpsd.supported(fft_len)
    x = _rand(fft_len * 24, seed=fft_len)
    want = np.asarray(psd_frames(jnp.asarray(x), fft_len))   # XLA chain (CPU)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(kpsd.psd_fused(jnp.asarray(x), fft_len))
    assert got.shape == want.shape == (24, fft_len)
    # bf16x3 DFT: ~1e-5 relative on the power (vs the capture peak)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * want.max())


def test_fused_psd_tone_bin():
    """A pure tone at bin 37 must put (virtually) all power in bin 37."""
    fft_len = 256
    n = fft_len * 16
    t = np.arange(n)
    x = np.exp(2j * np.pi * 37 * t / fft_len).astype(np.complex64)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(kpsd.psd_fused(jnp.asarray(x), fft_len))
    peak = got.argmax(axis=-1)
    np.testing.assert_array_equal(peak, 37)
    # windowed leakage: the tone bin dominates everything outside the
    # window's main lobe by orders of magnitude
    far = np.delete(got, [36, 37, 38], axis=-1)
    assert (got[:, 37] > 1e5 * far.max(axis=-1)).all()


def test_fused_psd_window_options_and_padding():
    fft_len = 128
    x = _rand(fft_len * 11 + 37, seed=2)          # ragged tail dropped
    want = np.asarray(psd_frames(jnp.asarray(x), fft_len, window="blackman_harris"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(kpsd.psd_fused(jnp.asarray(x), fft_len,
                                        window="blackman_harris"))
    assert got.shape == want.shape == (11, fft_len)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * want.max())


def test_supported_predicate():
    assert kpsd.supported(128) and kpsd.supported(1024)
    assert not kpsd.supported(64)     # < one lane row -> XLA path
    assert not kpsd.supported(192)    # not a multiple of 128
    assert not kpsd.supported(2048)   # inner stage capped at n1 = 8
