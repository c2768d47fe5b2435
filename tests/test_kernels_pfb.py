"""Fused Pallas PFB channelizer vs the golden-matched XLA formulation.

Interpret mode on CPU (the CI story for every Pallas kernel here, cf.
test_kernels_scan.py); the real-TPU lane (test_tpu.py) re-runs the compiled
kernel on device.  The comparison target is spectrum.channelizer.channelize
/ channelize_ext, which test_spectrum.py pins bit-for-bit to the golden
model -- so matching it transitively matches tests/golden/golden_ofdm.py's
pfb_channelize (SURVEY.md §2b "Polyphase filterbank channelizer").
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels import pfb
from tpu_ofdm.spectrum.channelizer import (
    channelize,
    channelize_ext,
    commutator_rows,
    lowpass_taps,
    polyphase_decompose,
)


def _rand(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)


@pytest.mark.parametrize("n_chan", [8, 32, 64, 128])
def test_fused_matches_unfused_oneshot(n_chan):
    assert pfb.supported(n_chan)
    taps = lowpass_taps(n_chan)
    x = _rand(n_chan * 300, seed=n_chan)
    want = np.asarray(channelize(jnp.asarray(x), n_chan, taps))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pfb.channelize_fused(jnp.asarray(x), n_chan, taps))
    assert got.shape == want.shape == (300, n_chan)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("n_chan", [256, 512])
def test_fused_wide_matches_unfused_oneshot(n_chan):
    """BASELINE config 5 shape: the wide (row-per-symbol) fused path."""
    assert pfb.supported(n_chan)
    taps = lowpass_taps(n_chan)
    x = _rand(n_chan * 40, seed=n_chan)
    want = np.asarray(channelize(jnp.asarray(x), n_chan, taps))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pfb.channelize_fused(jnp.asarray(x), n_chan, taps))
    assert got.shape == want.shape == (40, n_chan)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_fused_wide_streaming_tail_matches_oneshot():
    """512-channel tail-carried steps == one pass, FIR lookback intact
    across the block boundary (straddles a tile boundary too: 24+16 rows)."""
    n_chan = 512
    taps = lowpass_taps(n_chan, taps_per_arm=8)
    C = pfb.tail_len(n_chan, 8)
    n0, n1 = n_chan * 24, n_chan * 16
    x = _rand(n0 + n1, seed=5)
    want = np.asarray(channelize(jnp.asarray(x), n_chan, taps))
    with pltpu.force_tpu_interpret_mode():
        a = pfb.channelize_fused(jnp.asarray(x[:n0]), n_chan, taps)
        tail = jnp.asarray(x[n0 - C : n0])
        b = pfb.channelize_fused(jnp.asarray(x[n0:]), n_chan, taps, tail=tail)
        got = np.asarray(jnp.concatenate([a, b], axis=0))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_fused_wide_multi_tile_ring():
    """More symbols than one grid tile: the (J-1)-row ring must carry the
    FIR lookback across tile boundaries (mt is forced small via monkeypatch
    to keep the interpret-mode run cheap)."""
    n_chan = 256
    taps = lowpass_taps(n_chan, taps_per_arm=8)
    x = _rand(n_chan * 50, seed=11)
    want = np.asarray(channelize(jnp.asarray(x), n_chan, taps))
    orig = pfb._SYMS_PER_TILE
    pfb._SYMS_PER_TILE = 16  # 50 symbols -> 4 tiles incl. a padded tail tile
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(pfb.channelize_fused(jnp.asarray(x), n_chan, taps))
    finally:
        pfb._SYMS_PER_TILE = orig
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_fused_streaming_tail_matches_oneshot():
    """Two tail-carried fused steps == one fused pass == unfused, including
    the FIR lookback across the block boundary."""
    n_chan = 64
    taps = lowpass_taps(n_chan, taps_per_arm=8)
    C = pfb.tail_len(n_chan, 8)
    n0, n1 = n_chan * 160, n_chan * 96
    x = _rand(n0 + n1, seed=3)
    want = np.asarray(channelize(jnp.asarray(x), n_chan, taps))
    with pltpu.force_tpu_interpret_mode():
        a = pfb.channelize_fused(jnp.asarray(x[:n0]), n_chan, taps)
        tail = jnp.asarray(x[n0 - C : n0])
        b = pfb.channelize_fused(jnp.asarray(x[n0:]), n_chan, taps, tail=tail)
        got = np.asarray(jnp.concatenate([a, b], axis=0))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_fused_explicit_zero_tail_equals_default():
    n_chan = 32
    taps = lowpass_taps(n_chan)
    J = polyphase_decompose(taps, n_chan).shape[0]
    x = _rand(n_chan * 50, seed=9)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(pfb.channelize_fused(jnp.asarray(x), n_chan, taps))
        z = jnp.zeros((pfb.tail_len(n_chan, J),), jnp.complex64)
        b = np.asarray(pfb.channelize_fused(jnp.asarray(x), n_chan, taps, tail=z))
    np.testing.assert_array_equal(a, b)


def test_tail_len_covers_lookback():
    # (J-1)*N raw samples of FIR lookback must fit in the carried tail
    for n_chan in (8, 64, 128, 256, 512):
        for j in (1, 4, 8, 16):
            assert pfb.tail_len(n_chan, j) >= (j - 1) * n_chan
            assert pfb.tail_len(n_chan, j) % 128 == 0


def test_supported_predicate():
    assert pfb.supported(64) and pfb.supported(128) and pfb.supported(2)
    assert pfb.supported(256) and pfb.supported(512)  # wide path (config 5)
    assert not pfb.supported(48)    # 128 % 48 != 0
    assert not pfb.supported(192)   # not a multiple of 128
    assert not pfb.supported(1024)  # DFT constants would crowd VMEM
