"""Fused Schmidl-Cox detect-rows kernel vs the pure-XLA fallback, in
Pallas TPU interpret mode on CPU.

The real-TPU compiled run lives in tests/test_tpu.py
(test_sc_detect_rows_compiled_matches_jnp); this lane validates the kernel
MATH (three-stream prefix + R1-as-lagged-R2 + per-tile carry rebasing +
tile-local mask/ramp scalars) in plain CI where no TPU is present, so a
kernel-logic regression cannot hide until the hardware lane runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from tpu_ofdm.ops import sync


def _rows_both(spec, x):
    L = spec.fft_len // 2
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda a: sc_detect_rows(a, L, spec.cp_len)
        )(jnp.asarray(x))
    ref = sync._detect_rows_jnp(spec, jnp.asarray(x))
    return ([np.asarray(g) for g in got], [np.asarray(r) for r in ref])


@pytest.mark.parametrize("fft_len,cp", [(64, 16), (256, 64)])
def test_sc_detect_rows_interpret_matches_jnp(fft_len, cp):
    spec = OfdmConfig(fft_len=fft_len, cp_len=cp, modulation="qpsk").spec
    rng = np.random.RandomState(5)
    # > 2 tiles at the small-input tile size so the rings carry across
    # tile boundaries (rows8 <= 2*_ROWS_PER_TILE -> single tile; force
    # the multi-tile path with a long-enough block)
    n = 3 * 256 * 128 + 1000
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.5
    got, ref = _rows_both(spec, x)

    live = np.isfinite(ref[0])
    assert live.sum() > 0.99 * live.size
    np.testing.assert_allclose(got[0][live], ref[0][live],
                               rtol=2e-3, atol=2e-3)
    same = got[1] == ref[1]
    assert same[live].mean() > 0.95
    for i in (2, 3, 4):
        np.testing.assert_allclose(got[i][same], ref[i][same],
                                   rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[5], ref[5], rtol=2e-3, atol=2e-3)


def test_sc_detect_rows_interpret_selection_identical():
    """The selections induced by kernel rows and fallback rows must agree
    exactly on injected frames (the property the RX chain relies on)."""
    import tests.golden.golden_ofdm as G

    spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
    rng = np.random.RandomState(6)
    n = 3 * 256 * 128 + 1000
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.02
    gp = G.GoldenOfdmParams(fft_len=64, cp_len=16, modulation="qpsk")
    frame = G.tx_frame(gp, bytes(range(40))).astype(np.complex64)
    starts = [4000, 50000, 90000]
    for p in starts:
        x[p:p + len(frame)] += frame
    got, ref = _rows_both(spec, x)

    n_sm = n - spec.fft_len - spec.cp_len + 1
    sel_g = sync._select_from_rows(
        spec, *(jnp.asarray(z) for z in got), n_sm=n_sm, max_frames=8,
        threshold=spec.cfg.sync_threshold,
    )
    sel_r = sync._select_from_rows(
        spec, *(jnp.asarray(z) for z in ref), n_sm=n_sm, max_frames=8,
        threshold=spec.cfg.sync_threshold,
    )
    np.testing.assert_array_equal(np.asarray(sel_g.valid),
                                  np.asarray(sel_r.valid))
    v = np.asarray(sel_g.valid)
    assert v.sum() == len(starts)
    np.testing.assert_array_equal(np.asarray(sel_g.start)[v],
                                  np.asarray(sel_r.start)[v])
    np.testing.assert_allclose(np.asarray(sel_g.fine_cfo)[v],
                               np.asarray(sel_r.fine_cfo)[v],
                               rtol=1e-3, atol=1e-4)


def test_sc_detect_rows_hist_interpret_matches_concat():
    """The split-input kernel (streaming fast path: [hist-tile | block]
    virtually, never materialized) must produce the same row summaries as
    the concat kernel on the materialized buffer -- including ring carry
    across the hist->block tile seam and across block tiles."""
    from tpu_ofdm.kernels.sc_detect import (hist_tile_len,
                                            sc_detect_rows_hist)

    T = hist_tile_len()
    S = 2 * T                     # hist tile + two block tiles
    H = 40960                     # streaming history_len at the default spec
    rng = np.random.RandomState(9)
    v = (rng.randn(T + S) + 1j * rng.randn(T + S)).astype(np.complex64) * 0.5
    v[: T - H] = 0                # front zero pad, as rx_stream lays it out
    hre = np.real(v[:T]).astype(np.float32)
    him = np.imag(v[:T]).astype(np.float32)
    xre = np.real(v[T:]).astype(np.float32)
    xim = np.imag(v[T:]).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda a, b, c, d: sc_detect_rows_hist(a, b, c, d, 32, 16)
        )(hre, him, xre, xim)
        ref = jax.jit(
            lambda a: sc_detect_rows(a, 32, 16)
        )(jnp.asarray(v))
    got = [np.asarray(g) for g in got]
    ref = [np.asarray(r) for r in ref]
    assert (got[1] == ref[1]).mean() > 0.99   # argmax ties under noise
    for i in (0, 2, 3, 4, 5):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-5, atol=1e-5)
