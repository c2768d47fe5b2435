"""Pallas window-gather kernels vs plain numpy slicing, in interpret mode
on CPU (the compiled run is covered by tests/test_tpu.py and the headline
bench's every-frame-recovered assert)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels import gather as kg


def _planes(n, seed):
    rng = np.random.RandomState(seed)
    return (rng.randn(n).astype(np.float32),
            rng.randn(n).astype(np.float32))


def test_gather_windows_interpret_matches_numpy():
    n, K, F = 1 << 18, 37, 1360
    re, im = _planes(n, 0)
    rng = np.random.RandomState(1)
    starts = np.sort(rng.randint(0, n - F, K)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda a, b, s: kg.gather_windows(a, b, s, F)
        )(re, im, starts)
    got = np.asarray(got)
    want = np.stack([re[s:s + F] + 1j * im[s:s + F] for s in starts])
    np.testing.assert_array_equal(got, want.astype(np.complex64))


def test_gather_windows_two_interpret_matches_numpy():
    """Two-source gather over the virtual [head-region | x] buffer: window
    starts on both sides of (and straddling toward) the x_off boundary."""
    x_off = 1 << 16
    F = 1360
    sup = kg.sup_rows_for(F) * 128
    nx = 1 << 17
    virt_n = x_off + nx
    rng = np.random.RandomState(2)
    vre = rng.randn(virt_n).astype(np.float32)
    vim = rng.randn(virt_n).astype(np.float32)
    head_re, head_im = vre[:x_off + sup].copy(), vim[:x_off + sup].copy()
    x_re, x_im = vre[x_off:].copy(), vim[x_off:].copy()
    starts = np.array(
        [0, 5000, x_off - F - 7, x_off - 100, x_off - 1,
         x_off, x_off + 3, x_off + nx - F],
        np.int32,
    )
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda hr, hi, xr, xi, s: kg.gather_windows_two(
                hr, hi, xr, xi, s, F, x_off=x_off)
        )(head_re, head_im, x_re, x_im, starts)
    got = np.asarray(got)
    want = np.stack([vre[s:s + F] + 1j * vim[s:s + F] for s in starts])
    np.testing.assert_array_equal(got, want.astype(np.complex64))


def test_gather_windows_two_rejects_misaligned():
    with pytest.raises(AssertionError):
        kg.gather_windows_two(
            np.zeros(1000, np.float32), np.zeros(1000, np.float32),
            np.zeros(2048, np.float32), np.zeros(2048, np.float32),
            np.zeros(2, np.int32), 100, x_off=512,
        )
