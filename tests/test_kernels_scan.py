"""Pallas scan + fused Schmidl-Cox kernel tests (interpret mode on CPU).

The real kernels only engage on TPU (kernels.scan.use_pallas); here they run
under pltpu.force_tpu_interpret_mode so CI validates their semantics against
numpy / the jnp formulation.  TPU-compiled numerics are exercised by the
verify loopback and bench runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels import scan
from tpu_ofdm.kernels.sc_metric import sc_sliding_metric
from tpu_ofdm.ops import sync as ksync


@pytest.fixture
def force_kernels(monkeypatch):
    monkeypatch.setattr(scan, "use_pallas", lambda: True)
    monkeypatch.setattr(scan, "_MIN_PALLAS_N", 1)
    with pltpu.force_tpu_interpret_mode():
        yield


def test_cumsum_pallas_matches_numpy(force_kernels):
    rng = np.random.RandomState(0)
    for shape in [(1, 4096), (3, 8192), (2, 2, 4096), (5, 1000)]:
        x = rng.randn(*shape).astype(np.float32)
        got = np.asarray(scan.cumsum(jnp.asarray(x), axis=-1))
        want = np.cumsum(x.astype(np.float64), axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_cumsum_non_last_axis_falls_back(force_kernels):
    rng = np.random.RandomState(1)
    x = rng.randn(64, 32).astype(np.float32)
    got = np.asarray(scan.cumsum(jnp.asarray(x), axis=0))
    np.testing.assert_allclose(got, np.cumsum(x, axis=0), rtol=1e-4,
                               atol=1e-5)


def test_moving_sums_matches_convolve(force_kernels):
    rng = np.random.RandomState(2)
    n, w = 5000, 33
    a = rng.randn(n).astype(np.float32)
    b = rng.randn(n).astype(np.float32)
    ga, gb = scan.moving_sums([jnp.asarray(a), jnp.asarray(b)], w)
    k = np.ones(w)
    np.testing.assert_allclose(
        np.asarray(ga), np.convolve(a.astype(np.float64), k, "valid"),
        rtol=2e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(gb), np.convolve(b.astype(np.float64), k, "valid"),
        rtol=2e-4, atol=2e-3,
    )


def _sc_reference(r, L):
    prod = np.conj(r[:-L]) * r[L:]
    energy = np.abs(r[L:]) ** 2
    k = np.ones(L)
    P = (np.convolve(prod.real, k, "valid")
         + 1j * np.convolve(prod.imag, k, "valid"))
    R = np.convolve(energy, k, "valid")
    M = np.abs(P) ** 2 / np.maximum(R, 1e-12) ** 2
    return P, R, M


@pytest.mark.parametrize("L", [32, 128, 192])
def test_sc_sliding_metric_matches_reference(force_kernels, L):
    rng = np.random.RandomState(3)
    n = 4096 + 137
    r = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    P, R, M = jax.jit(lambda x: sc_sliding_metric(x, L))(jnp.asarray(r))
    Pr, Rr, Mr = _sc_reference(r.astype(np.complex128), L)
    np.testing.assert_allclose(np.asarray(P), Pr, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(R), Rr, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(M), Mr, rtol=5e-3, atol=5e-3)


def test_sc_sliding_metric_batched(force_kernels):
    rng = np.random.RandomState(4)
    L, n = 32, 2048
    r = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    P, R, M = jax.jit(lambda x: sc_sliding_metric(x, L))(jnp.asarray(r))
    assert P.shape == (3, n - 2 * L + 1)
    for i in range(3):
        Pr, Rr, Mr = _sc_reference(r[i].astype(np.complex128), L)
        np.testing.assert_allclose(np.asarray(P[i]), Pr, rtol=2e-3, atol=2e-3)


def test_coarse_sliding_max_dominates_exact():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(10000).astype(np.float32))
    w = 161
    exact = ksync.sliding_max_same(x, w, pad_left=w // 2)
    coarse = ksync.coarse_sliding_max_same(x, w)
    # the coarse window CONTAINS the exact one -> coarse >= exact everywhere
    assert bool(jnp.all(coarse >= exact - 1e-6))
    # and it is tight at block granularity: every coarse value is an actual
    # sample value from within w + 3*128 samples
    assert bool(jnp.all(coarse <= jnp.max(x)))
