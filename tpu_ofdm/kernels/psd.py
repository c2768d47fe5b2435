"""Fused windowed-PSD kernel (Pallas, TPU).

ONE pass over the sample stream does the whole logpwrfft front half
(SURVEY.md §2b "logpwrfft PSD chain" / §3.4, gr-fft logpwrfft + fft_vcc +
complex_to_mag_squared, unverified paths): window multiply, N-point DFT,
|.|^2, and normalization -- 12 B/sample of HBM traffic (two f32 planes in,
one f32 power plane out).  The unfused XLA chain materializes the windowed
frames and the four-step FFT's intermediates in HBM; measured on the bench
chip it ran at 9.6% of stream-copy bandwidth (bench/results_kernels_tpu.json
r3); this kernel replaces it for fft_len in {128, 256, 512, 1024}.

Factorization (N = n1 * 128, frame sample n = t1*128 + t2, output bin
k = k1 + n1*k2):

  * window (with 1/sqrt(sum(w^2)*N) normalization folded in) is a plain
    VPU broadcast multiply on the (b, N) tile;
  * the n1-point stage rides LANE-TILE SLICES: x[:, t1*128:(t1+1)*128] is a
    contiguous 128-lane slice, so inner[k1] = sum_t1 W_n1^{t1 k1} * slice_t1
    is n1^2 scalar-weighted (b, 128) MACs -- no strided access, and the
    trace-time-constant weights let +-1 / +-i terms drop their zero parts;
  * twiddle W_N^{t2 k1} is a (128,) lane-broadcast complex multiply;
  * the 128-point stage is one (b, 128) @ (128, 128) MXU matmul per k1 per
    re/im product, run as bf16x3 (hi+lo split, ~2^-16 relative error --
    see kernels.pfb._mm_bf16x3) against pre-split DFT-matrix constants;
  * |.|^2 on the VPU; the kernel emits k1-major (Z-order) lanes and ONE
    XLA transpose outside restores the natural bin order k1 + n1*k2
    (+8 B/sample -- Mosaic rejects the in-kernel lane-interleave relayout,
    see _kernel).  Total traffic 20 B/sample, still a 10x cut vs the
    unfused chain's measured 9.6%-of-membw effective rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels.pfb import _mm_bf16x3, _split_bf16
from tpu_ofdm.kernels.sc_detect import LANE

_FRAMES_PER_TILE = 256


def supported(fft_len: int) -> bool:
    """Fused coverage: N = n1*128 with the unrolled inner stage kept small
    (n1 <= 8); larger N falls back to the XLA four-step chain."""
    return fft_len % LANE == 0 and 1 <= fft_len // LANE <= 8


def _consts(fft_len: int, window_vals: np.ndarray):
    """Pre-split constants: folded window, twiddles, DFT-128 hi/lo."""
    N = fft_len
    n1 = N // LANE
    norm = float(np.sum(window_vals.astype(np.float64) ** 2) * N)
    w = (window_vals.astype(np.float64) / np.sqrt(norm)).astype(np.float32)

    t1 = np.arange(n1)[:, None]
    k1 = np.arange(n1)[None, :]
    w8 = np.exp(-2j * np.pi * t1 * k1 / n1)          # (n1, n1) scalar weights

    t2 = np.arange(LANE)[None, :]
    tw = np.exp(-2j * np.pi * t2 * np.arange(n1)[:, None] / N)  # (n1, 128)

    f = np.exp(-2j * np.pi * np.arange(LANE)[:, None]
               * np.arange(LANE)[None, :] / LANE)    # DFT-128
    frh, frl = _split_bf16(np.ascontiguousarray(f.real.astype(np.float32)))
    fih, fil = _split_bf16(np.ascontiguousarray(f.imag.astype(np.float32)))
    return (w, w8,
            np.ascontiguousarray(tw.real.astype(np.float32)),
            np.ascontiguousarray(tw.imag.astype(np.float32)),
            frh, frl, fih, fil)


def _kernel(n1: int, w8: np.ndarray,
            w, twr, twi, frh, frl, fih, fil, xre, xim,
            opwr):
    xr = xre[...] * w[...][0, :][None, :]            # windowed (b, N)
    xi = xim[...] * w[...][0, :][None, :]
    b = xr.shape[0]

    parts = []
    for k1 in range(n1):
        # n1-point DFT across lane-tile slices, trace-time scalar weights
        yr = jnp.zeros((b, LANE), jnp.float32)
        yi = jnp.zeros((b, LANE), jnp.float32)
        for t1 in range(n1):
            cr = float(w8[t1, k1].real)
            ci = float(w8[t1, k1].imag)
            sr = xr[:, t1 * LANE : (t1 + 1) * LANE]
            si = xi[:, t1 * LANE : (t1 + 1) * LANE]
            if abs(cr) > 1e-12:
                yr = yr + cr * sr
                yi = yi + cr * si
            if abs(ci) > 1e-12:
                yr = yr - ci * si
                yi = yi + ci * sr
        # twiddle W_N^{t2 k1}: lane-broadcast complex multiply
        tr = twr[...][k1, :][None, :]
        ti = twi[...][k1, :][None, :]
        zr = yr * tr - yi * ti
        zi = yr * ti + yi * tr
        # 128-point DFT on the MXU (bf16x3)
        or_ = _mm_bf16x3(zr, frh[...], frl[...]) - _mm_bf16x3(
            zi, fih[...], fil[...])
        oi_ = _mm_bf16x3(zr, fih[...], fil[...]) + _mm_bf16x3(
            zi, frh[...], frl[...])
        parts.append(or_ * or_ + oi_ * oi_)          # (b, 128) power

    if n1 == 1:
        opwr[...] = parts[0]
    else:
        # k1-major (Z-order) lane concat; the wrapper's one XLA transpose
        # restores natural bin order k = k1 + n1*k2.  (A minor-axis stack +
        # reshape interleave works in interpret mode but real Mosaic rejects
        # the (b, 128, n1) -> (b, N) shape cast, and pltpu.repeat is
        # tile-repeat, not element-repeat -- both probed on the bench chip
        # 2026-08-20.)
        opwr[...] = jnp.concatenate(parts, axis=-1)


def _build_call(fft_len: int, bt: int, w8: np.ndarray):
    N = fft_len
    n1 = N // LANE
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec((bt, N), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def call(w, twr, twi, frh, frl, fih, fil, re, im):
        rows = re.shape[0]
        return pl.pallas_call(
            functools.partial(_kernel, n1, w8),
            grid=(rows // bt,),
            in_specs=[const((1, N)), const((n1, LANE)), const((n1, LANE))]
                     + [const((LANE, LANE))] * 4 + [tile, tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(w, twr, twi, frh, frl, fih, fil, re, im)

    return call


@functools.lru_cache(maxsize=16)
def _cached(fft_len: int, window: str):
    from tpu_ofdm.spectrum import window as win

    wv = win.get(window, fft_len)
    w, w8, twr, twi, frh, frl, fih, fil = _consts(fft_len, wv)
    return (w.reshape(1, -1), w8, twr, twi, frh, frl, fih, fil)


def psd_fused(x: jnp.ndarray, fft_len: int,
              window: str = "hann") -> jnp.ndarray:
    """(n,) complex64 samples -> (n // fft_len, fft_len) linear-power PSD
    frames, matching spectrum.psd.psd_frames to bf16x3 precision (~1e-5
    relative).  Normalization (sum(w^2) * fft_len) is folded into the
    window constant."""
    N = fft_len
    assert supported(N), N
    w, w8, twr, twi, frh, frl, fih, fil = _cached(N, window)
    n = x.shape[-1]
    nf = n // N
    re = jnp.real(x[..., : nf * N]).astype(jnp.float32).reshape(nf, N)
    im = jnp.imag(x[..., : nf * N]).astype(jnp.float32).reshape(nf, N)
    bt = min(_FRAMES_PER_TILE, -(-nf // 8) * 8)
    nf_p = -(-nf // bt) * bt
    if nf_p != nf:
        re = jnp.pad(re, ((0, nf_p - nf), (0, 0)))
        im = jnp.pad(im, ((0, nf_p - nf), (0, 0)))
    out = _build_call(N, bt, w8)(
        jnp.asarray(w), jnp.asarray(twr), jnp.asarray(twi),
        jnp.asarray(frh), jnp.asarray(frl),
        jnp.asarray(fih), jnp.asarray(fil), re, im,
    )
    n1 = N // LANE
    if n1 > 1:
        # undo the kernel's k1-major Z-order (see _kernel): one f32
        # transpose pass, +8 B/sample on top of the kernel's 12
        out = out.reshape(nf_p, n1, LANE).swapaxes(-1, -2).reshape(nf_p, N)
    return out[:nf]
