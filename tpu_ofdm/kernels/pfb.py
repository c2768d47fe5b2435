"""Fused polyphase-filterbank channelizer kernel (Pallas, TPU).

ONE pass over the wideband stream does the whole pfb_channelizer_ccf
pipeline (SURVEY.md §2b "Polyphase filterbank channelizer",
gr-filter/lib/pfb_channelizer_ccf_impl.cc + polyphase_filterbank.cc,
unverified paths): commutator load, J-tap FIR arm MACs, and the cross-arm
N-point IDFT -- at 16 bytes/sample of HBM traffic (two f32 planes in, two
out).  The unfused XLA formulation (spectrum.channelizer.channelize_ext)
re-reads the input through the shifted-MAC ladder and round-trips the arm
outputs to HBM before the IFFT matmul; measured numbers live in
bench/results_kernels_tpu.json (rows channelize_stream{64,256,512} vs the
demoted pfb_channelizer64_unfused_xla row) so docstrings cannot drift from
the artifact.

Mapping (n_chan = N <= 128, 128 % N == 0, P = 128/N channel groups/row):

  * the stream rides (rpt, 128) f32 row tiles; flattened position
    t = m*N + b holds commutator input y[m, b] = x[m*N + b] -- NO lane
    reversal: the reference's reversed commutator order and the IFFT
    twiddles are FOLDED into constant matrices (derivation below),
  * each FIR arm tap j needs y[m-j, b] = xflat[t - j*N]: a lane/sublane
    lag served from a small VMEM ring of the previous tile's rows
    (kernels.sc_detect._lagged -- the same no-second-HBM-read trick),
  * z[m, b] = sum_j q[j, b] y[m-j, b] with q[j, b] = poly[j, N-1-b],
  * out[m, k] = sum_b z[m, b] G[b, k] with G[b, k] = e^{2pi i (N-1-b)k/N}:
    in row space that is ONE (rpt,128)@(128,128) MXU matmul against
    blockdiag(G, ..., G) (P copies) per re/im combination (4 total),
  * STREAMING HISTORY enters as the ring's INITIAL STATE (a tiny const
    input) instead of a concatenation -- prepending even 448 samples to a
    256 MB buffer would copy the whole buffer (measured: the concat+pad
    wrapper doubled kernel wall time).

Derivation: the reference arm order consumes xa[m, a] = x[m*N + (N-1-a)]
and emits out[m, k] = sum_a (sum_j poly[j, a] xa[m-j, a]) e^{2pi i a k/N}
(spectrum.channelizer.channelize_ext semantics, golden-matched);
substituting b = N-1-a gives the q/G form above -- identical math, zero
data movement for the reversal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ofdm.kernels.sc_detect import LANE, _lagged

_ROWS_PER_TILE = 512  # best of {128, 256, 512, 1024} on the bench chip


def tail_len(n_chan: int, taps_per_arm: int) -> int:
    """Streaming-carry length in raw samples: the FIR lookback (J-1)*N
    rounded up to whole 128-lane rows (the kernel ring granularity)."""
    return (((taps_per_arm - 1) * n_chan) // LANE + 1) * LANE


def supported(n_chan: int) -> bool:
    """Fused-kernel coverage: lane-folded path for n_chan <= 128 dividing
    the lane width; row-per-symbol path for n_chan a multiple of 128 up to
    512 (VMEM: the (N, N) DFT constants cost 8*N*N bytes -- 2 MB at 512;
    1024 would crowd out the pipeline buffers).  BASELINE config 5's 512
    channels ride the wide path."""
    if n_chan <= LANE:
        return LANE % n_chan == 0
    return n_chan % LANE == 0 and n_chan <= 512


def _mats(taps: np.ndarray, n_chan: int):
    """(q_lanes (J,128) f32, Gre (128,128) f32, Gim) constants."""
    from tpu_ofdm.spectrum.channelizer import polyphase_decompose

    N = n_chan
    P = LANE // N
    poly = polyphase_decompose(np.asarray(taps, np.float32), N)  # (J, N)
    q = poly[:, ::-1]                                  # q[j, b] = poly[j,N-1-b]
    q_lanes = np.tile(q, (1, P)).astype(np.float32)    # lane l -> b = l % N
    b = np.arange(N)[:, None]
    k = np.arange(N)[None, :]
    # channelize_ext's ifft(acc)*N nets to a plain e^{+2pi i a k/N} sum
    G = np.exp(2j * np.pi * ((N - 1 - b) * k % N) / N)
    Gfull = np.zeros((LANE, LANE), np.complex128)
    for p in range(P):
        Gfull[p * N : (p + 1) * N, p * N : (p + 1) * N] = G
    return (
        q_lanes,
        np.ascontiguousarray(Gfull.real.astype(np.float32)),
        np.ascontiguousarray(Gfull.imag.astype(np.float32)),
    )


def _kernel(J: int, N: int, rpt: int,
            qt, gre, gim, hist, xre, xim,
            ore, oim,
            in_ring):
    it = pl.program_id(0)
    qmax = ((J - 1) * N) // LANE

    @pl.when(it == 0)
    def _():
        in_ring[...] = hist[...]        # lookback = end of the previous block

    a_re, a_im = xre[...], xim[...]                    # (rpt, 128)
    r = a_re.shape[0]
    prev = in_ring[...].reshape(2, qmax + 1, LANE)

    z_re = qt[0, :][None, :] * a_re
    z_im = qt[0, :][None, :] * a_im
    for j in range(1, J):
        lag = j * N
        qj, sj = lag // LANE, lag % LANE
        l_re = _lagged(a_re, prev[0, qmax - qj :, :], qj, sj)
        l_im = _lagged(a_im, prev[1, qmax - qj :, :], qj, sj)
        tv = qt[j, :][None, :]
        z_re = z_re + tv * l_re
        z_im = z_im + tv * l_im

    mm = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    Gr, Gi = gre[...], gim[...]
    ore[...] = mm(z_re, Gr) - mm(z_im, Gi)
    oim[...] = mm(z_re, Gi) + mm(z_im, Gr)

    in_ring[...] = jnp.stack([a_re, a_im])[:, r - (qmax + 1) :, :].reshape(
        2 * (qmax + 1), LANE
    )


@functools.partial(jax.jit, static_argnames=("J", "N", "rpt"))
def _pfb_pallas(qt, gre, gim, hre, him, re, im, J: int, N: int, rpt: int):
    rows = re.shape[0]
    assert rows % rpt == 0, (rows, rpt)
    qmax = ((J - 1) * N) // LANE
    hist = jnp.concatenate([hre, him], axis=0)  # (2*(qmax+1), LANE), tiny
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec((rpt, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, J, N, rpt),
        grid=(rows // rpt,),
        in_specs=[const(qt.shape), const((LANE, LANE)), const((LANE, LANE)),
                  const(hist.shape), tile, tile],
        out_specs=[tile, tile],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2 * (qmax + 1), LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qt, gre, gim, hist, re, im)


# --- wide path: n_chan a multiple of the lane width (BASELINE config 5's
# 512 channels).  The lane-folded mapping above packs P = 128/N channels per
# row; past 128 the natural inverse applies: reshape the flat stream to
# (M, N) so each ROW is one commutator load y[m, :] = x[m*N : (m+1)*N].
# Every FIR lag j*N is then a whole-row (sublane) shift -- no lane shuffles
# at all -- and the cross-arm DFT is ONE (mt, N) @ (N, N) MXU matmul per
# re/im product.  HBM traffic is the same 16 B/sample as the narrow path.

_SYMS_PER_TILE = 128  # rows of N lanes per grid step (tuned on bench chip)

# DFT matmul precision for the wide path.  On TPU f32 matmuls are emulated
# in bf16 passes (HIGHEST = 6); Mosaic rejects Precision.HIGH inside Pallas,
# so the 3-pass bf16x3 split is done by hand: G is pre-split host-side into
# hi + lo bf16 halves, z per tile, and a@b ~= ah@bh + ah@bl + al@bh with f32
# accumulation -- ~2^-16 relative error, far inside the chain's 2e-4 golden
# tolerance, at half HIGHEST's MXU cost.  The (mt,N)@(N,N) DFT at N=512 is
# compute-significant (4096 flop/sample), so the split is worth ~35% of
# kernel throughput (measured 2026-08-20; current numbers live in
# bench/results_kernels_tpu.json, row channelize_stream512).


def _mats_wide(taps: np.ndarray, n_chan: int):
    """(q (J, N) f32, Gre (N, N) f32, Gim) constants -- same q[j, b] =
    poly[j, N-1-b] / G[b, k] = e^{2pi i (N-1-b) k / N} fold as _mats, minus
    the lane tiling/blockdiag (the symbol owns all N lanes of its rows)."""
    from tpu_ofdm.spectrum.channelizer import polyphase_decompose

    N = n_chan
    poly = polyphase_decompose(np.asarray(taps, np.float32), N)  # (J, N)
    q = np.ascontiguousarray(poly[:, ::-1]).astype(np.float32)
    b = np.arange(N)[:, None]
    k = np.arange(N)[None, :]
    G = np.exp(2j * np.pi * (((N - 1 - b) * k) % N) / N)
    return (q,
            np.ascontiguousarray(G.real.astype(np.float32)),
            np.ascontiguousarray(G.imag.astype(np.float32)))


def _split_bf16(a: np.ndarray):
    """f32 -> (hi, lo) bf16 with a ~= hi + lo (hi = round-to-bf16, lo = the
    rounding residual), the host-side half of the bf16x3 matmul."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _mm_bf16x3(a, b_hi, b_lo):
    """a (f32) @ b via 3 bf16 MXU passes with f32 accumulation."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda p, q: jax.lax.dot_general(
        p, q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _kernel_wide(J: int, N: int, mt: int,
                 qt, grh, grl, gih, gil, hist, xre, xim,
                 ore, oim,
                 ring):
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        ring[...] = hist[...]            # (2*(J-1), N): last J-1 symbol rows

    a_re, a_im = xre[...], xim[...]                     # (mt, N)
    prev = ring[...]
    # causal FIR over symbol rows: z[m] = sum_j q[j] * y[m - j]
    ext_re = jnp.concatenate([prev[: J - 1], a_re], axis=0)
    ext_im = jnp.concatenate([prev[J - 1 :], a_im], axis=0)
    z_re = qt[0, :][None, :] * a_re
    z_im = qt[0, :][None, :] * a_im
    for j in range(1, J):
        tv = qt[j, :][None, :]
        z_re = z_re + tv * ext_re[J - 1 - j : J - 1 - j + mt]
        z_im = z_im + tv * ext_im[J - 1 - j : J - 1 - j + mt]

    zG_r = _mm_bf16x3(z_re, grh[...], grl[...])
    zG_i = _mm_bf16x3(z_im, gih[...], gil[...])
    ore[...] = zG_r - zG_i
    oim[...] = (_mm_bf16x3(z_re, gih[...], gil[...])
                + _mm_bf16x3(z_im, grh[...], grl[...]))

    ring[...] = jnp.concatenate(
        [ext_re[mt:], ext_im[mt:]], axis=0  # last J-1 rows incl. short tiles
    )


@functools.partial(jax.jit, static_argnames=("J", "N", "mt"))
def _pfb_pallas_wide(qt, grh, grl, gih, gil, hre, him, re, im,
                     J: int, N: int, mt: int):
    rows = re.shape[0]
    assert rows % mt == 0, (rows, mt)
    hist = jnp.concatenate([hre, him], axis=0)          # (2*(J-1), N)
    const = lambda shape, _d=jnp.float32: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec((mt, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_wide, J, N, mt),
        grid=(rows // mt,),
        in_specs=[const(qt.shape)] + [const((N, N))] * 4
                 + [const(hist.shape), tile, tile],
        out_specs=[tile, tile],
        out_shape=[jax.ShapeDtypeStruct((rows, N), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2 * (J - 1), N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qt, grh, grl, gih, gil, hist, re, im)


def _channelize_fused_wide(x, n_chan, taps, tail):
    from tpu_ofdm.spectrum.channelizer import polyphase_decompose

    N = n_chan
    poly = polyphase_decompose(np.asarray(taps, np.float32), N)
    J = poly.shape[0]
    qt, gre, gim = _mats_wide(taps, N)
    grh, grl = _split_bf16(gre)
    gih, gil = _split_bf16(gim)
    n = x.shape[-1]
    M = n // N

    if tail is None:
        hre = jnp.zeros((J - 1, N), jnp.float32)
        him = hre
    else:
        # carry layout is tail_len() samples for checkpoint compatibility
        # with the narrow/XLA paths; the FIR needs only the last (J-1)*N
        assert tail.shape[-1] >= (J - 1) * N, (tail.shape, J, N)
        t = tail[..., tail.shape[-1] - (J - 1) * N :]
        hre = jnp.real(t).astype(jnp.float32).reshape(J - 1, N)
        him = jnp.imag(t).astype(jnp.float32).reshape(J - 1, N)

    mt = min(_SYMS_PER_TILE, -(-M // 8) * 8)
    M_p = -(-M // mt) * mt
    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)
    pad = M_p * N - n
    if pad:
        re = jnp.pad(re, (0, pad))
        im = jnp.pad(im, (0, pad))
    ore, oim = _pfb_pallas_wide(
        jnp.asarray(qt),
        jnp.asarray(grh), jnp.asarray(grl),
        jnp.asarray(gih), jnp.asarray(gil),
        hre, him,
        re.reshape(M_p, N), im.reshape(M_p, N), J=J, N=N, mt=mt,
    )
    return (ore[:M] + 1j * oim[:M]).astype(jnp.complex64)


def channelize_fused(x: jnp.ndarray, n_chan: int, taps: np.ndarray,
                     tail: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused channelizer over a flat sample buffer x (n,), n % n_chan == 0.

    tail: optional (tail_len(n_chan, J),) complex64 -- the raw samples
    IMMEDIATELY PRECEDING x (streaming lookback; zeros at stream start).
    Returns (n // n_chan, n_chan) complex64 channel rows, identical (to f32
    matmul precision) to spectrum.channelizer.channelize/_ext on the same
    data.  Zero-copy when n is a multiple of 128*8 (the common streaming
    case); ragged lengths pay one pad copy.
    """
    from tpu_ofdm.spectrum.channelizer import polyphase_decompose

    N = n_chan
    assert supported(N), N
    n = x.shape[-1]
    assert n % N == 0, (n, N)
    if N > LANE:
        return _channelize_fused_wide(x, n_chan, taps, tail)
    poly = polyphase_decompose(np.asarray(taps, np.float32), N)
    J = poly.shape[0]
    qt, gre, gim = _mats(taps, N)
    qmax = ((J - 1) * N) // LANE
    C = (qmax + 1) * LANE

    if tail is None:
        hre = jnp.zeros((qmax + 1, LANE), jnp.float32)
        him = hre
    else:
        assert tail.shape[-1] == C, (tail.shape, C)
        hre = jnp.real(tail).astype(jnp.float32).reshape(qmax + 1, LANE)
        him = jnp.imag(tail).astype(jnp.float32).reshape(qmax + 1, LANE)

    rows = -(-n // LANE)
    rows8 = -(-rows // 8) * 8
    if rows8 <= 2 * _ROWS_PER_TILE:
        rpt, rows_p = rows8, rows8
    else:
        rpt = _ROWS_PER_TILE
        rows_p = -(-rows // rpt) * rpt
    pad = rows_p * LANE - n
    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)
    if pad:
        re = jnp.pad(re, (0, pad))
        im = jnp.pad(im, (0, pad))
    ore, oim = _pfb_pallas(
        jnp.asarray(qt), jnp.asarray(gre), jnp.asarray(gim), hre, him,
        re.reshape(rows_p, LANE), im.reshape(rows_p, LANE),
        J=J, N=N, rpt=rpt,
    )
    flat = (ore.reshape(-1)[:n] + 1j * oim.reshape(-1)[:n])
    return flat.reshape(n // N, N).astype(jnp.complex64)
