"""Fused Schmidl-Cox frame-detection kernel (Pallas, TPU).

ONE pass over the sample stream computes everything frame detection needs,
at 8 bytes/sample of HBM traffic (the two f32 input planes) plus ~0.2
bytes/sample of per-row summaries.  This is the TPU replacement for the hot
half of the reference's ofdm_sync_sc_cfb + plateau_detector_fb stack
(SURVEY.md §2b/§3.3, gr-digital/lib/ofdm_sync_sc_cfb_impl.cc, unverified
path); the cheap selection over the 128x-smaller row arrays lives in
ops.sync.

The kernel is NOT memory-bound: at 8 B/sample its HBM time is a small
fraction of the step, and an in-kernel ablation (bench/step_budget.py,
measured 2026-08-21 on TPU v5 lite) showed the r2-r4 design spent most of
its time in f32-HIGHEST prefix matmuls (6 MXU passes each) and the VPU
lag/rebase plumbing around them.  This version therefore computes every
sliding window DIRECTLY as a banded matmul:

  * per (rpt, 128)-row tile, marching sequentially down the time axis, the
    input is read ONCE; the L-lagged view x[v-L] comes from a small VMEM
    ring of the previous tile's rows (no second HBM read),
  * the three product streams prod = conj(x[v-L]) x[v] (re, im) and
    e2 = |x[v]|^2 are formed on the VPU,
  * every trailing window sum -- P(t) (width L), R2(t) (width L),
    R1(t) = R2(t-L) (width L at lag L), and the CP-boxcar sm(t) (width
    W = cp+1 over the metric M) -- is ONE banded MXU matmul per source:
    out[r, l] = sum_{k,j} src[r-k, j] * B_k[j, l] with 0/1 band matrices
    B_k[j, l] = [d <= l + 128k - j < d + w] stacked along the contraction
    axis for all row shifts k; the shifted row planes come from small VMEM
    rings of the last ceil((d+w-1)/128) source rows,
  * precision: each f32 source is split hi/lo into TWO bf16 planes
    (s = hi + lo + eps, |eps| <= 2^-17 |s|); the 0/1 bands are exact in
    bf16, so a window sum's error is ~sqrt(w) * 2^-17 of one element, i.e.
    ~1e-6 relative -- BETTER conditioned than the r2-r4 tile-rebased f32
    prefix differences (~6e-5), because nothing large is ever cancelled.
    Both bf16 split planes ride one matmul: the band stack is tiled
    vertically per split, accumulation is f32 in the MXU,
  * two-sided metric M = |P|^2 / (R1 R2) (ops.sync._metric2 semantics),
    then sm = banded boxcar of M, plus the deterministic tie-break ramp
    (t & 0xFFFF computed elementwise, so tiles may span the 2^16 wrap),
  * per-row (128-sample) reductions: max of sm, its position, P and R2 at
    position t* - (cp - cp//2) (the plateau center, where the fine CFO is
    read -- served by lagging the window arrays through a 2-row ring), and
    the row max of R2 for the energy gate.

Indexing: everything is trailing-window at stream position t (= v); the
valid-mode arrays of the jnp fallback sit at t = d + 2L - 1.  Head of
stream: positions t < 2L + W - 2 (partial windows) are masked to the
tie-break ramp alone, so a partial-window value can never capture a row's
candidate (the jnp fallback pads them to -inf; both fail the selection's
threshold + ps-range checks identically).  Positions ride as int32
(row-relative lane index in the packed output, globalized by the wrapper);
the block bound n < 2^30 is asserted in sc_detect_rows.  ops.sync's
_select_from_rows consumes both paths identically.

All lookback rings are kept 2-D: Mosaic SIGABRTs lowering read-modify-write
of 3-D VMEM scratch (measured 2026-08-18, kernels/sc_metric.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# 64k-sample tiles: 1024-row tiles measured only ~0.6% faster (2026-08-21),
# and the smaller tile keeps the split-input history tile (hist_tile_len)
# small and the block-alignment gate in modem.rx_stream permissive; the
# tie-break wrap is handled in-kernel for any rpt.
_ROWS_PER_TILE = 512
_NSPLIT = 2  # bf16 planes per f32 source (see Precision in module doc)


def _lagged(cur, prev, q: int, s: int):
    """z[t] = stream[t - (q*LANE + s)] for a rowized stream.

    cur: (..., R, LANE) current tile rows; prev: (..., q+1, LANE) the last
    q+1 rows preceding the tile.  Two concatenations + a lane-index select
    (the lane rotation by s), no gathers."""
    r = cur.shape[-2]

    def down(j):
        if j == 0:
            return cur
        return jnp.concatenate(
            [prev[..., q + 1 - j :, :], cur[..., : r - j, :]], axis=-2
        )

    if s == 0:
        return down(q)

    def rot(x):
        return jnp.concatenate(
            [x[..., LANE - s :], x[..., : LANE - s]], axis=-1
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
    return jnp.where(lane >= s, rot(down(q)), rot(down(q + 1)))


def _ks_for(windows) -> list[int]:
    """Row shifts k with any nonzero band across `windows` = [(w, d), ...]:
    the deepest sample a window reaches is d + w - 1 lanes back."""
    kmax = max(-(-(d + w - 1) // LANE) for w, d in windows)
    return list(range(kmax + 1))


def _band_rhs(windows, ks) -> np.ndarray:
    """(len(ks)*LANE, len(windows)*LANE) f32 stack of 0/1 band matrices:
    rows are contraction blocks per shift k (source row r-k), columns are
    output blocks per window (w, d); B_k[j, l] = [d <= l + 128k - j < d+w],
    i.e. source position t - (l + 128k - j) falls inside the trailing
    window [t-d-w+1, t-d]."""
    out = np.zeros((len(ks) * LANE, len(windows) * LANE), np.float32)
    j = np.arange(LANE)[:, None]
    l = np.arange(LANE)[None, :]
    for wi, (w, d) in enumerate(windows):
        for ki, k in enumerate(ks):
            delta = l + LANE * k - j
            out[ki * LANE : (ki + 1) * LANE,
                wi * LANE : (wi + 1) * LANE] = (
                (delta >= d) & (delta < d + w)
            )
    return out


def _split_bf16(x, n: int):
    """x (f32) -> n bf16 planes summing to x up to ~2^-(9n) relative."""
    outs = []
    rem = x
    for _ in range(n - 1):
        h = rem.astype(jnp.bfloat16)
        outs.append(h)
        rem = rem - h.astype(jnp.float32)
    outs.append(rem.astype(jnp.bfloat16))
    return outs


def _kernel(L: int, W: int, c: int, rpt: int, nv: int, split_inputs: bool,
            *refs):
    """Rings hold the last rows of [input re/im] (for the L-lag of x),
    [the 3 f32 product streams] (for banded row shifts), [M] (for the sm
    band), and [P_re, P_im, R2 window arrays] (for the plateau-center lag),
    each flattened to 2-D (Mosaic SIGABRTs on 3-D VMEM scratch RMW, see
    module doc).

    split_inputs=False: refs = (xre, xim, rhs_p, rhs_e, rhs_m, rows_o,
    rings...) over one contiguous buffer.  split_inputs=True: refs =
    (hre, him, xre, xim, rhs..., ...): tile 0 comes from the one-tile
    history buffer and tiles 1.. from the block buffer -- the streaming RX
    uses this so the [history | block] buffer is never materialized (the
    concat write + re-read cost ~1.5 ms/step at 2^25, measured 2026-08-21);
    both blocks are DMA'd per step but constant index maps make Pallas
    cache them, so the only extra cost is one select per plane."""
    if split_inputs:
        (hre, him, xre, xim, rhs_p, rhs_e, rhs_m,
         rows_o, in_ring, s_ring, m_ring, w_ring) = refs
    else:
        (xre, xim, rhs_p, rhs_e, rhs_m,
         rows_o, in_ring, s_ring, m_ring, w_ring) = refs
    it = pl.program_id(1)
    qL, sL = divmod(L, LANE)
    qc, sc_ = divmod(c, LANE)
    ks_e = _ks_for([(L, 0), (L, L)])
    k1 = max(ks_e)                      # source-ring depth (>= P's kmax)
    ks_m = _ks_for([(W, 0)])
    km = max(1, *ks_m)                  # ring depth >= 1 (W=1 edge case)

    @pl.when(it == 0)
    def _():
        in_ring[...] = jnp.zeros(in_ring.shape, in_ring.dtype)
        s_ring[...] = jnp.zeros(s_ring.shape, s_ring.dtype)
        m_ring[...] = jnp.zeros(m_ring.shape, m_ring.dtype)
        w_ring[...] = jnp.zeros(w_ring.shape, w_ring.dtype)

    if split_inputs:
        first = it == 0
        a_re = jnp.where(first, hre[0], xre[0])      # (R, 128)
        a_im = jnp.where(first, him[0], xim[0])
    else:
        a_re, a_im = xre[0], xim[0]                  # (R, 128)
    r = a_re.shape[0]

    prev_in = in_ring[...].reshape(2, qL + 1, LANE)
    l_re = _lagged(a_re, prev_in[0], qL, sL)         # x[v-L]
    l_im = _lagged(a_im, prev_in[1], qL, sL)

    pre_s = l_re * a_re + l_im * a_im                # Re conj(x[v-L]) x[v]
    pim_s = l_re * a_im - l_im * a_re                # Im
    e2_s = a_re * a_re + a_im * a_im                 # |x[v]|^2

    def windows_of(cur, prev, ks, rhs, kdepth):
        """All trailing-window sums of one f32 source in ONE bf16 matmul.
        prev: (kdepth, LANE) f32 = the last kdepth rows before this tile."""
        cur_sp = _split_bf16(cur, _NSPLIT)
        prev_sp = _split_bf16(prev, _NSPLIT)
        planes = []
        for si in range(_NSPLIT):
            for k in ks:
                if k == 0:
                    planes.append(cur_sp[si])
                else:
                    planes.append(jnp.concatenate(
                        [prev_sp[si][kdepth - k :, :],
                         cur_sp[si][: r - k, :]], axis=0))
        lhs = jnp.concatenate(planes, axis=1)
        return jax.lax.dot_general(
            lhs, rhs[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    prev_s = s_ring[...].reshape(3, k1, LANE)
    ks_p = _ks_for([(L, 0)])
    p_re = windows_of(pre_s, prev_s[0], ks_p, rhs_p, k1)   # (R, 128)
    p_im = windows_of(pim_s, prev_s[1], ks_p, rhs_p, k1)
    y_e = windows_of(e2_s, prev_s[2], ks_e, rhs_e, k1)     # (R, 256)
    r2 = y_e[:, :LANE]
    r1 = y_e[:, LANE:]                                     # R1[t] = R2[t-L]

    # two-sided normalized metric (ops.sync._metric2 semantics)
    p2 = p_re * p_re + p_im * p_im
    den = r1 * r2
    M = jnp.where(
        den > 0.0, jnp.minimum(p2 / jnp.maximum(den, 1e-12), 2.0), 0.0
    )

    sm = windows_of(M, m_ring[...], ks_m, rhs_m, km) * (1.0 / W)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
    t_loc = jax.lax.broadcasted_iota(
        jnp.int32, (r, LANE), 0
    ) * LANE + lane                                   # tile-local position

    # head of stream: positions t < 2L + W - 2 (partial windows) are masked
    # to match the jnp fallback; the zero-padded TAIL (t >= nv) is masked so
    # a decaying window cannot capture a ragged last row's candidate.  Both
    # are tile-local scalar compares (all-true except first/last tiles).
    base = it * (rpt * LANE)                          # scalar, SREG
    sm = jnp.where(
        (t_loc >= 2 * L + W - 2 - base) & (t_loc < nv - base), sm, 0.0
    )
    # deterministic tie-break ramp (ops.sync._tiebreak): (t & 0xFFFF)*1e-7
    # computed elementwise, so a tile may span the 2^16 wrap (any rpt)
    t16 = (t_loc + (base & 0xFFFF)) & 0xFFFF
    sm = sm + t16.astype(jnp.float32) * 1e-7

    # P / R2 at the plateau center t - c, via a lag of the window arrays
    # served from a small ring of their previous-tile rows
    PR = jnp.stack([p_re, p_im, r2])
    PRc = _lagged(PR, w_ring[...].reshape(3, qc + 1, LANE), qc, sc_)
    PRc = jnp.where(t_loc[None] >= 2 * L - 1 + c - base, PRc, 0.0)
    r2m = jnp.where(t_loc >= 2 * L - 1 - base, r2, 0.0)

    rowmax = jnp.max(sm, axis=-1)
    argl = jnp.min(
        jnp.where(sm == rowmax[:, None], lane, LANE), axis=-1
    )                                                  # first max, as argmax
    onehot = lane == argl[:, None]
    # ONE masked reduction for all three plateau-center picks
    picks = jnp.sum(jnp.where(onehot[None], PRc, 0.0), axis=-1)  # (3, r)

    # ONE packed (6, rpt) f32 output block, not six (1, rpt) arrays: a
    # (1, rows) 2-D pallas output read directly by downstream jitted code
    # came back with a mismatched layout on this backend (values correct
    # after a host round-trip, garbage when consumed on device; 2026-08-19).
    # The argmax rides as the ROW-RELATIVE lane index (0..127, always exact
    # in f32); the wrapper reconstructs the global position in int32.
    rows_o[0] = jnp.stack(
        [
            rowmax,
            argl.astype(jnp.float32),
            picks[0],
            picks[1],
            picks[2],
            jnp.max(r2m, axis=-1),
        ]
    )

    # 2-D slice stores: a 1-D concatenate here SIGABRTs Mosaic
    # ("offsets_[0] < tiling_[0]", bisected 2026-08-19)
    in_ring[...] = jnp.stack([a_re, a_im])[:, r - (qL + 1) :, :].reshape(
        2 * (qL + 1), LANE
    )
    s_ring[...] = jnp.stack([pre_s, pim_s, e2_s])[:, r - k1 :, :].reshape(
        3 * k1, LANE
    )
    m_ring[...] = M[r - km :, :]
    w_ring[...] = PR[:, r - (qc + 1) :, :].reshape(3 * (qc + 1), LANE)


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "c", "rpt", "nv"))
def _sc_detect_pallas(re, im, L: int, W: int, c: int, rpt: int, nv: int):
    """re/im: (B, rows, 128) f32 with rows % rpt == 0."""
    b, rows, _ = re.shape
    assert rows % rpt == 0, (rows, rpt)
    qL, qc = L // LANE, c // LANE
    # bf16 source planes need 16-sublane tiling; the packed OUTPUT's lane
    # dim is tiled by rpt, which must be 128-aligned ONLY when a batch row
    # spans several tiles (a full-dim block may be any 16-multiple)
    assert rpt % 16 == 0, rpt
    assert rows == rpt or rpt % LANE == 0, (rows, rpt)
    ks_e = _ks_for([(L, 0), (L, L)])
    k1 = max(ks_e)
    ks_m = _ks_for([(W, 0)])
    km = max(1, *ks_m)
    rhs_p = np.tile(_band_rhs([(L, 0)], _ks_for([(L, 0)])), (_NSPLIT, 1))
    rhs_e = np.tile(_band_rhs([(L, 0), (L, L)], ks_e), (_NSPLIT, 1))
    rhs_m = np.tile(_band_rhs([(W, 0)], ks_m), (_NSPLIT, 1))
    in_spec = pl.BlockSpec(
        (1, rpt, LANE), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM
    )
    rhs_specs = [
        pl.BlockSpec(t.shape, lambda ib, it: (0, 0),
                     memory_space=pltpu.VMEM)
        for t in (rhs_p, rhs_e, rhs_m)
    ]
    out_spec = pl.BlockSpec(
        (1, 6, rpt), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, L, W, c, rpt, nv, False),
        grid=(b, rows // rpt),
        in_specs=[in_spec, in_spec] + rhs_specs,
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, 6, rows), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2 * (qL + 1), LANE), jnp.float32),
            pltpu.VMEM((3 * k1, LANE), jnp.float32),
            pltpu.VMEM((km, LANE), jnp.float32),
            pltpu.VMEM((3 * (qc + 1), LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(re, im,
      jnp.asarray(rhs_p, jnp.bfloat16),
      jnp.asarray(rhs_e, jnp.bfloat16),
      jnp.asarray(rhs_m, jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("L", "W", "c"))
def _sc_detect_pallas_hist(hre, him, re, im, L: int, W: int, c: int):
    """Split-input form for the streaming RX: hre/him are ONE tile
    (_ROWS_PER_TILE, 128) of [front-zero-pad | history] planes, re/im the
    (rows, 128) block planes with rows % _ROWS_PER_TILE == 0.  Equivalent
    to _sc_detect_pallas over the concatenated buffer -- without ever
    building it."""
    rpt = _ROWS_PER_TILE
    rows, _ = re.shape
    assert hre.shape == (rpt, LANE), hre.shape
    assert rows % rpt == 0, (rows, rpt)
    qL, qc = L // LANE, c // LANE
    ks_e = _ks_for([(L, 0), (L, L)])
    k1 = max(ks_e)
    ks_m = _ks_for([(W, 0)])
    km = max(1, *ks_m)
    rhs_p = np.tile(_band_rhs([(L, 0)], _ks_for([(L, 0)])), (_NSPLIT, 1))
    rhs_e = np.tile(_band_rhs([(L, 0), (L, L)], ks_e), (_NSPLIT, 1))
    rhs_m = np.tile(_band_rhs([(W, 0)], ks_m), (_NSPLIT, 1))
    n_tiles = 1 + rows // rpt
    nv = n_tiles * rpt * LANE  # fully aligned: the tail mask never bites
    h_spec = pl.BlockSpec(
        (1, rpt, LANE), lambda ib, it: (0, 0, 0), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (1, rpt, LANE),
        lambda ib, it: (0, jnp.maximum(it - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    rhs_specs = [
        pl.BlockSpec(t.shape, lambda ib, it: (0, 0),
                     memory_space=pltpu.VMEM)
        for t in (rhs_p, rhs_e, rhs_m)
    ]
    out_spec = pl.BlockSpec(
        (1, 6, rpt), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    (packed,) = pl.pallas_call(
        functools.partial(_kernel, L, W, c, rpt, nv, True),
        grid=(1, n_tiles),
        in_specs=[h_spec, h_spec, x_spec, x_spec] + rhs_specs,
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((1, 6, n_tiles * rpt), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2 * (qL + 1), LANE), jnp.float32),
            pltpu.VMEM((3 * k1, LANE), jnp.float32),
            pltpu.VMEM((km, LANE), jnp.float32),
            pltpu.VMEM((3 * (qc + 1), LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(hre.reshape(1, rpt, LANE), him.reshape(1, rpt, LANE),
      re.reshape(1, rows, LANE), im.reshape(1, rows, LANE),
      jnp.asarray(rhs_p, jnp.bfloat16),
      jnp.asarray(rhs_e, jnp.bfloat16),
      jnp.asarray(rhs_m, jnp.bfloat16))
    return packed


def hist_tile_len() -> int:
    """Sample capacity of the split-input history tile (front-zero-padded
    by the caller to exactly this length)."""
    return _ROWS_PER_TILE * LANE


def sc_detect_rows_hist(hre, him, re, im, L: int, cp: int):
    """Row summaries over the VIRTUAL buffer [hist_tile | block] without
    materializing it (split-input kernel; streaming RX fast path).  hre/him:
    (hist_tile_len(),) f32; re/im: (n,) f32 with n % hist_tile_len() == 0.
    Positions are in virtual-buffer coordinates (hist tile first)."""
    assert cp - cp // 2 <= L
    rpt = _ROWS_PER_TILE
    n = re.shape[-1]
    assert n % (rpt * LANE) == 0, n
    assert n + rpt * LANE < (1 << 30)
    packed = _sc_detect_pallas_hist(
        hre.reshape(rpt, LANE), him.reshape(rpt, LANE),
        re.reshape(-1, LANE), im.reshape(-1, LANE),
        L, cp + 1, cp - cp // 2,
    )
    rows = packed.shape[-1]
    out = lambda i: packed[0, i, :]
    smarg = (
        jnp.arange(rows, dtype=jnp.int32) * LANE + out(1).astype(jnp.int32)
    )
    return (out(0), smarg, out(2), out(3), out(4), out(5))


def detect_aligned_len(n: int) -> int:
    """Smallest n' >= n at which sc_detect_rows' input needs ZERO padding,
    so the wrapper's jnp.pad is elided instead of copying the whole plane
    (measured 2026-08-21: the pad copy cost ~1.4 ms/step at 2^25+history in
    the streaming RX -- callers that control the buffer length should
    zero-extend to this length in the concat that builds it, which is
    free)."""
    rows = -(-n // LANE)
    rows16 = -(-rows // 16) * 16
    if rows16 <= _ROWS_PER_TILE:
        return rows16 * LANE
    return -(-rows // _ROWS_PER_TILE) * _ROWS_PER_TILE * LANE


def sc_detect_rows(r, L: int, cp: int):
    """Row summaries (smmax, smarg, pre, pim, r_at, rmax) for a sample
    block r (..., n) -- complex64 or a device_io.PackedComplex of (re, im)
    f32 planes -- each output (..., ceil(n/128)); fed to
    ops.sync._select_from_rows.  The plane form is the zero-copy TPU path
    (the kernel consumes f32 planes anyway).  Trailing-window indexing (see
    module doc); candidates in the zero-padded tail rows carry sm ~=
    tie-break only and are masked by the selection's ps-range check."""
    from tpu_ofdm.utils.device_io import PackedComplex

    W = cp + 1
    c = cp - cp // 2
    if isinstance(r, PackedComplex):
        re0, im0 = r.re, r.im
    else:
        r = r.astype(jnp.complex64)
        re0 = jnp.real(r).astype(jnp.float32)
        im0 = jnp.imag(r).astype(jnp.float32)
    lead = re0.shape[:-1]
    n = re0.shape[-1]
    b = 1
    for d in lead:
        b *= d
    re = re0.reshape(b, n)
    im = im0.reshape(b, n)

    # 2^30, not full int32 range: ops.sync._select_from_rows marks invalid
    # candidates with the sentinel big = 1 << 30, so a genuine position at
    # or above it would be classified invalid (ADVICE r4)
    assert n < (1 << 30), "positions must stay below the selection sentinel"
    # the plateau-center lag must fit the w_ring lookback (OfdmConfig
    # validates cp_len < fft_len, which implies this; belt and braces here)
    assert c <= L, (c, L)
    rows = -(-n // LANE)
    # Tile selection: a batch row that fits one tile runs grid (b, 1) with
    # rpt = rows rounded to the 16-sublane bf16 tile -- ZERO padded work
    # (the wideband RX feeds 64 channels of ~288 rows each; padding every
    # channel to the full tile cost 44% of the kernel, measured
    # 2026-08-19).  Longer rows tile at _ROWS_PER_TILE, padding the tail
    # tile only (<= rpt-1 rows, negligible at streaming block sizes).
    rows16 = -(-rows // 16) * 16
    if rows16 <= _ROWS_PER_TILE:
        rpt = rows16
        rows_p = rows16
    else:
        rpt = _ROWS_PER_TILE
        rows_p = -(-rows // rpt) * rpt
    pad = rows_p * LANE - n
    re = jnp.pad(re, ((0, 0), (0, pad))).reshape(b, rows_p, LANE)
    im = jnp.pad(im, ((0, 0), (0, pad))).reshape(b, rows_p, LANE)
    (packed,) = _sc_detect_pallas(re, im, L, W, c, rpt, n)
    out = lambda i: packed[:, i, :rows].reshape(*lead, rows)
    # global argmax position in int32 from the kernel's row-relative lane
    # index (exact for any block length; f32 would cap blocks at 2^24)
    smarg = (
        jnp.arange(rows, dtype=jnp.int32) * LANE + out(1).astype(jnp.int32)
    )
    return (
        out(0),
        smarg,
        out(2),
        out(3),
        out(4),
        out(5),
    )
