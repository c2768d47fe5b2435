"""Fused Schmidl-Cox frame-detection kernel (Pallas, TPU).

ONE pass over the sample stream computes everything frame detection needs,
at 8 bytes/sample of HBM traffic (the two f32 input planes) plus ~0.2
bytes/sample of per-row summaries -- where the r1 pipeline (sc_metric kernel
+ XLA smoothing/NMS/top-k passes) moved ~32 bytes/sample over 4+ passes.
This is the TPU replacement for the hot half of the reference's
ofdm_sync_sc_cfb + plateau_detector_fb stack (SURVEY.md §2b/§3.3,
gr-digital/lib/ofdm_sync_sc_cfb_impl.cc, unverified path); the cheap
selection over the 128x-smaller row arrays lives in ops.sync.

Per (rpt, 128)-row tile, marching sequentially down the time axis:
  * the input is read ONCE; the L-lagged view x[v-L] is reconstructed from a
    small VMEM ring of the previous tile's rows (no second HBM read),
  * prod = conj(x[v-L]) x[v], e2 = |x[v]|^2 (no e1 stream: the first-half
    energy is the second-half energy L samples earlier, R1(t) = R2(t-L),
    served by lagging R2 through a small ring of its previous-tile rows),
  * TILE-LOCAL prefix sums of the three streams via one MXU matmul against
    a triangular ones matrix (the kernels/scan.py trick),
  * length-L trailing sums as cs[t] - cs[t-L] with the lag served from a
    VMEM ring of REBASED previous-tile values (prev local prefix minus the
    prev tile total, so the cross-tile difference is exact in the same
    basis) -> P(t), R2(t),
  * two-sided metric M = |P|^2 / (R1 R2) (ops.sync._metric2 semantics),
  * prefix sum of M + a W = cp+1 lag ring -> CP-boxcar smoothed sm(t),
    plus the deterministic tie-break ramp,
  * per-row (128-sample) reductions: max of sm, its global position, P and
    R2 at position t* - (cp - cp//2) (the plateau center, where the fine
    CFO is read), and the row max of R2 for the energy gate.

Precision: because every prefix sum is rebased per tile, the cancellation
error of a trailing L-sum is bounded by the TILE length (rpt * 128 = 32k
samples of O(E) energy -> f32 ulp ~ 2^-8 E, i.e. ~3e-5 relative to an
L=128 sum), independent of block length -- an unrebased carry would lose
~0.25 E absolute at 2^22 samples.  Position exactness (< 2^24) is asserted
separately in sc_detect_rows.

Indexing: everything is trailing-window at stream position t (= v); the
valid-mode arrays of the jnp fallback sit at t = d + 2L - 1.  Head of
stream: positions t < 2L + W - 2 (partial windows) are masked to the
tie-break ramp alone, so a partial-window value can never capture a row's
candidate (the jnp fallback pads them to -inf; both fail the selection's
threshold + ps-range checks identically).  ops.sync's _select_from_rows
consumes both paths identically.

All lookback rings are kept 2-D: Mosaic SIGABRTs lowering read-modify-write
of 3-D VMEM scratch (measured 2026-08-18, kernels/sc_metric.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ROWS_PER_TILE = 512


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


def _prefix(streams):
    """Within-tile (tile-LOCAL) prefix sums of (k, R, LANE) streams.
    One MXU matmul against a triangular ones matrix for the lane prefix and
    a tiny second one for the row offsets.  Cross-tile continuity is NOT a
    running carry (which would grow with block length and eat f32 mantissa,
    see module doc): the caller rebases lagged values from the previous tile
    instead."""
    k, r, _ = streams.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    tri = (jj <= ll).astype(jnp.float32)
    y = jax.lax.dot_general(
        streams.reshape(k * r, LANE), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(k, r, LANE)
    rowtot = y[:, :, LANE - 1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    strict = (rr < cc).astype(jnp.float32)
    off = jax.lax.dot_general(
        rowtot, strict,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return y + off[:, :, None]


def _kernel(L: int, W: int, c: int, rpt: int, nv: int,
            xre, xim,
            rows_o,
            in_ring, cs_ring, cm_ring, pr_ring):
    """Rings hold the last q+1 rows of [input re/im], [3 REBASED prefix
    streams], [REBASED M prefix], and [P_re, P_im, R2] respectively, each
    flattened to 2-D (Mosaic SIGABRTs on 3-D VMEM scratch RMW, see module
    doc).  "Rebased" = previous tile's local prefix minus that tile's total,
    so S = cs_local[t] - ring[t - L] is the exact global trailing sum in the
    current tile's basis (module doc, Precision).

    Only THREE streams ride the prefix path: the first-half energy window is
    the second-half one L samples earlier (R1[t] = R2[t-L] -- both are
    sum |x[u]|^2 over L consecutive u ending at t-L resp. t), so e1 is not
    computed at all; R1 is served by lagging R2 through the pr_ring, whose
    depth is qL+1 rows (covers lag L, and a fortiori the plateau lag c)."""
    it = pl.program_id(1)
    qL, sL = L // LANE, L % LANE
    qW, sW = W // LANE, W % LANE
    qc, sc = c // LANE, c % LANE

    @pl.when(it == 0)
    def _():
        in_ring[...] = jnp.zeros(in_ring.shape, in_ring.dtype)
        cs_ring[...] = jnp.zeros(cs_ring.shape, cs_ring.dtype)
        cm_ring[...] = jnp.zeros(cm_ring.shape, cm_ring.dtype)
        pr_ring[...] = jnp.zeros(pr_ring.shape, pr_ring.dtype)

    a_re, a_im = xre[0], xim[0]                      # (R, 128)
    r = a_re.shape[0]

    prev_in = in_ring[...].reshape(2, qL + 1, LANE)
    l_re = _lagged(a_re, prev_in[0], qL, sL)         # x[v-L]
    l_im = _lagged(a_im, prev_in[1], qL, sL)

    streams = jnp.stack(
        [
            l_re * a_re + l_im * a_im,               # Re conj(x[v-L]) x[v]
            l_re * a_im - l_im * a_re,               # Im
            a_re * a_re + a_im * a_im,               # e2
        ]
    )                                                 # (3, R, 128)
    cs = _prefix(streams)                             # tile-local prefixes
    csl = _lagged(cs, cs_ring[...].reshape(3, qL + 1, LANE), qL, sL)
    S = cs - csl                                      # trailing L-sums at t
    p_re, p_im, r2 = S[0], S[1], S[2]
    prev_pr = pr_ring[...].reshape(3, qL + 1, LANE)
    r1 = _lagged(r2, prev_pr[2], qL, sL)             # R1[t] = R2[t-L]

    # two-sided normalized metric (ops.sync._metric2 semantics)
    p2 = p_re * p_re + p_im * p_im
    den = r1 * r2
    M = jnp.where(
        den > 0.0, jnp.minimum(p2 / jnp.maximum(den, 1e-12), 2.0), 0.0
    )

    cm = _prefix(M[None])                             # (1, R, 128)
    cml = _lagged(cm, cm_ring[...].reshape(1, qW + 1, LANE), qW, sW)
    sm = (cm - cml)[0] * (1.0 / W)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
    t_loc = jax.lax.broadcasted_iota(
        jnp.int32, (r, LANE), 0
    ) * LANE + lane                                   # tile-local position

    # head of stream: positions t < 2L + W - 2 (etc.) have only partial
    # windows and must be masked to match the jnp fallback.  All thresholds
    # are < one tile (2L + W <= 2*512 + 129 << rpt*LANE), so for every tile
    # but the first the masks are all-true: compare against a scalar that
    # goes negative from tile 1 on, and XLA's VPU predication makes the
    # always-true lanes free of data movement.
    # ... and the zero-padded TAIL (positions t >= nv, the true sample
    # count): sm there still holds real window content decaying over W
    # samples, which could capture a ragged last row's candidate away from
    # a genuine in-range peak (the jnp fallback pads those positions to
    # -inf; selection's ps-range check would drop the candidate, losing
    # the row).  Both bounds are tile-local scalar compares.
    base = it * (rpt * LANE)                          # scalar, SREG
    sm = jnp.where(
        (t_loc >= 2 * L + W - 2 - base) & (t_loc < nv - base), sm, 0.0
    )
    # deterministic tie-break ramp (ops.sync._tiebreak): t & 0xFFFF with
    # t = t_loc + it*rpt*LANE; since rpt*LANE is a multiple of 2^15 and
    # 0x10000 = 2 tiles at rpt=256, the wrap reduces to a scalar offset
    base16 = base & 0xFFFF                            # scalar
    sm = sm + (t_loc + base16).astype(jnp.float32) * 1e-7

    # P / R2 at the plateau center t - c; the ring covers lag L >= c, so
    # slice its trailing qc+1 rows for the shorter lag
    PR = jnp.stack([p_re, p_im, r2])
    PRc = _lagged(PR, prev_pr[:, qL - qc:, :], qc, sc)
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
    # in f32); the wrapper reconstructs the global position in int32, so
    # block length is bounded by int32 range, not f32 mantissa.
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
    # ("offsets_[0] < tiling_[0]", bisected 2026-08-19).  The prefix rings
    # store REBASED tails (local prefix minus tile total, via a standard
    # reduce rather than a last-lane slice, which trips Mosaic layout
    # inference); bit-exactness vs cs[., r-1, LANE-1] is not required --
    # any O(ulp) total mismatch is a fixed tiny offset on next-tile head
    # sums, bounded by the same per-tile analysis (module doc).
    tot3 = jnp.sum(streams.reshape(3, r * LANE), axis=1, keepdims=True)
    totm = jnp.sum(M.reshape(1, r * LANE), axis=1, keepdims=True)
    in_ring[...] = jnp.stack([a_re, a_im])[:, r - (qL + 1) :, :].reshape(
        2 * (qL + 1), LANE
    )
    cs_ring[...] = (cs[:, r - (qL + 1) :, :] - tot3[:, :, None]).reshape(
        3 * (qL + 1), LANE
    )
    cm_ring[...] = (cm[:, r - (qW + 1) :, :] - totm[:, :, None]).reshape(
        qW + 1, LANE
    )
    pr_ring[...] = PR[:, r - (qL + 1) :, :].reshape(3 * (qL + 1), LANE)


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "c", "rpt", "nv"))
def _sc_detect_pallas(re, im, L: int, W: int, c: int, rpt: int, nv: int):
    """re/im: (B, rows, 128) f32 with rows % rpt == 0."""
    b, rows, _ = re.shape
    assert rows % rpt == 0, (rows, rpt)
    qL, qW, qc = L // LANE, W // LANE, c // LANE
    # sublane (input) tiling needs 8-alignment; the packed OUTPUT's lane dim
    # is tiled by rpt, which must be 128-aligned ONLY when a batch row spans
    # several tiles (a full-dim block may be any 8-multiple)
    assert rpt % 8 == 0, rpt
    assert rows == rpt or rpt % LANE == 0, (rows, rpt)
    # the tie-break ramp folds the 2^16 wrap into a per-tile scalar, which
    # is only exact while one tile never spans a wrap boundary internally
    assert rpt * LANE <= (1 << 16), rpt
    in_spec = pl.BlockSpec(
        (1, rpt, LANE), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 6, rpt), lambda ib, it: (ib, 0, it), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, L, W, c, rpt, nv),
        grid=(b, rows // rpt),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, 6, rows), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2 * (qL + 1), LANE), jnp.float32),
            pltpu.VMEM((3 * (qL + 1), LANE), jnp.float32),
            pltpu.VMEM((qW + 1, LANE), jnp.float32),
            pltpu.VMEM((3 * (qL + 1), LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(re, im)


def sc_detect_rows(r: jnp.ndarray, L: int, cp: int):
    """Row summaries (smmax, smarg, pre, pim, r_at, rmax) for a complex64
    sample block r (..., n), each (..., ceil(n/128)); fed to
    ops.sync._select_from_rows.  Trailing-window indexing (see module doc);
    candidates in the zero-padded tail rows carry sm ~= tie-break only and
    are masked by the selection's ps-range check."""
    W = cp + 1
    c = cp - cp // 2
    lead = r.shape[:-1]
    n = r.shape[-1]
    b = 1
    for d in lead:
        b *= d
    rb = r.reshape(b, n)
    re = jnp.real(rb).astype(jnp.float32)
    im = jnp.imag(rb).astype(jnp.float32)

    assert n < (1 << 31) - LANE, "positions must stay exact in int32"
    # metric precision needs no companion guard: per-tile carry rebasing
    # bounds L-sum cancellation error by the 32k-sample tile, not n (module
    # doc, Precision paragraph)
    rows = -(-n // LANE)
    # Tile selection: a batch row that fits one tile (the 2^16-sample
    # tie-break wrap bound, = _ROWS_PER_TILE rows) runs grid (b, 1) with
    # rpt = rows rounded to the 8-sublane tile -- ZERO padded work (the
    # wideband RX feeds 64 channels of ~288 rows each; padding every
    # channel to the full tile cost 44% of the kernel, measured
    # 2026-08-19).  Longer rows tile at _ROWS_PER_TILE, padding the tail
    # tile only (<= rpt-1 rows, negligible at streaming block sizes).
    rows8 = -(-rows // 8) * 8
    if rows8 * LANE <= (1 << 16):
        rpt = rows8
        rows_p = rows8
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
