"""Schmidl-Cox timing/CFO synchronization as fused array ops.

TPU-native equivalent of ofdm_sync_sc_cfb + plateau_detector_fb
(SURVEY.md §2b/§3.3, gr-digital/lib/ofdm_sync_sc_cfb_impl.cc and
plateau_detector_fb_impl.cc, unverified paths).

The reference builds this from ~8 streaming blocks (delay, multiply-conjugate,
two moving averages, divide, plateau detector), each a thread+ring-buffer hop.
Here the whole stack is a handful of cumsum/elementwise ops over the entire
sample block at once -- XLA fuses them into a few passes over HBM, and the
"plateau detector" becomes boxcar smoothing + windowed argmax (non-maximum
suppression), yielding up to `max_frames` detections per block with a
validity mask (static shapes; SURVEY.md §7 decision 2).

Math: P(d) = sum_{m<L} conj(r[d+m]) r[d+m+L], L = fft_len/2;
R(d) = sum_{m<L} |r[d+m+L]|^2;  M(d) = |P|^2 / R^2.
Fine CFO (subcarrier units) = angle(P) / pi.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_ofdm.config import OfdmSpec
from tpu_ofdm.kernels import scan


def sliding_max(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Valid-mode sliding max along the last axis: out[i] = max x[i:i+w],
    output length n - w + 1.  Uses the log-doubling trick (O(log w) shifted
    maxes) instead of lax.reduce_window, whose stride-1 large-window form
    compiles pathologically slowly on TPU (~60s for w=80)."""
    n = x.shape[-1]
    if w <= 1:
        return x
    y = x
    p = 1
    while p * 2 <= w:
        y = jnp.maximum(y[..., :-p], y[..., p:])
        p *= 2
    # y[i] = max x[i:i+p]; combine two p-windows covering [i, i+w)
    if p < w:
        y = jnp.maximum(y[..., : n - w + 1], y[..., w - p: w - p + n - w + 1])
    return y


def sliding_max_same(x: jnp.ndarray, w: int, pad_left: int) -> jnp.ndarray:
    """Same-length sliding max: out[i] = max x[i-pad_left : i-pad_left+w]
    (out-of-range treated as -inf)."""
    padded = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad_left, w - 1 - pad_left)],
        constant_values=-jnp.inf,
    )
    return sliding_max(padded, w)


def coarse_sliding_max_same(x: jnp.ndarray, w: int, g: int = 128) -> jnp.ndarray:
    """Block-granular same-length sliding max: out[i] = max over a window
    that CONTAINS the centered w-window and at most w + 3g samples.

    Exact sliding max costs ~log2(w) full HBM passes (the log-doubling
    ladder); this computes per-block maxima (one reduce pass), runs the
    tiny ladder on the n/g block array, and broadcasts back -- ~1 pass
    total.  Both uses in this module (energy gate, peak non-max
    suppression) tolerate the enlarged window: the gate is a heuristic,
    and for NMS it only merges peaks closer than ~(w/2 + 2g) samples,
    well under one frame length."""
    n = x.shape[-1]
    nb = -(-n // g)
    pad = nb * g - n
    xb = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=-jnp.inf
    ).reshape(*x.shape[:-1], nb, g)
    rowmax = xb.max(-1)
    k = -(-(w // 2 + g) // g)
    wm = sliding_max_same(rowmax, 2 * k + 1, pad_left=k)
    full = jnp.broadcast_to(wm[..., None], (*wm.shape, g))
    return full.reshape(*x.shape[:-1], nb * g)[..., :n]


def moving_sum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Valid-mode moving sum along the last axis: out[d] = sum x[d:d+w].
    Output length = n - w + 1.  Single cumsum (the Pallas one-pass kernel on
    TPU, kernels/scan.py) + lead-lag difference, rather than the reference's
    stateful moving_average block."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = scan.moving_sums([jnp.real(x), jnp.imag(x)], w)
        return (re + 1j * im).astype(jnp.complex64)
    c = scan.cumsum(x.astype(jnp.float32) if x.dtype == jnp.float64 else x,
                    axis=-1)
    lead = c[..., w - 1:]
    lag = jnp.concatenate(
        [jnp.zeros_like(c[..., :1]), c[..., : c.shape[-1] - w]], axis=-1
    )
    return lead - lag


class SyncMetric(NamedTuple):
    metric: jnp.ndarray   # M(d), float32, length n - fft_len
    corr: jnp.ndarray     # P(d), complex64, same length
    energy: jnp.ndarray   # R(d), float32, same length


def schmidl_cox(spec: OfdmSpec, r: jnp.ndarray) -> SyncMetric:
    """Compute the Schmidl-Cox metric over a sample block (last axis)."""
    L = spec.fft_len // 2
    n = r.shape[-1]
    if scan.use_pallas() and n >= (1 << 15) and L // 128 + 1 < 128:
        # fully fused single-HBM-pass kernel (kernels/sc_metric.py)
        from tpu_ofdm.kernels.sc_metric import sc_sliding_metric

        P, R, M = sc_sliding_metric(r.astype(jnp.complex64), L)
    else:
        prod = jnp.conj(r[..., :-L]) * r[..., L:]
        energy = jnp.abs(r[..., L:]) ** 2
        # one fused sliding-sum pass for all three real streams
        p_re, p_im, R = scan.moving_sums(
            [jnp.real(prod), jnp.imag(prod), energy], L
        )
        P = (p_re + 1j * p_im).astype(jnp.complex64)
        M = None
    if M is None:
        M = jnp.abs(P) ** 2 / jnp.maximum(R, 1e-12) ** 2
    # Suppress low-energy regions where the ratio is unreliable.  The energy
    # scale is LOCAL (sliding max over ~2 symbols) rather than the block
    # max: a block-global gate would silently drop a weak frame whenever a
    # strong one shares the block (dynamic-range bug), and would make
    # detection depend on how the stream is chopped into blocks.
    w = 2 * spec.sym_len + 1
    local = coarse_sliding_max_same(R, w)
    M = jnp.where(R > 0.05 * local, M, 0.0)
    return SyncMetric(M.astype(jnp.float32), P.astype(jnp.complex64), R)


class Detections(NamedTuple):
    start: jnp.ndarray     # (K,) int32: index of first FFT-window sample
    fine_cfo: jnp.ndarray  # (K,) float32: fractional CFO, subcarrier units
    valid: jnp.ndarray     # (K,) bool
    peak: jnp.ndarray      # (K,) float32: smoothed metric at the peak


def detect_frames(
    spec: OfdmSpec,
    r: jnp.ndarray,
    max_frames: int,
    threshold: float | None = None,
) -> Detections:
    """Find up to `max_frames` frame starts in sample block `r` (1-D).

    Returns detections sorted by position with a validity mask.  `start`
    points a few samples inside the CP before sync word 1's FFT window
    (deliberate ISI backoff, same rule as the golden model's detect_frame).
    """
    if threshold is None:
        threshold = spec.cfg.sync_threshold
    m = schmidl_cox(spec, r)
    cp = spec.cp_len
    # Plateau -> peak: boxcar over ~CP span turns the flat plateau into a
    # triangle whose apex sits at the plateau center.
    sm = moving_sum(m.metric, cp + 1) / (cp + 1)
    n = sm.shape[-1]
    # deterministic tie-break on perfectly flat (noiseless) plateaus
    sm = sm + jnp.arange(n, dtype=jnp.float32) * 1e-7
    # windowed non-max suppression: a winner is the max of its sym_len window
    w = spec.sym_len
    win_max = coarse_sliding_max_same(sm, w)
    is_peak = (sm >= win_max) & (sm > threshold)
    # First K peak positions (ascending).  jnp.sort on 1M elements is a full
    # bitonic sort and even top_k over the raw array measured 1.4 ms on TPU
    # v5 lite -- dominating the whole detector.  The NMS window guarantees
    # peaks are > w/2 apart, so a min-reduce over segments of seg <= w/2
    # samples keeps at most one peak per segment losslessly, and top_k runs
    # on the seg-times-smaller array.
    pos = jnp.where(is_peak, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    seg = min(32, max(1, w // 2))
    n_pad = -(-n // seg) * seg
    segmin = jnp.min(
        jnp.pad(pos, (0, n_pad - n), constant_values=n).reshape(-1, seg),
        axis=-1,
    )
    neg, _ = jax.lax.top_k(-segmin, max_frames)
    pos = -neg  # top_k sorts descending, so -neg is ascending
    valid = pos < n
    safe = jnp.minimum(pos, n - 1)
    # smoothing window [d, d+cp] has apex at d_sm where plateau center is
    # d_sm + cp/2... the boxcar's *valid* output index d corresponds to the
    # window starting at d, so plateau center ~ d + cp/2; we need the mid of
    # the ORIGINAL metric plateau: mid = d_peak + cp/2.
    mid = safe + cp // 2
    backoff = min(4, cp // 4)
    start = mid + cp - cp // 2 - backoff
    fine_cfo = jnp.angle(m.corr[jnp.minimum(mid, m.corr.shape[-1] - 1)]) / jnp.pi
    return Detections(
        start.astype(jnp.int32),
        fine_cfo.astype(jnp.float32),
        valid,
        sm[safe],
    )


def derotate(r: jnp.ndarray, cfo_subcarriers: jnp.ndarray, fft_len: int,
             n0: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Remove a carrier frequency offset: r[n] * exp(-j 2 pi cfo (n+n0) / N).

    Equivalent of the reference's frequency_modulator_fc + multiply_cc
    derotator stage (SURVEY.md §2b "CFO derotator")."""
    n = jnp.arange(r.shape[-1], dtype=jnp.float32) + n0
    ph = -2.0 * jnp.pi * cfo_subcarriers * n / fft_len
    return (r * jnp.exp(1j * ph.astype(jnp.float32))).astype(jnp.complex64)
