"""Fused Schmidl-Cox sliding-correlation kernel (Pallas, TPU).

One pass over HBM computes, for every sample offset t:

    P[t] = sum_{m=0..L-1} conj(r[t-L+1+m]) * r[t+1+m]      (autocorrelation)
    R[t] = sum_{m=0..L-1} |r[t+1+m]|^2                      (energy)
    M[t] = |P[t]|^2 / max(R[t], eps)^2                      (timing metric)

i.e. the entire ofdm_sync_sc_cfb stack -- delay, conjugate-multiply, two
length-L moving averages, magnitude-divide (SURVEY.md §2b/§3.3,
gr-digital/lib/ofdm_sync_sc_cfb_impl.cc, unverified path) -- which the
reference runs as ~6 thread-coupled blocks and which even fused XLA runs as
4+ HBM passes (bench 2026-08-18: 2.15 Gsamp/s after the Pallas cumsum,
stage profile showed no single dominant pass).

Kernel structure (per (R,128)-row tile, sequential grid over time):
  * prod/energy from the two L-shifted input views (VPU),
  * running prefix sums of (prod_re, prod_im, energy) via one MXU matmul
    against a triangular ones matrix + per-stream carry in scratch
    (same trick as kernels/scan.py),
  * the length-L moving sum as cs[t] - cs[t-L], where cs[t-L] is
    reconstructed IN VMEM from the current tile and a (q+1)-row lookback
    ring of the previous tile's prefix rows (q = L // 128), using two
    lane-rolls and a lane-index select -- no second HBM pass,
  * metric arithmetic (VPU), four f32 outputs.

Indexing note: outputs are "trailing-window" values S[t] = cs[t]-cs[t-L]
(window (t-L, t]); the valid-mode moving sum callers expect starts at
t = L-1, so wrappers slice [L-1:].  With zero-initialized lookback, the
t < L-1 prefix entries are exactly the partial sums cs[t], matching a
zero-history stream start.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ROWS_PER_TILE = 256     # 32768 samples per grid step (tuned 2026-08-18:
                         # 128->2.9, 256->3.0, 512->3.1, 1024->2.5 Gsamp/s;
                         # 256 keeps VMEM headroom at near-peak speed)


def _kernel(L: int, r0re, r0im, rLre, rLim, pre_o, pim_o, e_o, m_o,
            carry, prev_ref):
    """carry: (3, 1) f32 running totals; prev_ref: (3*(q+1), 128) f32 last
    prefix rows of the previous tile, flattened to 2D (q = L // 128;
    Mosaic SIGABRTs lowering read-modify-write of 3-D VMEM scratch,
    measured 2026-08-18, so the (3, q+1, 128) ring is kept 2-D and
    reshaped at the use site)."""
    it = pl.program_id(1)
    q, s = L // LANE, L % LANE

    @pl.when(it == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)
        prev_ref[...] = jnp.zeros(prev_ref.shape, prev_ref.dtype)

    a_re, a_im = r0re[0], r0im[0]          # (R, 128)
    b_re, b_im = rLre[0], rLim[0]
    r = a_re.shape[0]
    # conj(r0) * rL and |rL|^2
    streams = jnp.stack(
        [
            a_re * b_re + a_im * b_im,
            a_re * b_im - a_im * b_re,
            b_re * b_re + b_im * b_im,
        ]
    )                                       # (3, R, 128)

    # prefix sums (one MXU matmul for all three streams)
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    tri = (jj <= ll).astype(jnp.float32)
    y = jax.lax.dot_general(
        streams.reshape(3 * r, LANE), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(3, r, LANE)
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
    cs = y + off[:, :, None] + carry[...][:, :, None]   # (3, R, 128) global

    # cs[t - L] via lookback: flat (row, lane) index t-L lives at
    # (row - q - (lane < s), (lane - s) mod 128)
    prev = prev_ref[...].reshape(3, q + 1, LANE)

    def down(j):
        # rows shifted down by j: row r' <- row r'-j, borrowing from prev
        if j == 0:
            return cs
        return jnp.concatenate([prev[:, q + 1 - j:, :], cs[:, : r - j, :]],
                               axis=1)

    def rot(x):
        # lane rotation by s: out[..., l] = x[..., (l - s) mod 128]
        return jnp.concatenate([x[..., LANE - s:], x[..., : LANE - s]],
                               axis=-1)

    if s:
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
        lag = jnp.where((lane_ids >= s)[None], rot(down(q)),
                        rot(down(q + 1)))
    else:
        lag = down(q)

    S = cs - lag                                        # (3, R, 128)
    p_re, p_im, en = S[0], S[1], S[2]
    pre_o[0] = p_re
    pim_o[0] = p_im
    e_o[0] = en
    m_o[0] = (p_re * p_re + p_im * p_im) / jnp.maximum(en, 1e-12) ** 2

    carry[...] = cs[:, r - 1, LANE - 1][:, None]
    prev_ref[...] = cs[:, r - (q + 1):, :].reshape(3 * (q + 1), LANE)


@functools.partial(jax.jit, static_argnames=("L", "rpt"))
def _sc_pallas(r0re, r0im, rLre, rLim, L: int, rpt: int):
    """Inputs: (B, n) f32 with n % (rpt*128) == 0.  Returns P_re, P_im,
    R, M each (B, n) f32 in trailing-window indexing.  rpt is the caller's
    tile row count -- deriving it here from a differently-rounded formula
    silently skipped trailing rows when rows % rpt != 0 (ADVICE r1 #3)."""
    b, n = r0re.shape
    rows = n // LANE
    assert rows % rpt == 0, (rows, rpt)
    q = L // LANE
    view = lambda x: x.reshape(b, rows, LANE)
    spec = pl.BlockSpec(
        (1, rpt, LANE), lambda ib, it: (ib, it, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, L),
        grid=(b, rows // rpt),
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, rows, LANE), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((3, 1), jnp.float32),
            pltpu.VMEM((3 * (q + 1), LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(view(r0re), view(r0im), view(rLre), view(rLim))
    return tuple(o.reshape(b, n) for o in outs)


def sc_sliding_metric(r: jnp.ndarray, L: int):
    """P (complex64), R, M (f32) for a complex64 sample block r (..., n),
    valid-mode indexing: element d corresponds to windows starting at d,
    output length n - 2L + 1.  TPU Pallas path; callers guard with
    kernels.scan.use_pallas() and fall back to the jnp formulation."""
    lead = r.shape[:-1]
    n = r.shape[-1]
    m = n - L
    b = 1
    for d in lead:
        b *= d
    rb = r.reshape(b, n)
    re, im = jnp.real(rb).astype(jnp.float32), jnp.imag(rb).astype(jnp.float32)

    rpt = min(_ROWS_PER_TILE, max(8, (m // LANE) // 8 * 8))
    tile = rpt * LANE
    mp = -(-m // tile) * tile
    pad = lambda x: jnp.pad(x, ((0, 0), (0, mp - m)))
    p_re, p_im, en, met = _sc_pallas(
        pad(re[:, :m]), pad(im[:, :m]), pad(re[:, L:]), pad(im[:, L:]), L, rpt
    )
    lo, hi = L - 1, m          # valid range in trailing-window indexing
    out = lambda x: x[:, lo:hi].reshape(*lead, m - L + 1)
    P = (out(p_re) + 1j * out(p_im)).astype(jnp.complex64)
    return P, out(en), out(met)
