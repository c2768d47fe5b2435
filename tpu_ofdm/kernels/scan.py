"""Pallas TPU kernels for streaming prefix/sliding sums.

The Schmidl-Cox autocorrelator, its moving-average normalization, and every
moving_average-style block reduce to cumulative sums (SURVEY.md §2b
"Schmidl-Cox sync", gr-digital/lib/ofdm_sync_sc_cfb_impl.cc +
gr-blocks moving_average, unverified paths).  XLA lowers jnp.cumsum over a
long axis as a log-depth ladder of shifted adds -- ~log2(n) full passes over
HBM (measured 2026-08-18 on TPU v5 lite: the metric ran at 8% of the
stream-copy roofline, bench/results_kernels_tpu.json).

This kernel makes cumsum ONE pass: a sequential grid marches tile-by-tile
down the time axis; within a tile the prefix is computed on the MXU as a
matmul against a triangular ones matrix (lane prefix), plus a second tiny
triangular matmul for the row offsets; a per-row carry in VMEM scratch
threads the running total across tiles.  f32 in, f32 out.

Numerical note: a single global cumsum accumulates O(sqrt(n)*eps) absolute
error; downstream sliding sums difference nearby cumsum values, so relative
error of a window sum is ~eps * n / w -- at n=2^20, w=32 that is ~3e-3 of
the window magnitude, well inside what the detection metric tolerates (and
identical in kind to the jnp.cumsum fallback path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_MIN_PALLAS_N = 1 << 15  # below this, jnp.cumsum's log-ladder is cheap


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _cumsum_kernel(x_ref, out_ref, carry_ref):
    """One (Bt, R, 128) tile: out = carry + within-tile prefix; update carry.

    Grid is (n_btiles, n_ttiles) with the time axis innermost (sequential on
    TPU); carry resets at the start of each b-tile row.
    """
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    x = x_ref[...]                       # (Bt, R, 128) f32
    bt, r, _ = x.shape
    # lane prefix on the MXU: y[b,r,l] = sum_{j<=l} x[b,r,j]
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    upper = (jj <= ll).astype(jnp.float32)
    y = jax.lax.dot_general(
        x.reshape(bt * r, LANE), upper,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(bt, r, LANE)
    # exclusive row offsets: off[b,r] = sum_{r'<r} rowtot[b,r']
    rowtot = y[:, :, LANE - 1]           # (Bt, R)
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    strict = (rr < cc).astype(jnp.float32)
    off = jax.lax.dot_general(
        rowtot, strict,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                    # (Bt, R)
    cs = y + off[:, :, None] + carry_ref[...][:, :, None]   # carry: (Bt, 1)
    out_ref[...] = cs
    carry_ref[...] = cs[:, r - 1, LANE - 1][:, None]


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "b_tile"))
def _cumsum_rows_pallas(x: jnp.ndarray, rows_per_tile: int, b_tile: int):
    """x: (B, n) f32 with n % (rows_per_tile*128) == 0 and B % b_tile == 0."""
    b, n = x.shape
    rows = n // LANE
    xv = x.reshape(b, rows, LANE)
    grid = (b // b_tile, rows // rows_per_tile)
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_tile, rows_per_tile, LANE),
                lambda ib, it: (ib, it, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (b_tile, rows_per_tile, LANE),
            lambda ib, it: (ib, it, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_tile, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xv)
    return out.reshape(b, n)


def cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Drop-in cumsum with the Pallas single-pass path on TPU.

    Falls back to jnp.cumsum off-TPU, for small sizes, and for non-f32
    dtypes (complex callers should stack re/im rows -- see moving_sums).
    """
    if axis not in (-1, x.ndim - 1):
        return jnp.cumsum(x, axis=axis)
    n = x.shape[-1]
    if (not use_pallas()) or x.dtype != jnp.float32 or n < _MIN_PALLAS_N:
        return jnp.cumsum(x, axis=axis)

    lead = x.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    xb = x.reshape(b, n)

    # tuned on TPU v5 lite (2026-08-18): 512 rows x b_tile 4 -> ~95 GB/s;
    # a VPU log-shift prefix variant measured ~40% slower than these MXU
    # triangular matmuls, so the matmul form stays
    rows_per_tile = min(512, max(8, (n // (LANE * 2)) // 8 * 8))
    tile = rows_per_tile * LANE
    n_pad = -(-n // tile) * tile
    b_tile = min(b, 4)
    b_pad = -(-b // b_tile) * b_tile
    xb = jnp.pad(xb, ((0, b_pad - b), (0, n_pad - n)))
    cs = _cumsum_rows_pallas(xb, rows_per_tile, b_tile)
    return cs[:b, :n].reshape(*lead, n)


def moving_sums(arrs: list[jnp.ndarray], w: int) -> list[jnp.ndarray]:
    """Valid-mode moving sums over the last axis for several same-shape f32
    arrays in ONE fused kernel pass: out[d] = sum x[d:d+w], length n-w+1.

    Stacks the arrays as batch rows of a single cumsum (so the Pallas path
    amortizes its tile machinery across all of them), then differences.
    """
    stacked = jnp.stack([a.astype(jnp.float32) for a in arrs])
    cs = cumsum(stacked, axis=-1)
    lead = cs[..., w - 1:]
    lag = jnp.concatenate(
        [jnp.zeros_like(cs[..., :1]), cs[..., : cs.shape[-1] - w]], axis=-1
    )
    out = lead - lag
    return [out[i] for i in range(len(arrs))]
