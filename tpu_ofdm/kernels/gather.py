"""Batched window gather (Pallas, TPU): K frame windows out of a long
sample buffer via one double-buffered DMA chain.

The RX chain's pass-2 demod gathers max_frames (K ~ 480) fixed-length
windows at data-dependent starts.  XLA lowers the vmapped dynamic_slice on
the BIG buffer as ~K serial slice programs at ~2.7 us each regardless of
window size or slicing form (measured 2026-08-21 over four formulations:
~1.3 ms/step at the headline shape, dispatch/issue bound -- the gathered
bytes are ~5 MB ~ 30 us at stream-copy rate).  Two-stage fix:

  1. SUPERWINDOW DMA (this kernel): one grid step marches a double-buffered
     HBM->VMEM copy chain over the K windows (window k+1's DMA is in
     flight while k's lands -- the pallas_guide double-buffering pattern).
     Mosaic constrains both DMA endpoints to (8, 128)-tile alignment, so
     each copy fetches an ALIGNED superwindow: rows 8*floor(start/1024)
     onward, wide enough to cover a 1023-sample skew plus the frame.
     Measured net cost ~0 ms (fully overlapped; 2026-08-21).
  2. EXACT extraction: a vmapped dynamic_slice pulls [start % 1024 ..)
     out of the (K, SUP) superwindow array -- on the SMALL operand this
     costs ~0.4 ms net (3x cheaper than slicing the big buffer; same
     measurement session).

Scalar starts ride in SMEM via PrefetchScalarGridSpec with pl.multiple_of
alignment hints (Mosaic must PROVE 8-row divisibility of the dynamic
offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_ALIGN_ROWS = 8          # DMA row-offset alignment (f32 sublane tiling)
_ALIGN = _ALIGN_ROWS * LANE  # = 1024 samples


def _kernel2(nrow: int, scalars_ref, head_ref, x_ref, out_ref, sems):
    """Two-source variant: scalars_ref rows = (src flag, row start); window
    k's superwindow is DMA'd from head_ref (src 0) or x_ref (src 1) -- the
    streaming RX's [history-tile | block] virtual buffer without the
    concat (see gather_windows_two)."""
    k_total = out_ref.shape[0] // nrow

    def dma_from(ref, k, slot):
        r0 = pl.multiple_of(scalars_ref[1, k], _ALIGN_ROWS)
        return pltpu.make_async_copy(
            ref.at[pl.ds(r0, nrow)],
            out_ref.at[pl.ds(k * nrow, nrow)],
            sems.at[slot],
        )

    def start(k, slot):
        @pl.when(scalars_ref[0, k] == 0)
        def _():
            dma_from(head_ref, k, slot).start()

        @pl.when(scalars_ref[0, k] != 0)
        def _():
            dma_from(x_ref, k, slot).start()

    def wait(k, slot):
        @pl.when(scalars_ref[0, k] == 0)
        def _():
            dma_from(head_ref, k, slot).wait()

        @pl.when(scalars_ref[0, k] != 0)
        def _():
            dma_from(x_ref, k, slot).wait()

    start(0, 0)

    def body(k, _):
        @pl.when(k + 1 < k_total)
        def _():
            start(k + 1, (k + 1) % 2)

        wait(k, k % 2)
        return 0

    jax.lax.fori_loop(0, k_total, body, 0, unroll=False)


def _kernel(nrow: int, rstarts_ref, rows_ref, out_ref, sems):
    k_total = out_ref.shape[0] // nrow

    def dma(k, slot):
        r0 = pl.multiple_of(rstarts_ref[k], _ALIGN_ROWS)
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(r0, nrow)],
            out_ref.at[pl.ds(k * nrow, nrow)],
            sems.at[slot],
        )

    dma(0, 0).start()

    def body(k, _):
        @pl.when(k + 1 < k_total)
        def _():
            dma(k + 1, (k + 1) % 2).start()

        dma(k, k % 2).wait()
        return 0

    jax.lax.fori_loop(0, k_total, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("nrow",))
def _gather_super(plane: jnp.ndarray, rstarts: jnp.ndarray, nrow: int):
    """plane: (n,) f32 with n % 1024 == 0; rstarts: (K,) int32 row indices,
    each a multiple of 8 with rstarts[k] + nrow <= n // 128.  Returns
    (K, nrow*128) f32 superwindows."""
    K = rstarts.shape[0]
    rows = plane.reshape(-1, LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nrow),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * nrow, LANE), plane.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rstarts, rows)
    return out.reshape(K, nrow * LANE)


def supported(n: int) -> bool:
    """The DMA gather needs an (8,128)-tileable buffer."""
    return n % _ALIGN == 0


def sup_rows_for(length: int) -> int:
    """Superwindow row count covering a 1023-sample alignment skew plus the
    window."""
    return -(-(_ALIGN - 1 + length) // _ALIGN) * _ALIGN_ROWS


@functools.partial(jax.jit, static_argnames=("nrow",))
def _gather_super2(head: jnp.ndarray, x: jnp.ndarray,
                   scalars: jnp.ndarray, nrow: int):
    """scalars: (2, K) int32 [src flag; row start].  Superwindows from two
    source planes (head for src 0, x for src 1)."""
    K = scalars.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel2, nrow),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * nrow, LANE), x.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scalars, head.reshape(-1, LANE), x.reshape(-1, LANE))
    return out.reshape(K, nrow * LANE)


def gather_windows_two(head_re, head_im, x_re, x_im,
                       starts: jnp.ndarray, length: int,
                       x_off: int) -> jnp.ndarray:
    """Windows out of the VIRTUAL buffer [.. | x], where virtual positions
    p >= x_off map to x[p - x_off] and any window with start < x_off lies
    entirely inside the small head buffer (caller contract: head =
    virtual[0 : x_off + sup] materialized, len(head) >= x_off +
    sup_rows_for(length)*128, both buffers % 1024 == 0).  starts are
    virtual positions in [0, x_off + len(x) - length]."""
    sup_rows = sup_rows_for(length)
    sup = sup_rows * LANE
    nh, nx = head_re.shape[-1], x_re.shape[-1]
    assert nh % _ALIGN == 0 and nx % _ALIGN == 0, (nh, nx)
    assert nh >= x_off + sup, (nh, x_off, sup)
    src = (starts >= x_off).astype(jnp.int32)
    vstart = jnp.where(src == 1, starts - x_off, starts)
    max_r0 = jnp.where(src == 1, (nx - sup) // LANE, (nh - sup) // LANE)
    r0 = jnp.minimum((vstart // _ALIGN) * _ALIGN_ROWS, max_r0)
    offs = jnp.clip(vstart - r0 * LANE, 0, sup - length)
    scalars = jnp.stack([src, r0])

    sup_re = _gather_super2(head_re, x_re, scalars, sup_rows)
    sup_im = _gather_super2(head_im, x_im, scalars, sup_rows)

    def extract(srow, o):
        return jax.lax.dynamic_slice(srow, (o,), (length,))

    wr = jax.vmap(extract)(sup_re, offs)
    wi = jax.vmap(extract)(sup_im, offs)
    return (wr + 1j * wi).astype(jnp.complex64)


def gather_windows(re: jnp.ndarray, im: jnp.ndarray,
                   starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """out[k] = (re + 1j*im)[starts[k] : starts[k] + length] as a (K,
    length) complex64 array; re/im (n,) f32 with n % 1024 == 0 and
    0 <= starts[k] <= n - length."""
    n = re.shape[-1]
    assert supported(n), n
    sup_rows = sup_rows_for(length)
    sup = sup_rows * LANE
    max_r0 = (n - sup) // LANE  # multiple of 8 since n and sup are
    r0 = jnp.minimum((starts // _ALIGN) * _ALIGN_ROWS, max_r0)
    offs = jnp.clip(starts - r0 * LANE, 0, sup - length)

    sup_re = _gather_super(re, r0, sup_rows)
    sup_im = _gather_super(im, r0, sup_rows)

    def extract(srow, o):
        return jax.lax.dynamic_slice(srow, (o,), (length,))

    wr = jax.vmap(extract)(sup_re, offs)
    wi = jax.vmap(extract)(sup_im, offs)
    return (wr + 1j * wi).astype(jnp.complex64)
