"""BASELINE config 5: a wideband capture channelized and demodulated over a
(channel x time) device mesh.

The reference's only wideband-scaling story is "run N independent flowgraphs
behind a pfb_channelizer_ccf and ship results over sockets" (SURVEY.md §2c
DP row, gr-filter/lib/pfb_channelizer_ccf_impl.cc, unverified path).  Here
the whole capture is ONE jitted program over the mesh, in two stages:

  1. **Channelize, sharded over ALL devices.**  The flat wideband stream is
     split into contiguous chunks over the flattened (channel, time) device
     order; each device channelizes its chunk after fetching the
     stream_tail_len raw samples of its left neighbor with one ppermute
     ring step (the same overlap-save-as-halo pattern as shard.halo, over
     the flattened axis pair).  On TPU the per-device work is the fused
     Pallas kernel (kernels.pfb); on CPU the XLA ladder.
  2. **Demodulate, (channel x time) sharded.**  The channel rows transpose
     to (n_chan, M_total) and flow into shard.rx.sharded_rx_capture_fn;
     GSPMD inserts the all_to_all that redistributes stage-1's time-major
     rows into stage-2's channel-major layout (scaling-book recipe: annotate
     shardings, let XLA place collectives).  Frame ownership across time
     shards is exactly shard.rx's tiling -- every frame reported once,
     straddles included.

Constraints: n_chan % mesh.channel == 0, per_chan_shard % mesh.channel == 0
(so each device's stage-1 chunk is whole commutator loads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpu_ofdm.config import OfdmSpec
from tpu_ofdm.shard.mesh import CHANNEL_AXIS, TIME_AXIS
from tpu_ofdm.shard.rx import sharded_rx_capture_fn
from tpu_ofdm.spectrum.channelizer import (
    channelize_stream,
    lowpass_taps,
    polyphase_decompose,
    stream_tail_len,
)

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def mesh_psd_step_fn(
    mesh,
    n_chan: int,
    nbins: int,
    taps: np.ndarray | None = None,
    window: str = "hann",
    floor: float = 1e-20,
):
    """Jittable distributed-analyzer step (the multi-device replacement for
    the reference's ship-every-PSD-over-a-socket design, SURVEY.md §5 last
    row): (tail, wideband block) -> ((n_chan, nbins) dB consensus PSD
    replicated on every device, new tail).

    Per step: the sharded channelizer (same raw-sample ppermute halo as
    sharded_wideband_capture_fn, with the FIRST device taking the carried
    cross-step tail) -> per-channel windowed PSD averaged over the block's
    frames -> `all_gather_spectrum` consensus (all_gather over the channel
    axis + pmean over time shards).  The returned tail is the block's last
    stream_tail_len raw samples; thread it back in as the next step's carry.
    Block length must be a multiple of n_chan * nbins (whole PSD frames per
    channel)."""
    taps_np = lowpass_taps(n_chan) if taps is None else np.asarray(taps)
    poly = jnp.asarray(polyphase_decompose(taps_np, n_chan))
    C_tail = stream_tail_len(n_chan, taps_np)
    n_c = mesh.shape[CHANNEL_AXIS]
    n_t = mesh.shape[TIME_AXIS]
    n_dev = n_c * n_t

    from tpu_ofdm.shard.distributed import all_gather_spectrum
    from tpu_ofdm.spectrum.psd import psd_frames

    def chan_local(tail, x):  # tail (C_tail,) replicated; x (L,) local chunk
        h = x[-C_tail:]
        if n_dev > 1:
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            h = jax.lax.ppermute(h, (CHANNEL_AXIS, TIME_AXIS), perm)
        else:
            h = jnp.zeros_like(h)
        idx = (jax.lax.axis_index(CHANNEL_AXIS) * n_t
               + jax.lax.axis_index(TIME_AXIS))
        h = jnp.where(idx == 0, tail, h)
        out, _ = channelize_stream(x, h, n_chan, taps_np, poly)
        return out

    def step(tail, samples):  # samples: (n_chan * F * nbins * n_t,)
        x = samples.astype(jnp.complex64)
        rows = shard_map(
            chan_local,
            mesh=mesh,
            in_specs=(P(None), P((CHANNEL_AXIS, TIME_AXIS))),
            out_specs=P((CHANNEL_AXIS, TIME_AXIS), None),
            check_vma=False,
        )(tail.astype(jnp.complex64), x)
        chans = jnp.swapaxes(rows, 0, 1)          # (n_chan, M)
        p = psd_frames(chans, nbins, window)      # (n_chan, M//nbins, nbins)
        p_db = 10.0 * jnp.log10(jnp.maximum(p.mean(axis=-2), floor))
        full = all_gather_spectrum(p_db, mesh)    # replicated (n_chan, nbins)
        return full, x[-C_tail:]

    return step, C_tail


def flatten_band(psd_cn: np.ndarray) -> np.ndarray:
    """(n_chan, nbins) per-channel PSD -> one full-band vector ordered by
    absolute frequency (host-side presentation): flat[i] covers
    -fs/2 + i*fs/(n_chan*nbins).  Channel k is centered at k*fs/n_chan
    (wrapped), each channel's bins are FFT-ordered; fftshift both axes,
    flatten, then roll half a channel (the lowest channel straddles the
    -fs/2 wrap, so the shifted grid starts at -fs/2 - fs/(2*n_chan))."""
    shifted = np.fft.fftshift(psd_cn, axes=0)     # channels by center freq
    shifted = np.fft.fftshift(shifted, axes=1)    # bins within each channel
    return np.roll(shifted.reshape(-1), -(psd_cn.shape[1] // 2))


def sharded_wideband_capture_fn(
    spec: OfdmSpec,
    mesh,
    n_chan: int,
    per_chan_shard: int,
    taps: np.ndarray | None = None,
    max_frames_per_shard: int = 8,
    equalizer: str = "pilot_phase",
):
    """Build the jittable config-5 capture: (n_chan * n_time * per_chan_shard,)
    wideband complex64 -> RxBlockResult with leading (n_chan, n_time * K)
    axes (collect with shard.rx.collect_sharded_frames).

    per_chan_shard is S, each time shard's per-channel sample count; frame
    ownership/abs_start semantics are identical to sharded_rx_capture_fn's.
    """
    taps_np = lowpass_taps(n_chan) if taps is None else np.asarray(taps)
    poly = jnp.asarray(polyphase_decompose(taps_np, n_chan))
    C_tail = stream_tail_len(n_chan, taps_np)
    n_c = mesh.shape[CHANNEL_AXIS]
    n_t = mesh.shape[TIME_AXIS]
    n_dev = n_c * n_t
    S = per_chan_shard
    if n_chan % n_c:
        raise ValueError(f"n_chan={n_chan} not divisible by mesh channel={n_c}")
    if S % n_c:
        raise ValueError(f"per_chan_shard={S} not divisible by mesh "
                         f"channel={n_c} (stage-1 chunks must hold whole "
                         f"commutator loads)")
    rx_fn = sharded_rx_capture_fn(
        spec, mesh, S, max_frames_per_shard=max_frames_per_shard,
        equalizer=equalizer,
    )

    def chan_local(x):  # (L,) local wideband chunk, L = n_chan * S / n_c
        tail = x[-C_tail:]
        if n_dev > 1:
            # left neighbor in the FLATTENED (channel, time) chunk order
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            tail = jax.lax.ppermute(tail, (CHANNEL_AXIS, TIME_AXIS), perm)
        else:
            tail = jnp.zeros_like(tail)
        out, _ = channelize_stream(x, tail, n_chan, taps_np, poly)
        return out  # (L // n_chan, n_chan)

    def fn(samples):  # (n_chan * n_t * S,) global wideband
        rows = shard_map(
            chan_local,
            mesh=mesh,
            in_specs=P((CHANNEL_AXIS, TIME_AXIS)),
            out_specs=P((CHANNEL_AXIS, TIME_AXIS), None),
            check_vma=False,
        )(samples.astype(jnp.complex64))
        chans = jnp.swapaxes(rows, 0, 1)  # (n_chan, M_total)
        return rx_fn(chans)

    return fn
