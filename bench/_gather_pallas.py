"""Prototype: slot-window gather as a Pallas DMA kernel.

XLA lowers the vmapped dynamic_slice gather (480 slots x 2000 samples from
a 2^25-sample ext buffer) at ~2.6 ms -- per-slot DMA issue overhead, not
bandwidth (the payload is 7.7 MB).  This kernel issues the per-slot copies
as explicit async DMAs from HBM with the output block pipeline hiding the
latency.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SLOTS = 8  # slots per grid step: out block (8, F) meets the (8, 128)
# tile rule, and 16 in-flight DMAs per step amortize issue latency


def _kernel(starts_ref, xre, xim, ore, oim, sem_re, sem_im):
    k = pl.program_id(0)
    F = ore.shape[-1]
    dmas = []
    for j in range(_SLOTS):
        s = starts_ref[k * _SLOTS + j]
        d1 = pltpu.make_async_copy(
            xre.at[pl.ds(s, F)], ore.at[j], sem_re.at[j])
        d2 = pltpu.make_async_copy(
            xim.at[pl.ds(s, F)], oim.at[j], sem_im.at[j])
        d1.start()
        d2.start()
        dmas.append((d1, d2))
    for d1, d2 in dmas:
        d1.wait()
        d2.wait()


@functools.partial(jax.jit, static_argnames=("F",))
def gather_windows(re, im, starts, F: int):
    """re/im: (n,) f32; starts: (K,) int32 -> (K, F) f32 windows."""
    K = starts.shape[0]
    assert K % _SLOTS == 0, K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // _SLOTS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_SLOTS, F), lambda k, st: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLOTS, F), lambda k, st: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((K, F), jnp.float32),
            jax.ShapeDtypeStruct((K, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(starts, re, im)


if __name__ == "__main__":
    from bench.util import bench
    from tpu_ofdm.config import OfdmConfig
    from tpu_ofdm.modem.rx_stream import history_len

    spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
    S = 1 << 25
    H = history_len(spec)
    K = 480
    n = S + H
    rng = np.random.RandomState(0)
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)
    starts = np.linspace(
        100, S - spec.max_frame_len - 1, K
    ).astype(np.int32)
    F = 2048  # padded window

    out = jax.jit(
        lambda a, b, s: gather_windows(a, b, s, F)
    )(re, im, starts)
    got_re = np.asarray(out[0])
    want = np.stack([re[s:s + F] for s in starts])
    print("match:", np.array_equal(got_re, want))

    sec = bench(lambda a, b, s: gather_windows(a, b, s, F),
                (re, im, starts), reps=8)
    print(f"pallas gather  {sec*1e3:7.2f} ms")
