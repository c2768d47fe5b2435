"""Stage-level profile of the streaming RX step on the real chip.

Times each stage of the chain in isolation at the bench block size to find
where the 1 Gsample/s gap lives.  Not part of the headline bench.

Method: on this tunneled backend block_until_ready can return before the
device finishes (see bench.py), so each measurement enqueues `n` program
launches and then forces ONE scalar readback derived from every launch's
output -- the device runs programs in order, so the elapsed wall time covers
all n executions; the single ~30 ms tunnel RTT amortizes over n.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.modem.rx import rx_block
from tpu_ofdm.modem.rx_stream import history_len
from tpu_ofdm.ops.sync import detect_frames, schmidl_cox
from tpu_ofdm.utils.device_io import maybe_encode, tpu_safe


def first_leaf_sum(out):
    return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))


reduce_all = jax.jit(
    lambda outs: jnp.sum(jnp.stack([first_leaf_sum(o) for o in outs]))
)


def timeit(fn, *args, n=24):
    # warmup with the SAME list length: reduce_all retraces per length, and
    # per output-shape set, so a short warmup would leave its compile inside
    # the timed region (this exact bug produced phantom 20 ms readings)
    outs = [fn(*args) for _ in range(n)]
    jax.device_get(reduce_all(outs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        jax.device_get(reduce_all(outs))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk")
    spec = cfg.spec
    for logS in (20, 21, 22, 23):
        S = 1 << logS
        K = 64
        H = history_len(spec)
        n = H + S
        rng = np.random.RandomState(0)
        x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.1
        xe = jax.device_put(maybe_encode(x))
        jax.block_until_ready(xe)

        sc_j = jax.jit(tpu_safe(lambda r: schmidl_cox(spec, r)))
        det_j = jax.jit(tpu_safe(lambda r: detect_frames(spec, r, K)))
        full_j = jax.jit(
            tpu_safe(lambda r: rx_block(spec, r, K, own_lo=0, own_hi=S))
        )

        t_sc = timeit(sc_j, xe)
        t_det = timeit(det_j, xe)
        t_full = timeit(full_j, xe)
        print(
            f"S=2^{logS}: sc={t_sc*1e6:8.1f}us det={t_det*1e6:8.1f}us "
            f"full={t_full*1e6:8.1f}us | demod~={(t_full-t_det)*1e6:8.1f}us "
            f"| full tput={S/t_full/1e6:7.1f} Msamp/s"
        )


if __name__ == "__main__":
    main()
