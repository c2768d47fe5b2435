"""Stage-level profile of the wideband RX block (where do the cycles go?)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.config import OfdmConfig, StreamConfig
from tpu_ofdm.modem.rx import rx_block
from tpu_ofdm.modem.rx_stream import history_len
from tpu_ofdm.ops import sync
from tpu_ofdm.spectrum.channelizer import (channelize_ext, commutator_rows,
                                           lowpass_taps, polyphase_decompose)
from tpu_ofdm.utils.device_io import maybe_encode, tpu_safe

def timeit(f, *a, reps=8):
    f(*a)  # compile
    outs = None
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = f(*a)
    s = jax.device_get(outs)
    return (time.perf_counter() - t0) / reps

def main():
    cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    n_chan = 64
    B = 1 << 21
    S = B // n_chan
    H = history_len(spec)
    K = 4
    rng = np.random.RandomState(0)
    x = (rng.randn(B) + 1j*rng.randn(B)).astype(np.complex64) * 0.05
    ext = (rng.randn(n_chan, H + S) + 1j*rng.randn(n_chan, H + S)).astype(np.complex64) * 0.05
    poly = polyphase_decompose(lowpass_taps(n_chan), n_chan)
    J = poly.shape[0]

    xe = jax.device_put(maybe_encode(x)); exe = jax.device_put(maybe_encode(ext))
    jax.block_until_ready((xe, exe))

    @jax.jit
    def chanz(xx):
        f = tpu_safe(lambda v: jnp.swapaxes(channelize_ext(
            jnp.concatenate([jnp.zeros((J-1, n_chan), jnp.complex64),
                             commutator_rows(v, n_chan)], axis=-2),
            jnp.asarray(poly)), -1, -2))
        return f(xx)

    @jax.jit
    def detect_only(ee):
        f = tpu_safe(lambda v: sync.detect_frames(spec, v, max_frames=K).valid)
        return f(ee)

    @jax.jit
    def full_rx(ee):
        f = tpu_safe(lambda v: jax.vmap(
            lambda row: rx_block(spec, row, max_frames=K, own_lo=0, own_hi=S)
        )(v).valid)
        return f(ee)

    t_ch = timeit(chanz, xe)
    t_det = timeit(detect_only, exe)
    t_rx = timeit(full_rx, exe)
    tot_in = n_chan * (H + S)
    print(f"channelize  {t_ch*1e3:8.3f} ms  ({B/t_ch/1e6:7.1f} Msamp/s wideband)")
    print(f"detect only {t_det*1e3:8.3f} ms  ({tot_in/t_det/1e6:7.1f} Msamp/s over (64,{H+S}))")
    print(f"full rx     {t_rx*1e3:8.3f} ms  ({tot_in/t_rx/1e6:7.1f} Msamp/s) -> demod share {(t_rx-t_det)*1e3:.3f} ms")

if __name__ == "__main__":
    main()
