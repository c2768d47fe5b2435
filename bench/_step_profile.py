"""Time each component of the 2^25 streaming RX step in-loop (device time)."""
import numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.modem.rx_stream import history_len
from tpu_ofdm.modem.rx import rx_block, demod_frame
from tpu_ofdm.ops import sync
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from tpu_ofdm.ops.sync import derotate
from bench.util import bench

spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
S = 1 << 25
H = history_len(spec)
K = 480
n = S + H
rng = np.random.RandomState(0)
x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.1
L = spec.fft_len // 2

sec = bench(lambda a: sc_detect_rows(a, L, spec.cp_len), (x,), reps=8)
print(f"sc_detect_rows   {sec*1e3:7.2f} ms")

sec = bench(lambda a: sync.detect_frames(spec, a, K), (x,), reps=8)
print(f"detect_frames    {sec*1e3:7.2f} ms (kernel + selection + top_k)")

sec = bench(lambda a: rx_block(spec, a, K, own_lo=0, own_hi=S), (x,), reps=8)
print(f"rx_block full    {sec*1e3:7.2f} ms")

hist = x[:H]
xs = x[H:]
sec = bench(lambda h, a: jnp.concatenate([h, a]), (hist, xs), reps=8)
print(f"concat           {sec*1e3:7.2f} ms")

# demod alone: fixed starts
starts = np.linspace(100, S - spec.max_frame_len - 1, K).astype(np.int32)
cfos = np.zeros(K, np.float32)
def demod_only(a, st, cf):
    def one(s0, c0):
        win = jax.lax.dynamic_slice(a, (s0,), (spec.max_frame_len,))
        win = derotate(win, c0, spec.fft_len)
        return demod_frame(spec, win)
    return jax.vmap(one)(st, cf)
sec = bench(demod_only, (x, starts, cfos), reps=8)
print(f"demod vmap K={K} {sec*1e3:7.2f} ms")
