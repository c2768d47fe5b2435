"""Sweep headline bench block size (same protocol as bench.py)."""
import sys, time, numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.config import OfdmConfig, StreamConfig
from tpu_ofdm.modem.rx_stream import history_len, rx_stream_block
from tpu_ofdm.stream.executor import StreamExecutor
from tpu_ofdm.utils.device_io import maybe_encode
import tests.golden.golden_ofdm as G

logS = int(sys.argv[1]) if len(sys.argv) > 1 else 22
FR = 56 * (1 << (logS - 22))
K = int(sys.argv[2]) if len(sys.argv) > 2 else max(64, 2 * FR - FR // 2)

cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk")
spec = cfg.spec
sc = StreamConfig(block_size=1 << logS, max_frames_per_block=K)
S = sc.block_size

rng = np.random.RandomState(0)
msg = bytes(range(64)) * 2
gp = G.GoldenOfdmParams(fft_len=spec.fft_len, cp_len=spec.cp_len, modulation=spec.modulation)
frame = G.tx_frame(gp, msg).astype(np.complex64)
gap = (S - 2 * len(frame)) // FR
blocks = (rng.randn(4, S) + 1j * rng.randn(4, S)).astype(np.complex64) * 0.02
for b in range(4):
    for j in range(FR):
        pos = 100 + j * gap
        blocks[b, pos:pos+len(frame)] += frame
enc = [jax.device_put(maybe_encode(b)) for b in blocks]
jax.block_until_ready(enc)

ex = StreamExecutor(rx_stream_block(spec, sc), S)
n_timed = 24
reduce_jit = jax.jit(lambda vs: jnp.sum(jnp.stack([v.sum() for v in vs])))

def trial():
    t0 = time.perf_counter()
    outs = [ex.push(enc[i % len(enc)]).result.valid for i in range(n_timed)]
    n_frames = int(jax.device_get(reduce_jit(outs)))
    return time.perf_counter() - t0, n_frames

trial()
ex.reset()
results = [trial() for _ in range(3)]
dt = min(r[0] for r in results)
n_frames = results[0][1]
expect = FR * n_timed
tail = -(-history_len(spec) * FR // S) + 1
print(f"S=2^{logS} K={K} frames={n_frames}/{expect} (tail allow {tail}) "
      f"tput={n_timed*S/dt/1e6:.1f} Msamp/s")
