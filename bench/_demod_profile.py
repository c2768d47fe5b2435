import numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.modem.rx_stream import history_len
from tpu_ofdm.modem.rx import demod_frame
from tpu_ofdm.ops.sync import derotate
from tpu_ofdm.ops.transform import ofdm_fft
from bench.util import bench

spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
S = 1 << 25
H = history_len(spec)
K = 480
n = S + H
rng = np.random.RandomState(0)
x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.1
starts = np.linspace(100, S - spec.max_frame_len - 1, K).astype(np.int32)
cfos = (rng.randn(K) * 0.05).astype(np.float32)
F = spec.max_frame_len
print("max_frame_len", F, "n_syms", spec.max_frame_ofdm_syms)

def slices(a, st):
    return jax.vmap(lambda s0: jax.lax.dynamic_slice(a, (s0,), (F,)))(st)
sec = bench(slices, (x, starts), reps=8)
print(f"slice only       {sec*1e3:7.2f} ms")

def slice_rot(a, st, cf):
    w = slices(a, st)
    return jax.vmap(lambda wi, c0: derotate(wi, c0, spec.fft_len))(w, cf)
sec = bench(slice_rot, (x, starts, cfos), reps=8)
print(f"slice+derotate   {sec*1e3:7.2f} ms")

def slice_rot_fft(a, st, cf):
    w = slice_rot(a, st, cf)
    nsy = spec.max_frame_ofdm_syms
    wins = w[:, : nsy * spec.sym_len].reshape(K, nsy, spec.sym_len)
    return ofdm_fft(wins[:, :, : spec.fft_len])
sec = bench(slice_rot_fft, (x, starts, cfos), reps=8)
print(f"slice+rot+fft    {sec*1e3:7.2f} ms")

def full(a, st, cf):
    w = slice_rot(a, st, cf)
    return jax.vmap(lambda wi: demod_frame(spec, wi))(w)
sec = bench(full, (x, starts, cfos), reps=8)
print(f"full demod       {sec*1e3:7.2f} ms")
