import numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.modem.rx_stream import history_len
from bench.util import bench

spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
S = 1 << 25
H = history_len(spec)
K = 480
n = S + H
rng = np.random.RandomState(0)
x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.1
starts = np.linspace(100, S - spec.max_frame_len - 1, K).astype(np.int32)
F = spec.max_frame_len
RW = F // 128 + 2

def slices_old(a, st):
    return jax.vmap(lambda s0: jax.lax.dynamic_slice(a, (s0,), (F,)))(st)
sec = bench(slices_old, (x, starts), reps=8)
print(f"elem dynamic_slice  {sec*1e3:7.2f} ms")

def slices_rows(a, st):
    rows_view = a.reshape(-1, 128)
    r0 = st // 128
    idx = r0[:, None] + jnp.arange(RW)[None, :]
    rows = jnp.take(rows_view, idx, axis=0)          # (K, RW, 128)
    flat = rows.reshape(st.shape[0], RW * 128)
    off = st % 128
    return jax.vmap(
        lambda f, o: jax.lax.dynamic_slice(f, (o,), (F,))
    )(flat, off)
sec = bench(slices_rows, (x, starts), reps=8)
print(f"row take + slice    {sec*1e3:7.2f} ms")

a = np.asarray(jax.jit(slices_old)(jnp.asarray(x), jnp.asarray(starts)))
b = np.asarray(jax.jit(slices_rows)(jnp.asarray(x), jnp.asarray(starts)))
print("match:", np.array_equal(a, b))
