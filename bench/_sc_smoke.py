import numpy as np, jax, jax.numpy as jnp, sys
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from tpu_ofdm.utils.device_io import jit_safe
print("backend:", jax.default_backend()); sys.stdout.flush()
rng = np.random.RandomState(0)
x = (rng.randn(1 << 16) + 1j * rng.randn(1 << 16)).astype(np.complex64)
got = jit_safe(lambda a: sc_detect_rows(a, 32, 16))(x)
print("small ok", [np.asarray(g)[:3] for g in got[:2]]); sys.stdout.flush()
x = (rng.randn(1 << 20) + 1j * rng.randn(1 << 20)).astype(np.complex64)
got = jit_safe(lambda a: sc_detect_rows(a, 32, 16))(x)
print("multi-tile ok", float(np.asarray(got[0]).max())); sys.stdout.flush()
