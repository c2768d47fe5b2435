"""Quick numerics + speed check of sc_detect_rows vs jnp fallback."""
import numpy as np, jax, jax.numpy as jnp
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from tpu_ofdm.ops import sync
from tpu_ofdm.kernels import scan
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.utils.device_io import jit_safe
from bench.util import bench

rng = np.random.RandomState(0)
for fft_len, cp in [(64, 16), (256, 64), (1024, 128)]:
    spec = OfdmConfig(fft_len=fft_len, cp_len=cp, modulation="qpsk").spec
    L = fft_len // 2
    n = (1 << 21) + 4096
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    got = jit_safe(lambda a, L=L, cp=cp: sc_detect_rows(a, L, cp))(x)
    orig = scan.use_pallas
    scan.use_pallas = lambda: False
    try:
        ref = jit_safe(lambda a, sp=spec: sync._detect_rows_jnp(sp, a))(x)
    finally:
        scan.use_pallas = orig
    got = [np.asarray(g) for g in got]
    ref = [np.asarray(g) for g in ref]
    live = np.isfinite(ref[0])
    names = ["smmax", "smarg", "pre", "pim", "rat", "rmax"]
    print(f"fft={fft_len}:")
    same = got[1] == ref[1]
    print(f"  argpos agree {same.mean():.5f}")
    for i in (0, 2, 3, 4, 5):
        sel = live & (same if i in (2, 3, 4) else np.ones_like(same))
        err = np.max(np.abs(got[i][sel] - ref[i][sel]) /
                     np.maximum(np.abs(ref[i][sel]), 1e-3))
        print(f"  {names[i]} rel err {err:.2e}")
    nbig = 1 << 23
    xb = (rng.randn(nbig) + 1j * rng.randn(nbig)).astype(np.complex64)
    sec = bench(lambda a, L=L, cp=cp: sc_detect_rows(a, L, cp), (xb,))
    print(f"  speed {nbig/sec/1e6:.0f} Msamp/s")
