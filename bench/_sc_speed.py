import numpy as np
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from bench.util import bench
rng = np.random.RandomState(0)
n = 1 << 23
for L, cp in [(32, 16), (128, 64), (512, 128)]:
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    sec = bench(lambda a, L=L, cp=cp: sc_detect_rows(a, L, cp), (x,))
    print(f"L={L:4d} {n/sec/1e6:8.1f} Msamp/s  {n*8/sec/1e9:6.1f} GB/s")
