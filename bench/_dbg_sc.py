import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.kernels.sc_detect import sc_detect_rows
from tpu_ofdm.ops import sync

spec = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk").spec
rng = np.random.RandomState(5)
n = 3 * 256 * 128 + 1000
x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64) * 0.5
with pltpu.force_tpu_interpret_mode():
    got = jax.jit(lambda a: sc_detect_rows(a, 32, spec.cp_len))(jnp.asarray(x))
ref = sync._detect_rows_jnp(spec, jnp.asarray(x))
got = [np.asarray(g) for g in got]; ref = [np.asarray(r) for r in ref]
same = got[1] == ref[1]
for i in (0,5,2,3,4):
    d = np.abs(got[i] - ref[i]) / np.maximum(np.abs(ref[i]), 1e-3)
    m = same if i in (2,3,4) else np.isfinite(ref[0])
    bad = np.where(m & (np.abs(got[i]-ref[i]) > 2e-3 + 2e-3*np.abs(ref[i])))[0]
    print("out", i, "bad rows:", bad[:10], "argpos:", ref[1][bad[:10]] if len(bad) else "")
    for b in bad[:5]:
        print("   row", b, "got", got[i][b], "ref", ref[i][b], "arg", ref[1][b], got[1][b])
