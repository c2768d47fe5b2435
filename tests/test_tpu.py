"""Real-TPU test lane: compiled (non-interpret) kernel + loopback numerics.

Run with:  TPU_OFDM_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Everything else in tests/ runs on the virtual CPU mesh (conftest.py), where
Pallas kernels are only exercised in interpret mode -- this lane is the
insurance that what Mosaic actually COMPILES matches the jnp formulations
(VERDICT r1 "What's weak" #3).  The driver's bench runs assert detection
counts but almost nothing about values; these tests assert values.

Boundary rule on this backend: complex64 (and bool) must never cross a
compiled program's I/O boundary (utils.device_io module doc) -- every test
here builds complex arrays INSIDE jit from packed f32 planes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ofdm.config import OfdmConfig
from tpu_ofdm.kernels import scan
from tpu_ofdm.ops import sync

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("real TPU backend required (run with TPU_OFDM_TPU_TESTS=1)")


def test_cumsum_compiled_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 1 << 16).astype(np.float32)
    got = np.asarray(jax.jit(lambda v: scan.cumsum(v, axis=-1))(x))
    want = np.cumsum(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-2)


def test_moving_sums_compiled_matches_numpy():
    rng = np.random.RandomState(1)
    n, w = 1 << 16, 33
    a = rng.randn(n).astype(np.float32)
    b = rng.randn(n).astype(np.float32)
    ga, gb = jax.jit(lambda u, v: tuple(scan.moving_sums([u, v], w)))(a, b)
    k = np.ones(w)
    np.testing.assert_allclose(
        np.asarray(ga), np.convolve(a.astype(np.float64), k, "valid"),
        rtol=2e-4, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(gb), np.convolve(b.astype(np.float64), k, "valid"),
        rtol=2e-4, atol=5e-3,
    )


def test_sc_metric_compiled_matches_reference():
    from tpu_ofdm.kernels.sc_metric import sc_sliding_metric

    rng = np.random.RandomState(2)
    L, n = 32, 1 << 16
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)

    @jax.jit
    def run(u, v):
        P, R, M = sc_sliding_metric((u + 1j * v).astype(jnp.complex64), L)
        return jnp.real(P), jnp.imag(P), R, M

    pr, pi, R, M = (np.asarray(x) for x in run(re, im))
    r = re.astype(np.complex128) + 1j * im
    prod = np.conj(r[:-L]) * r[L:]
    k = np.ones(L)
    Pref = (np.convolve(prod.real, k, "valid")
            + 1j * np.convolve(prod.imag, k, "valid"))
    Rref = np.convolve(np.abs(r[L:]) ** 2, k, "valid")
    np.testing.assert_allclose(pr + 1j * pi, Pref, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(R, Rref, rtol=3e-3, atol=3e-3)
    Mref = np.abs(Pref) ** 2 / np.maximum(Rref, 1e-12) ** 2
    np.testing.assert_allclose(M, Mref, rtol=1e-2, atol=1e-2)


def _detect_rows_both(spec, re, im):
    """Compiled Pallas sc_detect rows and pure-XLA jnp rows for the same
    (re, im) planes, both computed ON DEVICE with packed f32 I/O."""
    from tpu_ofdm.kernels.sc_detect import sc_detect_rows

    L = spec.fft_len // 2

    @jax.jit
    def run_pallas(u, v):
        return sc_detect_rows((u + 1j * v).astype(jnp.complex64), L,
                              spec.cp_len)

    @jax.jit
    def run_jnp(u, v):
        r = (u + 1j * v).astype(jnp.complex64)
        rows = sync._detect_rows_jnp(spec, r)
        # -inf head fill cannot cross the boundary on all backends; map to a
        # sentinel the comparison understands
        return (jnp.where(jnp.isfinite(rows[0]), rows[0], -1e30),) + rows[1:]

    orig = scan.use_pallas
    scan.use_pallas = lambda: False  # pure-XLA reference inside run_jnp
    try:
        ref = [np.asarray(x) for x in run_jnp(re, im)]
    finally:
        scan.use_pallas = orig
    got = [np.asarray(x) for x in run_pallas(re, im)]
    return got, ref


@pytest.mark.parametrize("fft_len,cp", [(64, 16), (256, 64)])
def test_sc_detect_rows_compiled_matches_jnp(fft_len, cp):
    """The fused detection kernel (the headline bench's hot stage) vs the
    pure-XLA row summaries, on a multi-tile block with injected frames --
    exercises the ring carry across tile boundaries, and at fft_len=256
    (L=128) the banded windows' multi-row-shift path (R1's bands ride row
    shifts {1,2})."""
    import tests.golden.golden_ofdm as G

    cfg = OfdmConfig(fft_len=fft_len, cp_len=cp, modulation="qpsk")
    spec = cfg.spec
    rng = np.random.RandomState(3)
    n = 3 * (256 * 128) + 4096  # 3 full tiles + ragged tail
    noise = 0.02 * (rng.randn(n) + 1j * rng.randn(n))
    gp = G.GoldenOfdmParams(fft_len=fft_len, cp_len=cp, modulation="qpsk")
    frame = G.tx_frame(gp, bytes(range(48))).astype(np.complex64)
    x = noise.astype(np.complex64)
    starts = [5000, 40000, 40000 + len(frame), 99000]  # incl. back-to-back
    for p in starts:
        x[p : p + len(frame)] += frame
    got, ref = _detect_rows_both(
        spec, np.real(x).copy(), np.imag(x).copy()
    )
    smmax_g, smarg_g, pre_g, pim_g, rat_g, rmax_g = got
    smmax_r, smarg_r, pre_r, pim_r, rat_r, rmax_r = ref

    # rows where the reference is live (not head-fill): values must agree
    live = smmax_r > -1e29
    assert live.sum() > 0.99 * live.size
    np.testing.assert_allclose(smmax_g[live], smmax_r[live], rtol=2e-3,
                               atol=2e-3)
    # argmaxes: near-flat NOISE rows may flip on ~1e-3 backend numeric
    # differences (observed 98.9% raw agreement); require broad agreement
    # plus value agreement wherever both picked the same position, and
    # EXACT agreement of the final frame selection below.
    match = (smarg_g[live] == smarg_r[live]).mean()
    assert match > 0.95, match
    same = smarg_g == smarg_r
    np.testing.assert_allclose(pre_g[same], pre_r[same], rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(pim_g[same], pim_r[same], rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(rat_g[same], rat_r[same], rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(rmax_g, rmax_r, rtol=2e-3, atol=1e-3)

    # the selections both backends' rows induce must be IDENTICAL: same
    # frames (incl. the back-to-back pair), same starts, same CFOs
    n_sm = n - spec.fft_len - spec.cp_len + 1
    sel_g = sync._select_from_rows(
        spec, *(jnp.asarray(z) for z in got), n_sm=n_sm, max_frames=8,
        threshold=spec.cfg.sync_threshold,
    )
    ref_inf = [np.where(ref[0] < -1e29, -np.inf, ref[0])] + list(ref[1:])
    sel_r = sync._select_from_rows(
        spec, *(jnp.asarray(z) for z in ref_inf), n_sm=n_sm, max_frames=8,
        threshold=spec.cfg.sync_threshold,
    )
    np.testing.assert_array_equal(np.asarray(sel_g.valid),
                                  np.asarray(sel_r.valid))
    v = np.asarray(sel_g.valid)
    assert int(v.sum()) == len(starts)
    np.testing.assert_array_equal(np.asarray(sel_g.start)[v],
                                  np.asarray(sel_r.start)[v])
    np.testing.assert_allclose(np.asarray(sel_g.fine_cfo)[v],
                               np.asarray(sel_r.fine_cfo)[v], atol=1e-3)


def test_detect_frames_compiled_finds_injected_frames():
    """End-to-end detect_frames on device: every injected frame found at the
    golden model's start rule, fine CFO recovered."""
    import tests.golden.golden_ofdm as G

    cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk")
    spec = cfg.spec
    rng = np.random.RandomState(4)
    n = 1 << 17
    gp = G.GoldenOfdmParams(fft_len=64, cp_len=16, modulation="qpsk")
    frame = G.tx_frame(gp, bytes(range(40))).astype(np.complex64)
    x = (0.02 * (rng.randn(n) + 1j * rng.randn(n))).astype(np.complex64)
    cfo = 0.23
    starts = [3000, 30000, 70000, 110000]
    ph = np.exp(2j * np.pi * cfo * np.arange(len(frame)) / spec.fft_len)
    for p in starts:
        x[p : p + len(frame)] += (frame * ph).astype(np.complex64)

    @jax.jit
    def run(u, v):
        d = sync.detect_frames(spec, (u + 1j * v).astype(jnp.complex64),
                               max_frames=8)
        return d.start, d.fine_cfo, d.valid.astype(jnp.int32), d.peak

    start, fcfo, valid, peak = (
        np.asarray(z) for z in run(np.real(x).copy(), np.imag(x).copy())
    )
    assert int(valid.sum()) == len(starts), (start, valid)
    det = np.sort(start[valid.astype(bool)])
    backoff = min(4, spec.cp_len // 4)
    want = np.asarray(starts) + spec.cp_len - backoff
    np.testing.assert_array_equal(det, want)
    np.testing.assert_allclose(fcfo[valid.astype(bool)], cfo, atol=0.02)


def test_rx_stream_loopback_on_device():
    """Full streaming RX chain compiled on the chip: TX frames -> AWGN ->
    rx_stream_block via the executor; payload bytes and CRC asserted."""
    from tpu_ofdm.config import StreamConfig
    from tpu_ofdm.modem.rx_stream import (collect_frames, history_len,
                                          rx_stream_block)
    from tpu_ofdm.stream.executor import StreamExecutor
    from tpu_ofdm.utils.device_io import maybe_encode
    import tests.golden.golden_ofdm as G

    cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk")
    spec = cfg.spec
    sc = StreamConfig(block_size=1 << 15, max_frames_per_block=4)
    rng = np.random.RandomState(5)
    gp = G.GoldenOfdmParams(fft_len=64, cp_len=16, modulation="qpsk")
    msgs = [bytes([i]) * 48 for i in range(5)]
    stream = (0.02 * (rng.randn(3 * sc.block_size)
                      + 1j * rng.randn(3 * sc.block_size))
              ).astype(np.complex64)
    pos = 2000
    for i, m in enumerate(msgs):
        f = G.tx_frame(gp, m, frame_num=i).astype(np.complex64)
        stream[pos : pos + len(f)] += f
        pos += len(f) + 9000

    ex = StreamExecutor(rx_stream_block(spec, sc), sc.block_size)
    outs = []
    for b in range(3):
        blk = maybe_encode(stream[b * sc.block_size : (b + 1) * sc.block_size])
        outs.append(ex.push(blk))
    frames = collect_frames(outs, sc.block_size, history_len(spec))
    assert len(frames) == len(msgs)
    for i, f in enumerate(frames):
        assert f["crc_ok"]
        assert f["payload"] == msgs[i]
        assert f["frame_num"] == i


def test_pfb_fused_compiled_matches_xla():
    """Compiled fused channelizer (kernels.pfb) vs the golden-matched XLA
    formulation, multi-tile with a streaming tail -- exercises the VMEM
    lookback ring across real (non-interpret) grid steps."""
    from tpu_ofdm.kernels import pfb
    from tpu_ofdm.spectrum.channelizer import channelize, lowpass_taps

    n_chan = 64
    taps = lowpass_taps(n_chan)
    rng = np.random.RandomState(7)
    n = n_chan * 8192  # 4096 rows = several 512-row tiles
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)
    C = pfb.tail_len(n_chan, 8)
    cut = n // 2

    @jax.jit
    def run_fused(u, v):
        x = (u + 1j * v).astype(jnp.complex64)
        a = pfb.channelize_fused(x[:cut], n_chan, taps)
        b = pfb.channelize_fused(x[cut:], n_chan, taps,
                                 tail=x[cut - C : cut])
        out = jnp.concatenate([a, b], axis=0)
        return jnp.real(out), jnp.imag(out)

    @jax.jit
    def run_xla(u, v):
        out = channelize((u + 1j * v).astype(jnp.complex64), n_chan, taps)
        return jnp.real(out), jnp.imag(out)

    gr, gi = (np.asarray(z) for z in run_fused(re, im))
    wr, wi = (np.asarray(z) for z in run_xla(re, im))
    scale = float(np.abs(wr + 1j * wi).max())
    np.testing.assert_allclose(gr + 1j * gi, wr + 1j * wi, rtol=0,
                               atol=2e-4 * scale)


def test_pfb_fused_wide_compiled_matches_xla():
    """Compiled WIDE fused channelizer (n_chan > 128: BASELINE config 5's
    512 channels) vs the golden-matched XLA formulation, multi-tile with a
    streaming tail -- exercises the (J-1)-row ring and the bf16x3 DFT on
    real Mosaic-compiled grid steps."""
    from tpu_ofdm.kernels import pfb
    from tpu_ofdm.spectrum.channelizer import channelize, lowpass_taps

    n_chan = 512
    assert pfb.supported(n_chan)
    taps = lowpass_taps(n_chan)
    rng = np.random.RandomState(8)
    n = n_chan * 512  # 512 symbol rows = several 128-row tiles
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)
    C = pfb.tail_len(n_chan, 8)
    cut = n // 2

    @jax.jit
    def run_fused(u, v):
        x = (u + 1j * v).astype(jnp.complex64)
        a = pfb.channelize_fused(x[:cut], n_chan, taps)
        b = pfb.channelize_fused(x[cut:], n_chan, taps,
                                 tail=x[cut - C : cut])
        out = jnp.concatenate([a, b], axis=0)
        return jnp.real(out), jnp.imag(out)

    @jax.jit
    def run_xla(u, v):
        out = channelize((u + 1j * v).astype(jnp.complex64), n_chan, taps)
        return jnp.real(out), jnp.imag(out)

    gr, gi = (np.asarray(z) for z in run_fused(re, im))
    wr, wi = (np.asarray(z) for z in run_xla(re, im))
    scale = float(np.abs(wr + 1j * wi).max())
    np.testing.assert_allclose(gr + 1j * gi, wr + 1j * wi, rtol=0,
                               atol=2e-4 * scale)


def test_psd_fused_compiled_matches_xla():
    """Compiled fused windowed-PSD kernel (kernels.psd) vs the golden-
    matched XLA chain, on device, tone + noise."""
    from tpu_ofdm.kernels import psd as kpsd
    from tpu_ofdm.kernels import scan as kscan
    from tpu_ofdm.spectrum.psd import psd_frames

    fft_len = 1024
    rng = np.random.RandomState(9)
    n = fft_len * 512
    t = np.arange(n)
    sig = (0.5 * np.exp(2j * np.pi * 200.25 * t / fft_len)
           + 0.05 * (rng.randn(n) + 1j * rng.randn(n)))
    re = sig.real.astype(np.float32)
    im = sig.imag.astype(np.float32)

    @jax.jit
    def run_fused(u, v):
        return kpsd.psd_fused((u + 1j * v).astype(jnp.complex64), fft_len)

    @jax.jit
    def run_xla(u, v):
        return psd_frames((u + 1j * v).astype(jnp.complex64).reshape(1, -1),
                          fft_len)[0]

    orig = kscan.use_pallas
    kscan.use_pallas = lambda: False  # force psd_frames' XLA branch
    try:
        want = np.asarray(run_xla(re, im))
    finally:
        kscan.use_pallas = orig
    got = np.asarray(run_fused(re, im))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * want.max())
    assert (got.argmax(axis=-1) == 200).all()


def test_device_io_packing_round_trip():
    from tpu_ofdm.utils.device_io import maybe_encode, to_host, tpu_safe

    rng = np.random.RandomState(6)
    x = (rng.randn(256) + 1j * rng.randn(256)).astype(np.complex64)

    fn = tpu_safe(lambda v: v * (2.0 + 0.0j))
    y = to_host(jax.jit(fn)(maybe_encode(x)))
    np.testing.assert_allclose(np.asarray(y), x * 2.0, rtol=1e-6, atol=1e-6)


def test_rx_stream_split_fast_path_on_device():
    """The SPLIT-BUFFER streaming fast path (block_size a multiple of the
    detect hist tile => rx_block_split: split-input detect kernel + Pallas
    two-source window gather, no materialized [hist | x] buffer), compiled
    on the chip.  Frames placed mid-block, straddling the block seam, and
    with CFO; payloads, positions, and the CFO estimate asserted -- the
    same bar as test_rx_stream_loopback_on_device, which exercises the
    concat path at an unaligned block size."""
    from tpu_ofdm.config import StreamConfig
    from tpu_ofdm.kernels.sc_detect import hist_tile_len
    from tpu_ofdm.modem.rx_stream import (collect_frames, history_len,
                                          rx_stream_block)
    from tpu_ofdm.stream.executor import StreamExecutor
    from tpu_ofdm.utils.device_io import maybe_encode
    import tests.golden.golden_ofdm as G

    cfg = OfdmConfig(fft_len=64, cp_len=16, modulation="qpsk")
    spec = cfg.spec
    S = hist_tile_len()          # gate: S % hist_tile_len() == 0
    sc = StreamConfig(block_size=S, max_frames_per_block=64)
    rng = np.random.RandomState(6)
    gp = G.GoldenOfdmParams(fft_len=64, cp_len=16, modulation="qpsk")
    n = 3 * S
    stream = (0.02 * (rng.randn(n) + 1j * rng.randn(n))).astype(np.complex64)
    msgs = [b"fast path mid block", b"fast path straddles seam",
            b"fast path with cfo"]
    frames_tx = [G.tx_frame(gp, m, frame_num=i).astype(np.complex64)
                 for i, m in enumerate(msgs)]
    pos = [1500, S - len(frames_tx[1]) // 2, S + 30000]
    cfo = 0.1
    k = np.arange(len(frames_tx[2]))
    frames_tx[2] = frames_tx[2] * np.exp(
        2j * np.pi * cfo * k / spec.fft_len).astype(np.complex64)
    for f, p in zip(frames_tx, pos):
        stream[p : p + len(f)] += f

    ex = StreamExecutor(rx_stream_block(spec, sc), S)
    outs = [ex.push(maybe_encode(stream[b * S : (b + 1) * S]))
            for b in range(3)]
    got = collect_frames(outs, S, history_len(spec))
    ok = [f for f in got if f["crc_ok"]]
    assert {f["payload"] for f in ok} == set(msgs), got
    assert len(ok) == 3
    by_payload = {f["payload"]: f for f in ok}
    for m, p in zip(msgs, pos):
        assert abs(by_payload[m]["abs_start"] - p) <= 16, (m, p)
    assert abs(by_payload[msgs[2]]["fine_cfo"] - cfo) < 1e-2
