"""Self-consistency checks for the frozen golden model (tests/golden/).

These pin down the oracle itself: loopback recovery across modulations and
channel impairments, header/CRC formats, sync-word structure.  If one of
these fails after an edit to golden_ofdm.py, the oracle changed -- which is
forbidden (SURVEY.md §4: keep the golden model tiny, reviewed, frozen).
"""

import numpy as np
import pytest

from golden.golden_ofdm import (
    BITS_PER_SYMBOL,
    GoldenOfdmParams,
    append_crc32,
    bits_to_bytes,
    bytes_to_bits,
    channel,
    check_crc32,
    constellation_points,
    demap_symbols,
    detect_frame,
    log_pwr_fft,
    lowpass_taps,
    make_header_bits,
    map_bits,
    parse_header_bits,
    pfb_channelize,
    rx_frame,
    tx_frame,
)


def test_constellations_unit_power():
    for m in ("bpsk", "qpsk", "qam16", "qam64"):
        pts = constellation_points(m)
        assert len(pts) == 2 ** BITS_PER_SYMBOL[m]
        assert np.isclose(np.mean(np.abs(pts) ** 2), 1.0)
        # all points distinct
        assert len(np.unique(np.round(pts, 9))) == len(pts)


def test_map_demap_roundtrip():
    rng = np.random.RandomState(0)
    for m in ("bpsk", "qpsk", "qam16", "qam64"):
        bits = rng.randint(0, 2, size=8 * 3 * BITS_PER_SYMBOL[m])
        syms = map_bits(bits, m)
        back = demap_symbols(syms, m)
        assert np.array_equal(bits, back[: len(bits)])


def test_gray_mapping_adjacent():
    # Gray property: nearest-neighbor constellation points differ by 1 bit
    for m in ("qam16", "qam64"):
        pts = constellation_points(m)
        k = BITS_PER_SYMBOL[m]
        d = np.abs(pts[:, None] - pts[None, :])
        min_d = np.min(d[d > 1e-9])
        for i in range(len(pts)):
            for j in range(len(pts)):
                if i < j and abs(d[i, j] - min_d) < 1e-9:
                    assert bin(i ^ j).count("1") == 1


def test_bits_bytes_roundtrip():
    data = bytes(range(256))
    assert bits_to_bytes(bytes_to_bits(data)) == data


def test_crc32_roundtrip():
    assert check_crc32(append_crc32(b"hello world"))
    assert not check_crc32(append_crc32(b"hello world")[:-1] + b"\x00")


def test_header_roundtrip():
    bits = make_header_bits(321, 7)
    plen, fnum, ok = parse_header_bits(bits)
    assert (plen, fnum, ok) == (321, 7, True)
    bad = bits.copy()
    bad[0] ^= 1
    assert not parse_header_bits(bad)[2]


def test_sync_word1_halves():
    p = GoldenOfdmParams()
    sw = p.sync_word1_freq()
    td = np.fft.ifft(sw)
    np.testing.assert_allclose(td[:32], td[32:], atol=1e-12)


def _loopback(modulation, snr_db=None, cfo=0.0, timing=0, multipath=None,
              payload=b"The quick brown fox jumps over the lazy dog!", seed=1):
    p = GoldenOfdmParams(modulation=modulation)
    tx = tx_frame(p, payload, frame_num=3)
    # pad with silence either side
    sig = np.concatenate([np.zeros(100), tx, np.zeros(200)])
    rx = channel(sig, snr_db=snr_db, cfo=cfo, fft_len=p.fft_len,
                 timing_offset=timing, multipath=multipath, seed=seed)
    return p, rx_frame(p, rx), payload


@pytest.mark.parametrize("m", ["bpsk", "qpsk", "qam16", "qam64"])
def test_loopback_clean(m):
    p, res, payload = _loopback(m)
    assert res is not None and res["crc_ok"]
    assert res["payload"] == payload
    assert res["frame_num"] == 3
    assert res["evm"] < 1e-6


@pytest.mark.parametrize("m", ["bpsk", "qpsk", "qam16"])
def test_loopback_awgn(m):
    p, res, payload = _loopback(m, snr_db=25)
    assert res is not None and res["crc_ok"]
    assert res["payload"] == payload


def test_loopback_cfo():
    # fractional + integer CFO: 2.2 subcarriers total
    p, res, payload = _loopback("qpsk", snr_db=30, cfo=2.2)
    assert res is not None and res["crc_ok"]
    assert res["payload"] == payload
    assert res["int_cfo"] == 2
    assert abs(res["fine_cfo"] - 0.2) < 0.02


def test_loopback_multipath():
    mp = np.array([1.0, 0.0, 0.35 + 0.2j, 0.0, 0.1j])
    p, res, payload = _loopback("qam16", snr_db=30, multipath=mp)
    assert res is not None and res["crc_ok"]
    assert res["payload"] == payload


def test_detect_frame_position():
    p = GoldenOfdmParams()
    tx = tx_frame(p, b"x" * 40)
    sig = np.concatenate([np.zeros(77), tx])
    det = detect_frame(p, sig)
    assert det is not None
    start, cfo = det
    # start should land inside sync1's CP-protected FFT window region:
    # nominal fft window start is 77 + cp_len = 93; a few samples of backoff
    # into the CP are deliberate (ISI margin), never late.
    assert 93 - p.cp_len // 2 <= start <= 93
    assert abs(cfo) < 0.01


def test_log_pwr_fft_tone():
    fs_rel = 8 / 64  # tone at bin 8
    n = 64 * 32
    x = np.exp(2j * np.pi * fs_rel * np.arange(n))
    psd = log_pwr_fft(x, 64)
    assert np.argmax(psd[-1]) == 8


def test_pfb_channelizer_tone_isolation():
    n_chan = 8
    taps = lowpass_taps(n_chan)
    n = n_chan * 512
    # tone centered in channel 3: freq = 3/n_chan of fs
    x = np.exp(2j * np.pi * (3 / n_chan) * np.arange(n))
    y = pfb_channelize(x, n_chan, taps)
    pwr = np.mean(np.abs(y[32:]) ** 2, axis=0)  # skip filter transient
    assert np.argmax(pwr) == 3
    others = np.delete(pwr, 3)
    assert pwr[3] > 50 * others.max()
