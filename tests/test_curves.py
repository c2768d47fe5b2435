"""EVM/BER-vs-SNR curve assertions (BASELINE configs 1-3, SURVEY.md §4
correctness bound).  Reduced grid of bench/curves.py: monotone EVM, zero
BER at high SNR, detection threshold SNRs, and EVM parity with the frozen
golden model on identical captures."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench.curves import baseline_configs, measure_point  # noqa: E402

PAYLOAD = b"curve test payload 0123456789"


@pytest.mark.slow
@pytest.mark.parametrize("cc", baseline_configs(), ids=lambda c: c.name)
def test_curves_monotone_and_thresholds(cc):
    snrs = [8, 14, 22, 32] if cc.cfg.modulation != "qam16" else [12, 18, 26, 36]
    pts = [measure_point(cc, s, n_trials=6, payload=PAYLOAD) for s in snrs]

    # high-SNR point: everything decodes, zero bit errors, tiny EVM
    top = pts[-1]
    assert top["fer"] == 0.0, pts
    assert top["ber"] == 0.0, pts
    assert top["evm"] < 0.1, pts

    # EVM decreases monotonically with SNR (5% slack for MC noise)
    evms = [p["evm"] for p in pts if p["evm"] is not None]
    assert len(evms) >= 3
    for a, b in zip(evms, evms[1:]):
        assert b <= a * 1.05, evms

    # BER non-increasing with SNR
    bers = [p["ber"] for p in pts if p["ber"] is not None]
    for a, b in zip(bers, bers[1:]):
        assert b <= a + 1e-9, bers

    # EVM parity vs the golden model on the same captures (within 2x; the
    # two RX chains use different timing backoff and equalizer details)
    for p in pts[1:]:
        if p["evm"] is not None and p.get("golden_evm"):
            assert p["evm"] < 2.0 * p["golden_evm"] + 0.02, pts
