"""CLI apps end-to-end (in-process, CPU backend via conftest).

Mirrors how the reference's apps were validated -- by running them
(SURVEY.md §4: the OOT module was "likely validated by running the apps")
-- but automated."""

import json
import threading

import numpy as np
import pytest

from tpu_ofdm.apps import ofdm_chat, ofdm_loopback, spectrum_analyzer, spectrum_logger, wideband_scanner
from tpu_ofdm.io import file_sink
from tpu_ofdm.io.transport import SpectrumSubscriber


class TestOfdmLoopback:
    def test_clean(self, capsys):
        rc = ofdm_loopback.main(["--frames", "3", "--gap", "300"])
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("OK ") == 3

    def test_impaired(self):
        rc = ofdm_loopback.main([
            "--frames", "2", "--snr", "25", "--cfo", "0.1", "--multipath",
            "--modulation", "qam16",
        ])
        assert rc == 0

    def test_low_snr_fails_gracefully(self):
        # 0 dB QAM64: CRCs fail -> nonzero exit, no crash
        rc = ofdm_loopback.main([
            "--frames", "2", "--snr", "0", "--modulation", "qam64",
        ])
        assert rc == 1


class TestSpectrumLogger:
    def test_logs_tone(self, tmp_path):
        out = str(tmp_path / "speclog")
        rc = spectrum_logger.main([
            "--tone", "0.125", "--fft-len", "256", "--block-size", "8192",
            "--blocks-per-snapshot", "2", "--snapshots", "3", "--out", out,
            "--sample-rate", "1e6",
        ])
        assert rc == 0
        z = np.load(out + ".npz")
        assert z["avg_db"].shape == (3, 256)
        assert np.argmax(z["avg_db"][0]) == 32  # 0.125 * 256
        lines = [json.loads(l) for l in open(out + ".jsonl")]
        assert len(lines) == 3 and lines[0]["peak_bin"] == 32


class TestSpectrumAnalyzer:
    def test_local_remote_pair(self, capsys):
        sub = SpectrumSubscriber(bind_port=0)
        port = sub.port
        sub.close()

        worker = threading.Thread(
            target=spectrum_analyzer.main,
            args=([
                "local", "--tone", "0.25", "--fft-len", "128",
                "--block-size", "8192", "--blocks", "40",
                "--frame-rate", "1000", "--port", str(port),
                "--center-freq", "1e6", "--sample-rate", "4e6",
            ],),
        )
        worker.start()
        try:
            rc = spectrum_analyzer.main([
                "remote", "--port", str(port), "--frames", "3",
                "--timeout", "20", "--width", "40",
            ])
        finally:
            worker.join(timeout=30)
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("MHz") >= 3

    def test_mesh_remote_pair(self, capsys):
        """mesh mode (VERDICT r3 item 7): the distributed wideband worker --
        sharded channelizer over the virtual (channel x time) mesh, per-
        channel PSD, all_gather_spectrum consensus, broadcast_control on the
        retune path -- feeding the SAME UDP/render client.  A tone at 0.25 fs
        must surface at the right full-band bin of the consensus PSD."""
        sub = SpectrumSubscriber(bind_port=0)
        port = sub.port

        n_chan, nb = 16, 32
        worker = threading.Thread(
            target=spectrum_analyzer.main,
            args=([
                "mesh", "--tone", "0.25", "--noise", "0.01",
                "--n-chan", str(n_chan), "--chan-fft-len", str(nb),
                "--block-size", str(n_chan * nb * 8), "--blocks", "30",
                "--frame-rate", "1000", "--port", str(port),
                "--center-freq", "1e6", "--sample-rate", "4e6",
            ],),
        )
        worker.start()
        try:
            frames = []
            while len(frames) < 2:
                fr = sub.receive(timeout=30)
                assert fr is not None, "no consensus frames received"
                frames.append(fr)
        finally:
            worker.join(timeout=60)
            sub.close()
        fr = frames[-1]
        assert fr.avg_db.shape == (n_chan * nb,)
        # flatten_band orders bins by absolute frequency over [-fs/2, fs/2);
        # the 0.25 fs tone sits 3/4 of the way across the band
        peak = int(np.argmax(fr.avg_db))
        want = int(0.75 * n_chan * nb)
        assert abs(peak - want) <= 1, (peak, want)
        # max-hold tracks the average
        assert fr.max_db[peak] >= fr.avg_db[peak] - 1e-3


class TestWidebandScanner:
    def test_power_scan_flags_tone_channel(self, tmp_path, capsys):
        n_chan = 8
        n = np.arange(n_chan * 4096)
        x = np.exp(2j * np.pi * 3 / n_chan * n).astype(np.complex64)
        path = str(tmp_path / "wide.c64")
        w, c = file_sink(path)
        w(x)
        c()
        rc = wideband_scanner.main([
            "--file", path, "--channels", str(n_chan), "--blocks", "4",
            "--block-size", str(n_chan * 1024), "--threshold", "-20",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if l.strip().endswith("*")]
        assert len(lines) == 1 and lines[0].startswith("ch   3")


class TestOfdmChat:
    def test_send_listen_over_udp(self, capsys):
        from tpu_ofdm.io.pdu import UdpSampleLink

        probe = UdpSampleLink(0)
        port = probe.port
        probe.close()

        listener = {}

        def listen():
            listener["rc"] = ofdm_chat.main([
                "listen", "--port", str(port), "--messages", "2",
                "--timeout", "30", "--block-size", "8192",
            ])

        t = threading.Thread(target=listen)
        t.start()
        import time

        time.sleep(1.0)  # listener socket up
        rc = ofdm_chat.main([
            "send", "--remote-host", "127.0.0.1", "--port", str(port),
            "-m", "hello over the air", "-m", "second message",
        ])
        assert rc == 0
        t.join(timeout=60)
        assert listener.get("rc") == 0
        out = capsys.readouterr().out
        assert "hello over the air" in out
        assert "second message" in out
