"""Checkpoint/resume of streaming state (SURVEY.md §5)."""

import numpy as np

from tpu_ofdm.config import OfdmConfig, StreamConfig
from tpu_ofdm.modem.rx_stream import collect_frames, history_len, rx_stream_block
from tpu_ofdm.stream.checkpoint import load_state, resume_step, save_state
from tpu_ofdm.stream.executor import StreamExecutor
from tpu_ofdm.utils.device_io import to_host

from tests.test_stream import _make_stream


def test_resume_recovers_straddling_frame(tmp_path):
    """Checkpoint mid-stream with a frame straddling the cut; the resumed
    executor must still decode it (sync state survives the restart)."""
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    bs = 2048
    # frame 1 straddles the boundary between block 1 and block 2
    stream, pos = _make_stream(
        cfg, [b"before checkpoint", b"straddles the cut"], [500, 2950]
    )
    n_blocks = -(-len(stream) // bs)
    pad = np.concatenate([stream, np.zeros(n_blocks * bs - len(stream),
                                           np.complex64)])

    scfg = StreamConfig(block_size=bs, max_frames_per_block=4)

    # uninterrupted reference run
    ex_ref = StreamExecutor(rx_stream_block(spec, scfg), bs, donate=False)
    want = collect_frames(ex_ref.run(pad, drain=True), bs, history_len(spec))

    # run half, checkpoint, restore into a fresh executor, run the rest
    ex1 = StreamExecutor(rx_stream_block(spec, scfg), bs, donate=False)
    outs_a = [to_host(ex1.push(pad[i * bs:(i + 1) * bs])) for i in range(2)]
    save_state(str(tmp_path / "ckpt"), ex1, meta={"note": "mid-capture"})

    ex2 = StreamExecutor(rx_stream_block(spec, scfg), bs, donate=False)
    meta = load_state(str(tmp_path / "ckpt"), ex2)
    assert resume_step(meta) == 2
    rest = pad[2 * bs:]
    outs_b = [to_host(o) for o in ex2.run(rest, drain=True)]
    # outs_b step counters continue from the checkpoint
    got = collect_frames(outs_a + outs_b, bs, history_len(spec))

    key = lambda f: (f["payload"], f["frame_num"], f["abs_start"], f["crc_ok"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 2 and all(f["crc_ok"] for f in got)


def test_mismatched_config_rejected(tmp_path):
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    scfg = StreamConfig(block_size=1024, max_frames_per_block=4)
    ex = StreamExecutor(rx_stream_block(cfg.spec, scfg), 1024, donate=False)
    save_state(str(tmp_path / "c"), ex)

    ex_other = StreamExecutor(rx_stream_block(cfg.spec, scfg), 2048,
                              donate=False)
    import pytest

    with pytest.raises(ValueError, match="block_size"):
        load_state(str(tmp_path / "c"), ex_other)
