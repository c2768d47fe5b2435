"""Streaming TX + full-duplex radio tests (VERDICT r1 item 5).

Executor-driven TX -> channel -> RX loopback with multiple queued PDUs,
back-pressure on slot overflow, and the ofdm_radio composite running both
directions in one jitted step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ofdm.config import OfdmConfig, StreamConfig
from tpu_ofdm.modem.radio import ofdm_radio
from tpu_ofdm.modem.rx_stream import collect_frames, history_len, rx_stream_block
from tpu_ofdm.modem.tx_stream import empty_tx_in, queue_tx_in, tx_stream_block
from tpu_ofdm.ops.channel import channel_model
from tpu_ofdm.stream.executor import StreamExecutor


def _run_tx(spec, sc, batches, n_steps):
    """Push input batches (padding with empty) and return the TX stream."""
    ex = StreamExecutor(tx_stream_block(spec, sc), sc.block_size)
    outs = []
    for i in range(n_steps):
        ti = batches[i] if i < len(batches) else empty_tx_in(
            spec, sc.max_frames_per_block
        )
        outs.append(ex.push(ti))
    return ex, outs


def test_tx_stream_loopback_multi_pdu():
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    sc = StreamConfig(block_size=1 << 12, max_frames_per_block=4)
    msgs = [b"pdu number %d over the streaming tx" % i for i in range(6)]

    b0, rest = queue_tx_in(spec, 4, msgs, frame_num0=0)
    b1, rest = queue_tx_in(spec, 4, rest, frame_num0=4)
    assert not rest
    _, outs = _run_tx(spec, sc, [b0, b1], n_steps=4)
    for o in outs:
        assert o.samples.shape == (sc.block_size,)
    assert np.asarray(outs[0].accepted).all()
    assert np.asarray(outs[1].accepted)[:2].all()
    stream = np.concatenate([np.asarray(o.samples) for o in outs])

    # receive through the streaming RX over a mild channel
    rx = channel_model(jax.random.PRNGKey(1), jnp.asarray(stream), snr_db=25,
                       cfo=0.05, fft_len=cfg.fft_len)
    rex = StreamExecutor(rx_stream_block(spec, sc), sc.block_size)
    frames = collect_frames(rex.run(np.asarray(rx), drain=True),
                            sc.block_size, history_len(spec))
    assert len(frames) == len(msgs)
    for i, f in enumerate(frames):
        assert f["crc_ok"]
        assert f["payload"] == msgs[i]
        assert f["frame_num"] == i


def test_tx_stream_back_pressure():
    """Slots that would overflow the pending buffer are refused, and
    re-queueing them later succeeds (no samples lost or duplicated)."""
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    # tiny blocks: one step cannot drain even one frame
    sc = StreamConfig(block_size=256, max_frames_per_block=8)
    msgs = [bytes([65 + i]) * 40 for i in range(12)]

    ex = StreamExecutor(tx_stream_block(spec, sc), sc.block_size)
    pending = list(msgs)
    sent = 0
    chunks = []
    for _ in range(80):
        ti, rest = queue_tx_in(spec, 8, pending, frame_num0=sent)
        out = ex.push(ti)
        acc = np.asarray(out.accepted)
        n_in = sum(ti.valid)
        n_ok = int(acc[:n_in].sum())
        # accepted must be a prefix (frames are placed in slot order)
        assert acc[:n_ok].all() and not acc[n_ok:n_in].any()
        sent += n_ok
        pending = (
            [m for m, a in zip(pending[:8], acc[:n_in]) if not a]
            + pending[8:]
        )
        chunks.append(np.asarray(out.samples))
        if not pending and int(np.asarray(out.n_pending)) == 0:
            break
    assert sent == len(msgs)
    stream = np.concatenate(chunks)

    rex = StreamExecutor(
        rx_stream_block(spec, StreamConfig(block_size=1 << 12,
                                           max_frames_per_block=8)),
        1 << 12,
    )
    frames = collect_frames(rex.run(stream, drain=True))
    assert len(frames) == len(msgs)
    assert all(f["crc_ok"] for f in frames)
    got = sorted((f["frame_num"], f["payload"]) for f in frames)
    for i, (fn, payload) in enumerate(got):
        assert fn == i
        assert payload == msgs[i]


def test_tx_stream_accepted_prefix_mid_batch():
    """Negative case for the prefix invariant ofdm_chat relies on: when
    back-pressure refuses slots MID-batch, accepted must still be exactly
    [True]*n + [False]*rest -- never a hole followed by an acceptance.
    Structural reason: place() refuses iff cur + F > B and cur is monotone
    non-decreasing over slots, so the first refusal refuses all later slots
    (tx_stream.py place())."""
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    # Buffer B = S + K*(F+gap); fill it in one oversized batch so the tail
    # slots are refused in the SAME push as accepted head slots.
    sc = StreamConfig(block_size=256, max_frames_per_block=8)
    ex = StreamExecutor(tx_stream_block(spec, sc), sc.block_size)
    msgs = [bytes([48 + i]) * 50 for i in range(8)]
    ti, rest = queue_tx_in(spec, 8, msgs)
    assert not rest
    # The pending buffer holds one full batch (B = S + K*(F+gap)), so the
    # first push accepts everything; keep pushing full batches -- the
    # backlog drains only S samples/step, so within a few steps a batch is
    # split: head accepted, tail refused in the SAME push.
    saw_partial = False
    for _ in range(6):
        acc = np.asarray(ex.push(ti).accepted)
        n_ok = int(acc.sum())
        np.testing.assert_array_equal(
            acc, np.arange(len(msgs)) < n_ok, err_msg="accepted not a prefix"
        )
        if 0 < n_ok < len(msgs):
            saw_partial = True
    assert saw_partial, "no mid-batch refusal exercised; test is vacuous"


def test_ofdm_radio_full_duplex():
    """ofdm_radio: one jitted step runs TX and RX; feed radio A's TX output
    into its own RX input one step later (loopback air interface)."""
    cfg = OfdmConfig(modulation="qpsk", max_payload_bytes=64)
    spec = cfg.spec
    sc = StreamConfig(block_size=1 << 12, max_frames_per_block=4)
    radio = ofdm_radio(spec, sc)
    ex = StreamExecutor(radio, sc.block_size, donate=False)

    msgs = [b"full duplex hello %d" % i for i in range(3)]
    b0, rest = queue_tx_in(spec, 4, msgs)
    assert not rest
    air = np.zeros(sc.block_size, np.complex64)  # one block of delay
    outs = []
    n_steps = 3 + -(-history_len(spec) // sc.block_size) + 1
    for i in range(n_steps):
        ti = b0 if i == 0 else empty_tx_in(spec, 4)
        out = ex.push((tuple(ti), air))
        outs.append(out.rx)
        air = np.asarray(out.tx.samples)
    frames = collect_frames(outs)
    assert len(frames) == len(msgs)
    for i, f in enumerate(frames):
        assert f["crc_ok"] and f["payload"] == msgs[i]
