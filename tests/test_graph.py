"""Flowgraph topology + declarative spec (grc) tests.

The TPU-side counterpart of the reference runtime's flowgraph validation
(flat_flowgraph / hier_block2 / io_signature) and of grcc compiling .grc
descriptors into runnable top blocks.
"""

import json

import numpy as np
import pytest

from tpu_ofdm import grc
from tpu_ofdm.ops import firdes
from tpu_ofdm.stream.block import (
    Block,
    chain,
    complex_to_mag_squared,
    fir_filter,
    multiply_const,
    nlog10,
    single_pole_iir,
    stateless,
)
from tpu_ofdm.stream.executor import StreamExecutor
from tpu_ofdm.stream.graph import Flowgraph, FlowgraphError


def _run(block, x, block_size=256):
    ex = StreamExecutor(block, block_size, donate=False)
    return [np.asarray(o) if not isinstance(o, tuple) else o
            for o in ex.run(x)]


def test_linear_graph_matches_chain():
    taps = firdes.low_pass(1.0, 8.0, 1.5, 0.75, ntaps=21)
    rng = np.random.RandomState(0)
    x = (rng.randn(512) + 1j * rng.randn(512)).astype(np.complex64)

    fg = Flowgraph("lin")
    fg.add("lp", fir_filter(taps)).add("mag", complex_to_mag_squared())
    fg.add_input("lp").connect("lp", "mag").set_outputs("mag")
    got = np.concatenate(_run(fg.build(), x))

    want = np.concatenate(
        _run(chain(fir_filter(taps), complex_to_mag_squared()), x)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fan_out_and_multi_output():
    fg = Flowgraph()
    fg.add("src", multiply_const(2.0))
    fg.add("a", multiply_const(10.0))
    fg.add("b", multiply_const(100.0))
    fg.add_input("src")
    fg.connect("src", "a").connect("src", "b")
    fg.set_outputs("a", "b")
    x = np.arange(8, dtype=np.float32)
    outs = _run(fg.build(), x, block_size=8)
    ya, yb = outs[0]
    np.testing.assert_allclose(np.asarray(ya), x * 20.0)
    np.testing.assert_allclose(np.asarray(yb), x * 200.0)


def test_fan_in_tuple_input():
    add2 = stateless(lambda xy: xy[0] + xy[1], "add2")
    fg = Flowgraph()
    fg.add("a", multiply_const(2.0)).add("b", multiply_const(3.0))
    fg.add("sum", add2)
    fg.add_input("a").add_input("b")
    fg.connect("a", ("sum", 0)).connect("b", ("sum", 1))
    fg.set_outputs("sum")
    x1 = np.ones(8, np.float32)
    x2 = np.full(8, 2.0, np.float32)
    ex = StreamExecutor(fg.build(), 8, donate=False)
    y = np.asarray(ex.push((x1, x2)))
    np.testing.assert_allclose(y, 2.0 + 6.0)


def test_multi_port_source_output():
    split = stateless(lambda x: (x * 1.0, x * -1.0), "split")
    fg = Flowgraph()
    fg.add("split", split).add("neg", multiply_const(5.0))
    fg.add_input("split")
    fg.connect(("split", 1), "neg")
    fg.set_outputs(("split", 0), "neg")
    x = np.arange(4, dtype=np.float32)
    ex = StreamExecutor(fg.build(), 4, donate=False)
    pos, neg = ex.push(x)
    np.testing.assert_allclose(np.asarray(pos), x)
    np.testing.assert_allclose(np.asarray(neg), -5.0 * x)


def test_hierarchical_composition():
    """A built Flowgraph is a Block and nests as a node (hier_block2)."""
    inner = Flowgraph("inner")
    inner.add("m", multiply_const(3.0)).add_input("m").set_outputs("m")
    outer = Flowgraph("outer")
    outer.add("pre", multiply_const(2.0)).add("h", inner.build())
    outer.add_input("pre").connect("pre", "h").set_outputs("h")
    x = np.ones(4, np.float32)
    ex = StreamExecutor(outer.build(), 4, donate=False)
    np.testing.assert_allclose(np.asarray(ex.push(x)), 6.0)


def test_stateful_nodes_carry_state():
    fg = Flowgraph()
    fg.add("iir", single_pole_iir(0.5))
    fg.add_input("iir").set_outputs("iir")
    blk = fg.build()
    ref = single_pole_iir(0.5)
    x = np.random.RandomState(1).randn(64).astype(np.float32)
    got = np.concatenate(_run(blk, x, block_size=16))
    want = np.concatenate(_run(ref, x, block_size=16))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_validation_errors():
    fg = Flowgraph()
    fg.add("a", multiply_const(1.0))
    with pytest.raises(FlowgraphError, match="duplicate"):
        fg.add("a", multiply_const(1.0))
    with pytest.raises(FlowgraphError, match="unknown node"):
        fg.connect("a", "zzz")
    with pytest.raises(FlowgraphError, match="set_outputs"):
        fg.add_input("a")
        fg.build()
    # cycle
    fg2 = Flowgraph()
    fg2.add("x", multiply_const(1.0)).add("y", multiply_const(1.0))
    fg2.connect("x", "y").connect("y", "x")
    fg2.set_outputs("x")
    with pytest.raises(FlowgraphError, match="cycle"):
        fg2.build()
    # non-dense in-ports
    fg3 = Flowgraph()
    fg3.add("s", multiply_const(1.0)).add("d", multiply_const(1.0))
    fg3.connect("s", ("d", 1)).add_input("s").set_outputs("d")
    with pytest.raises(FlowgraphError, match="not dense"):
        fg3.build()
    # double-connect an input port
    fg4 = Flowgraph()
    fg4.add("s", multiply_const(1.0)).add("d", multiply_const(1.0))
    fg4.connect("s", "d")
    with pytest.raises(FlowgraphError, match="already connected"):
        fg4.connect("s", "d")


SPEC = {
    "name": "psd",
    "blocks": [
        {"id": "lp", "type": "fir_filter",
         "params": {"taps": {"design": "low_pass", "gain": 1.0, "fs": 1.0,
                             "cutoff": 0.2, "transition_width": 0.05}}},
        {"id": "probe", "type": "spectrum_probe", "params": {"fft_len": 64}},
    ],
    "connections": [["lp", "probe"]],
    "inputs": ["lp"],
    "outputs": ["probe"],
}


def test_grc_build_and_run():
    blk = grc.build(SPEC)
    n = 1 << 12
    tone = np.exp(2j * np.pi * 0.125 * np.arange(n)).astype(np.complex64)
    ex = StreamExecutor(blk, 1 << 11, donate=False)
    out = None
    for o in ex.run(tone):
        out = o
    avg = np.asarray(out.avg_db)
    assert int(np.argmax(avg)) == 8  # 0.125 * 64


def test_grc_load_file(tmp_path):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(SPEC))
    blk = grc.load(str(p))
    assert isinstance(blk, Block) and blk.name == "psd"


def test_grc_errors():
    with pytest.raises(FlowgraphError, match="unknown block type"):
        grc.build({"blocks": [{"id": "x", "type": "nope"}],
                   "outputs": ["x"]})
    with pytest.raises(FlowgraphError, match="unknown params"):
        grc.build({"blocks": [{"id": "x", "type": "nlog10",
                               "params": {"bogus": 1}}],
                   "outputs": ["x"]})
    with pytest.raises(FlowgraphError, match="unknown tap design"):
        grc.build({"blocks": [{"id": "x", "type": "fir_filter",
                               "params": {"taps": {"design": "zzz"}}}],
                   "inputs": ["x"], "outputs": ["x"]})


def test_named_in_port_rejected():
    """Named ports select a SOURCE output field; a string in-port on the
    destination is a spec error and must fail at connect()/add_input()
    time with a direct message (ADVICE r3), not later as 'not dense'."""
    from tpu_ofdm.stream.graph import Flowgraph
    from tpu_ofdm.stream.block import multiply_const

    fg = Flowgraph()
    fg.add("a", multiply_const(2.0))
    fg.add("b", multiply_const(3.0))
    with pytest.raises(FlowgraphError, match="named port.*destination"):
        fg.connect("a", ("b", "samples"))
    with pytest.raises(FlowgraphError, match="named port.*destination"):
        fg.add_input(("a", "samples"))


def test_grc_user_registration():
    # Clean up the global REGISTRY on exit: other tests assert the built-in
    # registry exactly (tests/test_grc_registry.py), so a leaked entry makes
    # the suite order-dependent.
    @grc.register("times_seven")
    def make(k=7.0):
        return multiply_const(k)

    try:
        blk = grc.build({
            "blocks": [{"id": "t", "type": "times_seven"}],
            "inputs": ["t"], "outputs": ["t"],
        })
        ex = StreamExecutor(blk, 4, donate=False)
        np.testing.assert_allclose(
            np.asarray(ex.push(np.ones(4, np.float32))), 7.0
        )
    finally:
        grc.unregister("times_seven")
    assert "times_seven" not in grc.REGISTRY


def test_example_specs_compile():
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "examples")
    specs = sorted(glob.glob(os.path.join(root, "*.json")))
    assert len(specs) >= 3
    for s in specs:
        blk = grc.load(s)
        assert isinstance(blk, Block)


def test_loopback_example_channel_realizes_requested_snr():
    """The shipped loopback example must realize the snr_db it asks for
    within 0.2 dB on frame samples (ADVICE r3 / VERDICT r4 missing #3: with
    the old signal_power=1.0 default the realized SNR ran ~0.9 dB low,
    because OFDM frame samples average n_occupied/fft_len ~ 0.81)."""
    import os

    import tests.golden.golden_ofdm as G

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "ofdm_loopback.json")
    with open(path) as f:
        spec_d = json.load(f)
    chan_params = next(
        b for b in spec_d["blocks"] if b["id"] == "chan")["params"]
    snr_req = float(chan_params["snr_db"])

    # a gapless stream of real TX frames: stream power == frame power
    gp = G.GoldenOfdmParams(fft_len=64, cp_len=16, modulation="qpsk")
    frame = G.tx_frame(gp, bytes(range(48))).astype(np.complex64)
    reps = max(1, (1 << 16) // len(frame))
    x = np.tile(frame, reps)

    def run(params):
        blk = grc.REGISTRY["channel_model"].make(params)
        state = blk.init()
        _, y = blk.apply(state, x)
        return np.asarray(y)

    noisy = run(chan_params)
    clean = run({**chan_params, "snr_db": None})
    noise_pow = np.mean(np.abs(noisy - clean) ** 2)
    sig_pow = np.mean(np.abs(clean) ** 2)
    realized = 10.0 * np.log10(sig_pow / noise_pow)
    # multipath gain sum|taps|^2 (~+0.07 dB here) is part of the realized
    # post-channel power; it must stay inside the same 0.2 dB budget
    assert abs(realized - snr_req) < 0.2, (realized, snr_req)


def test_run_flowgraph_app(tmp_path, capsys):
    from tpu_ofdm.apps import run_flowgraph

    p = tmp_path / "g.json"
    p.write_text(json.dumps(SPEC))
    rc = run_flowgraph.main([str(p), "--tone", "0.125",
                             "--block-size", "2048", "--steps", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 steps" in out and "compiled" in out
