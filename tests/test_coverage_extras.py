"""Coverage for remaining reference semantics: mortality, named handles,
envelope looping, OscWt interpolation, Phasor, RandomLin determinism,
Math1 ops, Beats-based scheduling."""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Beats,
    Envelope,
    GraphError,
    Math1UGen,
    OscWt,
    Phasor,
    Seconds,
    Wavetable,
)
from tests.utils import TestNumUGen

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


def test_set_mortality_blocks_free():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        n = gg.push(TestNumUGen(1.0), name="keeper")
        n.to_graph_out()
        return n

    n = g.edit(build)
    g.set_mortality(n, False)
    with pytest.raises(GraphError):
        g.free_node(n)
    g.set_mortality(n, True)
    g.free_node(n)
    assert n.node_id not in g.nodes


def test_handle_from_name():
    g, proc = AudioProcessor.new(0, 1, OPTS)
    g.edit(lambda gg: gg.push(TestNumUGen(0.5), name="source").to_graph_out())
    h = g.handle_from_name("source")
    assert h is not None
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.5
    assert g.handle_from_name("nope") is None


def test_envelope_looping():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        e = gg.push(Envelope(0.0, [(4 / 48000, 1.0), (4 / 48000, 0.0)],
                             looping=True))
        e.to_graph_out()
        return e.param("t_restart")

    t = g.edit(build)
    t.trig()
    proc.run_without_inputs()
    b1 = proc.output_block()[0].copy()
    proc.run_without_inputs()
    out = np.concatenate([b1, proc.output_block()[0]])
    # triangle repeating; the loop boundary emits the final value once, so
    # the period is dur1+dur2+1 = 9 (reference Envelope::process semantics)
    np.testing.assert_allclose(out[:9], out[9:18], atol=1e-6)
    assert out[:9].max() > 0.99


def test_oscwt_interpolated_smoother_than_nearest():
    def render(interp):
        g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=64))
        g.edit(lambda gg: gg.push(
            OscWt(Wavetable.sine(), 440.7, interpolate=interp)).to_graph_out())
        return proc.render(frames=4800)[0]

    a, b = render(True), render(False)
    # both are sines; interpolated one has lower quantization noise
    t = np.arange(4800) / 48000

    def noise(x):
        # residual against best-fit sine at the phase-quantized frequency
        sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        k = np.argmax(sp)
        mask = np.ones_like(sp, bool)
        mask[max(0, k - 3) : k + 4] = False
        return sp[mask].sum() / sp.sum()

    assert noise(a) < noise(b)


def test_phasor_ramp():
    g, proc = AudioProcessor.new(0, 1, OPTS)
    g.edit(lambda gg: gg.push(Phasor(48000.0 / 16.0)).to_graph_out())
    proc.run_without_inputs()
    np.testing.assert_allclose(
        proc.output_block()[0], np.arange(16) / 16.0, atol=1e-6
    )


def test_math1_ops():
    from knaster_tpu import SinWt

    g, proc = AudioProcessor.new(1, 1, OPTS)

    def build(gg):
        m = gg.push(Math1UGen("sqrt"))
        gg.from_inputs(0).to(m)
        m.to_graph_out()

    g.edit(build)
    x = np.linspace(0, 4, 16, dtype=np.float32)[None, :]
    proc.run(x)
    np.testing.assert_allclose(proc.output_block()[0], np.sqrt(x[0]), atol=1e-6)


def test_beats_scheduling():
    """Beats convert to Seconds for scheduling (musical time primitive)."""
    from tests.utils import TestInPlusParamUGen

    def build2(gg):
        n = gg.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    p = g2.edit(build2)
    # one beat at this bpm == exactly 32 samples
    beat = Beats.from_beats_f64(1.0).to_seconds(bpm=48000 * 60 / 32)
    assert beat.to_samples(48000) == 32
    p.set_at(7.0, beat)
    p2.run_without_inputs()  # frames 0..15: still 0
    assert np.all(p2.output_block()[0] == 0)
    p2.run_without_inputs()  # frames 16..31: still 0
    assert np.all(p2.output_block()[0] == 0)
    p2.run_without_inputs()  # frames 32..47: applies at frame 32
    assert np.all(p2.output_block()[0] == 7.0)


def test_random_lin_deterministic_per_seed():
    from knaster_tpu import RandomLin

    def render(seed):
        g, proc = AudioProcessor.new(0, 1, OPTS)
        g.edit(lambda gg: gg.push(RandomLin(100.0, seed=seed)).to_graph_out())
        return proc.render(frames=256)

    np.testing.assert_array_equal(render(9), render(9))
    assert not np.array_equal(render(9), render(10))
