"""Sample-accurate parameter scheduling tests.

Parity with the reference's WrPreciseTiming / WrSmoothParams tests
(knaster_core_dsp/src/wrappers_core.rs:123-250), re-expressed against the
parameter engine: changes scheduled at frame f take effect at exactly
sample f; wrappers don't disturb timing; smoothing ramps linearly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Seconds,
    Smoothing,
    Time,
    UGen,
    pinteger,
    ptrigger,
)
from tests.utils import TestInPlusParamUGen

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


def _samples(n):
    return Seconds.from_samples(n, 48000)


def test_sample_accurate_parameters():
    """wrappers_core.rs sample_accurate_parameters_test — exact output."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    for frame, val in [(5, 5.0), (6, 6.0), (8, 8.0), (9, 9.0), (10, 10.0)]:
        p.set_at(val, _samples(frame))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    expected = [0, 0, 0, 0, 0, 5, 6, 6, 8, 9, 10, 10, 10, 10, 10, 10]
    np.testing.assert_array_equal(out, np.asarray(expected, dtype=np.float32))


def test_sample_accurate_through_wrappers():
    """wrappers_core.rs sample_accurate_parameters_with_wrappers_test."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        inner = TestInPlusParamUGen()
        wrapped = (
            inner.wr_add(0.0)
            .wr_sub(0.0)
            .wr_div(1.0)
            .wr_mul(1.0)
            .wr_powf(1.0)
            .wr_powi(1)
            .wr(lambda v: v)
        )
        n = g.push(wrapped)
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    for frame, val in [(5, 5.0), (6, 6.0), (8, 8.0), (9, 9.0), (10, 10.0)]:
        p.set_at(val, _samples(frame))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    expected = np.asarray(
        [0, 0, 0, 0, 0, 5, 6, 6, 8, 9, 10, 10, 10, 10, 10, 10], dtype=np.float32
    )
    np.testing.assert_allclose(out, expected, atol=2e-4)


def test_set_after_and_asap():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param("number")

    p = g.edit(build)
    proc.run_without_inputs()  # clock: 16
    p.set_after(3.0, _samples(4))  # due at absolute frame 20 = block frame 4
    p.set(1.0)  # asap = frame 0 of next block
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_array_equal(
        out, np.asarray([1, 1, 1, 1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3], np.float32)
    )


def test_smoothing_audio_rate_across_blocks():
    """Linear AR smoothing: ramp advances per sample, spans blocks, lands
    exactly on the target (WrSmoothParams AudioRate semantics)."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    p.smooth(Smoothing.linear(24 / 48000))  # 24-frame ramp
    p.set_at(12.0, _samples(4))
    proc.run_without_inputs()
    b1 = proc.output_block()[0]
    proc.run_without_inputs()
    b2 = proc.output_block()[0]
    # frames 0-3: 0; ramp starts at 4: value at frame 4+k = k*0.5
    np.testing.assert_allclose(b1[:4], 0.0)
    np.testing.assert_allclose(b1[4:], 0.5 * np.arange(12), atol=1e-5)
    np.testing.assert_allclose(b2[:12], 0.5 * np.arange(12, 24), atol=1e-5)
    assert b2[12] == 12.0 and b2[15] == 12.0  # exact landing


def test_smoothing_block_rate_stairs():
    """BlockRate smoothing only updates at block starts (stair-step)."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    p.smooth(Smoothing.linear(32 / 48000, rate="block"))
    p.set(8.0)  # ramp starts at frame 0, 32 frames to reach 8
    proc.run_without_inputs()
    b1 = proc.output_block()[0]
    proc.run_without_inputs()
    b2 = proc.output_block()[0]
    proc.run_without_inputs()
    b3 = proc.output_block()[0]
    assert np.all(b1 == b1[0])  # constant within block
    assert np.all(b2 == b2[0])
    assert b1[0] == 0.0
    assert b2[0] == pytest.approx(4.0)  # halfway after 16 frames
    assert np.all(b3 == 8.0)


def test_smooth_cfg_freezes_inflight_ramp():
    """Reconfiguring smoothing mid-ramp freezes at the current value
    (WrSmoothParams::set_smoothing conversion semantics)."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    p.smooth(Smoothing.linear(32 / 48000))
    p.set(8.0)  # ramp: 0.25/frame
    # freeze at frame 8 of the first block (value 2.0)
    p.smooth_at(Smoothing.linear(16 / 48000), _samples(8))
    proc.run_without_inputs()
    b1 = proc.output_block()[0]
    np.testing.assert_allclose(b1[:8], 0.25 * np.arange(8), atol=1e-5)
    np.testing.assert_allclose(b1[8:], 2.0, atol=1e-5)
    proc.run_without_inputs()
    assert np.all(proc.output_block()[0] == pytest.approx(2.0))


def test_multiple_sets_same_slot_same_frame_last_wins():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    p.set_at(1.0, _samples(3))
    p.set_at(2.0, _samples(3))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    assert out[2] == 0.0 and out[3] == 2.0


class _TrigProbe(UGen):
    """Outputs 1.0 at trigger frames, else 0 — for trigger timing tests."""

    __test__ = False
    inputs = 0
    outputs = 1
    params = (ptrigger("t"),)

    def process(self, ctx, state, inputs, params):
        return state, params["t"].astype(ctx.dtype)[None, :]


def test_trigger_sample_accurate():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(_TrigProbe())
        n.to_graph_out()
        return n.param("t")

    p = g.edit(build)
    p.trig_at(_samples(7))
    p.trig_at(_samples(11))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    expected = np.zeros(16, np.float32)
    expected[7] = 1.0
    expected[11] = 1.0
    np.testing.assert_array_equal(out, expected)


class _IntProbe(UGen):
    __test__ = False
    inputs = 0
    outputs = 1
    params = (pinteger("sel", 0),)

    def process(self, ctx, state, inputs, params):
        return state, params["sel"].astype(ctx.dtype)[None, :]


def test_integer_param_steps_at_frame():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(_IntProbe())
        n.to_graph_out()
        return n.param("sel")

    p = g.edit(build)
    p.set_at(3, _samples(5))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_array_equal(out[:5], 0.0)
    np.testing.assert_array_equal(out[5:], 3.0)
    # persists into the next block
    proc.run_without_inputs()
    np.testing.assert_array_equal(proc.output_block()[0], 3.0)


def test_late_event_applies_asap():
    """Events scheduled in the past apply at frame 0 of the next block
    (reference to_samples_until_due clamps to 'now')."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        return n.param(0)

    p = g.edit(build)
    proc.run_without_inputs()  # clock at 16
    p.set_at(5.0, _samples(3))  # already in the past
    proc.run_without_inputs()
    assert np.all(proc.output_block()[0] == 5.0)


def test_audio_rate_param_modulation():
    """connect_param: a node's float param follows another node's output
    (WrArParams parity)."""
    from knaster_tpu import Phasor

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        lfo = g.push(Phasor(48000.0 / 16.0))  # one full ramp per block
        n = g.push(TestInPlusParamUGen())
        n.to_graph_out()
        g.connect_param(lfo, 0, n, "number")

    g.edit(build)
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_allclose(out, np.arange(16) / 16.0, atol=1e-5)


# ------------------------------------------------------------ event overflow
def _overflow_graph(n_consts, capacity):
    from knaster_tpu import Constant

    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=16, sample_rate=48000,
                                    event_capacity=capacity)
    )

    def build(g):
        hs = [g.push(Constant(0.0)) for _ in range(n_consts)]
        for h in hs:
            g.connect(h, 0, 0, "graph")
        return hs

    hs = g.edit(build)
    return g, proc, hs


def test_event_overflow_spills_instead_of_raising():
    """150 set events in one block on a 64-capacity engine: the tail spills
    to following blocks (ordered), producing the same audio as scheduling the
    same sets naturally spread at the frames where the spill lands them
    (reference ring headroom parity, processor.rs:36-44)."""
    CAP, N = 64, 150
    g, proc, hs = _overflow_graph(N, CAP)
    for h in hs:
        h.param("value").set_at(1.0, _samples(0))
    blocks_a = []
    for _ in range(4):
        proc.run_without_inputs()
        blocks_a.append(proc.output_block()[0].copy())

    # reference run: identical sets explicitly spread 64/64/22 across blocks
    g2, proc2, hs2 = _overflow_graph(N, CAP)
    for i, h in enumerate(hs2):
        h.param("value").set_at(1.0, _samples((i // CAP) * 16))
    blocks_b = []
    for _ in range(4):
        proc2.run_without_inputs()
        blocks_b.append(proc2.output_block()[0].copy())

    np.testing.assert_allclose(np.concatenate(blocks_a),
                               np.concatenate(blocks_b), atol=0)
    # sanity: the spill is visible (64, then 128, then all 150)
    assert blocks_a[0][0] == 64.0
    assert blocks_a[1][0] == 128.0
    assert blocks_a[2][0] == 150.0
    assert blocks_a[3][0] == 150.0


def test_event_overflow_preserves_per_slot_ordering():
    """When an early set spills, later sets to the same slot spill behind it:
    the final value is the last-scheduled one."""
    g, proc, hs = _overflow_graph(3, 2)
    # fill the block-0 bucket with sets to slots 0 and 1, then two ordered
    # sets to slot 2: the first spills, and the second must spill BEHIND it
    hs[0].param("value").set_at(1.0, _samples(0))
    hs[1].param("value").set_at(1.0, _samples(0))
    hs[2].param("value").set_at(5.0, _samples(2))
    hs[2].param("value").set_at(7.0, _samples(3))
    for _ in range(3):
        proc.run_without_inputs()
    # all spilled sets applied by now; last writer wins
    assert proc.output_block()[0][-1] == 1.0 + 1.0 + 7.0


def test_event_overflow_in_render_bounce():
    """The scan bounce path also spills (per-chunk horizons)."""
    CAP, N = 16, 80
    g, proc, hs = _overflow_graph(N, CAP)
    for h in hs:
        h.param("value").set_at(1.0, _samples(0))
    audio = proc.render(frames=16 * 8)
    # all sets eventually applied, none dropped
    assert audio[0, -1] == float(N)
    # monotone application (each block applies a non-negative batch)
    block_starts = audio[0, ::16]
    assert np.all(np.diff(block_starts) >= 0)


def test_scheduling_token_atomic_batch():
    """SchedulingToken (scheduling.rs:146-188): changes attached to a token
    are invisible until activate(), then all land in the same block."""
    from knaster_tpu import Constant, SchedulingToken

    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        a = gg.push(Constant(1.0))
        b = gg.push(Constant(10.0))
        a.to_graph_out_channels([0])
        b.to_graph_out_channels([1])
        return a, b

    a, b = g.edit(build)
    tok = SchedulingToken()
    a.param("value").set(2.0, token=tok)
    b.param("value").set(20.0, token=tok)
    assert not tok.is_activated()
    # not queued yet: a render sees the old values
    out = proc.render(frames=64)
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[1], 10.0)
    tok.activate()
    assert tok.is_activated()
    out = proc.render(frames=128)
    # both changes land at the SAME frame (start of the next block)
    np.testing.assert_allclose(out[0], 2.0)
    np.testing.assert_allclose(out[1], 20.0)
    # double activation is an error
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        tok.activate()


def test_scheduling_token_preserves_timed_events():
    """Timed changes in a token batch keep their own frames; 'after' times
    resolve at activation (the batch shares one reference frame)."""
    from knaster_tpu import Constant, SchedulingToken

    g, proc = AudioProcessor.new(0, 1, OPTS)
    c = g.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
        gg.push(Constant(1.0))))
    proc.render(frames=64)  # advance the clock one block
    tok = SchedulingToken()
    c.param("value").set_at(3.0, _samples(64 + 32), token=tok)
    tok.activate()
    out = proc.render(frames=64)
    np.testing.assert_allclose(out[0, :32], 1.0)
    np.testing.assert_allclose(out[0, 32:], 3.0)
