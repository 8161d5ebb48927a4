"""Graph integration tests, exact sample values.

Port of the reference's test strategy and expected values:
knaster_graph/src/tests/graph_tests.rs (empty-graph zeroing, input routing,
nodes+params math, multichannel + live re-edit, feedback one-block-delay
semantics, disconnect).
"""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    CircularConnection,
    Constant,
    Graph,
    MathUGen,
)
from tests.utils import TestInPlusParamUGen, TestNumUGen

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


def test_empty_graph_zero_output():
    g, proc = AudioProcessor.new(0, 1, OPTS)
    proc.run_without_inputs()
    out = proc.output_block()
    assert out.shape == (1, 16)
    assert np.all(out == 0.0)


def test_empty_graph_zero_output_many_channels():
    g, proc = AudioProcessor.new(0, 4, OPTS)
    proc.run_without_inputs()
    out = proc.output_block()
    assert out.shape == (4, 16)
    assert np.all(out == 0.0)


def test_graph_inputs_to_outputs():
    g, proc = AudioProcessor.new(3, 3, OPTS)

    def build(g):
        # connect input 1 to out 0, input 2 to out 1
        g.from_inputs(1).to_graph_out_channels(0)
        g.from_inputs(2).to_graph_out_channels(1)

    g.edit(build)
    inputs = np.ones((3, 16), dtype=np.float32)
    proc.run(inputs)
    out = proc.output_block()
    assert out[0, 0] == 1.0
    assert out[1, 0] == 1.0
    assert out[2, 0] == 0.0


def test_graph_inputs_to_nodes_to_outputs():
    g, proc = AudioProcessor.new(3, 3, OPTS)

    def build(g):
        g.from_inputs([0, 0]).to_graph_out_channels([1, 2])
        g0 = g.push(TestInPlusParamUGen())
        g1 = g.push(TestInPlusParamUGen())
        g0.param("number").set(0.75)
        g1.param("number").set(0.5)
        g0.to_graph_out_channels(2)
        g.from_inputs(2).to(g1).to_graph_out_channels(0)

    g.edit(build)
    inputs = np.full((3, 16), 2.0, dtype=np.float32)
    proc.run(inputs)
    out = proc.output_block()
    assert out[0, 0] == 2.5  # input 2 through g1 (+0.5)
    assert out[1, 0] == 2.0  # input 0 direct
    assert out[2, 0] == 2.75  # additive: input 0 + g0 (0 + 0.75)


def test_multichannel_nodes_and_live_reedit():
    g, proc = AudioProcessor.new(3, 2, OPTS)

    def build(g):
        v0_0 = g.push(TestNumUGen(0.125))
        v0_1 = g.push(TestNumUGen(1.0))
        v1_0 = g.push(TestNumUGen(0.5))
        v1_1 = g.push(TestNumUGen(4.125))
        m = g.push(MathUGen("add", 2))
        (v0_0 | v0_1 | v1_0 | v1_1).to(m).to_graph_out()
        return v0_0.id(), v0_1.id(), v1_0.id(), v1_1.id(), m.id()

    v0_0, v0_1, v1_0, v1_1, m = g.edit(build)
    proc.run(np.ones((3, 16), dtype=np.float32))
    out = proc.output_block()
    assert out[0, 0] == 0.625
    assert out[1, 0] == 5.125

    def reedit(g):
        v0_0h = g.handle(v0_0)
        v1_0h = g.handle(v1_0)
        mh = g.handle(m)
        m2 = g.push(MathUGen("mul", 1))
        m3 = g.push(MathUGen("mul", 1))
        (mh.out([0]) | v1_0h).to(m2)
        (mh.out([1]) | v0_0h).to(m3)
        (m2 | m3).to_graph_out_replace()

    g.edit(reedit)
    proc.run(np.ones((3, 16), dtype=np.float32))
    out = proc.output_block()
    assert out[0, 0] == pytest.approx(0.625 * 0.5)
    assert out[1, 0] == pytest.approx(5.125 * 0.125)


def test_feedback_nodes():
    """graph_tests.rs:186-254 feedback_nodes: one-block delay semantics."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n0 = g.push(TestInPlusParamUGen())
        n0.param(0).set(1.25)
        n1 = g.push(TestInPlusParamUGen())
        n1.param(0).set(0.125)
        n0.to(n1).to_feedback(n0)
        n1.to_graph_out()

    g.edit(build)
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 1.375
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 1.375 * 2.0
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 1.375 * 3.0


def test_feedback_nodes2():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n2 = g.push(TestInPlusParamUGen())
        n2.param(0).set(1.25)
        n3 = g.push(TestInPlusParamUGen())
        n3.param(0).set(0.125)
        n2.to_feedback(n3).to_graph_out()

    g.edit(build)
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.125
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.125 + 1.25
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.125 + 1.25


def test_disconnect():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n1 = g.push(TestInPlusParamUGen())
        n1.param(0).set(0.5)
        n2 = g.push(TestInPlusParamUGen())
        n2.param(0).set(1.25)
        n3 = g.push(TestInPlusParamUGen())
        n3.param(0).set(0.125)
        n1.to(n2)
        n2.to(n3)
        n3.to_graph_out()
        return n1, n3

    n1, n3 = g.edit(build)
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.5 + 1.25 + 0.125

    g.disconnect_output_from_source(n1, 0)
    g.commit()
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 1.25 + 0.125

    g.disconnect_input_to_sink(0, n3)
    g.commit()
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == 0.125


def test_cycle_detection():
    g = Graph(0, 1, 48000, 16)
    a = g.push(TestInPlusParamUGen())
    b = g.push(TestInPlusParamUGen())
    a.to(b)
    with pytest.raises(CircularConnection):
        b.to(a)
    # but feedback is allowed
    b.to_feedback(a)


def test_operator_sugar_constant_mul():
    """The README example's `sine * amp` desugars into Constant/Math nodes."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        n = g.push(TestNumUGen(2.5))
        sig = n * 0.5 + 1.0
        sig.to_graph_out()

    g.edit(build)
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == pytest.approx(2.25)


def test_operator_two_nodes():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        a = g.push(TestNumUGen(3.0))
        b = g.push(TestNumUGen(2.0))
        ((a * b) - 1.0).to_graph_out()

    g.edit(build)
    proc.run_without_inputs()
    assert proc.output_block()[0, 0] == pytest.approx(5.0)


def test_state_survives_reedit():
    """Node state must survive a recompile (TakeFromTask parity)."""
    from knaster_tpu import SinWt

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        s = g.push(SinWt(440.0))
        s.to_graph_out()
        return s.id()

    sid = g.edit(build)
    proc.run_without_inputs()
    b1 = proc.output_block().copy()
    # structural edit: add an unrelated node
    def edit2(g):
        extra = g.push(TestNumUGen(0.0))
        extra.to_graph_out()

    g.edit(edit2)
    proc.run_without_inputs()
    b2 = proc.output_block()
    # the sine must continue from its carried phase, not restart:
    # block 2 should differ from block 1 (phase advanced)
    assert not np.allclose(b1, b2)
    # and the first sample of block 2 should continue the sine trajectory
    import math

    expected_phase_cycles = 16 * 440.0 / 48000.0
    assert b2[0, 0] == pytest.approx(
        math.sin(2 * math.pi * expected_phase_cycles), abs=2e-3
    )


def test_free_node_when_done_protocol():
    """Port of the reference's free_node_when_done (graph.rs:2484-2513):
    done flag -> node freed at the next commit boundary -> silence after."""
    from knaster_tpu import Done, Seconds
    from knaster_tpu.ugens.envelopes import EnvAsr

    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(g):
        e = g.push_with_done_action(EnvAsr(0.0, 0.0), Done.FREE_SELF)
        e.to_graph_out()
        return e

    e = g.edit(build)
    assert len(g.nodes) == 1
    e.param("t_restart").trig()
    e.param("t_release").trig_at(Seconds.from_samples(2, 48000))
    for _ in range(10):
        proc.run_without_inputs()
    # the done action freed the node (host applies it between blocks)
    assert len(g.nodes) == 0
    proc.run_without_inputs()
    assert np.all(proc.output_block() == 0)


def test_free_parent_zeroes_tail_from_done_frame():
    """A node freeing the TOP-LEVEL graph zeroes the graph output from its
    done frame within the same block (graph_gen.rs:227-238)."""
    from knaster_tpu import Done, Seconds
    from knaster_tpu.ugens.envelopes import EnvAsr

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        c = g.push(Constant(1.0))
        c.to_graph_out()
        e = g.push_with_done_action(EnvAsr(0.0, 0.0), Done.FREE_PARENT)
        return e

    e = g.edit(build)
    e.param("t_restart").trig()
    e.param("t_release").trig_at(Seconds.from_samples(5, 48000))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    # constant plays until the env's done frame (5), silence from there on
    np.testing.assert_allclose(out[:5], 1.0, atol=1e-7)
    np.testing.assert_allclose(out[5:], 0.0, atol=1e-7)
    # the whole graph is freed: subsequent blocks are silent
    proc.run_without_inputs()
    assert np.all(proc.output_block() == 0)
    assert proc.freed and g.freed
