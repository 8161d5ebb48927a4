"""Anchored ramps: a render's carried state is bit-identical however the
render is partitioned into ``render(frames=...)`` calls.

The param engine / VoiceBank carry float ramps as (anchor value at the set
event's frame, integer progress elapsed at block start, total duration), so
the per-block state advance is integer-only and every materialization is
``anchor + step * absolute_progress`` in one rounding — per-block,
superblock and scan-of-superblock program tiers must all land on the SAME
carried state (DESIGN_NOTES "Anchored ramps"). Outputs are compared to
1e-6: the expression is identical everywhere, but XLA may contract
mul+add to FMA differently per fusion context (the documented residual of
the superblock fuzz), and closed-form envelope reassociation is excluded
by construction (no envelopes in these graphs).
"""

import jax
import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Constant,
    Seconds,
    SinWt,
    Smoothing,
    UGen,
    pfloat,
)
from knaster_tpu.parallel import VoiceBank

SR = 48000
OPTS = AudioProcessorOptions(block_size=32, sample_rate=SR)

TOTAL = 1536
PARTITIONS = [
    [TOTAL],
    [32] * (TOTAL // 32),
    [7, 13, 100, 204, 512, 700],
    [480, 480, 576],
]


def _samples(n):
    return Seconds.from_samples(n, SR)


def _state_leaves(proc):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(proc.state))]


def _assert_state_equal(a, b, tag):
    assert len(a) == len(b)
    for i, (la, lb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(
            la, lb, err_msg=f"{tag}: state leaf {i} differs")


def _render_engine(partitions):
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        s = gg.push(SinWt(440.0))
        c = gg.push(Constant(0.5))
        (s * c).to_graph_out()
        return s.param("freq"), c.param("value")

    freq, amp = g.edit(build)
    # ramps and re-anchoring sets at assorted (mid-block) frames, queued
    # up-front at absolute times so every partitioning sees one schedule
    freq.smooth(Smoothing.linear(0.005))
    freq.set_at(880.0, _samples(37))
    freq.set_at(550.0, _samples(411))      # re-set mid-ramp
    amp.smooth(Smoothing.linear(0.01))
    amp.set_at(0.9, _samples(700))
    out = np.concatenate(
        [proc.render(frames=n) for n in partitions], axis=-1)
    return out, _state_leaves(proc)


def test_engine_ramp_state_partition_invariant():
    ref_out, ref_state = _render_engine(PARTITIONS[0])
    assert ref_out.shape == (1, TOTAL)
    for parts in PARTITIONS[1:]:
        out, state = _render_engine(parts)
        _assert_state_equal(ref_state, state, f"partitions={parts}")
        np.testing.assert_allclose(out, ref_out, atol=1e-6)


class _AmpVoice(UGen):
    """Minimal bank voice: the materialized amp ramp IS the output."""

    __test__ = False
    inputs = 0
    outputs = 1
    params = (pfloat("amp", 0.25),)

    def process(self, ctx, state, inputs, params):
        return state, params["amp"][None, :]


def _render_bank(partitions):
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        b = gg.push(VoiceBank(_AmpVoice(), n_voices=8))
        b.to_graph_out()
        return b

    bank = g.edit(build)
    amp = bank.voice_param("amp")
    amp.smooth(3, 0.005)
    amp.set_at(3, 0.9, _samples(37))
    amp.set_at(3, 0.1, _samples(411))      # re-set mid-ramp
    amp.smooth(5, 0.01)
    amp.set_at(5, 0.7, _samples(700))
    amp.set_at(1, 0.0, _samples(900))      # jump (no smoothing on voice 1)
    out = np.concatenate(
        [proc.render(frames=n) for n in partitions], axis=-1)
    return out, _state_leaves(proc)


def test_bank_ramp_state_partition_invariant():
    ref_out, ref_state = _render_bank(PARTITIONS[0])
    for parts in PARTITIONS[1:]:
        out, state = _render_bank(parts)
        _assert_state_equal(ref_state, state, f"partitions={parts}")
        np.testing.assert_allclose(out, ref_out, atol=1e-6)
