"""Eventful superblock program (compile.get_full_super_fn): a streaming
chunk with live events ANYWHERE inside it renders as ONE dispatch of the
full per-block program built at block n*B — event frames relative to the
chunk start, block-rate ramps stairing at native-block boundaries. Before
this program existed, mid-chunk events fragmented a chunk into
[superblock, eventful block, superblock] = 3+ RTT-priced dispatches, which
under-ran the realtime soak on event-heavy scenarios.

Every test pins the one-dispatch path against the strict per-block path
(`render(..., check_done_every=1)`), the same discipline as
test_superblock.py.
"""

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Constant,
    EnvAsr,
    Seconds,
    SinWt,
    Smoothing,
    SvfFilter,
)
from knaster_tpu.core.ugen import UGen
from knaster_tpu.graph.compile import get_full_super_fn
from knaster_tpu.primitives.params import pinteger

SR = 48000
B = 16
OPTS = AudioProcessorOptions(block_size=B, sample_rate=SR)


def _samples(n):
    return Seconds.from_samples(n, SR)


def _build_pair(build):
    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    r1 = g1.edit(build)
    r2 = g2.edit(build)
    return (g1, p1, r1), (g2, p2, r2)


def _arm(proc, n):
    """Pre-warm the eventful superblock at chunk length n (the streaming
    backend's role) and wrap it with a call counter so tests can assert the
    one-dispatch path actually engaged."""
    proc._ensure_compiled()
    fn = get_full_super_fn(proc.compiled, n)
    assert fn is not None, "graph unexpectedly superblock-ineligible"
    calls = []

    def spy(*a):
        calls.append(1)
        return fn(*a)

    proc.compiled.super_fns[("full", n)] = spy
    return calls


def test_mid_chunk_events_one_dispatch_parity():
    def build(gg):
        s = gg.push(SinWt(220.0))
        f = gg.push(SvfFilter(cutoff_freq=3000.0))
        s.to(f)
        f.to_graph_out()
        return s, f

    (g1, p1, (s1, f1)), (g2, p2, (s2, f2)) = _build_pair(build)
    for s, f in ((s1, f1), (s2, f2)):
        # events land mid-chunk: blocks 3, 7 and 11 of a 16-block chunk
        s.param("freq").set_at(432.0, _samples(3 * B + 5))
        f.param("cutoff_freq").smooth(Smoothing.linear(0.01))
        f.param("cutoff_freq").set_at(800.0, _samples(7 * B + 2))
        s.param("freq").set_at(330.0, _samples(11 * B + 9))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)
    b = p2.render(frames=16 * B, check_done_every=1)
    assert calls, "eventful superblock program did not engage"
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_block_rate_ramp_set_mid_chunk_stairs_at_native_blocks():
    def build(gg):
        c = gg.push(Constant(0.0))
        c.to_graph_out()
        return c

    (g1, p1, c1), (g2, p2, c2) = _build_pair(build)
    for c in (c1, c2):
        c.param("value").smooth(Smoothing.linear(64 / SR, rate="block"))
        # the set lands mid-chunk, mid-block — the stair must anchor there
        c.param("value").set_at(64.0, _samples(3 * B + 7))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)[0]
    b = p2.render(frames=16 * B, check_done_every=1)[0]
    assert calls
    np.testing.assert_allclose(a, b, atol=1e-5)
    # flat within native blocks (block-rate), stepping across them
    for j in range(0, 16 * B, B):
        assert np.all(a[j:j + B] == a[j])
    assert len(np.unique(np.round(a, 4))) >= 4


def test_triggers_and_envelope_mid_chunk():
    def build(gg):
        e = gg.push(EnvAsr(attack_time=0.001, release_time=0.002))
        e.to_graph_out()
        return e

    (g1, p1, e1), (g2, p2, e2) = _build_pair(build)
    for e in (e1, e2):
        e.param("t_restart").trig_at(_samples(5 * B + 3))
        e.param("t_release").trig_at(_samples(9 * B + 12))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)
    b = p2.render(frames=16 * B, check_done_every=1)
    assert calls
    np.testing.assert_allclose(a, b, atol=2e-5)


class _IntProbe(UGen):
    __test__ = False
    inputs = 0
    outputs = 1
    params = (pinteger("sel", 0),)

    def process(self, ctx, state, inputs, params):
        return state, params["sel"].astype(ctx.dtype)[None, :]


def test_int_set_exact_frame_mid_chunk():
    def build(gg):
        n = gg.push(_IntProbe())
        n.to_graph_out()
        return n.param("sel")

    (g1, p1, q1), (g2, p2, q2) = _build_pair(build)
    for q in (q1, q2):
        q.set_at(3, _samples(6 * B + 11))
        q.set_at(5, _samples(13 * B + 2))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)[0]
    b = p2.render(frames=16 * B, check_done_every=1)[0]
    assert calls
    np.testing.assert_array_equal(a, b)
    f0 = 6 * B + 11
    assert np.all(a[:f0] == 0.0) and a[f0] == 3.0


def test_capacity_overflow_falls_back_and_stays_exact():
    def build(gg):
        c = gg.push(Constant(0.0))
        c.to_graph_out()
        return c

    opts = AudioProcessorOptions(block_size=B, sample_rate=SR,
                                 event_capacity=4)
    g1, p1 = AudioProcessor.new(0, 1, opts)
    g2, p2 = AudioProcessor.new(0, 1, opts)
    q1 = g1.edit(build)
    q2 = g2.edit(build)
    # 8 sets across the chunk: each block's bucket fits the capacity of 4,
    # but the merged chunk tensor would not — the one-dispatch path must
    # decline and the fallback must stay exact
    for q in (q1, q2):
        for i in range(8):
            q.param("value").set_at(float(i + 1), _samples(2 * i * B + 3))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)[0]
    b = p2.render(frames=16 * B, check_done_every=1)[0]
    assert not calls, "overflowing chunk should not take the merged path"
    np.testing.assert_array_equal(a, b)
    assert a[-1] == 8.0


class _CappedProbe(UGen):
    """Block-invariant param probe that caps superblocks at 4 native
    blocks (the shape of a Pallas bank's kernel ceiling or a blockwise
    node's shortest delay)."""

    __test__ = False
    inputs = 0
    outputs = 1
    params = (pinteger("sel", 0),)
    superblock_cap = 4 * B

    def process(self, ctx, state, inputs, params):
        return state, params["sel"].astype(ctx.dtype)[None, :]


def test_capped_graph_rides_eventful_superblock_scan():
    from knaster_tpu.graph.compile import get_full_super_scan_fn

    def build(gg):
        n = gg.push(_CappedProbe())
        n.to_graph_out()
        return n.param("sel")

    (g1, p1, q1), (g2, p2, q2) = _build_pair(build)
    for q in (q1, q2):
        q.set_at(2, _samples(3 * B + 5))   # superblock 0, mid-block
        q.set_at(9, _samples(10 * B + 1))  # superblock 2
    p1._ensure_compiled()
    # the cap refuses the 16-block eventful superblock, the 4-block scan
    # does not
    assert get_full_super_fn(p1.compiled, 16) is None
    fn = get_full_super_scan_fn(p1.compiled, 4)
    assert fn is not None
    calls = []

    def spy(*a):
        calls.append(1)
        return fn(*a)

    p1.compiled.super_fns[("full_scan", 4)] = spy
    a = p1.render(frames=16 * B)[0]
    b = p2.render(frames=16 * B, check_done_every=1)[0]
    assert calls, "eventful superblock scan did not engage"
    np.testing.assert_array_equal(a, b)
    f0 = 3 * B + 5
    assert np.all(a[:f0] == 0.0) and a[f0] == 2.0 and a[-1] == 9.0


def test_feedback_graph_rides_whole_chunk_full_scan():
    from knaster_tpu.graph.processor import _get_full_scan_fn

    def build(gg):
        s = gg.push(SinWt(150.0))
        a = gg.push(SvfFilter(cutoff_freq=2000.0))
        b = gg.push(SvfFilter(cutoff_freq=900.0))
        s.to(a)
        a.to(b)
        b.to_feedback(a)  # feedback edge: superblock-ineligible
        b.to_graph_out()
        return a

    (g1, p1, c1), (g2, p2, c2) = _build_pair(build)
    for c in (c1, c2):
        c.param("cutoff_freq").set_at(1200.0, _samples(6 * B + 3))
        c.param("cutoff_freq").set_at(500.0, _samples(12 * B + 8))
    p1._ensure_compiled()
    assert get_full_super_fn(p1.compiled, 16) is None
    fn = _get_full_scan_fn(p1.compiled)
    calls = []

    def spy(*a):
        calls.append(1)
        return fn(*a)

    p1.compiled.full_scan_fn = spy
    p1.compiled.full_scan_warm.add(16)
    a = p1.render(frames=16 * B)
    b = p2.render(frames=16 * B, check_done_every=1)
    assert calls, "whole-chunk full scan did not engage"
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert np.abs(a).max() > 0.2


def test_voice_bank_events_mid_chunk_in_eventful_superblock():
    from knaster_tpu import VoiceBank
    from knaster_tpu.models.voices import SineVoice

    V = 8

    def build(gg):
        bank = gg.push(VoiceBank(
            SineVoice(), V,
            voice_defaults={
                "freq": np.linspace(200, 900, V).astype(np.float32),
                "amp": np.full(V, 0.1, np.float32),
            },
        ))
        bank.to_graph_out()
        return bank

    g1, p1 = AudioProcessor.new(0, 2, OPTS)
    g2, p2 = AudioProcessor.new(0, 2, OPTS)
    b1 = g1.edit(build)
    b2 = g2.edit(build)
    for b in (b1, b2):
        tr = b.voice_param("t_restart")
        for v in range(V):
            tr.trig_at(v, _samples(0))
        fp = b.voice_param("freq")
        fp.smooth(2, 0.005)
        fp.set_at(2, 440.0, _samples(4 * B + 7))   # mid-chunk ramp
        fp.set_at(5, 330.0, _samples(9 * B + 1))
        tr.trig_at(6, _samples(11 * B + 13))        # mid-chunk note-on
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)
    b = p2.render(frames=16 * B, check_done_every=1)
    assert calls, "eventful superblock program did not engage"
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_smooth_cfg_event_mid_chunk_freezes_ramp():
    def build(gg):
        c = gg.push(Constant(0.0))
        c.to_graph_out()
        return c

    (g1, p1, c1), (g2, p2, c2) = _build_pair(build)
    for c in (c1, c2):
        c.param("value").smooth(Smoothing.linear(200 / SR))
        c.param("value").set_at(100.0, _samples(B + 4))
        # cfg change mid-ramp, mid-chunk: freezes the in-flight ramp
        c.param("value").smooth_at(Smoothing.none(), _samples(5 * B + 9))
    calls = _arm(p1, 16)
    a = p1.render(frames=16 * B)[0]
    b = p2.render(frames=16 * B, check_done_every=1)[0]
    assert calls
    np.testing.assert_allclose(a, b, atol=1e-5)
