"""Superblock fast path: event-free runs render as ONE k*B-block program
(compile.get_super_fn) instead of a scan over blocks — the interactive-path
block batching of VERDICT r1 #5. These tests pin the semantics: superblocked
output must equal the strict per-block path (which `render(...,
check_done_every=1)` forces) for ramps, scheduled events, envelopes and
filters; graphs with feedback edges or block-dependent nodes must fall back.
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
from knaster_tpu.graph.compile import get_super_fn, superblock_eligible

SR = 48000
OPTS = AudioProcessorOptions(block_size=16, sample_rate=SR)


def _samples(n):
    return Seconds.from_samples(n, SR)


def _build_pair(build):
    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    r1 = g1.edit(build)
    r2 = g2.edit(build)
    return (g1, p1, r1), (g2, p2, r2)


def test_superblock_matches_per_block_with_ramps_and_events():
    def build(gg):
        sines = [gg.push(SinWt(200.0 + 7 * i)) for i in range(8)]
        f = gg.push(SvfFilter(cutoff_freq=3000.0))
        for s in sines:
            s.to(f)
        f.to_graph_out()
        return sines[0], f

    (g1, p1, (s1, f1)), (g2, p2, (s2, f2)) = _build_pair(build)
    for s, f, proc in ((s1, f1, p1), (s2, f2, p2)):
        # audio-rate smoothing ramp that spans many blocks, plus a
        # sample-accurate set landing mid-run
        f.param("cutoff_freq").smooth(Smoothing.linear(0.02))
        f.param("cutoff_freq").set(800.0)
        s.param("freq").set_at(432.0, _samples(1000))
    a = p1.render(frames=4096)  # superblocked event-free runs
    b = p2.render(frames=4096, check_done_every=1)  # strict per-block
    assert p1.compiled.super_fns, "superblock path did not engage"
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_superblock_block_rate_smoothing_stairs_at_native_blocks():
    def build(gg):
        c = gg.push(Constant(0.0))
        c.to_graph_out()
        return c

    (g1, p1, c1), (g2, p2, c2) = _build_pair(build)
    for c in (c1, c2):
        c.param("value").smooth(Smoothing.linear(64 / SR, rate="block"))
        c.param("value").set(64.0)
    a = p1.render(frames=512)[0]
    b = p2.render(frames=512, check_done_every=1)[0]
    np.testing.assert_allclose(a, b, atol=1e-5)
    # the stair steps at NATIVE 16-sample blocks even inside a superblock
    steps = np.unique(np.round(a, 4))
    assert len(steps) >= 4  # a real staircase, not one big jump
    for j in range(0, 512, 16):
        assert np.all(a[j:j + 16] == a[j])  # flat within native blocks


def test_feedback_graph_falls_back_and_matches():
    def build(gg):
        src = gg.push(Constant(0.25))
        f = gg.push(SvfFilter(cutoff_freq=20000.0))
        src.to(f)
        f.to_feedback(f)  # one-block-delay loop: a semantic boundary
        f.to_graph_out()
        return f

    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    g1.edit(build), g2.edit(build)
    p1._ensure_compiled()
    assert not superblock_eligible(p1.compiled)
    assert get_super_fn(p1.compiled, 16) is None
    a = p1.render(frames=512)
    b = p2.render(frames=512, check_done_every=1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_blockwise_nodes_are_capped():
    """Blockwise nodes participate in superblocks only up to their
    declared superblock_cap (the shortest Galactic delay line here);
    multiples beyond it are refused (test_superblock_cap.py covers the
    in-cap parity)."""
    from knaster_tpu.airwindows import Galactic

    g, p = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))

    def build(gg):
        c = gg.push(Constant(0.1))
        rev = gg.push(Galactic())
        c.out([0, 0]).to(rev)  # mono -> both reverb inputs
        rev.to_graph_out()
        return rev

    g.edit(build)
    p._ensure_compiled()
    assert superblock_eligible(p.compiled)
    assert p.compiled.superblock_max == int(680 * 48000 / 44100)
    assert get_super_fn(p.compiled, 16) is None  # 1024 > cap
    assert get_super_fn(p.compiled, 8) is not None


def test_envelope_done_inside_superblock():
    """Done flags surface from superblocked runs (the done vector is the
    whole run's OR, applied at the run boundary)."""
    from knaster_tpu.graph.graph import Done

    def build(gg):
        env = gg.push(SinWt(440.0))
        e = gg.push_with_done_action(EnvAsr(0.001, 0.002), Done.FREE_SELF)
        (env * e).to_graph_out()
        return e

    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    e1, e2 = g1.edit(build), g2.edit(build)
    for e, proc in ((e1, p1), (e2, p2)):
        e.param("t_restart").trig()
        e.param("t_release").trig_at(_samples(300))
    a = p1.render(frames=2048)
    b = p2.render(frames=2048, check_done_every=1)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_evchunk_program_matches_per_block():
    """The one-dispatch eventful-chunk program (block-0 events + superblock
    rest) equals the strict per-block path — the live-streaming hot shape."""
    from knaster_tpu.graph.compile import get_evchunk_fn

    def build(gg):
        sines = [gg.push(SinWt(150.0 + 10 * i)) for i in range(8)]
        for s in sines:
            (s * 0.05).to_graph_out()
        return sines

    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    s1, s2 = g1.edit(build), g2.edit(build)
    p1._ensure_compiled()
    # warm the fused program so render() takes the one-dispatch path
    n = 32
    assert get_evchunk_fn(p1.compiled, n) is not None
    for s, proc in ((s1, p1), (s2, p2)):
        for h in s:
            h.param("freq").set(432.0)  # asap -> block 0 of the next chunk
    a = p1.render(frames=n * 16)
    b = p2.render(frames=n * 16, check_done_every=1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)
    assert p1.compiled.evchunk_fns, "evchunk program was not built"


def _bank_build(gg):
    from knaster_tpu import PallasSineVoiceBank

    bank = gg.push(PallasSineVoiceBank(
        128, tile_rows=1, event_capacity=256,
        voice_defaults={"freq": np.linspace(100, 900, 128).astype(np.float32),
                        "amp": np.full(128, 0.01, np.float32)}))
    bank.to_graph_out()
    return bank


def test_evchunk_scan_tail_beyond_bank_cap():
    """Graphs whose superblock length is capped (the Pallas banks' kernel
    MAX_BLOCK ceiling) still get the one-dispatch eventful-chunk program at
    chunk sizes beyond the cap: its tail is an in-program scan of the fast
    block program."""
    from knaster_tpu.graph.compile import get_evchunk_fn, superblock_eligible
    from knaster_tpu.parallel.pallas_bank import MAX_BLOCK

    opts = AudioProcessorOptions(block_size=64)
    g1, p1 = AudioProcessor.new(0, 2, opts)
    g2, p2 = AudioProcessor.new(0, 2, opts)
    b1, b2 = g1.edit(_bank_build), g2.edit(_bank_build)
    p1._ensure_compiled()
    # bank graphs are superblock-eligible up to the kernel block cap
    assert superblock_eligible(p1.compiled)
    assert p1.compiled.superblock_max == MAX_BLOCK
    n = 32  # (n-1)*64 = 1984 > MAX_BLOCK: the evchunk tail must scan
    assert get_super_fn(p1.compiled, n) is None
    assert get_evchunk_fn(p1.compiled, n) is not None  # warm the fused path
    for b in (b1, b2):
        for v in range(0, 128, 2):
            b.voice_param("t_restart").trig(v)
    a = p1.render(frames=n * 64)
    b = p2.render(frames=n * 64, check_done_every=1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert p1.compiled.evchunk_fns


def test_bank_superblock_within_cap_matches_per_block():
    """Within the kernel cap a Pallas-bank graph renders event-free runs as
    one multi-block kernel launch; output matches the strict per-block path
    (sample-accurate triggers land in block 0, then 8-block superblocks)."""
    opts = AudioProcessorOptions(block_size=64)
    g1, p1 = AudioProcessor.new(0, 2, opts)
    g2, p2 = AudioProcessor.new(0, 2, opts)
    b1, b2 = g1.edit(_bank_build), g2.edit(_bank_build)
    p1._ensure_compiled()
    assert get_super_fn(p1.compiled, 8) is not None
    for b in (b1, b2):
        for v in range(0, 128, 3):
            b.voice_param("t_restart").trig(v)
        b.voice_param("t_release").trig_at(5, _samples(700))
    a = p1.render(frames=8 * 64 * 3)
    b = p2.render(frames=8 * 64 * 3, check_done_every=1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert any(
        isinstance(k, int) and k > 1 for k in p1.compiled.super_fns
    ), "bank superblock program did not engage"
