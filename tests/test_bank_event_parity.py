"""Bank-vs-engine event-semantics parity (VERDICT round-2 weak #4/#5).

The reference applies EVERY param change at its exact frame through
``param_apply`` (wrappers_core/precise_timing.rs:65-114), regardless of
parameter type. The graph param engine reproduces that for nodes; these
tests pin the VoiceBank event channel to the same semantics: a per-voice
event stream through a 1-voice bank must render identically (≤1e-6) to the
same events through a single-voice graph node.
"""

import numpy as np
import pytest

from knaster_tpu import (
    AudioCtx,
    AudioProcessor,
    AudioProcessorOptions,
    Envelope,
    Seconds,
    Smoothing,
    UGen,
    VoiceBank,
    pfloat,
    pinteger,
)

SR = 48000
OPTS = AudioProcessorOptions(block_size=64)


def _samples(n):
    return Seconds.from_samples(n, SR)


class IntLevelVoice(UGen):
    """Emits its integer param as a float signal (per-sample int visibility)."""

    inputs = 0
    outputs = 1
    params = (pinteger("sel", 1),)

    def batch_key(self):
        return (type(self),)

    def process(self, ctx, state, inputs, params):
        return state, params["sel"][None, :].astype(ctx.dtype)


class LevelVoice(UGen):
    inputs = 0
    outputs = 1
    params = (pfloat("level", 1.0),)

    def batch_key(self):
        return (type(self),)

    def process(self, ctx, state, inputs, params):
        return state, params["level"][None, :].astype(ctx.dtype)


def _engine_render(voice_ugen, schedule, frames=256):
    g, proc = AudioProcessor.new(0, 1, OPTS)
    node = g.edit(lambda gg: gg.push(voice_ugen))
    node.to_graph_out()
    g.commit()
    schedule(lambda name: node.param(name))
    return proc.render(frames=frames)[0]


def _bank_render(voice_ugen, schedule, frames=256):
    g, proc = AudioProcessor.new(0, 1, OPTS)
    bank = g.edit(lambda gg: gg.push(VoiceBank(voice_ugen, 1)))
    bank.to_graph_out()
    g.commit()
    schedule(lambda name: _VP(bank, name))
    return proc.render(frames=frames)[0]


class _VP:
    """Adapter: voice-0 parameter with the node-Parameter scheduling shape."""

    def __init__(self, bank_handle, name):
        self.vp = bank_handle.voice_param(name)

    def set_at(self, value, at):
        self.vp.set_at(0, value, at)

    def smooth(self, time_seconds, at=None):
        if at is None:
            self.vp.smooth(0, time_seconds)
        else:
            from knaster_tpu.graph.scheduling import Time

            self.vp.smooth(0, time_seconds, Time.at(at))

    def smooth_at(self, time_seconds, at):
        self.smooth(time_seconds, at=at)


def test_mid_block_int_set_parity():
    """Int sets land at their exact frame in banks, like engine ints
    (param_engine._materialize_ints)."""

    def schedule(param):
        param("sel").set_at(3, _samples(37))
        param("sel").set_at(7, _samples(201))

    a = _engine_render(IntLevelVoice(), schedule)
    b = _bank_render(IntLevelVoice(), schedule)
    # sanity: the switch is genuinely mid-block
    assert a[36] == 1 and a[37] == 3 and a[200] == 3 and a[201] == 7
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_mid_block_smooth_start_parity():
    """A ramp started mid-block anchors at its event frame and starts from
    the old trajectory's value there (WrSmoothParams + precise timing)."""

    def schedule(param):
        p = param("level")
        p.smooth(0.001)  # 48-frame linear, audio rate
        p.set_at(49.0, _samples(37))
        # re-set mid-ramp AND mid-block, in the next block (the bank event
        # channel applies at most one set per (param, voice) per block —
        # host dedup, documented in node_events_from_lists)
        p.set_at(-20.0, _samples(77))

    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    t = np.arange(256.0)
    # ramp 1 anchors at 37: value 1 + (49-1)/48 * (t-37) until re-set at 77
    seg = 1.0 + (49.0 - 1.0) / 48.0 * (t - 37)
    assert abs(a[37] - seg[37]) < 1e-5 and abs(a[76] - seg[76]) < 1e-5
    # ramp 2 starts from ramp 1's value at frame 77
    v77 = seg[77]
    seg2 = v77 + (-20.0 - v77) / 48.0 * (t - 77)
    assert abs(a[100] - seg2[100]) < 1e-4
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_repeated_jump_to_segment_parity():
    """Two sets of the SAME jump_to_segment value must both re-jump, in the
    engine (pset mask) and in banks (the per-voice _set mask) alike —
    envelopes.rs:488-508 applies every param_apply."""
    g, proc = AudioProcessor.new(0, 1, OPTS)
    node = g.edit(lambda gg: gg.push(Envelope(0.0, [(0.02, 1.0), (0.02, 0.5), (0.02, 0.0)])))
    node.to_graph_out()
    g.commit()
    node.param("jump_to_segment").set_at(1, _samples(100))
    node.param("jump_to_segment").set_at(1, _samples(400))
    a = proc.render(frames=700)[0]

    g2, proc2 = AudioProcessor.new(0, 1, OPTS)
    bank = g2.edit(
        lambda gg: gg.push(
            VoiceBank(Envelope(0.0, [(0.02, 1.0), (0.02, 0.5), (0.02, 0.0)]), 1)
        )
    )
    bank.to_graph_out()
    g2.commit()
    bank.voice_param("jump_to_segment").set_at(0, 1, _samples(100))
    bank.voice_param("jump_to_segment").set_at(0, 1, _samples(400))
    b = proc2.render(frames=700)[0]

    # the second (same-value) jump restarts segment 1 at frame 400: the
    # envelope value must jump back toward segment 1's start
    assert abs(a[400] - a[399]) > 1e-4 or abs(a[405] - a[399]) > 1e-4
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_smooth_cfg_freezes_inflight_ramp_parity():
    """A smoothing-config event FREEZES an in-flight ramp at its frame
    (engine KIND_SMOOTH_CFG, param_engine frz_tail) — in banks too."""

    def schedule(param):
        p = param("level")
        p.smooth(0.002)                      # 96-frame ramps
        p.set_at(97.0, _samples(10))         # ramp 1->97, step 1/frame
        p.smooth_at(0.0, _samples(70))       # freeze mid-ramp, mid-block

    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    # ramp runs 1/frame from frame 10, freezes at frame 70 at value 61
    assert abs(a[69] - 60.0) < 1e-4 and abs(a[70] - 61.0) < 1e-4
    assert abs(a[200] - 61.0) < 1e-4  # held after the freeze
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_set_then_cfg_same_block_parity():
    """Frame order inside one block: a set BEFORE a cfg starts its ramp
    with the OLD duration, and the cfg then freezes that ramp at its own
    frame; the new duration applies to later sets."""

    def schedule(param):
        p = param("level")
        p.smooth(0.002)                       # 96-frame ramps
        p.set_at(49.0, _samples(70))          # block 1: ramp 1->49, step 0.5
        p.smooth_at(0.004, _samples(90))      # same block: freeze at 11
        p.set_at(107.0, _samples(200))        # block 3: NEW 192-frame ramp

    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    assert abs(a[89] - (1.0 + 0.5 * 19)) < 1e-4   # ramping before the cfg
    assert abs(a[90] - 11.0) < 1e-4               # frozen at cfg frame
    assert abs(a[150] - 11.0) < 1e-4              # held
    # the later set ramps with the NEW duration: (107-11)/192 = 0.5/frame
    assert abs(a[240] - (11.0 + 0.5 * 40)) < 1e-4
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_cfg_then_set_same_block_parity():
    """A cfg BEFORE a set (same block) freezes the in-flight ramp first;
    the set then anchors at the frozen value with the new duration."""

    def schedule(param):
        p = param("level")
        p.smooth(0.002)                       # 96-frame ramps
        p.set_at(97.0, _samples(10))          # ramp 1->97, step 1/frame
        p.smooth_at(0.001, _samples(70))      # freeze at 61; 48-frame ramps
        p.set_at(13.0, _samples(90))          # same block, after the cfg

    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    assert abs(a[70] - 61.0) < 1e-4           # frozen
    assert abs(a[89] - 61.0) < 1e-4           # held until the set
    # ramp 61 -> 13 over 48 frames from frame 90: step -1
    assert abs(a[100] - (61.0 - 10.0)) < 1e-4
    assert abs(a[200] - 13.0) < 1e-4
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_bank_burst_two_sets_one_block():
    """Same-block duplicate sets on one (param, voice): BOTH apply at
    their exact frames, in frame order regardless of list order (the
    round fold, node_events_from_lists burst_rounds)."""
    ctx = AudioCtx(SR, 64, np.float32)
    vb = VoiceBank(LevelVoice(), 1)
    # scheduled out of order: frame 50 first in the list, then frame 10
    ev = vb.node_events_from_lists([
        (50, 0, 0, 0, 5.0),
        (10, 0, 0, 0, 3.0),
    ])
    st = vb.init(ctx)
    _, out = vb.process(ctx, st, np.zeros((0, 64), np.float32), {},
                        events=ev)[:2]
    out = np.asarray(out)[0]
    assert abs(out[9] - 1.0) < 1e-6    # pre-block value
    assert abs(out[10] - 3.0) < 1e-6   # earlier event at its frame
    assert abs(out[49] - 3.0) < 1e-6
    assert abs(out[50] - 5.0) < 1e-6   # later event at its frame
    assert abs(out[63] - 5.0) < 1e-6


def test_burst_ramp_sets_parity():
    """Two smoothed sets in ONE block: the second ramp anchors at its
    frame starting from the FIRST ramp's value there (engine sequential
    fold ≡ bank round fold)."""

    def schedule(param):
        p = param("level")
        p.smooth(0.001)                      # 48-frame ramps
        p.set_at(49.0, _samples(10))         # ramp 1->49, step 1/frame
        p.set_at(0.0, _samples(34))          # mid-ramp: re-ramp from 25
    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    assert abs(a[33] - 24.0) < 1e-4          # first ramp in flight
    # second ramp: from value 25 at frame 34 toward 0 over 48 frames
    assert abs(a[34] - 25.0) < 1e-4
    assert abs(a[58] - (25.0 - 25.0 / 48.0 * 24)) < 1e-3
    assert abs(a[82] - 0.0) < 1e-4
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_burst_set_set_cfg_interleave_parity():
    """set@10, set@20, cfg@30 in ONE block: the cfg must freeze the
    SECOND set's ramp (true frame order), not pair with the first — the
    joint float-family round space (node_events_from_lists)."""

    def schedule(param):
        p = param("level")
        p.smooth(0.002)                      # 96-frame ramps
        p.set_at(97.0, _samples(10))         # ramp 1->97, step 1/frame
        p.set_at(0.0, _samples(20))          # re-ramp from 11, step -11/96
        p.smooth_at(0.0, _samples(30))       # freeze THAT ramp at frame 30
    a = _engine_render(LevelVoice(), schedule)
    b = _bank_render(LevelVoice(), schedule)
    assert abs(a[19] - 10.0) < 1e-4              # first ramp
    frozen = 11.0 - 11.0 / 96.0 * 10             # second ramp at frame 30
    assert abs(a[29] - (11.0 - 11.0 / 96.0 * 9)) < 1e-4
    assert abs(a[30] - frozen) < 1e-4            # frozen there
    assert abs(a[200] - frozen) < 1e-4           # held
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_burst_int_sets_parity():
    """Two int sets on one voice in ONE block: each lands at its exact
    frame (engine _materialize_ints ≡ bank round fold)."""

    def schedule(param):
        p = param("sel")
        p.set_at(3, _samples(10))
        p.set_at(7, _samples(40))
    a = _engine_render(IntLevelVoice(), schedule)
    b = _bank_render(IntLevelVoice(), schedule)
    assert (a[9], a[10], a[39], a[40]) == (1.0, 3.0, 3.0, 7.0)
    np.testing.assert_allclose(b, a, atol=1e-6)


def _pallas_vs_vmap(events_by_block, n_blocks=4, V=1024):
    """Render a PallasSineVoiceBank and the equivalent vmap VoiceBank over
    the same per-block event lists; assert ≤2e-5 parity per block."""
    pytest.importorskip("jax.numpy")
    from knaster_tpu import PallasSineVoiceBank, SineVoice

    ctx = AudioCtx(SR, 64, np.float32)
    rng = np.random.default_rng(7)
    defaults = {
        "freq": rng.uniform(100, 900, V).astype(np.float32),
        "amp": np.full(V, 0.001, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    pb = PallasSineVoiceBank(V, voice_defaults=defaults)
    vb = VoiceBank(SineVoice(), V, voice_defaults=defaults)
    spb, svb = pb.init(ctx), vb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    for blk in range(n_blocks):
        evs = events_by_block.get(blk)
        ev_p = pb.node_events_from_lists(evs) if evs else None
        ev_v = vb.node_events_from_lists(evs) if evs else None
        spb, op = pb.process(ctx, spb, no_in, {}, events=ev_p)[:2]
        svb, ov = vb.process(ctx, svb, no_in, {}, events=ev_v)[:2]
        np.testing.assert_allclose(
            np.asarray(op), np.asarray(ov), atol=2e-5,
            err_msg=f"block {blk}",
        )
    return pb, vb


def test_pallas_bank_same_block_set_burst():
    """Two sets on ONE (param, voice) in one block apply at their exact
    frames in the kernels too (per-round trajectory breakpoints, not
    latest-frame dedup) — vmap round-fold parity."""
    fi = 0  # freq is float param 0 of SineVoice
    _pallas_vs_vmap({
        # out of order in the list; frame order must win
        1: [(50, 3, fi, 0, 880.0), (10, 3, fi, 0, 220.0)],
    })


def test_pallas_bank_burst_set_cfg_set():
    """Three-round burst on one slot — set@10, cfg@22 (freeze), set@40
    (ramps with the new duration) — exact in-kernel (depth 3 default)."""
    fi, ai = 0, 1  # freq, amp float indices of SineVoice
    _pallas_vs_vmap({
        0: [(0, 5, fi, 4, 96.0)],          # configure 96-frame ramps
        1: [
            (10, 5, fi, 0, 700.0),         # ramp starts
            (22, 5, fi, 4, 0.0),           # freeze it mid-flight
            (40, 5, fi, 0, 300.0),         # jump (dur now 0)
            (30, 9, ai, 0, 0.002),         # unrelated slot, one event
        ],
    })


def test_pallas_bank_burst_deeper_than_depth():
    """A burst deeper than kernel_burst_depth keeps its LAST D events: the
    final trajectory (and all later blocks) match the vmap bank; only the
    dropped earliest window inside the burst block may differ."""
    pytest.importorskip("jax.numpy")
    from knaster_tpu import PallasSineVoiceBank, SineVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    defaults = {"freq": np.full(V, 440.0, np.float32),
                "amp": np.full(V, 0.001, np.float32),
                "pan": np.zeros(V, np.float32)}
    pb = PallasSineVoiceBank(V, voice_defaults=defaults)
    vb = VoiceBank(SineVoice(), V, voice_defaults=defaults)
    assert pb.kernel_burst_depth == 3
    fi = 0
    burst = [(5, 2, fi, 0, 200.0), (15, 2, fi, 0, 300.0),
             (25, 2, fi, 0, 400.0), (35, 2, fi, 0, 500.0),
             (45, 2, fi, 0, 600.0)]
    spb, svb = pb.init(ctx), vb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    with pytest.warns(UserWarning, match="kernel_burst_depth=3"):
        ev_p = pb.node_events_from_lists(burst)
    ev_v = vb.node_events_from_lists(burst)
    spb, _ = pb.process(ctx, spb, no_in, {}, events=ev_p)[:2]
    svb, _ = vb.process(ctx, svb, no_in, {}, events=ev_v)[:2]
    # post-burst state converges: later blocks are identical
    for blk in range(3):
        spb, op = pb.process(ctx, spb, no_in, {}, events=None)[:2]
        svb, ov = vb.process(ctx, svb, no_in, {}, events=None)[:2]
        np.testing.assert_allclose(np.asarray(op), np.asarray(ov),
                                   atol=2e-5, err_msg=f"block {blk}")


def test_pallas_bank_configurable_burst_depth():
    """kernel_burst_depth is constructor-configurable: at depth >= the
    burst's length the kernel is exact INSIDE the burst block too (the
    last-D truncation never kicks in)."""
    pytest.importorskip("jax.numpy")
    from knaster_tpu import PallasSineVoiceBank, SineVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    defaults = {"freq": np.full(V, 440.0, np.float32),
                "amp": np.full(V, 0.001, np.float32),
                "pan": np.zeros(V, np.float32)}
    pb = PallasSineVoiceBank(V, voice_defaults=defaults,
                             kernel_burst_depth=5)
    vb = VoiceBank(SineVoice(), V, voice_defaults=defaults)
    assert pb.kernel_burst_depth == 5
    assert pb.make_local(512).kernel_burst_depth == 5
    fi = 0
    burst = [(5, 2, fi, 0, 200.0), (15, 2, fi, 0, 300.0),
             (25, 2, fi, 0, 400.0), (35, 2, fi, 0, 500.0),
             (45, 2, fi, 0, 600.0)]
    spb, svb = pb.init(ctx), vb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")  # depth 5 covers the burst: no warning
        ev_p = pb.node_events_from_lists(burst)
    ev_v = vb.node_events_from_lists(burst)
    spb, op = pb.process(ctx, spb, no_in, {}, events=ev_p)[:2]
    svb, ov = vb.process(ctx, svb, no_in, {}, events=ev_v)[:2]
    # exact inside the burst block (the depth-3 default only converges
    # after it — test_pallas_bank_burst_deeper_than_depth)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ov), atol=2e-5)
    for blk in range(2):
        spb, op = pb.process(ctx, spb, no_in, {}, events=None)[:2]
        svb, ov = vb.process(ctx, svb, no_in, {}, events=None)[:2]
        np.testing.assert_allclose(np.asarray(op), np.asarray(ov),
                                   atol=2e-5, err_msg=f"block {blk}")


def test_pallas_bank_burst_truncation_warns_once():
    """Packing a burst deeper than kernel_burst_depth warns (once per
    bank) so the documented <=1-block transient is observable, not
    silent."""
    pytest.importorskip("jax.numpy")
    from knaster_tpu import PallasSineVoiceBank

    V = 1024
    pb = PallasSineVoiceBank(V)
    fi = 0
    burst = [(5, 2, fi, 0, 200.0), (15, 2, fi, 0, 300.0),
             (25, 2, fi, 0, 400.0), (35, 2, fi, 0, 500.0)]
    with pytest.warns(UserWarning, match="kernel_burst_depth=3"):
        pb.node_events_from_lists(burst)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")  # second deep burst: already warned
        pb.node_events_from_lists(burst)
    with pytest.raises(ValueError):
        PallasSineVoiceBank(V, kernel_burst_depth=0)


def test_pallas_bank_anchored_ramp():
    """The Pallas kernels materialize the frame-anchored ramp in-kernel
    (the _mat select): parity with the vmap bank for a mid-block smooth
    start."""
    jnp = pytest.importorskip("jax.numpy")
    from knaster_tpu import PallasSineVoiceBank, SineVoice

    V = 1024
    ctx = AudioCtx(SR, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(100, 900, V).astype(np.float32),
        "amp": np.full(V, 0.001, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    pb = PallasSineVoiceBank(V, voice_defaults=defaults)
    vb = VoiceBank(SineVoice(), V, voice_defaults=defaults)
    if pb.n_voices != V:
        pytest.skip("pallas bank shape constraint")
    fi = vb.float_index("freq")
    events = [
        (0, 3, fi, 4, 96.0),   # smooth 96 frames on voice 3
        (17, 3, fi, 0, 440.0),  # ramp starts at frame 17
        (41, 7, vb.float_index("amp"), 0, 0.002),  # plain set voice 7
    ]
    # block 1: freeze voice 3's in-flight ramp mid-block (kernel-side
    # KIND_SMOOTH_CFG parity), and a set-then-cfg pair on voice 9
    events_blk1 = [
        (22, 3, fi, 4, 0.0),     # cfg dur 0: freeze the ramp at frame 86
        (5, 9, fi, 0, 620.0),    # jump (no smoothing configured yet)
        (30, 9, fi, 4, 48.0),    # then configure 48-frame ramps
    ]
    spb = pb.init(ctx)
    svb = vb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    for blk in range(4):
        evs = {0: events, 1: events_blk1}.get(blk)
        ev_p = pb.node_events_from_lists(evs) if evs else None
        ev_v = vb.node_events_from_lists(evs) if evs else None
        spb, op = pb.process(ctx, spb, no_in, {}, events=ev_p)[:2]
        svb, ov = vb.process(ctx, svb, no_in, {}, events=ev_v)[:2]
        np.testing.assert_allclose(
            np.asarray(op), np.asarray(ov), atol=2e-5,
            err_msg=f"block {blk}",
        )
