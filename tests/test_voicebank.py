"""VoiceBank + sharding tests: batched voices, per-voice events, mesh psum."""

import jax
import numpy as np
import pytest

from knaster_tpu import (
    AudioCtx,
    AudioProcessor,
    AudioProcessorOptions,
    FMVoice,
    Seconds,
    ShardedVoiceBank,
    SineVoice,
    SubtractiveVoice,
    VoiceBank,
)

SR = 48000
OPTS = AudioProcessorOptions(block_size=64, sample_rate=SR)


def _samples(n):
    return Seconds.from_samples(n, SR)


def test_voicebank_equals_sum_of_single_voices():
    """A bank of V voices must equal V separate voice nodes mixed."""
    freqs = np.array([220.0, 330.0, 550.0], np.float32)

    # bank version
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(SineVoice(amp=0.1), 3, voice_defaults={"freq": freqs}))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    vp = bank.voice_param("t_restart")
    for v in range(3):
        vp.trig(v)
    a = proc.render(frames=256)

    # separate-nodes version
    g2, proc2 = AudioProcessor.new(0, 2, OPTS)

    def build2(gg):
        ps = []
        for f in freqs:
            h = gg.push(SineVoice(freq=float(f), amp=0.1))
            h.to_graph_out()
            ps.append(h.param("t_restart"))
        return ps

    ps = g2.edit(build2)
    for p in ps:
        p.trig()
    b = proc2.render(frames=256)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_voicebank_per_voice_events():
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(SineVoice(amp=0.1), 4))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    freq = bank.voice_param("freq")
    trig = bank.voice_param("t_restart")
    freq.set(0, 1000.0)
    freq.set(2, 2000.0)
    trig.trig(0)
    # voice 2 triggers at sample 100 (sample-accurate)
    trig.trig_at(2, _samples(100))
    a = proc.render(frames=256)
    # before sample 100 only voice 0 sounds; envelope attack is 0.01s so
    # amplitude is tiny but non-zero after a few samples
    assert np.abs(a[:, 5:90]).max() > 0
    # voice 2 contributes only from sample 100 (+1 for env attack from 0)
    g3, p3 = AudioProcessor.new(0, 2, OPTS)

    def build3(gg):
        bank = gg.push(VoiceBank(SineVoice(amp=0.1), 4))
        bank.to_graph_out()
        return bank

    b3 = g3.edit(build3)
    b3.voice_param("freq").set(0, 1000.0)
    b3.voice_param("t_restart").trig(0)
    only0 = p3.render(frames=256)
    np.testing.assert_allclose(a[:, :100], only0[:, :100], atol=1e-7)
    assert not np.allclose(a[:, 105:], only0[:, 105:])


def test_voicebank_active_masking():
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(SineVoice(amp=0.1), 2))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    bank.voice_param("t_restart").trig(0)
    bank.voice_param("t_restart").trig(1)
    bank.set_voice_active(1, False)
    a = proc.render(frames=128)
    # with voice 1 muted, equals a single-voice render
    g2, p2 = AudioProcessor.new(0, 2, OPTS)
    b2 = g2.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
        gg.push(VoiceBank(SineVoice(amp=0.1), 2))))
    b2.voice_param("t_restart").trig(0)
    b = p2.render(frames=128)
    np.testing.assert_allclose(a, b, atol=1e-7)


@pytest.mark.parametrize("voice_cls", [FMVoice, SubtractiveVoice])
def test_voice_models_render(voice_cls):
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(voice_cls(), 8))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    for v in range(8):
        bank.voice_param("t_restart").trig(v)
    a = proc.render(frames=2048)
    assert np.isfinite(a).all()
    assert np.abs(a).max() > 1e-4


def test_sharded_voicebank_matches_single_device():
    """shard_map over the 8 virtual CPU devices == unsharded bank."""
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    freqs = 220.0 * (1 + np.arange(16, dtype=np.float32) / 16.0)
    bank = VoiceBank(SineVoice(amp=0.05), 16, voice_defaults={"freq": freqs})
    sb = ShardedVoiceBank(bank, mesh, ctx)

    # trigger all voices at frame 0, voice 13 at frame 10
    events = [(0, v, 0, 1, 0.0) for v in range(13)] + [(10, 13, 0, 1, 0.0)]
    ev = sb.events_from_lists(events)
    state = sb.init_state()
    state, out1 = sb.step(state, ev)
    state, out2 = sb.step(state, sb.empty_events())
    sharded = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)

    # unsharded reference
    ubank_state = bank.init(ctx)
    uev = bank.node_events_from_lists(events)
    st, o1, _ = bank.process(ctx, ubank_state, np.zeros((0, 64), np.float32), {}, events=uev)
    st, o2, _ = bank.process(ctx, st, np.zeros((0, 64), np.float32), {},
                             events=bank.node_events_from_lists([]))
    unsharded = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)
    assert np.abs(sharded).max() > 0

    # render(): the on-device lax.scan bounce equals the step-by-step path
    ev_stack = jax.tree_util.tree_map(
        lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
        sb.events_from_lists(events), sb.empty_events(),
    )
    scanned = np.asarray(sb.render(2, events_per_block=ev_stack))
    np.testing.assert_allclose(scanned, unsharded, atol=1e-5)


def test_pallas_bank_matches_vmap_bank():
    """The fused Pallas kernel bank == the composable vmap bank
    (runs in pallas interpreter mode on CPU)."""
    from knaster_tpu import PallasSineVoiceBank
    import jax.numpy as jnp

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    rng = np.random.default_rng(3)
    defaults = {
        "freq": rng.uniform(100, 4000, V).astype(np.float32),
        "amp": np.full(V, 0.01, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    pb = PallasSineVoiceBank(V, voice_defaults=defaults, tile_rows=8,
                             event_capacity=1024)
    vb = VoiceBank(SineVoice(), V, voice_defaults=defaults, event_capacity=1024)
    events = [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 5)]
    events += [(17, 5, pb.trig_index("t_release"), 1, 0.0)]
    events += [(0, 7, pb.float_index("freq"), 0, 1234.0)]
    ev_p = pb.node_events_from_lists(events)
    ev_v = vb.node_events_from_lists(events)
    no_in = np.zeros((0, 64), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(4):
        e_p = ev_p if i == 0 else pb.empty_node_events()
        e_v = ev_v if i == 0 else vb.empty_node_events()
        sp, op = pb.process(ctx, sp, no_in, {}, events=e_p)
        sv, ov, _ = vb.process(ctx, sv, no_in, {}, events=e_v)
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    a = np.concatenate(outs_p, 1)
    b = np.concatenate(outs_v, 1)
    assert np.abs(b).max() > 1e-4  # something actually played
    # the kernel carries the same per-sample u32 phase and computes the same
    # table-quantized jnp.sin as SinWt — only the mix reduction order differs
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fm_cascade_model():
    """FMCascade scan-over-stages == the cascade behavior sanity checks."""
    from knaster_tpu import FMCascade

    g, proc = AudioProcessor.new(0, 1, OPTS)
    g.edit(lambda gg: gg.push(FMCascade(16, freq=100.0)).to_graph_out())
    a = proc.render(frames=4800)[0]
    assert np.isfinite(a).all()
    assert 0.05 < np.abs(a).max() <= 0.1  # amp=0.1 sine-ish output
    # rich FM spectrum: energy spread across many bins
    sp = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    assert (sp > sp.max() * 0.05).sum() > 10


def test_sharded_pallas_bank_matches_unsharded():
    """PallasSineVoiceBank shards over the mesh like any bank."""
    from knaster_tpu import PallasSineVoiceBank

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    V = 8 * 1024  # 1024 per device (tile constraint: multiple of 128)
    rng = np.random.default_rng(5)
    defaults = {
        "freq": rng.uniform(100, 2000, V).astype(np.float32),
        "amp": np.full(V, 0.01, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    bank = PallasSineVoiceBank(V, voice_defaults=defaults, tile_rows=8,
                               event_capacity=512)
    sb = ShardedVoiceBank(bank, mesh, ctx)
    events = [(0, v, bank.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 17)]
    st = sb.init_state()
    st, o1 = sb.step(st, sb.events_from_lists(events))
    st, o2 = sb.step(st, sb.empty_events())
    sharded = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)

    ust = bank.init(ctx)
    ust, u1 = bank.process(ctx, ust, np.zeros((0, 64), np.float32), {},
                           events=bank.node_events_from_lists(events))
    ust, u2 = bank.process(ctx, ust, np.zeros((0, 64), np.float32), {},
                           events=bank.empty_node_events())
    unsharded = np.concatenate([np.asarray(u1), np.asarray(u2)], axis=1)
    assert np.abs(unsharded).max() > 1e-5
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


def test_voicebank_per_voice_smoothing():
    """Per-voice float smoothing ramps linearly and lands exactly."""
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(SineVoice(amp=1.0), 2))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    amp = bank.voice_param("amp")
    # voice 0 sustains so the amp is directly observable
    bank.voice_param("t_restart").trig(0)
    proc.render(frames=6400)  # attack done (0.01s = 480 frames)
    amp.smooth(0, 128 / 48000)  # 128-frame ramp
    amp.set(0, 3.0)
    a = proc.render(frames=256)
    # observable via the left channel gain: voice0 amp ramps 1 -> 3
    # (use the sine output envelope: compare blockwise peak growth)
    g2, p2 = AudioProcessor.new(0, 2, OPTS)
    b2 = g2.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
        gg.push(VoiceBank(SineVoice(amp=1.0), 2))))
    b2.voice_param("t_restart").trig(0)
    p2.render(frames=6400)
    b2.voice_param("amp").set(0, 3.0)  # no smoothing: jump
    b = p2.render(frames=256)
    # smoothed version differs from the jump during the ramp...
    assert not np.allclose(a[:, :128], b[:, :128])
    # ...and matches after it completes (same phase, same final amp)
    np.testing.assert_allclose(a[:, 192:], b[:, 192:], atol=1e-5)


def test_fm_cascade_pallas_matches_scan():
    from knaster_tpu import FMCascade

    def render(use_pallas):
        g, proc = AudioProcessor.new(0, 1, OPTS)
        g.edit(lambda gg: gg.push(
            FMCascade(16, use_pallas=use_pallas)).to_graph_out())
        return proc.render(frames=640)

    np.testing.assert_allclose(render(True), render(False), atol=1e-6)


def test_pallas_fm_bank_matches_vmap():
    """PallasFMVoiceBank == vmap VoiceBank(FMVoice), incl. deep-FM voices
    whose instantaneous frequency goes negative (Rust `as u32` saturation)."""
    from knaster_tpu import PallasFMVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    rng = np.random.default_rng(0)
    d = {"freq": rng.uniform(100, 1000, V).astype(np.float32),
         "ratio": rng.choice([1.0, 2.0], V).astype(np.float32),
         "index": rng.uniform(0.5, 2.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    pb = PallasFMVoiceBank(V, voice_defaults=d, tile_rows=8, event_capacity=2048)
    vb = VoiceBank(FMVoice(), V, voice_defaults=d, event_capacity=2048)
    events = [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 2)]
    no_in = np.zeros((0, 64), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(4):
        ep = pb.node_events_from_lists(events) if i == 0 else pb.empty_node_events()
        ev = vb.node_events_from_lists(events) if i == 0 else vb.empty_node_events()
        sp, op = pb.process(ctx, sp, no_in, {}, events=ep)
        sv, ov, _ = vb.process(ctx, sv, no_in, {}, events=ev)
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    a = np.concatenate(outs_p, 1)
    b = np.concatenate(outs_v, 1)
    assert np.abs(b).max() > 1e-3
    # modulator and carrier both carry the same per-sample u32 phases and
    # table-quantized jnp.sin as the vmap SinWt pair — parity to rounding
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_subtractive_bank_matches_vmap():
    from knaster_tpu import PallasSubtractiveVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    rng = np.random.default_rng(0)
    d = {"freq": rng.uniform(50, 400, V).astype(np.float32),
         "cutoff": rng.uniform(300, 5000, V).astype(np.float32),
         "q": rng.uniform(0.6, 3.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    pb = PallasSubtractiveVoiceBank(V, voice_defaults=d, tile_rows=8,
                                    event_capacity=2048)
    vb = VoiceBank(SubtractiveVoice(), V, voice_defaults=d, event_capacity=2048)
    events = [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 2)]
    events += [(30, 4, pb.trig_index("t_release"), 1, 0.0)]
    no_in = np.zeros((0, 64), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(4):
        ep = pb.node_events_from_lists(events) if i == 0 else pb.empty_node_events()
        ev = vb.node_events_from_lists(events) if i == 0 else vb.empty_node_events()
        sp, op = pb.process(ctx, sp, no_in, {}, events=ep)
        sv, ov, _ = vb.process(ctx, sv, no_in, {}, events=ev)
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    a = np.concatenate(outs_p, 1)
    b = np.concatenate(outs_v, 1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_voicebank_sample_accurate_float_set():
    """Float sets land on their exact frame: samples before the event frame
    follow the pre-event trajectory (WrPreciseTiming semantics at bank scale)."""
    import jax.numpy as jnp

    from knaster_tpu import UGen, pfloat

    class LevelVoice(UGen):
        inputs = 0
        outputs = 1
        params = (pfloat("level", 0.0),)

        def process(self, ctx, state, inputs, params):
            return state, params["level"][None, :]

    # end-to-end jump through the graph API: set_at lands at sample 100
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        bank = gg.push(
            VoiceBank(LevelVoice(), 2,
                      voice_defaults={"level": np.array([1.0, 10.0], np.float32)})
        )
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    bank.voice_param("level").set_at(0, 5.0, _samples(100))
    out = proc.render(frames=256)[0]
    np.testing.assert_allclose(out[:100], 11.0, atol=1e-6)
    np.testing.assert_allclose(out[100:], 15.0, atol=1e-6)

    # mid-block set while a ramp is running: the old ramp continues up to
    # the event frame; the new ramp ANCHORS at that frame and starts from
    # the old trajectory's value there (engine parity: the param engine's
    # c_f = row[f], param_engine._materialize_floats)
    ctx = AudioCtx(SR, 64, np.float32)
    vb = VoiceBank(LevelVoice(), 1)
    li = vb.float_index("level")
    st = vb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    ev0 = vb.node_events_from_lists(
        [(0, 0, li, 4, 128.0), (0, 0, li, 0, 128.0)]  # smooth 128f, ramp to 128
    )
    st, o0 = vb.process(ctx, st, no_in, {}, events=ev0)[:2]
    np.testing.assert_allclose(np.asarray(o0)[0], np.arange(64.0), atol=1e-4)
    ev1 = vb.node_events_from_lists([(32, 0, li, 0, 500.0)])
    st, o1 = vb.process(ctx, st, no_in, {}, events=ev1)[:2]
    t = np.arange(64.0)
    expect = np.where(
        t < 32, 64.0 + t, 96.0 + (500.0 - 96.0) / 128.0 * (t - 32)
    )
    np.testing.assert_allclose(np.asarray(o1)[0], expect, atol=1e-3)
    # ramp progress counts from the event frame: 32 of 128 frames elapsed
    # by the block boundary (anchored carry: felapsed/fdur)
    assert int(np.asarray(st["felapsed"])[li, 0]) == 32
    assert int(np.asarray(st["fdur"])[li, 0]) == 128


def test_additive_voice_single_harmonic_matches_sine_voice():
    """AdditiveVoice with one unit partial is exactly the SineVoice patch."""
    from knaster_tpu import AdditiveVoice, AudioCtx

    ctx = AudioCtx(SR, 64, np.float32)
    av = AdditiveVoice(harmonics=np.array([1.0], np.float32), freq=330.0)
    sv = SineVoice(freq=330.0)
    sa, sb = av.init(ctx), sv.init(ctx)
    p = {"freq": np.full(64, 330.0, np.float32),
         "amp": np.full(64, 0.5, np.float32),
         "pan": np.full(64, 0.3, np.float32),
         "t_restart": np.zeros(64, bool), "t_release": np.zeros(64, bool)}
    p["t_restart"][3] = True
    no_in = np.zeros((0, 64), np.float32)
    for i in range(3):
        sa, oa, _ = av.process(ctx, sa, no_in, p)
        sb, ob, _ = sv.process(ctx, sb, no_in, p)
        # AdditiveVoice evaluates the exact phase angle; SinWt quantizes to
        # the 16384-entry table grid (<= sin(2*pi/16384) difference)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=3e-4)
        p["t_restart"][:] = False


def test_pallas_wavetable_bank_matches_vmap():
    from knaster_tpu import AdditiveVoice, NonAaWavetable, PallasWavetableVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 1024
    nb = NonAaWavetable()
    nb.add_saw(1, 12, 1.0)
    rng = np.random.default_rng(3)
    d = {"freq": rng.uniform(60, 3000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    pb = PallasWavetableVoiceBank(V, table=nb.buffer, n_harmonics=12,
                                  voice_defaults=d, tile_rows=8,
                                  event_capacity=2048)
    vb = VoiceBank(AdditiveVoice(table=nb.buffer, n_harmonics=12), V,
                   voice_defaults=d, event_capacity=2048)
    events = [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 2)]
    events += [(25, 7, pb.trig_index("t_release"), 1, 0.0)]
    no_in = np.zeros((0, 64), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(4):
        ep = pb.node_events_from_lists(events) if i == 0 else pb.empty_node_events()
        ev = vb.node_events_from_lists(events) if i == 0 else vb.empty_node_events()
        sp, op = pb.process(ctx, sp, no_in, {}, events=ep)
        sv, ov, _ = vb.process(ctx, sv, no_in, {}, events=ev)
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    a = np.concatenate(outs_p, 1)
    b = np.concatenate(outs_v, 1)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_sharded_wavetable_bank_matches_unsharded():
    """PallasWavetableVoiceBank shards over the mesh (make_local carries the
    harmonic decomposition to each shard)."""
    from knaster_tpu import NonAaWavetable, PallasWavetableVoiceBank

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    V = 8 * 1024
    nb = NonAaWavetable()
    nb.add_saw(1, 10, 1.0)
    rng = np.random.default_rng(6)
    defaults = {
        "freq": rng.uniform(100, 2000, V).astype(np.float32),
        "amp": np.full(V, 0.01, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    bank = PallasWavetableVoiceBank(V, table=nb.buffer, n_harmonics=8,
                                    voice_defaults=defaults, tile_rows=8,
                                    event_capacity=512)
    sb = ShardedVoiceBank(bank, mesh, ctx)
    events = [(0, v, bank.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 17)]
    st = sb.init_state()
    st, o1 = sb.step(st, sb.events_from_lists(events))
    st, o2 = sb.step(st, sb.empty_events())
    sharded = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)

    ust = bank.init(ctx)
    ust, u1 = bank.process(ctx, ust, np.zeros((0, 64), np.float32), {},
                           events=bank.node_events_from_lists(events))
    ust, u2 = bank.process(ctx, ust, np.zeros((0, 64), np.float32), {},
                           events=bank.empty_node_events())
    unsharded = np.concatenate([np.asarray(u1), np.asarray(u2)], axis=1)
    assert np.abs(unsharded).max() > 1e-5
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


def test_sampler_voice_closed_form():
    """SamplerVoice's scan-free pointer math vs a per-sample numpy model:
    restart mid-block, loop wrap, fractional rate, one-shot end."""
    from knaster_tpu import SamplerVoice

    ctx = AudioCtx(SR, 64, np.float32)
    n = 100
    ramp = np.arange(n, dtype=np.float32)  # buffer[i] = i: output = position

    def run(voice, trig_frame, n_blocks, rate):
        st = voice.init(ctx)
        outs = []
        for b in range(n_blocks):
            p = {"rate": np.full(64, rate, np.float32),
                 "amp": np.ones(64, np.float32),
                 "pan": np.full(64, -1.0, np.float32),  # all left, gain 1
                 "t_restart": np.zeros(64, bool),
                 "t_release": np.zeros(64, bool)}
            if b == 0:
                p["t_restart"][trig_frame] = True
            st, out, _ = voice.process(ctx, st, np.zeros((0, 64), np.float32), p)
            outs.append(np.asarray(out)[0])
        return np.concatenate(outs)

    # env with instant attack so output == buffer value directly
    sv = SamplerVoice(ramp, loop=True, attack=0.0, release=0.01)
    got = run(sv, trig_frame=5, n_blocks=4, rate=1.7)
    t = np.arange(256)
    pos = np.where(t >= 5, 1.7 * (t - 5), 0.0)
    ip = np.floor(pos); fr = (pos - ip).astype(np.float32)
    i0 = (ip.astype(int)) % n; i1 = (ip.astype(int) + 1) % n
    expect = (ramp[i0] + (ramp[i1] - ramp[i0]) * fr) * (t >= 5)
    # env: attack 0 -> jumps to 1 one sample after the trigger (EnvAsr)
    expect = np.where(t >= 6, expect, 0.0)
    got_cmp = np.where(t >= 6, got, 0.0)
    np.testing.assert_allclose(got_cmp, expect, atol=2e-3)
    assert got_cmp[150] > 0  # looped past the end and kept playing

    # one-shot: silent after the buffer end
    sv1 = SamplerVoice(ramp, loop=False, attack=0.0, release=0.01)
    got1 = run(sv1, trig_frame=0, n_blocks=4, rate=1.0)
    assert np.abs(got1[102:]).max() == 0.0
    np.testing.assert_allclose(got1[50], 50.0, atol=1e-3)  # pos(t) = t


def test_sampler_voice_bank():
    """A bank of sampler voices at different rates mixes correctly."""
    from knaster_tpu import SamplerVoice

    n = 4800
    tone = np.sin(2 * np.pi * 440.0 * np.arange(n) / SR).astype(np.float32)
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(
            SamplerVoice(tone, loop=True, attack=0.001, release=0.05),
            4,
            voice_defaults={"rate": np.array([0.5, 1.0, 2.0, 1.5], np.float32),
                            "amp": np.full(4, 0.1, np.float32)},
        ))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    for v in range(4):
        bank.voice_param("t_restart").trig(v)
    a = proc.render(frames=4096)
    assert np.isfinite(a).all()
    assert np.abs(a).max() > 1e-3
    # spectral peaks at 220/440/880/660 Hz
    spec = np.abs(np.fft.rfft(a[0] * np.hanning(4096)))
    freqs = np.fft.rfftfreq(4096, 1 / SR)
    for f in (220, 440, 660, 880):
        band = spec[(freqs > f - 40) & (freqs < f + 40)].max()
        floor = spec[(freqs > 1200)].max()
        assert band > 5 * floor, (f, band, floor)


# --------------------------------------------------------------------------
# sample-accurate float sets + smoothing ramps inside the Pallas kernels
# (VERDICT r1 #2: kernels must match the vmap path per sample, not per block)
# --------------------------------------------------------------------------

def _run_bank_pair(pb, vb, ctx, schedule, n_blocks):
    """Run a Pallas bank and its vmap twin over the same per-block event
    schedule; blocks whose schedule entry is None run with events=None (the
    fast-program kernel variant — live ramps must still advance per sample)."""
    no_in = np.zeros((0, ctx.block_size), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(n_blocks):
        evs = schedule.get(i)
        if evs is None:
            ep = ev = None
        else:
            ep = pb.node_events_from_lists(evs)
            ev = vb.node_events_from_lists(evs)
        sp, op = pb.process(ctx, sp, no_in, {}, events=ep)
        r = vb.process(ctx, sv, no_in, {}, events=ev)
        sv, ov = r[0], r[1]
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    return np.concatenate(outs_p, 1), np.concatenate(outs_v, 1)


def _set_ramp_schedule(bank, fparams):
    """6-block schedule: restarts, mid-block jumps on every float param,
    a smoothing ramp spanning blocks (advancing through event-free blocks),
    and a mid-ramp re-set. fparams: {name: new_value}."""
    names = list(fparams)
    fi = {n: bank.float_index(n) for n in names}
    V = bank.n_voices
    sched = {
        0: [(0, v, bank.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 3)],
        # mid-block jumps, a different frame per param
        1: [(17 + 9 * k, 3 + 2 * k, fi[n], 0, float(fparams[n]))
            for k, n in enumerate(names)],
        # smoothing ramp on the first param of voice 9: 150 frames (spans
        # blocks 2-4, two of which render with events=None)
        2: [(0, 9, fi[names[0]], 4, 150.0),
            (10, 9, fi[names[0]], 0, float(fparams[names[0]]))],
        3: None,
        4: None,
        # mid-ramp re-set while the ramp is still running
        5: [(50, 9, fi[names[0]], 0, float(fparams[names[0]]) * 0.5)],
    }
    return sched


def test_pallas_sine_bank_sample_accurate_sets_and_ramps():
    from knaster_tpu import PallasSineVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(11)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    pb = PallasSineVoiceBank(V, voice_defaults=d, tile_rows=2,
                             event_capacity=1024)
    vb = VoiceBank(SineVoice(), V, voice_defaults=d, event_capacity=1024)
    sched = _set_ramp_schedule(pb, {"freq": 1234.0, "amp": 0.02, "pan": 0.9})
    a, b = _run_bank_pair(pb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    # the kernel now computes the SAME table-quantized jnp.sin from the SAME
    # per-sample u32 phases as SinWt — only reduction order differs
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_fm_bank_sample_accurate_sets_and_ramps():
    from knaster_tpu import PallasFMVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(12)
    d = {"freq": rng.uniform(100, 800, V).astype(np.float32),
         "ratio": rng.choice([1.0, 2.0], V).astype(np.float32),
         "index": rng.uniform(0.5, 2.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    pb = PallasFMVoiceBank(V, voice_defaults=d, tile_rows=2,
                           event_capacity=1024)
    vb = VoiceBank(FMVoice(), V, voice_defaults=d, event_capacity=1024)
    sched = _set_ramp_schedule(
        pb, {"freq": 440.0, "ratio": 3.0, "index": 4.0, "amp": 0.02})
    a, b = _run_bank_pair(pb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_subtractive_bank_sample_accurate_sets_and_ramps():
    from knaster_tpu import PallasSubtractiveVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(13)
    d = {"freq": rng.uniform(50, 400, V).astype(np.float32),
         "cutoff": rng.uniform(300, 5000, V).astype(np.float32),
         "q": rng.uniform(0.6, 3.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    pb = PallasSubtractiveVoiceBank(V, voice_defaults=d, tile_rows=2,
                                    event_capacity=1024)
    vb = VoiceBank(SubtractiveVoice(), V, voice_defaults=d,
                   event_capacity=1024)
    # the cutoff smoothing ramp is the classic filter sweep: per-sample
    # tan-based coefficients must track it inside the kernel
    sched = _set_ramp_schedule(
        pb, {"cutoff": 900.0, "freq": 220.0, "q": 1.5, "amp": 0.02})
    a, b = _run_bank_pair(pb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_pallas_wavetable_bank_sample_accurate_sets_and_ramps():
    from knaster_tpu import PallasWavetableVoiceBank
    from knaster_tpu.models.voices import AdditiveVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(14)
    mags = np.array([1.0, 0.5, 0.25, 0.125], np.float32)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    pb = PallasWavetableVoiceBank(V, harmonics=mags, voice_defaults=d,
                                  tile_rows=2, event_capacity=1024)
    vb = VoiceBank(AdditiveVoice(harmonics=mags), V, voice_defaults=d,
                   event_capacity=1024)
    # include a freq jump ABOVE half-nyquist so the per-sample AA mask
    # drops partials at the exact event frame in both paths
    sched = _set_ramp_schedule(pb, {"freq": 13000.0, "amp": 0.02, "pan": -0.7})
    a, b = _run_bank_pair(pb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_fm_bank_at_44100():
    """The FM kernel derives its phase constants from the AudioCtx sample
    rate (regression: 48 kHz used to be baked into the kernel)."""
    from knaster_tpu import PallasFMVoiceBank

    ctx = AudioCtx(44100, 64, np.float32)
    V = 256
    d = {"freq": np.full(V, 441.0, np.float32),
         "ratio": np.ones(V, np.float32),
         "index": np.zeros(V, np.float32),  # plain sine: freq is measurable
         "amp": np.full(V, 1.0 / V, np.float32)}
    pb = PallasFMVoiceBank(V, voice_defaults=d, tile_rows=1, attack=0.0001)
    vb = VoiceBank(FMVoice(attack=0.0001), V, voice_defaults=d)
    sched = {0: [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(V)]}
    a, b = _run_bank_pair(pb, vb, ctx, sched, 32)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # 441 Hz at 44.1 kHz: one zero-crossing pair per 100 samples
    ch = a[0]
    zc = np.sum((ch[:-1] < 0) & (ch[1:] >= 0))
    assert abs(zc - 441.0 * (32 * 64) / 44100.0) <= 2


def test_sharded_bank_spec_inference_nonleading_axis():
    """ShardedVoiceBank infers each leaf's voice axis structurally (full vs
    local shapes), so custom banks with non-leading or extra state leaves
    shard correctly without name lists."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    class WeirdBank(VoiceBank):
        def make_local(self, n_local):
            return WeirdBank(self.voice, n_local,
                             event_capacity=self.event_capacity)

        def init(self, ctx):
            base = super().init(ctx)
            base["weird"] = jnp.zeros((2, self.n_voices, 3), ctx.dtype)
            base["shared"] = jnp.zeros((5,), ctx.dtype)
            return base

        def process(self, ctx, state, inputs, params, events=None):
            extra = {"weird": state.pop("weird"), "shared": state.pop("shared")}
            new_state, out, done = super().process(
                ctx, state, inputs, params, events=events
            )
            new_state.update(extra)
            return new_state, out, done

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    bank = WeirdBank(SineVoice(amp=0.05), 16)
    sb = ShardedVoiceBank(bank, mesh, ctx)
    assert sb._specs["weird"] == P(None, "voices")
    assert sb._specs["shared"] == P()
    assert sb._specs["fvals"] == P(None, "voices")
    assert sb._specs["active"] == P("voices")
    st = sb.init_state()
    st, out = sb.step(st, sb.empty_events())
    assert np.asarray(out).shape == (2, 64)


def test_mesh_voicebank_inside_graph_matches_unsharded():
    """A MeshVoiceBank IS a graph node: sharded bank + SVF bus in one Graph
    equals the same graph with the plain (unsharded) bank, and per-voice
    events work through the normal voice_param handles."""
    from knaster_tpu import MeshVoiceBank, SvfFilter

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    V = 4 * n_dev
    freqs = 220.0 * (1 + np.arange(V, dtype=np.float32) / V)

    def render(shard):
        g, proc = AudioProcessor.new(0, 2, OPTS)
        bank = VoiceBank(SineVoice(amp=0.05), V, voice_defaults={"freq": freqs})
        node = MeshVoiceBank(bank, mesh) if shard else bank

        def build(gg):
            h = gg.push(node)
            f = gg.push(SvfFilter(cutoff_freq=4000.0))
            h.out([0]).to(f)  # left channel through the filter bus
            f.to_graph_out()
            h.out([1]).to_graph_out_channels([1])
            return h

        h = g.edit(build)
        trig = h.voice_param("t_restart")
        for v in range(V):
            trig.trig(v)
        h.voice_param("t_restart").trig_at(1, _samples(100))
        h.voice_param("freq").set_at(2, 990.0, _samples(200))
        return proc.render(frames=1024)

    a = render(True)
    b = render(False)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_mesh_voicebank_pallas_inside_graph():
    """Pallas kernel banks shard into the graph too (shard_map around the
    pallas_call, per-device interpret on CPU)."""
    from knaster_tpu import MeshVoiceBank, PallasSineVoiceBank

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    V = 128 * n_dev
    rng = np.random.default_rng(7)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}

    def render(shard):
        g, proc = AudioProcessor.new(0, 2, OPTS)
        bank = PallasSineVoiceBank(V, voice_defaults=d, tile_rows=1,
                                   event_capacity=512)
        node = MeshVoiceBank(bank, mesh) if shard else bank
        h = g.edit(lambda gg: (lambda hh: (hh.to_graph_out(), hh)[1])(
            gg.push(node)))
        trig = h.voice_param("t_restart")
        for v in range(0, V, 3):
            trig.trig(v)
        return proc.render(frames=512)

    a = render(True)
    b = render(False)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_render_is_state_continuous():
    """ShardedVoiceBank.render can thread state: two 4-block renders equal
    one 8-block render (it previously re-initialized per call)."""
    import jax.numpy as jnp

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    freqs = 220.0 * (1 + np.arange(16, dtype=np.float32) / 16.0)
    bank = VoiceBank(SineVoice(amp=0.05), 16, voice_defaults={"freq": freqs})
    sb = ShardedVoiceBank(bank, mesh, ctx)
    ev = sb.events_from_lists([(0, v, 0, 1, 0.0) for v in range(16)])
    st = sb.init_state()
    st, _ = sb.step(st, ev)  # start the envelopes

    # render() does not donate its state: the same st drives both paths
    whole = np.asarray(sb.render(8, state=st))
    a, st2 = sb.render(4, state=st, return_state=True)
    b = np.asarray(sb.render(4, state=st2))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a), b], axis=1), whole, atol=1e-6
    )


# --------------------------------------------------------------------------
# large-block kernels (block sizes beyond 64: ceil(B/32) trigger words)
# --------------------------------------------------------------------------

def _run_bank_pair_blocks(pb, vb, B, events, blocks=3):
    """Step both banks over `blocks` blocks (events in block 0), return
    (pallas_out, vmap_out) concatenated over time."""
    ctx = AudioCtx(SR, B, np.float32)
    no_in = np.zeros((0, B), np.float32)
    sp, sv = pb.init(ctx), vb.init(ctx)
    outs_p, outs_v = [], []
    for i in range(blocks):
        ep = pb.node_events_from_lists(events) if i == 0 else pb.empty_node_events()
        ev = vb.node_events_from_lists(events) if i == 0 else vb.empty_node_events()
        sp, op = pb.process(ctx, sp, no_in, {}, events=ep)
        sv, ov, _ = vb.process(ctx, sv, no_in, {}, events=ev)
        outs_p.append(np.asarray(op))
        outs_v.append(np.asarray(ov))
    return np.concatenate(outs_p, 1), np.concatenate(outs_v, 1)


@pytest.mark.parametrize("B", [96, 128, 256])
def test_pallas_sine_bank_large_blocks(B):
    """Kernel banks accept any block size: trigger bitmasks generalize to
    ceil(B/32) words, and events landing in frames >= 64 (the old cap) are
    sample-accurate."""
    from knaster_tpu import PallasSineVoiceBank

    V = 256
    rng = np.random.default_rng(3)
    d = {"freq": rng.uniform(100, 4000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    pb = PallasSineVoiceBank(V, voice_defaults=d, tile_rows=1,
                             event_capacity=1024)
    vb = VoiceBank(SineVoice(), V, voice_defaults=d, event_capacity=1024)
    tr, tq = pb.trig_index("t_restart"), pb.trig_index("t_release")
    events = [(0, v, tr, 1, 0.0) for v in range(0, V, 5)]
    # frames straddling every word boundary, incl. the last frame
    events += [(33, 13, tr, 1, 0.0), (70, 5, tq, 1, 0.0),
               (95, 11, tr, 1, 0.0), (B - 1, 9, tr, 1, 0.0),
               (90, 7, pb.float_index("freq"), 0, 1234.0)]
    a, b = _run_bank_pair_blocks(pb, vb, B, events)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_fm_and_sub_and_wt_banks_block_128():
    """The other three kernel banks at a 2x-superblock-sized block."""
    from knaster_tpu import (AdditiveVoice, NonAaWavetable, PallasFMVoiceBank,
                             PallasSubtractiveVoiceBank,
                             PallasWavetableVoiceBank)

    B, V = 128, 256
    rng = np.random.default_rng(5)

    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32)}
    pb = PallasFMVoiceBank(V, voice_defaults=d, tile_rows=1,
                           event_capacity=1024)
    vb = VoiceBank(FMVoice(), V, voice_defaults=d, event_capacity=1024)
    tr = pb.trig_index("t_restart")
    ev = [(0, v, tr, 1, 0.0) for v in range(0, V, 3)] + [(100, 3, tr, 1, 0.0)]
    a, b = _run_bank_pair_blocks(pb, vb, B, ev)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-4)

    d = {"freq": rng.uniform(60, 800, V).astype(np.float32),
         "cutoff": rng.uniform(400, 4000, V).astype(np.float32),
         "amp": np.full(V, 0.05, np.float32)}
    pb = PallasSubtractiveVoiceBank(V, voice_defaults=d, tile_rows=1,
                                    event_capacity=1024)
    vb = VoiceBank(SubtractiveVoice(), V, voice_defaults=d,
                   event_capacity=1024)
    tr, tq = pb.trig_index("t_restart"), pb.trig_index("t_release")
    ev = [(0, v, tr, 1, 0.0) for v in range(0, V, 2)]
    ev += [(97, 4, tq, 1, 0.0), (110, 8, tr, 1, 0.0)]
    a, b = _run_bank_pair_blocks(pb, vb, B, ev)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-4)

    nb = NonAaWavetable()
    nb.add_saw(1, 12, 1.0)
    d = {"freq": rng.uniform(60, 3000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    pb = PallasWavetableVoiceBank(V, table=nb.buffer, n_harmonics=12,
                                  voice_defaults=d, tile_rows=1,
                                  event_capacity=2048)
    vb = VoiceBank(AdditiveVoice(table=nb.buffer, n_harmonics=12), V,
                   voice_defaults=d, event_capacity=2048)
    ev = [(0, v, pb.trig_index("t_restart"), 1, 0.0) for v in range(0, V, 2)]
    ev += [(89, 7, pb.trig_index("t_release"), 1, 0.0)]
    a, b = _run_bank_pair_blocks(pb, vb, B, ev)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_sampler_voice_tiled_matches_gather_path():
    """tiled=True (gather-free unit-rate read, DESIGN_NOTES 'tile + barrel
    roll') is bit-exact vs the gather path at rate 1: loop wrap, one-shot
    end masking, mid-block restart, multi-block continuation."""
    from knaster_tpu import SamplerVoice

    ctx = AudioCtx(SR, 64, np.float32)
    rng = np.random.default_rng(5)
    buf = rng.standard_normal(300).astype(np.float32)

    def run(voice, trig_frames, n_blocks):
        st = voice.init(ctx)
        outs = []
        for b in range(n_blocks):
            p = {"rate": np.ones(64, np.float32),
                 "amp": np.ones(64, np.float32),
                 "pan": np.full(64, -1.0, np.float32),
                 "t_restart": np.zeros(64, bool),
                 "t_release": np.zeros(64, bool)}
            for (bb, f) in trig_frames:
                if bb == b:
                    p["t_restart"][f] = True
            st, out, _ = voice.process(
                ctx, st, np.zeros((0, 64), np.float32), p)
            outs.append(np.asarray(out)[0])
        return np.concatenate(outs)

    for loop in (True, False):
        ref = run(SamplerVoice(buf, loop=loop, attack=0.0, release=0.01),
                  [(0, 5), (4, 33)], 8)
        til = run(SamplerVoice(buf, loop=loop, attack=0.0, release=0.01,
                               tiled=True),
                  [(0, 5), (4, 33)], 8)
        np.testing.assert_array_equal(til, ref)


def test_sampler_voice_tiled_bank():
    """Tiled sampler voices inside a VoiceBank (the drum-machine case)."""
    from knaster_tpu import SamplerVoice

    n = 4800
    tone = np.sin(2 * np.pi * 440.0 * np.arange(n) / SR).astype(np.float32)
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        bank = gg.push(VoiceBank(
            SamplerVoice(tone, loop=True, attack=0.001, release=0.05,
                         tiled=True),
            4,
            voice_defaults={"amp": np.full(4, 0.1, np.float32)},
        ))
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    for v in range(4):
        bank.voice_param("t_restart").trig(v)
    a = proc.render(frames=4096)
    assert np.isfinite(a).all() and np.abs(a).max() > 1e-3
    spec = np.abs(np.fft.rfft(a[0] * np.hanning(4096)))
    freqs = np.fft.rfftfreq(4096, 1 / SR)
    band = spec[(freqs > 400) & (freqs < 480)].max()
    floor = spec[(freqs > 1200)].max()
    assert band > 5 * floor


def test_sampler_voice_tiled_validation():
    from knaster_tpu import SamplerVoice

    ctx = AudioCtx(SR, 64, np.float32)
    with pytest.raises(ValueError):  # loop shorter than a block
        SamplerVoice(np.zeros(32, np.float32), tiled=True).init(ctx)

    class FakeBuf:
        data = np.zeros(300, np.float32)
        sample_rate = 44100

    with pytest.raises(ValueError):  # wrong sample rate
        SamplerVoice(FakeBuf(), tiled=True).init(ctx)


def _run_sampler(voice, trig_frames, n_blocks, rate, B=64, no_events=False):
    ctx = AudioCtx(SR, B, np.float32, no_events=no_events)
    st = voice.init(ctx)
    outs = []
    for b in range(n_blocks):
        p = {"rate": np.full(B, rate, np.float32),
             "amp": np.ones(B, np.float32),
             "pan": np.full(B, -1.0, np.float32),
             "t_restart": np.zeros(B, bool),
             "t_release": np.zeros(B, bool)}
        for (bb, f) in trig_frames:
            if bb == b and not no_events:
                p["t_restart"][f] = True
        st, out, _ = voice.process(ctx, st, np.zeros((0, B), np.float32), p)
        outs.append(np.asarray(out)[0])
    return np.concatenate(outs)


def test_sampler_voice_resample_matches_gather_path():
    """resample=True (windowed bounded-rate read, DESIGN_NOTES 'Windowed
    resampling') is BIT-exact vs the gather path: the one-hot in-window
    matmul at HIGHEST precision is an exact gather, and the position
    trajectory is the gather path's verbatim. Loop wrap, one-shot end
    masking, mid-block restarts, fractional rates."""
    from knaster_tpu import SamplerVoice

    rng = np.random.default_rng(5)
    buf = rng.standard_normal(300).astype(np.float32)
    for loop in (True, False):
        for rate in (0.73, 1.31, 1.99):
            ref = _run_sampler(
                SamplerVoice(buf, loop=loop, attack=0.0, release=0.01),
                [(0, 5), (4, 33)], 8, rate)
            got = _run_sampler(
                SamplerVoice(buf, loop=loop, attack=0.0, release=0.01,
                             resample=True),
                [(0, 5), (4, 33)], 8, rate)
            np.testing.assert_array_equal(got, ref)


def test_sampler_voice_resample_edges():
    """Tiny loops (the window wraps the loop more than once), the
    no-events fast program, the rate clamp, and the B > block-cap gather
    fallback all stay bit-exact."""
    from knaster_tpu import SamplerVoice

    rng = np.random.default_rng(6)
    # window wraps a 17-frame loop several times per block
    for L in (17, 50):
        buf = rng.standard_normal(L).astype(np.float32)
        ref = _run_sampler(
            SamplerVoice(buf, loop=True, attack=0.0, release=0.01),
            [(0, 3)], 6, 1.99)
        got = _run_sampler(
            SamplerVoice(buf, loop=True, attack=0.0, release=0.01,
                         resample=True),
            [(0, 3)], 6, 1.99)
        np.testing.assert_array_equal(got, ref)

    buf = rng.standard_normal(300).astype(np.float32)
    # fast program (ctx.no_events): steady-state continuation bit-matches
    outs = []
    for kw in ({}, {"resample": True}):
        v = SamplerVoice(buf, loop=True, attack=0.0, release=0.01, **kw)
        ctx = AudioCtx(SR, 64, np.float32)
        st = v.init(ctx)
        p = {"rate": np.full(64, 1.31, np.float32),
             "amp": np.ones(64, np.float32),
             "pan": np.full(64, -1.0, np.float32),
             "t_restart": np.zeros(64, bool),
             "t_release": np.zeros(64, bool)}
        p["t_restart"][0] = True
        st, _, _ = v.process(ctx, st, np.zeros((0, 64), np.float32), p)
        fast = AudioCtx(SR, 64, np.float32, no_events=True)
        p2 = dict(p)
        p2["t_restart"] = np.zeros(64, bool)
        chunks = []
        for _ in range(5):
            st, o, _ = v.process(fast, st, np.zeros((0, 64), np.float32), p2)
            chunks.append(np.asarray(o)[0])
        outs.append(np.concatenate(chunks))
    np.testing.assert_array_equal(outs[1], outs[0])

    # rate above max_rate clamps (documented divergence from the gather
    # path), identically in the windowed read and the B > cap fallback
    v = SamplerVoice(buf, loop=True, attack=0.0, release=0.01,
                     resample=True)
    ref2 = SamplerVoice(buf, loop=True, attack=0.0, release=0.01)
    np.testing.assert_array_equal(
        _run_sampler(v, [(0, 3)], 8, 5.0, B=64),
        _run_sampler(ref2, [(0, 3)], 8, 2.0, B=64))
    np.testing.assert_array_equal(
        _run_sampler(v, [(0, 3)], 2, 5.0, B=512),
        _run_sampler(ref2, [(0, 3)], 2, 2.0, B=512))


def test_sampler_voice_resample_bank():
    """Resample sampler voices inside a VoiceBank (per-voice rates +
    sample-accurate restarts through the bank event path) bit-match the
    gather-path bank."""
    from knaster_tpu import SamplerVoice

    n = 4800
    tone = np.sin(2 * np.pi * 330.0 * np.arange(n) / SR).astype(np.float32)
    rates = np.array([0.5, 0.99, 1.31, 1.87], np.float32)

    def render(**kw):
        g, proc = AudioProcessor.new(0, 2, OPTS)

        def build(gg):
            bank = gg.push(VoiceBank(
                SamplerVoice(tone, loop=True, attack=0.001, release=0.05,
                             **kw),
                4,
                voice_defaults={"amp": np.full(4, 0.1, np.float32),
                                "rate": rates}))
            bank.to_graph_out()
            return bank

        bank = g.edit(build)
        for v in range(4):
            bank.voice_param("t_restart").trig(v)
        return proc.render(frames=2048)

    ref = render()
    got = render(resample=True)
    np.testing.assert_array_equal(got, ref)
