"""GrainPlayer: numpy-model parity, determinism, partition invariance,
sample-accurate t_spawn, loop semantics, slot reuse, in-graph use."""

import jax
import numpy as np
import pytest

import knaster_tpu as kt
from knaster_tpu.core.ugen import AudioCtx
from knaster_tpu.ugens.granular import GrainPlayer


SR = 48000


def _buffer(n=4800, sr=SR):
    t = np.arange(n, dtype=np.float32)
    data = np.sin(2 * np.pi * 220.0 * t / sr).astype(np.float32) * 0.5
    return kt.Buffer(data, sr)


def _render(player, n, ctx=None, param_overrides=None, tspawn_frames=()):
    """Drive the UGen directly, block by block."""
    ctx = ctx or AudioCtx(sample_rate=SR, block_size=64, dtype=np.float32)
    B = ctx.block_size
    state = player.init(ctx)
    blocks = []
    names = [p.name for p in player.params]
    defaults = {p.name: player.pdefaults.get(p.name, p.default)
                for p in player.params}
    if param_overrides:
        defaults.update(param_overrides)
    for b in range(0, n, B):
        params = {}
        for name in names:
            if name == "t_spawn":
                row = np.zeros(B, dtype=bool)
                for f in tspawn_frames:
                    if b <= f < b + B:
                        row[f - b] = True
                params[name] = row
            else:
                params[name] = np.full(B, defaults[name], np.float32)
        state, out = player.process(ctx, state, np.zeros((0, B)), params)
        blocks.append(np.asarray(out))
    return np.concatenate(blocks, axis=1)[:, :n]


def _numpy_model(buf, n, G, density, grain_dur, rate, pos, amp=1.0,
                 window="hann", loop=True, tspawn_frames=(), sr=SR):
    """Jitter-free reference model of the scheduler + grain readers."""
    bsr = buf.sample_rate
    base_step = bsr / sr
    period = sr / np.clip(density, 0.01, sr)
    dur = max(grain_dur * sr, 1.0)
    src_base = pos * bsr
    step = rate * base_step
    data = buf.data[0].astype(np.float64)
    nf = len(data)

    countdown = 0.0
    age = np.zeros(G)
    gdur = np.zeros(G)
    counter = 0
    outl = np.zeros(n)
    outr = np.zeros(n)
    for i in range(n):
        countdown -= 1.0
        forced = i in tspawn_frames
        due = countdown <= 0.0 or forced
        if due:
            countdown = period if forced else countdown + period
            slot = counter % G
            age += 1
            age[slot] = 0
            gdur[slot] = dur
            counter += 1
        else:
            age += 1
        active = (age < gdur) & (gdur > 0)
        ph = np.where(gdur > 0, age / np.maximum(gdur, 1e-9), 0.0)
        if window == "hann":
            w = 0.5 - 0.5 * np.cos(2 * np.pi * ph)
        elif window == "triangle":
            w = 1.0 - np.abs(2 * ph - 1.0)
        else:
            w = np.ones_like(ph)
        src = src_base + age * step
        idx = np.floor(src).astype(int)
        frac = src - idx
        if loop:
            i0, i1 = idx % nf, (idx + 1) % nf
            valid = active
        else:
            i0 = np.clip(idx, 0, nf - 1)
            i1 = np.clip(idx + 1, 0, nf - 1)
            valid = active & (idx >= 0) & (idx < nf - 1)
        s = data[i0] * (1 - frac) + data[i1] * frac
        sig = np.where(valid, w * s, 0.0)
        # jitter-free: pan = 0 -> angle pi/4
        g = np.cos(np.pi / 4)
        outl[i] = sig.sum() * g * amp
        outr[i] = sig.sum() * g * amp
    return np.stack([outl, outr])


def test_matches_numpy_model_jitter_free():
    buf = _buffer()
    G = 8
    player = GrainPlayer(buf, grains=G, density=40.0, grain_dur=0.02,
                         rate=1.0, pos=0.01, pos_jitter=0.0,
                         rate_jitter=0.0, pan_spread=0.0)
    n = 2048
    got = _render(player, n)
    want = _numpy_model(buf, n, G, density=40.0, grain_dur=0.02, rate=1.0,
                        pos=0.01)
    assert np.max(np.abs(got - want)) < 1e-4
    assert np.max(np.abs(got)) > 1e-3  # actually made sound


def test_rate_and_window_variants():
    buf = _buffer()
    for window in ("triangle", "rect"):
        for rate in (0.5, 2.0):
            player = GrainPlayer(buf, grains=4, density=25.0,
                                 grain_dur=0.015, rate=rate, pos=0.02,
                                 pos_jitter=0.0, rate_jitter=0.0,
                                 pan_spread=0.0, window=window)
            n = 1024
            got = _render(player, n)
            want = _numpy_model(buf, n, 4, density=25.0, grain_dur=0.015,
                                rate=rate, pos=0.02, window=window)
            assert np.max(np.abs(got - want)) < 1e-4, (window, rate)


def test_block_partition_invariance_with_jitter():
    buf = _buffer()
    n = 512
    outs = []
    for B in (16, 128):
        player = GrainPlayer(buf, grains=16, density=200.0, grain_dur=0.01,
                             pos_jitter=0.005, rate_jitter=1.0,
                             pan_spread=1.0, seed=7)
        ctx = AudioCtx(sample_rate=SR, block_size=B, dtype=np.float32)
        outs.append(_render(player, n, ctx=ctx))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_seed_determinism():
    buf = _buffer()
    mk = lambda s: GrainPlayer(buf, grains=8, density=100.0, grain_dur=0.01,
                               pos_jitter=0.01, pan_spread=1.0, seed=s)
    a = _render(mk(3), 512)
    b = _render(mk(3), 512)
    c = _render(mk(4), 512)
    np.testing.assert_array_equal(a, b)
    assert np.max(np.abs(a - c)) > 1e-6


def test_t_spawn_sample_accurate():
    buf = _buffer()
    # density so low the scheduler only fires once at sample 0; a forced
    # spawn at frame 100 must start its grain exactly there
    player = GrainPlayer(buf, grains=4, density=0.01, grain_dur=0.002,
                         pos=0.01, pos_jitter=0.0, rate_jitter=0.0,
                         pan_spread=0.0)
    n = 400
    got = _render(player, n, tspawn_frames=(100,))
    want = _numpy_model(buf, n, 4, density=0.01, grain_dur=0.002, rate=1.0,
                        pos=0.01, tspawn_frames=(100,))
    assert np.max(np.abs(got - want)) < 1e-4
    first_grain_len = int(0.002 * SR)  # 96 samples
    # grain 0 dies at 96; the region before the forced spawn is silent
    assert np.max(np.abs(got[:, first_grain_len + 1:100])) == 0.0
    assert np.max(np.abs(got[:, 101:101 + first_grain_len - 1])) > 0.0


def test_loop_wrap_vs_silence():
    buf = _buffer(n=1000)
    common = dict(grains=2, density=0.01, grain_dur=0.004, rate=1.0,
                  pos=1000 / SR - 0.001, pos_jitter=0.0, rate_jitter=0.0,
                  pan_spread=0.0)
    n = 256
    looped = _render(GrainPlayer(buf, loop=True, **common), n)
    clipped = _render(GrainPlayer(buf, loop=False, **common), n)
    # the grain (192 samples) runs off the 1000-frame buffer ~48 samples in
    assert np.max(np.abs(looped[:, 60:150])) > 0.0
    assert np.max(np.abs(clipped[:, 60:150])) == 0.0


def test_slot_reuse_steals_oldest():
    buf = _buffer()
    # 2 slots, spawn every 100 samples, grains last 480 samples: every
    # spawn steals a live slot — must stay finite and keep making sound
    player = GrainPlayer(buf, grains=2, density=480.0, grain_dur=0.01,
                         pos_jitter=0.0, rate_jitter=0.0, pan_spread=0.0)
    out = _render(player, 2048)
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out[:, 1024:])) > 1e-4


def test_in_graph_with_scheduled_events():
    graph, proc = kt.knaster(outputs=2, block_size=64)
    buf = _buffer()

    def build(g):
        gp = g.push(GrainPlayer(buf, grains=8, density=0.01,
                                grain_dur=0.002, pos_jitter=0.0,
                                pan_spread=0.0))
        gp.to_graph_out()
        return gp

    gp = graph.edit(build)
    gp.param("t_spawn").trig_at(kt.Seconds.from_samples(200, SR))
    audio = np.asarray(proc.render(frames=512))
    grain = int(0.002 * SR)
    assert audio.shape == (2, 512)
    # scheduler's sample-0 grain, then silence, then the scheduled grain
    assert np.max(np.abs(audio[:, grain + 1:200])) == 0.0
    assert np.max(np.abs(audio[:, 201:201 + grain - 1])) > 0.0


def test_amp_is_live_not_frozen():
    buf = _buffer()
    player = GrainPlayer(buf, grains=4, density=50.0, grain_dur=0.02,
                         pos_jitter=0.0, rate_jitter=0.0, pan_spread=0.0)
    a = _render(player, 512)
    player2 = GrainPlayer(buf, grains=4, density=50.0, grain_dur=0.02,
                          pos_jitter=0.0, rate_jitter=0.0, pan_spread=0.0)
    b = _render(player2, 512, param_overrides={"amp": 0.25})
    np.testing.assert_allclose(b, a * 0.25, atol=1e-6)


def test_evmm_and_gather_paths_identical(monkeypatch):
    """The one-hot-matmul event routing (HIGHEST precision) and the gather
    fallback (large trace-time B) are bit-identical — same state, same
    output, for the same blocks."""
    import knaster_tpu.ugens.granular as gran
    buf = _buffer(n=1000)
    ctx = AudioCtx(sample_rate=SR, block_size=64, dtype=np.float32)
    B = ctx.block_size
    player = GrainPlayer(buf, grains=8, density=400.0, grain_dur=0.01,
                         pos_jitter=0.002, rate_jitter=0.8, pan_spread=1.0,
                         seed=3)
    names = [p.name for p in player.params]
    defaults = {p.name: player.pdefaults.get(p.name, p.default)
                for p in player.params}
    params = {n: (np.zeros(B, bool) if n == "t_spawn"
                  else np.full(B, defaults[n], np.float32)) for n in names}
    outs, states = [], []
    for cap in (1 << 24, 0):   # matmul path, then forced gather fallback
        monkeypatch.setattr(gran, "_EVMM_MAX_ONEHOT", cap)
        s = player.init(ctx)
        acc = []
        for _ in range(4):
            s, o = player.process(ctx, s, np.zeros((0, B)), params)
            acc.append(np.asarray(o))
        outs.append(np.concatenate(acc, axis=1))
        states.append(jax.tree.map(np.asarray, s))
    np.testing.assert_array_equal(outs[0], outs[1])
    for k in states[0]:
        np.testing.assert_array_equal(states[0][k], states[1][k],
                                      err_msg=f"state[{k}]")


def test_vectorized_matches_scan_bit_exact():
    """The closed-form [B, G] reconstruction (process) matches the
    per-sample scan recurrence (_process_scan) across blocks, with jitter,
    forced spawns and slot stealing. Integer state (counter, age) is
    bit-identical; float state and outputs match to ULP scale — XLA fuses
    fma and picks SIMD widths differently between the two program shapes
    (observed: 2 ULP on src0's pos + posj*u, <=5e-7 on the output sum),
    same formulas, different compiler rounding."""
    buf = _buffer(n=1000)
    ctx = AudioCtx(sample_rate=SR, block_size=64, dtype=np.float32)
    B = ctx.block_size
    player = GrainPlayer(buf, grains=6, density=300.0, grain_dur=0.012,
                         pos=0.004, pos_jitter=0.003, rate_jitter=1.0,
                         pan_spread=1.0, seed=11)
    sa = player.init(ctx)
    sb = player.init(ctx)
    names = [p.name for p in player.params]
    defaults = {p.name: player.pdefaults.get(p.name, p.default)
                for p in player.params}
    rng = np.random.default_rng(5)
    for b in range(8):
        params = {}
        for name in names:
            if name == "t_spawn":
                row = np.zeros(B, dtype=bool)
                if b in (1, 4):  # forced spawns, incl. mid-block
                    row[rng.integers(0, B)] = True
                params[name] = row
            else:
                params[name] = np.full(B, defaults[name], np.float32)
        # block-rate param wiggle so spawn-time freezing is exercised
        params["density"] = params["density"] * (1.0 + 0.3 * (b % 3))
        sa, oa = player.process(ctx, sa, np.zeros((0, B)), params)
        sb, ob = player._process_scan(ctx, sb, np.zeros((0, B)), params)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=2e-6, err_msg=f"block {b}")
        for k in sa:
            va, vb = np.asarray(sa[k]), np.asarray(sb[k])
            if np.issubdtype(va.dtype, np.integer):
                np.testing.assert_array_equal(
                    va, vb, err_msg=f"state[{k}] block {b}")
            else:
                np.testing.assert_allclose(
                    va, vb, rtol=2e-6, atol=1e-6,
                    err_msg=f"state[{k}] block {b}")
    assert np.abs(np.asarray(oa)).max() > 1e-4


def test_prelude_export():
    assert kt.GrainPlayer is GrainPlayer
    from knaster_tpu.prelude import GrainPlayer as P2
    assert P2 is GrainPlayer


def test_grain_players_auto_batch_and_match_singles():
    """Same-config players over one shared Buffer auto-batch (batch_key:
    seed lives in state) into ONE vmapped call; the batched texture equals
    the sum of the players rendered alone — events included."""
    buf = _buffer()

    def build_graph(only=None):
        g, proc = kt.knaster(outputs=2)
        hs = []

        def b(gg):
            for i in range(4):
                if only is not None and i != only:
                    continue
                p = gg.push(GrainPlayer(
                    buf, grains=16, seed=i,
                    density=40.0 + 10.0 * i, grain_dur=0.02,
                    pos_jitter=0.02, rate=1.0 + 0.1 * i, amp=0.1,
                ))
                p.to_graph_out()
                hs.append(p)

        g.edit(b)
        return proc, hs

    def drive(proc, hs, spawn_idx):
        a1 = np.asarray(proc.render(frames=128))
        if spawn_idx is not None:
            hs[spawn_idx].param("t_spawn").trig()
            hs[spawn_idx].param("rate").set(1.7)
        a2 = np.asarray(proc.render(frames=128))
        return np.concatenate([a1, a2], axis=1)

    proc, hs = build_graph()
    proc._ensure_compiled()
    batches = [it for k, it in proc.compiled.plan if k == "batch"]
    assert any(len(nids) == 4 for nids in batches), \
        "grain players did not auto-batch"
    a = drive(proc, hs, spawn_idx=2)
    parts = []
    for i in range(4):
        pi, hi = build_graph(only=i)
        parts.append(drive(pi, hi, spawn_idx=0 if i == 2 else None))
    assert np.abs(a).max() > 1e-4
    np.testing.assert_allclose(a, sum(parts), atol=2e-6)


def test_grain_player_seed_determinism_from_state():
    """The Threefry key rides state: same seed => identical render,
    different seed => different grains (checkpoint/restore keeps the
    stream)."""
    buf = _buffer()
    p1 = GrainPlayer(buf, grains=8, seed=5, density=80.0, grain_dur=0.02,
                     pos_jitter=0.05, amp=0.3)
    p2 = GrainPlayer(buf, grains=8, seed=5, density=80.0, grain_dur=0.02,
                     pos_jitter=0.05, amp=0.3)
    p3 = GrainPlayer(buf, grains=8, seed=6, density=80.0, grain_dur=0.02,
                     pos_jitter=0.05, amp=0.3)
    a, b, c = (_render(p, 256) for p in (p1, p2, p3))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6


def test_grain_player_windowed_matches_gather():
    """max_rate= switches source reads to bounded-rate tile windows +
    one-hot matmuls (the sampler recipe at grain scale): BIT-identical to
    the gather path when the clamp is inert, loop and one-shot, forward
    and reverse rates, spawns mid-block included."""
    buf = _buffer()
    kw = dict(grains=64, seed=3, density=300.0, grain_dur=0.03,
              pos=0.02, pos_jitter=0.05, rate=1.0, rate_jitter=0.5,
              amp=0.3)
    a = _render(GrainPlayer(buf, **kw), 512, tspawn_frames=(37, 200))
    b = _render(GrainPlayer(buf, max_rate=4.0, **kw), 512,
                tspawn_frames=(37, 200))
    assert np.abs(a).max() > 1e-4
    np.testing.assert_array_equal(a, b)

    kw2 = dict(kw, rate=-1.2)
    c = _render(GrainPlayer(buf, loop=False, **kw2), 512)
    d = _render(GrainPlayer(buf, loop=False, max_rate=4.0, **kw2), 512)
    np.testing.assert_array_equal(c, d)


def test_grain_player_windowed_scan_parity_with_clamp():
    """With an ACTIVE max_rate clamp the closed-form windowed path still
    carries bit-identical state vs the per-sample scan (both clamp)."""
    import jax

    buf = _buffer()
    p = GrainPlayer(buf, grains=32, seed=9, density=500.0, grain_dur=0.02,
                    rate=3.0, rate_jitter=1.0, max_rate=1.5, amp=0.2)
    ctx = AudioCtx(sample_rate=SR, block_size=64, dtype=np.float32)
    B = 64
    s1, s2 = p.init(ctx), p.init(ctx)
    names = [q.name for q in p.params]
    for _ in range(6):
        params = {}
        for name in names:
            if name == "t_spawn":
                params[name] = np.zeros(B, bool)
            else:
                params[name] = np.full(
                    B, p.pdefaults.get(
                        name, [q for q in p.params if q.name == name][0].default
                    ), np.float32)
        s1, o1 = p.process(ctx, s1, np.zeros((0, B)), params)
        s2, o2 = p._process_scan(ctx, s2, np.zeros((0, B)), params)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=2e-5)
    for k in s1:
        np.testing.assert_array_equal(np.asarray(s1[k]), np.asarray(s2[k]))


def test_grain_player_windowed_superblock_fallback_invariant():
    """B > G (superblock programs) falls back to the gather read — and
    because windowed == gather bit-exactly, any block partitioning of a
    windowed player renders identically."""
    buf = _buffer()
    kw = dict(grains=64, seed=4, density=250.0, grain_dur=0.03,
              pos_jitter=0.05, rate_jitter=0.5, max_rate=2.0, amp=0.3)
    a = _render(GrainPlayer(buf, **kw), 512)  # B=64: windowed
    ctx = AudioCtx(sample_rate=SR, block_size=256, dtype=np.float32)
    b = _render(GrainPlayer(buf, **kw), 512, ctx=ctx)  # B=256: gathers
    assert np.abs(a).max() > 1e-4
    np.testing.assert_array_equal(a, b)
