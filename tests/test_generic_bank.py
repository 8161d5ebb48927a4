"""Generic PallasVoiceBank: any voice with a mosaic_voice body gets the
fused-kernel path, with the hand-written banks as bit-parity references."""

import jax.numpy as jnp
import numpy as np
import pytest

from knaster_tpu import (
    AudioCtx,
    AudioProcessor,
    AudioProcessorOptions,
    FMVoice,
    MosaicVoiceSpec,
    PallasFMVoiceBank,
    PallasVoiceBank,
    SineVoice,
    UGen,
    VoiceBank,
    pfloat,
    pinteger,
    ptrigger,
)
from knaster_tpu.core.ugen import normalize_process_result

SR = 48000
OPTS = AudioProcessorOptions(block_size=64, sample_rate=SR)


def _run_pair(a_bank, b_bank, ctx, schedule, n_blocks):
    no_in = np.zeros((0, ctx.block_size), np.float32)
    sa, sb = a_bank.init(ctx), b_bank.init(ctx)
    outs_a, outs_b = [], []
    for i in range(n_blocks):
        evs = schedule.get(i)
        if evs is None:
            ea = eb = None
        else:
            ea = a_bank.node_events_from_lists(evs)
            eb = b_bank.node_events_from_lists(evs)
        sa, oa = a_bank.process(ctx, sa, no_in, {}, events=ea)[:2]
        rb = normalize_process_result(
            b_bank.process(ctx, sb, no_in, {}, events=eb), ctx
        )
        sb, ob = rb[0], rb[1]
        outs_a.append(np.asarray(oa))
        outs_b.append(np.asarray(ob))
    return (np.concatenate(outs_a, 1), np.concatenate(outs_b, 1), sa, sb)


def _schedule(bank, fparams):
    """Restarts, mid-block jumps, a cross-block smoothing ramp, a mid-ramp
    re-set — the full sample-accurate event surface."""
    names = list(fparams)
    fi = {n: bank.float_index(n) for n in names}
    V = bank.n_voices
    return {
        0: [(0, v, bank.trig_index("t_restart"), 1, 0.0)
            for v in range(0, V, 3)],
        1: [(17 + 9 * k, 3 + 2 * k, fi[n], 0, float(fparams[n]))
            for k, n in enumerate(names)],
        2: [(0, 9, fi[names[0]], 4, 150.0),
            (10, 9, fi[names[0]], 0, float(fparams[names[0]]))],
        3: None,
        4: None,
        5: [(50, 9, fi[names[0]], 0, float(fparams[names[0]]) * 0.5)],
    }


def _fm_defaults(V, seed=0):
    rng = np.random.default_rng(seed)
    return {"freq": rng.uniform(100, 800, V).astype(np.float32),
            "ratio": rng.choice([1.0, 2.0], V).astype(np.float32),
            "index": rng.uniform(0.5, 2.0, V).astype(np.float32),
            "amp": np.full(V, 0.01, np.float32)}


def test_generic_fm_matches_hand_kernel():
    """PallasVoiceBank(FMVoice) vs the hand-written PallasFMVoiceBank:
    per-voice trajectories are bit-identical (same _mat/_env_ar/_sin_quant
    math); only the mix reduction's multiply-by-active fusion may differ by
    rounding."""
    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    d = _fm_defaults(V, 12)
    gb = PallasVoiceBank(FMVoice(), V, voice_defaults=d, tile_rows=2,
                         event_capacity=1024)
    hb = PallasFMVoiceBank(V, voice_defaults=d, tile_rows=2,
                           event_capacity=1024)
    sched = _schedule(gb, {"freq": 555.0, "index": 2.5, "amp": 0.02})
    a, b, sa, sb = _run_pair(gb, hb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=5e-7)
    # idle latches agree (VoicePool auto-release source)
    np.testing.assert_array_equal(np.asarray(sa["idle"]), np.asarray(sb["idle"]))


def test_generic_fm_matches_vmap():
    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    d = _fm_defaults(V, 13)
    gb = PallasVoiceBank(FMVoice(), V, voice_defaults=d, tile_rows=2,
                         event_capacity=1024)
    vb = VoiceBank(FMVoice(), V, voice_defaults=d, event_capacity=1024)
    sched = _schedule(gb, {"freq": 555.0, "ratio": 3.0, "amp": 0.02})
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generic_sine_matches_vmap():
    """SineVoice body: EnvAsr (restart AND release triggers), exact Pan2."""
    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(14)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    gb = PallasVoiceBank(SineVoice(), V, voice_defaults=d, tile_rows=2,
                         event_capacity=1024)
    vb = VoiceBank(SineVoice(), V, voice_defaults=d, event_capacity=1024)
    sched = _schedule(gb, {"freq": 1234.0, "amp": 0.02, "pan": 0.9})
    sched[1].append((33, 6, gb.trig_index("t_release"), 1, 0.0))
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


class DetunedVoice(UGen):
    """A USER voice (not in the library): two detuned sines + AR envelope.
    The extensibility check — ~20 lines of mosaic body buy the fused-kernel
    path for a sound no hand-written bank covers."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 330.0),
        pfloat("detune", 1.003),
        pfloat("amp", 0.02),
        ptrigger("t_restart"),
    )

    def __init__(self, attack=0.004, release=0.2):
        from knaster_tpu import EnvAr, SinWt

        self.pdefaults = {"freq": 330.0, "detune": 1.003, "amp": 0.02}
        self.o1 = SinWt(330.0)
        self.o2 = SinWt(330.0)
        self.env = EnvAr(attack, release)
        self._attack = float(attack)
        self._release = float(release)

    def init(self, ctx):
        return {"o1": self.o1.init(ctx), "o2": self.o2.init(ctx),
                "env": self.env.init(ctx)}

    def process(self, ctx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        zeros = jnp.zeros((B,), ctx.dtype)
        no_trig = jnp.zeros((B,), bool)
        s1, o1, _ = normalize_process_result(self.o1.process(
            ctx, state["o1"], no_in,
            {"freq": params["freq"], "phase_offset": zeros,
             "reset_phase": no_trig}), ctx)
        s2, o2, _ = normalize_process_result(self.o2.process(
            ctx, state["o2"], no_in,
            {"freq": params["freq"] * params["detune"],
             "phase_offset": zeros, "reset_phase": no_trig}), ctx)
        se, env, done = normalize_process_result(self.env.process(
            ctx, state["env"], no_in,
            {"attack_time": jnp.full((B,), self._attack, ctx.dtype),
             "release_time": jnp.full((B,), self._release, ctx.dtype),
             "t_restart": params["t_restart"]}), ctx)
        out = (o1 + o2) * env * params["amp"]
        return {"o1": s1, "o2": s2, "env": se}, out, done

    def mosaic_voice(self, ctx):
        from knaster_tpu.parallel.pallas_bank import (
            _env_ar, _env_ar_free, _sin_quant, _to_inc,
        )
        from knaster_tpu.ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        atk = np.float32(1.0 / max(self._attack * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(self._release * ctx.sample_rate, 1.0))

        def body(i_f, carry, P, T):
            restart = T["t_restart"]
            stage, t = carry["stage"], carry["t"]
            if restart is None:
                env, stage, t = _env_ar_free(stage, t, atk, rel)
            else:
                env, stage, t = _env_ar(stage, t, restart, atk, rel)
            freq = P["freq"]
            s1 = _sin_quant(carry["p1"])
            s2 = _sin_quant(carry["p2"])
            p1 = carry["p1"] + _to_inc(freq * f2pi)
            p2 = carry["p2"] + _to_inc(freq * P["detune"] * f2pi)
            new = {"p1": p1, "p2": p2, "stage": stage, "t": t}
            return new, ((s1 + s2) * env * P["amp"],)

        return MosaicVoiceSpec(
            carry={"p1": (jnp.uint32, 0), "p2": (jnp.uint32, 0),
                   "stage": (ctx.dtype, 0.0), "t": (ctx.dtype, 0.0)},
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


def test_generic_custom_voice_matches_vmap():
    ctx = AudioCtx(SR, 64, np.float32)
    V = 256
    rng = np.random.default_rng(15)
    d = {"freq": rng.uniform(100, 900, V).astype(np.float32),
         "detune": rng.uniform(1.0, 1.01, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    gb = PallasVoiceBank(DetunedVoice(), V, voice_defaults=d, tile_rows=2,
                         event_capacity=1024)
    vb = VoiceBank(DetunedVoice(), V, voice_defaults=d, event_capacity=1024)
    sched = _schedule(gb, {"freq": 444.0, "detune": 1.02, "amp": 0.02})
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generic_bank_in_graph_engine():
    """The generic bank is a first-class graph node: per-voice handles,
    scheduled events, superblocked renders, state carry — parity with the
    hand-written kernel bank on the same program. (vmap parity is covered
    block-by-block above; over hundreds of frames FM phase feedback
    amplifies the documented kernel-vs-vmap rounding drift, so the
    in-graph reference is the bit-tight hand kernel.)"""

    def run(bank_cls):
        g, proc = AudioProcessor.new(0, 1, OPTS)
        d = {"freq": np.linspace(200, 400, 128).astype(np.float32),
             "amp": np.full(128, 0.05, np.float32)}
        bank = (PallasVoiceBank(FMVoice(), 128, voice_defaults=d, tile_rows=1)
                if bank_cls is PallasVoiceBank
                else bank_cls(128, voice_defaults=d, tile_rows=1))
        h = g.edit(lambda gg: (lambda b: (b.to_graph_out(), b)[1])(
            gg.push(bank)))
        h.voice_param("t_restart").trig(3)
        h.voice_param("t_restart").trig(70)
        r1 = np.asarray(proc.render(frames=256))
        h.voice_param("freq").set(3, 555.0)
        h.voice_param("amp").smooth(70, 0.002)
        h.voice_param("amp").set(70, 0.1)
        return r1, np.asarray(proc.render(frames=512))

    a1, a2 = run(PallasVoiceBank)
    b1, b2 = run(PallasFMVoiceBank)
    assert np.abs(b2).max() > 1e-3
    np.testing.assert_allclose(a1, b1, atol=1e-6)
    np.testing.assert_allclose(a2, b2, atol=1e-6)


def test_generic_subtractive_matches_hand_kernel():
    """SubtractiveVoice body (polyBLEP saw -> per-sample tan SVF -> EnvAsr)
    vs the hand-written PallasSubtractiveVoiceBank: bit-identical math."""
    from knaster_tpu import PallasSubtractiveVoiceBank, SubtractiveVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(16)
    d = {"freq": rng.uniform(60, 400, V).astype(np.float32),
         "cutoff": rng.uniform(400, 6000, V).astype(np.float32),
         "q": rng.uniform(0.6, 3.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    gb = PallasVoiceBank(SubtractiveVoice(), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    hb = PallasSubtractiveVoiceBank(V, voice_defaults=d, tile_rows=2,
                                    event_capacity=1024)
    sched = _schedule(gb, {"cutoff": 900.0, "freq": 220.0, "amp": 0.02})
    sched[1].append((33, 6, gb.trig_index("t_release"), 1, 0.0))
    a, b, sa, sb = _run_pair(gb, hb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=5e-7)
    np.testing.assert_array_equal(np.asarray(sa["idle"]), np.asarray(sb["idle"]))


def test_generic_subtractive_matches_vmap():
    from knaster_tpu import SubtractiveVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(17)
    d = {"freq": rng.uniform(60, 400, V).astype(np.float32),
         "cutoff": rng.uniform(400, 5000, V).astype(np.float32),
         "q": rng.uniform(0.6, 3.0, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    gb = PallasVoiceBank(SubtractiveVoice(), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    vb = VoiceBank(SubtractiveVoice(), V, voice_defaults=d,
                   event_capacity=1024)
    # the cutoff smoothing ramp is the classic filter sweep: per-sample
    # tan-based coefficients must track it inside the kernel
    sched = _schedule(gb, {"cutoff": 900.0, "freq": 220.0, "q": 1.5})
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_generic_additive_matches_hand_kernel():
    """AdditiveVoice body (phasor-recurrence partials, per-sample AA mask)
    vs the hand-written PallasWavetableVoiceBank. Pan moves are instant
    sets (both paths then use exact cos/sin gains; only MID-RAMP pan
    differs by design — the hand kernel's fast path rotates a phasor)."""
    from knaster_tpu import AdditiveVoice, PallasWavetableVoiceBank

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    rng = np.random.default_rng(18)
    mags = np.array([1.0, 0.5, 0.25, 0.125, 0.0625], np.float32)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    gb = PallasVoiceBank(AdditiveVoice(harmonics=mags), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    hb = PallasWavetableVoiceBank(V, harmonics=mags, voice_defaults=d,
                                  tile_rows=2, event_capacity=1024)
    # freq jump above half-nyquist: the per-sample AA mask must drop
    # partials at the exact event frame in both kernels
    sched = _schedule(gb, {"freq": 13000.0, "amp": 0.02, "pan": -0.7})
    sched[1].append((33, 6, gb.trig_index("t_release"), 1, 0.0))
    a, b, sa, sb = _run_pair(gb, hb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=5e-7)
    np.testing.assert_array_equal(np.asarray(sa["idle"]), np.asarray(sb["idle"]))


def test_generic_additive_matches_vmap():
    from knaster_tpu import AdditiveVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 256
    rng = np.random.default_rng(19)
    mags = np.array([1.0, 0.5, 0.25, 0.125], np.float32)
    d = {"freq": rng.uniform(100, 2000, V).astype(np.float32),
         "amp": np.full(V, 0.01, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32)}
    gb = PallasVoiceBank(AdditiveVoice(harmonics=mags), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    vb = VoiceBank(AdditiveVoice(harmonics=mags), V, voice_defaults=d,
                   event_capacity=1024)
    sched = _schedule(gb, {"freq": 13000.0, "amp": 0.02, "pan": -0.7})
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_generic_modal_matches_vmap():
    """ModalVoice body: M rotation-decay modes unrolled over the mode axis,
    EnvAr mallet, exact Pan2 — a mallet ensemble as one fused kernel. The
    vmap path evaluates the same recurrence through affine_scan_2x2_rows'
    combine tree, so parity is fma-reordering-bounded (~1e-7/block), plus
    the documented one-rounding exp-argument regrouping (mosaic_voice
    docstring)."""
    from knaster_tpu import ModalVoice
    from knaster_tpu.ugens.modal import ModalResonator

    ctx = AudioCtx(SR, 64, np.float32)
    V = 256
    rng = np.random.default_rng(23)
    d = {"freq": rng.uniform(200, 900, V).astype(np.float32),
         "amp": np.full(V, 0.2, np.float32),
         "pan": rng.uniform(-1, 1, V).astype(np.float32),
         "decay": rng.uniform(0.2, 3.0, V).astype(np.float32)}
    mk = lambda: ModalVoice(ModalResonator.bell(440.0), strike_ms=1.5,
                            done_threshold=1e-4)
    gb = PallasVoiceBank(mk(), V, voice_defaults=d, tile_rows=2,
                         event_capacity=1024)
    vb = VoiceBank(mk(), V, voice_defaults=d, event_capacity=1024)
    ts = gb.trig_index("t_strike")
    fi = {n: gb.float_index(n) for n in ("freq", "decay", "amp")}
    sched = {
        0: [(0, v, ts, 1, 0.0) for v in range(0, V, 3)],
        1: [(17, 5, fi["freq"], 0, 555.0),    # mid-block retune while ringing
            (26, 7, fi["decay"], 0, 0.05),    # choke a voice
            (40, 9, ts, 1, 0.0)],             # sample-accurate re-strike
        2: [(0, 9, fi["amp"], 4, 150.0),      # smoothing ramp
            (10, 9, ts, 1, 0.0)],
        3: None,
        4: [(50, 3, fi["freq"], 0, 30000.0)], # all modes cross Nyquist
        5: None,
    }
    a, b, sa, sb = _run_pair(gb, vb, ctx, sched, 6)
    assert np.abs(b).max() > 1e-3
    # bound: both executors drift O(t * ulp) in PHASE from the true f64
    # resonator (the vmap path via XLA cos/sin rounding through the scan
    # tree, the kernel via its <=2e-7 polynomial transcendentals — round-5
    # change that took the modal bank 2.35G -> 5.36G voice-samples/s), so
    # their MUTUAL divergence grows ~2.4e-7 rad/sample through a ringing
    # mode. 384 samples here -> ~1e-4; test_generic_modal_truth_parity
    # pins each path against an exact f64 replay so this bound can't
    # silently absorb a real defect.
    np.testing.assert_allclose(a, b, atol=1.5e-4)
    np.testing.assert_array_equal(np.asarray(sa["idle"]), np.asarray(sb["idle"]))


def test_generic_modal_truth_parity():
    """Both modal executors against an exact f64 replay of the recurrence:
    one struck voice, no events after the strike — truth is the f64
    rotation-decay recurrence driven by the f64 mallet pulse. Asserts each
    path stays within the same phase-drift bound of truth (neither
    executor is privileged; the A/B tolerance above is not hiding a
    defect in one of them)."""
    from knaster_tpu import ModalVoice
    from knaster_tpu.ugens.modal import _LN10_M3, ModalResonator

    ctx = AudioCtx(SR, 64, np.float32)
    n_blocks = 12
    T = 64 * n_blocks
    res = ModalResonator.bell(440.0)
    mk = lambda: ModalVoice(res, strike_ms=1.5, done_threshold=0.0)
    V = 128  # one lane row; only voice 0 is struck, the rest stay silent
    d = {"freq": np.full(V, 440.0, np.float32),
         "amp": np.full(V, 0.5, np.float32),
         "pan": np.zeros(V, np.float32),
         "decay": np.full(V, 1.7, np.float32)}
    gb = PallasVoiceBank(mk(), V, voice_defaults=d, event_capacity=64)
    vb = VoiceBank(mk(), V, voice_defaults=d, event_capacity=64)
    sched = {0: [(0, 0, gb.trig_index("t_strike"), 1, 0.0)]}
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, n_blocks)

    # f64 truth: the same mallet AR pulse and rotation-decay recurrence
    half = mk()._half
    atk_n = max(0.00075 * SR, 1.0)  # strike_ms/2 attack
    rel_n = max(0.00075 * SR, 1.0)
    t_env = 0.0
    stage = 1.0
    pulse = np.zeros(T)
    for i in range(T):
        if stage == 1.0:
            pulse[i] = t_env
            t_env += 1.0 / atk_n
            if t_env >= 1.0:
                stage, t_env = 2.0, 1.0
        elif stage == 2.0:
            pulse[i] = t_env ** 3
            t_env -= 1.0 / rel_n
            if t_env <= 0.0:
                stage, t_env = 0.0, 0.0
    inv_area = 1.0 / max(half * SR, 1.0)
    x = pulse * 0.5 * inv_area
    yt = np.zeros(T)
    for m in range(res.n_modes):
        theta = 2.0 * np.pi * 440.0 * float(res.ratios[m]) / SR
        if theta >= np.pi:
            continue
        r = np.exp(float(_LN10_M3) / (float(res.decays[m]) * SR * 1.7))
        s0 = s1 = 0.0
        for i in range(T):
            s0, s1 = (r * np.cos(theta) * s0 - r * np.sin(theta) * s1 + x[i],
                      r * np.sin(theta) * s0 + r * np.cos(theta) * s1)
            yt[i] += float(res.gains[m]) * s1
    # equal-power center pan
    yt = yt * np.cos(np.pi / 4.0)
    bound = 1e-5 + T * 3e-7
    err_kernel = np.abs(a[0] - yt).max()
    err_vmap = np.abs(b[0] - yt).max()
    assert np.abs(yt).max() > 1e-3
    assert err_kernel < bound, err_kernel
    assert err_vmap < bound, err_vmap


def test_generic_modal_pool_reclaims():
    """Choked modal voices go idle in-kernel (struck & quiet & mallet done)
    so VoicePool auto-release works at fused-bank scale."""
    from knaster_tpu import ModalVoice
    from knaster_tpu.ugens.modal import ModalResonator

    ctx = AudioCtx(SR, 64, np.float32)
    V = 128
    d = {"decay": np.full(V, 0.004, np.float32),
         "amp": np.full(V, 0.3, np.float32)}
    gb = PallasVoiceBank(
        ModalVoice(ModalResonator.bar(300.0), strike_ms=0.5,
                   done_threshold=1e-3),
        V, voice_defaults=d, tile_rows=1, event_capacity=256)
    st = gb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    ev = gb.node_events_from_lists(
        [(0, v, gb.trig_index("t_strike"), 1, 0.0) for v in range(8)])
    st, _ = gb.process(ctx, st, no_in, {}, events=ev)[:2]
    assert not np.asarray(st["idle"])[:8].any()
    for _ in range(40):  # ~53 ms: a 4 ms T60 bar is long gone
        st, _ = gb.process(ctx, st, no_in, {}, events=None)[:2]
    idle = np.asarray(st["idle"])
    assert idle[:8].all()
    assert not idle[8:].any()  # never-struck voices are not reclaimable


def test_sharded_generic_bank_matches_unsharded():
    """make_local shards the generic bank over the mesh like any bank."""
    import jax

    from knaster_tpu import ShardedVoiceBank

    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    ctx = AudioCtx(SR, 64, np.float32)
    V = 128 * n_dev * 2
    d = _fm_defaults(V, 21)
    bank = PallasVoiceBank(FMVoice(), V, voice_defaults=d, tile_rows=1,
                           event_capacity=512)
    sb = ShardedVoiceBank(bank, mesh, ctx)
    events = [(0, v, bank.trig_index("t_restart"), 1, 0.0)
              for v in range(0, V, 7)]
    st = sb.init_state()
    st, o1 = sb.step(st, sb.events_from_lists(events))
    st, o2 = sb.step(st, sb.empty_events())
    sharded = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)

    ust = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    ust, u1 = bank.process(ctx, ust, no_in, {},
                           events=bank.node_events_from_lists(events))
    ust, u2 = bank.process(ctx, ust, no_in, {},
                           events=bank.empty_node_events())
    unsharded = np.concatenate([np.asarray(u1), np.asarray(u2)], axis=1)
    assert np.abs(unsharded).max() > 1e-5
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


def test_generic_bank_rejects_unsupported_voices():
    from knaster_tpu.models.voices import SamplerVoice

    class IntVoice(DetunedVoice):
        params = DetunedVoice.params + (pinteger("mode", 0),)

    with pytest.raises(ValueError, match="integer params"):
        PallasVoiceBank(IntVoice(), 128)
    with pytest.raises(ValueError, match="mosaic_voice"):
        PallasVoiceBank(SamplerVoice(np.zeros(4096, np.float32)), 128)


def _env4():
    from knaster_tpu.ugens.envelopes import Envelope

    # 4 segments, 3 shapes, short enough to finish inside a 10-block run
    return Envelope(0.0, [
        (0.001, 1.0), (0.002, 0.5), (0.002, 0.75, "sinusoidal"),
        (0.003, 0.0),
    ])


def _env_defaults(V, seed=21):
    rng = np.random.default_rng(seed)
    return {
        "freq": rng.uniform(100, 800, V).astype(np.float32),
        "amp": np.full(V, 0.01, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
        "time_scale": rng.uniform(0.5, 2.0, V).astype(np.float32),
    }


def test_envelope_voice_kernel_matches_vmap():
    """EnvelopeVoice (multi-segment Envelope, VERDICT r3 #7): the unrolled
    segment-table fold in the kernel matches the engine's Envelope.process
    scan on the vmap path — restarts, per-voice time_scale, smoothing
    ramps, shapes."""
    from knaster_tpu import EnvelopeVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 512
    d = _env_defaults(V)
    gb = PallasVoiceBank(EnvelopeVoice(_env4()), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    vb = VoiceBank(EnvelopeVoice(_env4()), V, voice_defaults=d,
                   event_capacity=1024)
    sched = _schedule(gb, {"freq": 555.0, "time_scale": 1.5, "amp": 0.02})
    a, b, sa, sb = _run_pair(gb, vb, ctx, sched, 10)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_envelope_voice_idle_latch_and_restart():
    """The envelope-FINISHED bit is the idle latch: restarted voices whose
    program ran out latch idle in the kernel; a voice restarted late stays
    un-idle; t_stop freezes a voice at its current (audible) value, so it
    is NOT idle — matching the vmap path's Envelope done bit (advisor
    round-4 finding: the pool must never auto-reclaim an audible voice)."""
    from knaster_tpu import EnvelopeVoice

    ctx = AudioCtx(SR, 64, np.float32)
    V = 256
    d = _env_defaults(V, 22)
    gb = PallasVoiceBank(EnvelopeVoice(_env4()), V, voice_defaults=d,
                         tile_rows=2, event_capacity=1024)
    st = gb.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    ti_restart = gb.trig_index("t_restart")
    ti_stop = gb.trig_index("t_stop")
    # restart voices 0..9 at block 0 (the only point the raw-event test
    # can observe the latch: clearing a latched idle is a pool kind-5
    # event, not a trigger side effect); stop voice 8 mid-flight
    for blk in range(10):
        evs = None
        if blk == 0:
            evs = [(0, v, ti_restart, 1, 0.0) for v in range(10)]
        elif blk == 2:
            evs = [(30, 8, ti_stop, 1, 0.0)]
        elif blk == 9:
            evs = [(0, 9, ti_restart, 1, 0.0)]
        ep = gb.node_events_from_lists(evs) if evs else None
        st, _ = gb.process(ctx, st, no_in, {}, events=ep)[:2]
    idle = np.asarray(st["idle"])
    # 8ms envelope at time_scale<=2 => <=16 ms < 9 blocks (12 ms)... voices
    # with slow time_scale may still run; check a fast-scale one finished
    ts = d["time_scale"]
    done_expected = [v for v in range(8) if ts[v] * 0.008 < 0.011]
    assert done_expected, "test fixture: no fast voice"
    assert idle[done_expected].all()
    assert not idle[8]       # stopped via t_stop: frozen mid-flight, audible
    assert not idle[9]       # restarted in the final block


def test_envelope_voice_looping_never_idles():
    """looping=True wraps to segment 0 and never finishes: the idle latch
    stays clear and the envelope keeps cycling (LFO-style programs)."""
    from knaster_tpu import EnvelopeVoice
    from knaster_tpu.ugens.envelopes import Envelope

    env = Envelope(0.0, [(0.001, 1.0), (0.001, 0.0)], looping=True)
    ctx = AudioCtx(SR, 64, np.float32)
    V = 128
    d = {"freq": np.full(V, 300.0, np.float32),
         "amp": np.full(V, 0.01, np.float32)}
    gb = PallasVoiceBank(EnvelopeVoice(env), V, voice_defaults=d,
                         tile_rows=1, event_capacity=256)
    vb = VoiceBank(EnvelopeVoice(env), V, voice_defaults=d,
                   event_capacity=256)
    sched = {0: [(0, v, gb.trig_index("t_restart"), 1, 0.0)
                 for v in range(V)]}
    a, b, sa, sb = _run_pair(gb, vb, ctx, sched, 8)
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert not np.asarray(sa["idle"]).any()
    # still audible at the end: the loop really cycles
    assert np.abs(a[:, -64:]).max() > 1e-4


def test_envelope_voice_exponential_shape_close():
    """Exponential segments: the kernel's exp/log geometric form vs the
    engine's pow — same curve within float tolerance."""
    from knaster_tpu import EnvelopeVoice
    from knaster_tpu.ugens.envelopes import Envelope

    env = Envelope(0.001, [(0.002, 1.0, "exponential"),
                           (0.004, 0.001, "exponential"),
                           (0.002, 0.5), (0.002, 0.0)])
    ctx = AudioCtx(SR, 64, np.float32)
    V = 128
    d = {"freq": np.full(V, 440.0, np.float32),
         "amp": np.full(V, 0.02, np.float32)}
    gb = PallasVoiceBank(EnvelopeVoice(env), V, voice_defaults=d,
                         tile_rows=1, event_capacity=256)
    vb = VoiceBank(EnvelopeVoice(env), V, voice_defaults=d,
                   event_capacity=256)
    sched = {0: [(0, v, gb.trig_index("t_restart"), 1, 0.0)
                 for v in range(V)]}
    a, b, _, _ = _run_pair(gb, vb, ctx, sched, 8)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-4)
