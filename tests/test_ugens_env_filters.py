"""Envelope & filter UGen tests vs independent numpy per-sample references.

The numpy models re-implement the reference's per-sample semantics
(envelopes.rs, svf.rs, onepole.rs) directly; our block/scan implementations
must match them sample-exactly (within f32 noise).
"""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Seconds,
)
from knaster_tpu.ugens.envelopes import EnvAr, EnvAsr, Envelope
from knaster_tpu.ugens.filters import OnePoleHpf, OnePoleLpf, SvfFilter, SvfFilterType
from knaster_tpu.ugens.pan import Pan2
from knaster_tpu.ugens.dynamics import SafetyLimiter

SR = 48000
OPTS = AudioProcessorOptions(block_size=16, sample_rate=SR)


def _samples(n):
    return Seconds.from_samples(n, SR)


# ---------------------------------------------------------------- envelopes
def np_env_asr(n, atk_rate, rel_rate, restarts, releases):
    """Per-sample port of EnvAsr::next_sample (envelopes.rs:52-80)."""
    out = np.zeros(n, np.float32)
    stage, t, scale = 0, np.float32(0), np.float32(1)
    for i in range(n):
        if i in restarts:
            stage = 1
        if i in releases:
            if stage == 1:
                scale, stage, t = t, 3, np.float32(1)
            elif stage == 2:
                scale, stage, t = np.float32(1), 3, np.float32(1)
        if stage == 1:
            out[i] = t
            t += np.float32(atk_rate)
            if t >= 1:
                stage = 2
        elif stage == 2:
            out[i] = 1
        elif stage == 3:
            out[i] = t * t * t * scale
            t -= np.float32(rel_rate)
            if t <= 0:
                stage, t = 0, np.float32(0)
    return out


def test_env_asr_exact():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push(EnvAsr(8 / SR, 4 / SR))
        e.to_graph_out()
        return e.param("t_restart"), e.param("t_release")

    restart, release = g.edit(build)
    restart.trig_at(_samples(2))
    release.trig_at(_samples(20))
    out = np.concatenate(
        [(proc.run_without_inputs(), proc.output_block()[0])[1] for _ in range(3)]
    )
    expected = np_env_asr(48, 1 / 8, 1 / 4, {2}, {20})
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_env_asr_early_release_scaled():
    """Releasing mid-attack scales the cubic release by the attack value."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push(EnvAsr(16 / SR, 8 / SR))
        e.to_graph_out()
        return e.param("t_restart"), e.param("t_release")

    restart, release = g.edit(build)
    restart.trig_at(_samples(0))
    release.trig_at(_samples(8))  # mid-attack at t = 0.5
    proc.run_without_inputs()
    out = proc.output_block()[0]
    expected = np_env_asr(16, 1 / 16, 1 / 8, {0}, {8})
    np.testing.assert_allclose(out, expected, atol=1e-6)
    assert expected[8] == pytest.approx(0.5)  # release starts from scale*1^3


def test_env_ar_oneshot_and_done():
    from knaster_tpu import Done

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push_with_done_action(EnvAr(4 / SR, 4 / SR), Done.FREE_SELF)
        e.to_graph_out()
        return e.param("t_restart"), e.id()

    restart, eid = g.edit(build)
    restart.trig()
    proc.run_without_inputs()
    out = proc.output_block()[0]
    # linear attack 4 samples: 0, .25, .5, .75, then release from 1: 1, ...
    np.testing.assert_allclose(out[:4], [0, 0.25, 0.5, 0.75], atol=1e-6)
    assert out[4] == pytest.approx(1.0)
    # env finished within the block -> node freed by done action
    assert eid not in g.nodes
    proc.run_without_inputs()
    assert np.all(proc.output_block() == 0)


def test_envelope_segments_and_loop():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push(Envelope(0.0, [(4 / SR, 1.0), (4 / SR, 0.5)]))
        e.to_graph_out()
        return e.param("t_restart")

    restart = g.edit(build)
    restart.trig()
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_allclose(out[:4], [0, 0.25, 0.5, 0.75], atol=1e-6)
    # second segment ramps 1.0 -> 0.5
    np.testing.assert_allclose(out[4:8], [1.0, 0.875, 0.75, 0.625], atol=1e-6)
    # then holds the final value
    np.testing.assert_allclose(out[9:], 0.5, atol=1e-6)


def test_envelope_shapes_exact():
    """Per-segment shapes: sinusoidal, exponential, step (envelopes.rs:339-348
    declares the enum; evaluation semantics are ours, documented)."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push(
            Envelope(
                0.0,
                [
                    (4 / SR, 1.0, "sinusoidal"),
                    (4 / SR, 0.5, "exponential"),
                    (4 / SR, 0.25, "step"),
                ],
            )
        )
        e.to_graph_out()
        return e.param("t_restart")

    restart = g.edit(build)
    restart.trig()
    proc.run_without_inputs()
    out = proc.output_block()[0]
    # seg 0: raised cosine 0 -> 1 over 4 samples
    exp0 = [(1 - np.cos(np.pi * f / 4)) / 2 for f in range(4)]
    np.testing.assert_allclose(out[:4], exp0, atol=1e-6)
    assert out[4] == pytest.approx(1.0)  # boundary sample emits target
    # seg 1: geometric 1 -> 0.5, frac = t/4 with t starting at 1
    exp1 = [0.5 ** (f / 4) for f in (1, 2, 3)]
    np.testing.assert_allclose(out[5:8], exp1, rtol=1e-6)
    assert out[8] == pytest.approx(0.5)
    # seg 2: step -> target immediately, then holds after finish
    np.testing.assert_allclose(out[9:], 0.25, atol=1e-6)


def test_envelope_repeat_jump_reapplies():
    """Two consecutive set events to the SAME segment index must each re-jump
    (reference param_apply runs per event, envelopes.rs:488-508). Also covers
    the initial set-to-segment-0 case that value-change detection misses."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        e = g.push(Envelope(0.0, [(8 / SR, 1.0)]))
        e.to_graph_out()
        return e.param("jump_to_segment")

    jump = g.edit(build)
    jump.set_at(0, _samples(0))  # first set: value unchanged from default 0
    jump.set_at(0, _samples(4))  # repeated set: must re-jump
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_allclose(out[:4], [0, 0.125, 0.25, 0.375], atol=1e-6)
    # re-jump at sample 4 restarts the ramp (from_value stays 0.0)
    np.testing.assert_allclose(out[4:12], np.arange(8) / 8, atol=1e-6)
    assert out[12] == pytest.approx(1.0)
    np.testing.assert_allclose(out[13:], 1.0, atol=1e-6)


# ------------------------------------------------------------------ filters
def np_svf(x, ty, cutoff, q, gain_db, sr):
    """Per-sample port of SvfFilter (svf.rs:150-300), f32 math."""
    f32 = np.float32
    g = np.tan(np.pi * f32(cutoff) / f32(sr)).astype(f32)
    amp = f32(10.0) ** (f32(gain_db) / f32(40.0))
    if ty == SvfFilterType.Bell:
        g = f32(np.tan(np.pi * cutoff / sr) / np.sqrt(amp))
        k = f32(1.0 / (q * amp))
    elif ty == SvfFilterType.LowShelf:
        g = f32(np.tan(np.pi * cutoff / sr) / np.sqrt(amp))
        k = f32(1.0 / q)
    elif ty == SvfFilterType.HighShelf:
        g = f32(np.tan(np.pi * cutoff / sr) * np.sqrt(amp))
        k = f32(1.0 / q)
    else:
        k = f32(1.0 / q)
    a1 = f32(1.0) / (f32(1.0) + g * (g + k))
    a2 = g * a1
    a3 = g * a2
    table = {
        SvfFilterType.Low: (0, 0, 1),
        SvfFilterType.Band: (0, 1, 0),
        SvfFilterType.High: (1, -k, -1),
        SvfFilterType.Notch: (1, -k, 0),
        SvfFilterType.Peak: (1, -k, -2),
        SvfFilterType.All: (1, -2 * k, 0),
        SvfFilterType.Bell: (1, k * (amp * amp - 1), 0),
        SvfFilterType.LowShelf: (1, k * (amp - 1), amp * amp - 1),
        SvfFilterType.HighShelf: (amp * amp, k * (1 - amp) * amp, 1 - amp * amp),
    }
    m0, m1, m2 = [f32(v) for v in table[ty]]
    ic1 = ic2 = f32(0)
    y = np.zeros_like(x)
    for i, v0 in enumerate(x.astype(f32)):
        v3 = v0 - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = f32(2) * v1 - ic1
        ic2 = f32(2) * v2 - ic2
        y[i] = m0 * v0 + m1 * v1 + m2 * v2
    return y


@pytest.mark.parametrize(
    "ty", [SvfFilterType.Low, SvfFilterType.High, SvfFilterType.Band,
           SvfFilterType.Notch, SvfFilterType.Peak, SvfFilterType.All,
           SvfFilterType.Bell, SvfFilterType.LowShelf, SvfFilterType.HighShelf]
)
def test_svf_matches_reference_model(ty):
    rng = np.random.default_rng(42)
    x = rng.standard_normal(64).astype(np.float32)
    g, proc = AudioProcessor.new(1, 1, AudioProcessorOptions(block_size=64))

    def build(g):
        f = g.push(SvfFilter(ty, 1234.0, 1.3, 6.0))
        g.from_inputs(0).to(f)
        f.to_graph_out()

    g.edit(build)
    proc.run(x[None, :])
    out = proc.output_block()[0]
    ref = np_svf(x, ty, 1234.0, 1.3, 6.0, 48000)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_onepole_lp_hp():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64).astype(np.float32)
    f32 = np.float32
    b1 = f32(np.exp(-2.0 * np.pi * 2000.0 / 48000.0))
    a0 = f32(1.0) - b1
    y = np.zeros_like(x)
    last = f32(0)
    for i in range(64):
        last = x[i] * a0 + last * b1
        y[i] = last

    for cls, expected in ((OnePoleLpf, y), (OnePoleHpf, x - y)):
        g, proc = AudioProcessor.new(1, 1, AudioProcessorOptions(block_size=64))

        def build(gg):
            f = gg.push(cls(2000.0))
            gg.from_inputs(0).to(f)
            f.to_graph_out()

        g.edit(build)
        proc.run(x[None, :])
        np.testing.assert_allclose(proc.output_block()[0], expected, atol=1e-5)


def test_filter_state_across_blocks():
    """Filter memory must carry across block boundaries."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(128).astype(np.float32)
    g, proc = AudioProcessor.new(1, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        f = gg.push(SvfFilter(SvfFilterType.Low, 500.0, 0.7071, 0.0))
        gg.from_inputs(0).to(f)
        f.to_graph_out()

    g.edit(build)
    outs = []
    for b in range(8):
        proc.run(x[None, b * 16 : (b + 1) * 16])
        outs.append(proc.output_block()[0].copy())
    out = np.concatenate(outs)
    ref = np_svf(x, SvfFilterType.Low, 500.0, 0.7071, 0.0, 48000)
    np.testing.assert_allclose(out, ref, atol=2e-4)


# ----------------------------------------------------------------- pan/util
def test_pan2():
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        from tests.utils import TestNumUGen

        n = gg.push(TestNumUGen(1.0))
        p = gg.push(Pan2(0.0))
        n.to(p)
        p.to_graph_out()
        return p.param("pan")

    pan = g.edit(build)
    proc.run_without_inputs()
    out = proc.output_block()
    # center: equal power, cos(pi/4) both sides
    assert out[0, 0] == pytest.approx(np.cos(np.pi / 4), abs=1e-6)
    assert out[1, 0] == pytest.approx(np.sin(np.pi / 4), abs=1e-6)
    pan.set(-1.0)  # hard left
    proc.run_without_inputs()
    out = proc.output_block()
    assert out[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert out[1, 0] == pytest.approx(0.0, abs=1e-6)


def test_safety_limiter():
    g, proc = AudioProcessor.new(1, 1, OPTS)

    def build(gg):
        f = gg.push(SafetyLimiter())
        gg.from_inputs(0).to(f)
        f.to_graph_out()

    g.edit(build)
    x = np.array([[0.5, 2.0, -3.0, np.nan] + [0.0] * 12], dtype=np.float32)
    proc.run(x)
    out = proc.output_block()[0]
    np.testing.assert_array_equal(out[:4], [0.5, 1.0, -1.0, 0.0])


def test_envelope_closed_form_matches_scan():
    """The event-free fast path's closed-form envelopes (no scan) match
    the per-sample state machine from every reachable state — at most one
    spontaneous transition per block for ASR, two for AR. Differences are
    pure float reassociation (cumsum vs repeated addition), < 5e-5."""
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx
    from knaster_tpu.ugens.envelopes import (
        ATTACKING,
        RELEASING,
        STOPPED,
        SUSTAINING,
        EnvAr,
        EnvAsr,
    )

    B = 64
    ctx_ev = AudioCtx(SR, B, np.float32, no_events=False)
    ctx_cf = AudioCtx(SR, B, np.float32, no_events=True)
    rng = np.random.default_rng(0)
    no_in = jnp.zeros((0, B), np.float32)

    def params_for(env, atk_t, rel_t):
        p = {
            "attack_time": jnp.full((B,), atk_t, np.float32),
            "release_time": jnp.full((B,), rel_t, np.float32),
            "t_restart": jnp.zeros((B,), bool),
        }
        if any(q.name == "t_release" for q in env.params):
            p["t_release"] = jnp.zeros((B,), bool)
        return p

    for cls in (EnvAsr, EnvAr):
        stages = [STOPPED, ATTACKING, SUSTAINING, RELEASING]
        if cls is EnvAr:
            stages = [STOPPED, ATTACKING, RELEASING]
        for trial in range(80):
            stage = int(rng.choice(stages))
            t0 = float(rng.uniform(0, 1.2)) if stage != STOPPED else 0.0
            rs = float(rng.uniform(0.1, 1.0))
            atk_t = float(rng.choice([0.0, 0.0003, 0.001, 0.01, 0.5]))
            rel_t = float(rng.choice([0.0, 0.0003, 0.001, 0.01, 0.5]))
            env = cls(atk_t, rel_t)
            st = {"stage": jnp.asarray(stage, jnp.int32),
                  "t": jnp.asarray(t0, np.float32),
                  "release_scale": jnp.asarray(rs, np.float32)}
            p = params_for(env, atk_t, rel_t)
            s1, o1, d1 = env.process(ctx_ev, dict(st), no_in, p)
            s2, o2, d2 = env.process(ctx_cf, dict(st), no_in, p)
            label = (cls.__name__, trial, stage, t0, atk_t, rel_t)
            assert (np.asarray(d1) == np.asarray(d2)).all(), label
            assert int(s1["stage"]) == int(s2["stage"]), label
            np.testing.assert_allclose(
                np.asarray(o1), np.asarray(o2), atol=5e-5, err_msg=str(label)
            )
            assert abs(float(s1["t"]) - float(s2["t"])) < 2e-5, label
