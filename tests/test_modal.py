"""Modal synthesis (beyond reference): ModalResonator exactness vs a numpy
closed form, linearity, Nyquist masking, block-partition continuity, T60
calibration; ModalVoice bank strikes and VoicePool auto-release."""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Buffer,
    BufferReader,
    ModalResonator,
    VoiceBank,
    VoicePool,
)
from knaster_tpu.models import ModalVoice

SR = 48000


def _np_impulse_response(n, freq, decay, ratios, gains, decays, x0=1.0, sr=SR):
    """y[n] = x0 * sum_m g_m * r_m^n * sin(n*theta_m), modes above Nyquist
    silent — the exact closed form of the rotation-decay recurrence."""
    t = np.arange(n, dtype=np.float64)
    y = np.zeros(n, np.float64)
    for rat, g, rel in zip(ratios, gains, decays):
        f = freq * rat
        theta = 2.0 * np.pi * f / sr
        if theta >= np.pi:
            continue
        r = 10.0 ** (-3.0 / max(decay * rel * sr, 1e-4))
        y += g * (r ** t) * np.sin(t * theta)
    return (x0 * y).astype(np.float32)


def _render_impulse(res, n, block=64, x0=1.0):
    opts = AudioProcessorOptions(block_size=block, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)
    x = np.zeros(max(n, block), np.float32)
    x[0] = x0

    def build(gg):
        exc = gg.push(BufferReader(Buffer(x[None, :], SR)))
        r = gg.push(res)
        exc.to(r)
        r.to_graph_out()
        return r

    g.edit(build)
    return proc.render(frames=n)[0]


def test_single_mode_matches_closed_form():
    got = _render_impulse(
        ModalResonator(freq=440.0, decay=0.5, ratios=(1.0,)), 1024
    )
    want = _np_impulse_response(1024, 440.0, 0.5, (1.0,), (1.0,), (1.0,))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_multi_mode_is_sum_of_single_modes():
    ratios, gains, decays = (1.0, 2.7, 5.4), (1.0, 0.5, 0.25), (1.0, 0.6, 0.3)
    got = _render_impulse(
        ModalResonator(freq=220.0, decay=0.4, ratios=ratios, gains=gains,
                       decays=decays),
        768,
    )
    want = _np_impulse_response(768, 220.0, 0.4, ratios, gains, decays)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mode_above_nyquist_is_silent():
    # second mode at 200*150 = 30 kHz > Nyquist: must contribute nothing
    got = _render_impulse(
        ModalResonator(freq=200.0, decay=0.3, ratios=(1.0, 150.0)), 512
    )
    want = _render_impulse(
        ModalResonator(freq=200.0, decay=0.3, ratios=(1.0,)), 512
    )
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_block_partition_continuity():
    a = _render_impulse(ModalResonator.bell(330.0, decay=1.0), 512, block=32)
    b = _render_impulse(ModalResonator.bell(330.0, decay=1.0), 512, block=128)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_t60_calibration():
    """After decay seconds the envelope of a single mode is -60 dB."""
    decay = 0.25
    n60 = int(decay * SR)
    y = _render_impulse(
        ModalResonator(freq=100.0, decay=decay, ratios=(1.0,)), n60 + 512
    )
    early = np.abs(y[:512]).max()
    late = np.abs(y[n60 : n60 + 512]).max()
    assert early > 0.5
    np.testing.assert_allclose(late / early, 1e-3, rtol=0.25)


@pytest.mark.parametrize(
    "preset", ["bell", "bar", "string", "membrane"]
)
def test_presets_ring(preset):
    res = getattr(ModalResonator, preset)(220.0)
    y = _render_impulse(res, 2048)
    assert np.isfinite(y).all()
    assert np.abs(y).max() > 1e-3
    # it rings: energy well past the strike
    assert np.abs(y[1024:]).max() > 1e-4


def test_audio_rate_freq_is_finite_and_continuous():
    """Ramping freq across blocks must not glitch state (coefficients are
    per-sample; state carries across the ramp)."""
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)
    x = np.zeros(64, np.float32)
    x[0] = 1.0

    def build(gg):
        exc = gg.push(BufferReader(Buffer(x[None, :], SR)))
        r = gg.push(ModalResonator(freq=300.0, decay=1.0, ratios=(1.0,)))
        exc.to(r)
        r.to_graph_out()
        return r

    h = g.edit(build)
    h.param("freq").smooth(0.02)
    h.param("freq").set(900.0)
    y = proc.render(frames=4096)[0]
    assert np.isfinite(y).all()
    # no sample-to-sample jump larger than physically possible for a
    # decaying unit-impulse response
    assert np.abs(np.diff(y)).max() < 0.5


def test_modal_voice_bank_strike_sample_accurate():
    from knaster_tpu.primitives.time import Seconds

    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)

    def make():
        g, proc = AudioProcessor.new(0, 2, opts)

        def build(gg):
            bank = gg.push(VoiceBank(ModalVoice(freq=440.0, amp=0.5), 4))
            bank.to_graph_out()
            return bank

        return g, proc, g.edit(build)

    g, proc, bank = make()
    bank.voice_param("freq").set(0, 440.0)
    bank.voice_param("freq").set(2, 660.0)
    bank.voice_param("t_strike").trig(0)
    bank.voice_param("t_strike").trig_at(2, Seconds.from_samples(100, SR))
    a = proc.render(frames=256)

    g2, p2, b2 = make()
    b2.voice_param("freq").set(0, 440.0)
    b2.voice_param("t_strike").trig(0)
    only0 = p2.render(frames=256)

    # graph `a`'s block 1 is eventful (trig@100) and runs the full program,
    # whose EnvAr takes the trigger-machinery scan; only0's block 1 is
    # event-free and takes the closed form — the documented <=1e-6
    # reassociation class (DESIGN_NOTES "Closed-form envelopes"), amplified
    # by the bell's summed mode gains.
    np.testing.assert_allclose(a[:, :100], only0[:, :100], atol=1e-5)
    assert not np.allclose(a[:, 110:], only0[:, 110:], atol=1e-3)


def test_modal_voice_done_and_pool_auto_release():
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 2, opts)
    res = ModalResonator(freq=880.0, decay=0.02, ratios=(1.0, 2.5),
                         gains=(1.0, 0.5), decays=(1.0, 0.5))

    def build(gg):
        bank = gg.push(
            VoiceBank(ModalVoice(resonator=res, amp=0.5,
                                 done_threshold=1e-4),
                      4, event_capacity=64)
        )
        bank.to_graph_out()
        return bank

    bank = g.edit(build)
    pool = VoicePool(proc, bank, note_on_trigger="t_strike")
    v = pool.note_on({"freq": 880.0, "amp": 0.5})
    assert v is not None
    out = proc.render(frames=SR // 4)  # 250 ms >> strike + 20 ms T60
    assert np.abs(out).max() > 1e-3
    pool.refresh()
    assert pool.free_count == pool.n_voices
