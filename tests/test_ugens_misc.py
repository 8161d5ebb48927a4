"""Noise, polyblep, delay, buffer, closure UGen tests."""

import numpy as np
import pytest

from knaster_tpu import (
    AllpassFeedbackDelay,
    AudioProcessor,
    AudioProcessorOptions,
    Buffer,
    BufferReader,
    BrownNoise,
    Done,
    PinkNoise,
    PolyBlep,
    RandomLin,
    SampleDelay,
    Seconds,
    StaticSampleDelay,
    Waveform,
    WhiteNoise,
    ugen_from_sample_fn,
)

SR = 48000
OPTS64 = AudioProcessorOptions(block_size=64, sample_rate=SR)


def _render(build, seconds=None, frames=None, outputs=1, inputs=0, opts=OPTS64,
            in_data=None):
    g, proc = AudioProcessor.new(inputs, outputs, opts)
    g.edit(build)
    return proc.render(seconds=seconds, frames=frames, inputs=in_data), g, proc


# ------------------------------------------------------------------- noise
def test_white_noise_statistics():
    a, _, _ = _render(lambda g: g.push(WhiteNoise()).to_graph_out(), seconds=1.0)
    x = a[0]
    assert abs(x.mean()) < 0.02
    assert 0.5 < x.std() < 0.65  # uniform(-1,1) std = 0.577
    assert np.abs(x).max() <= 1.0
    # different blocks differ (counter advances)
    assert not np.allclose(x[:64], x[64:128])


def test_white_noise_deterministic_per_seed():
    a, _, _ = _render(lambda g: g.push(WhiteNoise(seed=5)).to_graph_out(), frames=256)
    b, _, _ = _render(lambda g: g.push(WhiteNoise(seed=5)).to_graph_out(), frames=256)
    np.testing.assert_array_equal(a, b)


def test_pink_noise_spectrum_slope():
    a, _, _ = _render(lambda g: g.push(PinkNoise()).to_graph_out(), seconds=2.0)
    x = a[0]
    assert np.abs(x).max() <= 1.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / SR)
    lo = spec[(freqs > 20) & (freqs < 200)].mean()
    hi = spec[(freqs > 2000) & (freqs < 20000)].mean()
    # pink: ~3dB/octave falloff -> energy density ratio across 2 decades large
    assert lo / hi > 10


def test_brown_noise_bounded_and_low_heavy():
    a, _, _ = _render(lambda g: g.push(BrownNoise()).to_graph_out(), seconds=1.0)
    x = a[0]
    assert np.abs(x).max() <= 1.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / SR)
    assert spec[(freqs > 10) & (freqs < 100)].mean() > 100 * spec[freqs > 5000].mean()


def test_random_lin_range_and_rate():
    a, _, _ = _render(lambda g: g.push(RandomLin(100.0)).to_graph_out(), seconds=1.0)
    x = a[0]
    assert 0.0 <= x.min() and x.max() <= 1.0
    # piecewise linear: second difference is ~0 except at breakpoints
    dd = np.abs(np.diff(np.diff(x)))
    breaks = (dd > 1e-4).sum()
    assert 50 < breaks < 300  # ~100 new values/second


# ----------------------------------------------------------------- polyblep
@pytest.mark.parametrize("wf", list(Waveform))
def test_polyblep_all_waveforms_finite(wf):
    a, _, _ = _render(
        lambda g: g.push(PolyBlep(wf, 220.0)).to_graph_out(), frames=4096
    )
    assert np.isfinite(a).all()
    assert np.abs(a).max() < 2.01


def test_polyblep_saw_shape_and_antialiasing():
    a, _, _ = _render(
        lambda g: g.push(PolyBlep(Waveform.Sawtooth, 375.0)).to_graph_out(),
        frames=SR,
    )
    x = a[0]
    # saw at 375 Hz = 128 samples/cycle, ramps -1..1
    assert x.max() > 0.95 and x.min() < -0.95
    # aliasing check: energy above 21kHz should be tiny vs naive saw
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / SR)
    naive = np.cumsum(np.full(SR, 2 * 375.0 / SR)) % 2.0 - 1.0
    nspec = np.abs(np.fft.rfft(naive * np.hanning(len(naive))))
    hf = (freqs > 18000) & (freqs < 23900)
    # exclude bins near harmonics of 375 to measure the alias floor
    alias_bins = hf & (np.abs((freqs / 375.0) - np.round(freqs / 375.0)) > 0.2)
    assert spec[alias_bins].mean() < 0.12 * nspec[alias_bins].mean()


def test_polyblep_square_duty_cycle():
    a, _, _ = _render(
        lambda g: g.push(PolyBlep(Waveform.Square, 100.0)).to_graph_out(),
        frames=4800,
    )
    duty = (a[0] > 0).mean()
    assert abs(duty - 0.5) < 0.02


# ------------------------------------------------------------------- delays
def test_sample_delay_exact():
    def build(g):
        d = g.push(SampleDelay(Seconds.from_samples(100, SR)))
        g.from_inputs(0).to(d)
        d.to_graph_out()
        d.param("delay_time").set(Seconds.from_samples(10, SR).to_secs_f64())

    x = np.zeros((1, 128), np.float32)
    x[0, 3] = 1.0
    a, _, _ = _render(build, frames=128, inputs=1, in_data=x)
    expected = np.zeros(128, np.float32)
    expected[13] = 1.0
    np.testing.assert_array_equal(a[0], expected)


def test_sample_delay_zero_passthrough():
    def build(g):
        d = g.push(SampleDelay(Seconds.from_samples(100, SR)))
        g.from_inputs(0).to(d)
        d.to_graph_out()

    x = np.random.default_rng(0).standard_normal((1, 64)).astype(np.float32)
    a, _, _ = _render(build, frames=64, inputs=1, in_data=x)
    np.testing.assert_array_equal(a[0], x[0])


def test_static_sample_delay_doctest_parity():
    """The delay.rs StaticSampleDelay doctest sequence, via process_block."""
    import jax.numpy as jnp

    d = StaticSampleDelay(4)
    st = d.make_state()
    st, out = d.process_block(st, jnp.asarray([1.0, 2.0], np.float32))
    np.testing.assert_array_equal(np.asarray(out), [0, 0])
    st, out = d.process_block(st, jnp.asarray([3.0, 4.0], np.float32))
    np.testing.assert_array_equal(np.asarray(out), [0, 0])
    st, out = d.process_block(st, jnp.asarray([5.0, 6.0], np.float32))
    np.testing.assert_array_equal(np.asarray(out), [1, 2])
    st, out = d.process_block(st, jnp.asarray([0.0, 0.0], np.float32))
    np.testing.assert_array_equal(np.asarray(out), [3, 4])


def np_allpass_feedback(x, delay_frames, fb, L):
    """Per-sample port of AllpassFeedbackDelay incl. the reference's
    AllpassInterpolator init quirk (prev_in = prev_out = 1.0, delay.rs:60-75)."""
    nf_f = np.floor(delay_frames)
    delta = delay_frames - nf_f
    if delay_frames > 0.5 and delta < 0.5:
        delta += 1.0
        nf = int(nf_f) - 1
    else:
        nf = int(nf_f)
    coeff = (1.0 - delta) / (1.0 + delta)
    buf = np.zeros(L, np.float32)
    wp, ap_in, ap_out = 0, np.float32(1), np.float32(1)
    y = np.zeros_like(x)
    for i, xi in enumerate(x):
        rp = (wp + L - nf) % L
        raw = buf[rp]
        delayed = np.float32(coeff) * (raw - ap_out) + ap_in
        ap_out, ap_in = delayed, raw
        write = delayed * fb + xi
        buf[wp] = write
        wp = (wp + 1) % L
        y[i] = delayed - fb * write
    return y


def test_allpass_feedback_delay_impulse():
    """Schroeder allpass matches the per-sample reference model exactly."""

    def build(g):
        d = g.push(AllpassFeedbackDelay(Seconds.from_samples(8, SR), feedback=0.5))
        d.param("delay_time").set(Seconds.from_samples(8, SR).to_secs_f64())
        g.from_inputs(0).to(d)
        d.to_graph_out()

    x = np.zeros((1, 64), np.float32)
    x[0, 0] = 1.0
    a, _, _ = _render(build, frames=64, inputs=1, in_data=x)
    ref = np_allpass_feedback(x[0], 8.0, 0.5, 8)
    np.testing.assert_allclose(a[0], ref, atol=1e-6)
    # after the init transient decays, taps recur at the delay period
    assert abs(a[0, 16]) > 0.1


# ------------------------------------------------------------------- buffer
def test_buffer_reader_mid_block_end_zero_fill():
    """buffer.rs:148-188 process_block: when the read pointer crosses
    end_frame at sample i, done is marked at frame i+1 and the REST OF THE
    SAME BLOCK is zero-filled from that frame — not from the next block.
    24-sample buffer at block 16: block 2 carries 8 real samples then 8
    zeros, and the FREE_SELF fires off the mid-block done frame."""
    from knaster_tpu import Done

    data = np.arange(1, 25, dtype=np.float32)[None, :] / 100.0
    buf = Buffer(data, SR)

    def build(g):
        r = g.push_with_done_action(BufferReader(buf, rate=1.0), Done.FREE_SELF)
        r.to_graph_out()
        return r.id()

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    rid = g.edit(build)
    proc.run_without_inputs()
    np.testing.assert_allclose(proc.output_block()[0], data[0, :16], atol=1e-7)
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_allclose(out[:8], data[0, 16:24], atol=1e-7)
    assert np.all(out[8:] == 0.0), out
    assert rid not in g.nodes  # freed off the mid-block done
    proc.run_without_inputs()
    assert np.all(proc.output_block() == 0)


def test_buffer_reader_plays_and_done_frees():
    data = np.arange(1, 33, dtype=np.float32)[None, :] / 100.0
    buf = Buffer(data, SR)

    def build(g):
        r = g.push_with_done_action(BufferReader(buf, rate=1.0), Done.FREE_SELF)
        r.to_graph_out()
        return r.id()

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    rid = g.edit(build)
    proc.run_without_inputs()
    np.testing.assert_allclose(proc.output_block()[0], data[0, :16], atol=1e-7)
    proc.run_without_inputs()
    np.testing.assert_allclose(proc.output_block()[0], data[0, 16:32], atol=1e-7)
    proc.run_without_inputs()  # past the end: done -> freed
    assert rid not in g.nodes
    assert np.all(proc.output_block() == 0)


def test_buffer_reader_looping_and_rate():
    data = np.arange(8, dtype=np.float32)[None, :]
    buf = Buffer(data, SR)

    def build(g):
        r = g.push(BufferReader(buf, rate=1.0, looping=True))
        r.to_graph_out()

    a, _, _ = _render(build, frames=32, opts=AudioProcessorOptions(block_size=16))
    np.testing.assert_allclose(a[0], np.tile(np.arange(8), 4), atol=1e-5)


def test_buffer_resampling_rate():
    # buffer at half the server rate: base step 0.5 -> linear interpolation
    data = np.arange(16, dtype=np.float32)[None, :]
    buf = Buffer(data, SR // 2)

    def build(g):
        r = g.push(BufferReader(buf, rate=1.0))
        r.to_graph_out()

    a, _, _ = _render(build, frames=16, opts=AudioProcessorOptions(block_size=16))
    np.testing.assert_allclose(a[0], np.arange(16) * 0.5, atol=1e-5)


# ------------------------------------------------------------------ closure
def test_closure_ugen():
    def build(g):
        sq = g.push(ugen_from_sample_fn(lambda f: f * f, inputs=1, outputs=1))
        g.from_inputs(0).to(sq)
        sq.to_graph_out()

    x = np.linspace(-1, 1, 64, dtype=np.float32)[None, :]
    a, _, _ = _render(build, frames=64, inputs=1, in_data=x)
    np.testing.assert_allclose(a[0], x[0] ** 2, atol=1e-7)


# --------------------------------------------------------------------- wav
def test_wav_roundtrip(tmp_path):
    from knaster_tpu.utils.wav import read_wav, write_wav

    rng = np.random.default_rng(1)
    data = np.clip(rng.standard_normal((2, 1000)) * 0.5, -0.999, 0.999).astype(
        np.float32
    )
    for subtype, atol in (("float32", 0.0), ("pcm16", 1e-4), ("pcm24", 1e-6)):
        p = str(tmp_path / f"t_{subtype}.wav")
        write_wav(p, data, 48000, subtype)
        back, sr = read_wav(p)
        assert sr == 48000 and back.shape == data.shape
        np.testing.assert_allclose(back, data, atol=atol)


def test_wr_ar_param_to_input():
    """WrArParamToInput: an input channel drives a float param
    (wrappers_core/audio_rate.rs parity)."""
    from knaster_tpu import AudioProcessor, AudioProcessorOptions, Phasor
    from knaster_tpu.wrappers import WrArParamToInput
    from tests.utils import TestInPlusParamUGen

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        lfo = gg.push(Phasor(48000.0 / 16.0))
        wrapped = gg.push(WrArParamToInput(TestInPlusParamUGen(), "number"))
        # channel 1 (the appended channel) drives the 'number' param;
        # channel 0 (the real audio input) stays silent
        gg.connect(lfo, 0, 1, wrapped)
        wrapped.to_graph_out()

    g.edit(build)
    proc.run_without_inputs()
    np.testing.assert_allclose(
        proc.output_block()[0], np.arange(16) / 16.0, atol=1e-6
    )
