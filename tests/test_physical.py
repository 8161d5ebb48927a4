"""PluckedString (Karplus-Strong) — numpy per-sample model parity, pitch
accuracy, decay behavior, blockwise-vs-scan equivalence, superblock cap."""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    EnvAr,
    PluckedString,
    WhiteNoise,
)

SR = 48000


def _np_model(x, freq, damp, brightness, L, sr=SR):
    """Sequential reference of PluckedString.process's recurrence."""
    b1 = min(max(1.0 - brightness, 0.0), 0.995)
    comp = 0.5 + min(b1 / (1.0 - b1), 8.0)
    df = np.clip(sr / freq - comp, 1.0, L - 2)
    nf_f = np.floor(df)
    delta = df - nf_f
    if df > 0.5 and delta < 0.5:
        delta += 1.0
        nf_f -= 1.0
    nf = int(np.clip(nf_f, 0, L - 1))
    coeff = (1.0 - delta) / (1.0 + delta)

    buf = np.zeros(L, np.float32)
    wp = 0
    ap_in = ap_out = d_last = lp = np.float32(0.0)
    out = np.zeros_like(x)
    for n in range(len(x)):
        raw = buf[(wp + L - nf) % L]
        d = np.float32(coeff) * (raw - ap_out) + ap_in
        h = np.float32(0.5) * (d + d_last)
        lp = np.float32(b1) * lp + np.float32(1.0 - b1) * h
        w = x[n] + np.float32(damp) * lp
        buf[wp] = w
        wp = (wp + 1) % L
        ap_in, ap_out, d_last = raw, d, d
        out[n] = w
    return out


def _render_string(block, n, long, freq=220.0, damp=0.995, brightness=1.0,
                   burst=64, seed=3):
    opts = AudioProcessorOptions(block_size=block, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)
    rng = np.random.default_rng(seed)
    x = np.zeros(n, np.float32)
    x[:burst] = rng.standard_normal(burst).astype(np.float32) * 0.5

    from knaster_tpu import BufferReader, Buffer

    def build(gg):
        exc = gg.push(BufferReader(Buffer(x[None, :], SR)))
        s = gg.push(PluckedString(freq=freq, damp=damp,
                                  brightness=brightness, long=long))
        exc.to(s)
        s.to_graph_out()
        return s

    g.edit(build)
    return x, proc.render(frames=n)[0]


def _f0_autocorr(sig, sr=SR, lo=50.0, hi=2000.0):
    sig = sig - sig.mean()
    ac = np.correlate(sig, sig, mode="full")[len(sig) - 1:]
    lags = np.arange(len(ac))
    lmin, lmax = int(sr / hi), int(sr / lo)
    k = lmin + np.argmax(ac[lmin:lmax])
    # parabolic refinement
    if 1 <= k < len(ac) - 1:
        a, b, c = ac[k - 1], ac[k], ac[k + 1]
        k = k + 0.5 * (a - c) / (a - 2 * b + c)
    return sr / k


def test_matches_numpy_model_scan_path():
    x, out = _render_string(block=64, n=2048, long=False)
    L = int(np.ceil(SR / 20.0)) + 4
    ref = _np_model(x, 220.0, 0.995, 1.0, L)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_matches_numpy_model_blockwise_path():
    x, out = _render_string(block=64, n=2048, long=True)
    L = int(np.ceil(SR / 20.0)) + 4
    ref = _np_model(x, 220.0, 0.995, 1.0, L)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_blockwise_equals_scan():
    _, a = _render_string(block=64, n=4096, long=True)
    _, b = _render_string(block=64, n=4096, long=False)
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_pitch_tracks_freq(freq):
    _, out = _render_string(block=64, n=SR // 2, long=True, freq=freq)
    f0 = _f0_autocorr(out[2000:])
    assert abs(f0 - freq) / freq < 0.01, f0  # within 1% (~17 cents)


def test_brightness_compensation_keeps_pitch():
    _, out = _render_string(block=64, n=SR // 2, long=True, freq=220.0,
                            brightness=0.5)
    f0 = _f0_autocorr(out[2000:])
    assert abs(f0 - 220.0) / 220.0 < 0.015, f0


def test_damp_controls_decay():
    _, short = _render_string(block=64, n=SR // 2, long=True, damp=0.9)
    _, ring = _render_string(block=64, n=SR // 2, long=True, damp=0.999)
    tail = slice(SR // 4, SR // 2)
    e_short = float(np.sum(short[tail] ** 2))
    e_ring = float(np.sum(ring[tail] ** 2))
    assert e_ring > 100 * max(e_short, 1e-12)
    # and it does decay (stable loop)
    head = float(np.sum(ring[:SR // 4] ** 2))
    assert e_ring < head


def test_long_mode_declares_superblock_cap():
    from knaster_tpu.core.ugen import AudioCtx

    s = PluckedString(freq=220.0, long=True, max_freq=440.0)
    ctx = AudioCtx(block_size=32, sample_rate=SR, dtype=np.float32)
    s.init(ctx)
    assert s.superblock_cap == int(SR / 440.0)
    assert s.block_invariant is False


def test_excited_by_graph_noise_chain():
    """The intended idiom: WhiteNoise * EnvAr burst -> string."""
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)

    def build(gg):
        noise = gg.push(WhiteNoise())
        env = gg.push(EnvAr(0.001, 0.003))
        s = gg.push(PluckedString(freq=330.0, long=True, damp=0.997))
        (noise * env).to(s)
        s.to_graph_out()
        return env

    env = g.edit(build)
    env.param("t_restart").trig()
    out = proc.render(frames=SR // 2)[0]
    assert np.abs(out).max() > 1e-3
    f0 = _f0_autocorr(out[2000:])
    assert abs(f0 - 330.0) / 330.0 < 0.01, f0


# ---------------------------------------------------------------------------
# PluckedVoice: the bank-scale string (built-in exciter)
# ---------------------------------------------------------------------------

def _pluck_bank(V, vd, frames, pluck_times, mix="stack", block=64):
    from knaster_tpu.models import PluckedVoice
    from knaster_tpu.parallel import VoiceBank
    from knaster_tpu import Seconds

    opts = AudioProcessorOptions(block_size=block, sample_rate=SR)
    g, proc = AudioProcessor.new(0, V if mix == "stack" else 1, opts)

    def build(gg):
        b = gg.push(VoiceBank(PluckedVoice(), V, voice_defaults=vd, mix=mix))
        b.to_graph_out()
        return b

    bank = g.edit(build)
    pluck = bank.voice_param("t_pluck")
    for v, t in pluck_times:
        if t is None:
            pluck.set(v, None)
        else:
            pluck.set_at(v, None, Seconds.from_samples(t, SR))
    return proc.render(frames=frames)


def test_plucked_voice_bank_pitch_per_voice():
    vd = {"vseed": np.arange(2), "freq": np.array([110.0, 220.0])}
    out = _pluck_bank(2, vd, SR // 2, [(0, None), (1, None)])
    for ch, f in [(0, 110.0), (1, 220.0)]:
        f0 = _f0_autocorr(out[ch, 2000:])
        assert abs(f0 - f) / f < 0.01, (ch, f0)


def test_plucked_voice_vseed_decorrelates():
    vd = {"vseed": np.array([0, 7]), "freq": np.array([220.0, 220.0])}
    out = _pluck_bank(2, vd, 4096, [(0, None), (1, None)])
    a, b = out[0], out[1]
    assert np.abs(a).max() > 1e-3 and np.abs(b).max() > 1e-3
    denom = float(np.sqrt(np.sum(a * a) * np.sum(b * b)))
    corr = float(np.dot(a, b)) / max(denom, 1e-12)
    assert abs(corr) < 0.5, corr  # different noise bursts


def test_plucked_voice_sample_accurate_pluck():
    vd = {"vseed": np.arange(1), "freq": np.array([220.0])}
    out = _pluck_bank(1, vd, 1024, [(0, 100)])
    ch = out[0]
    assert np.all(ch[:100] == 0.0)
    assert np.abs(ch[100:140]).max() > 1e-4


def test_plucked_voice_bank_mixes():
    vd = {"vseed": np.arange(4),
          "freq": 110.0 * 2 ** (np.arange(4) / 4.0)}
    out = _pluck_bank(4, vd, 8192, [(v, None) for v in range(4)], mix="sum")
    assert out.shape == (1, 8192)
    assert np.abs(out).max() > 1e-3


def test_plucked_voice_bank_propagates_block_contract():
    from knaster_tpu.core.ugen import AudioCtx
    from knaster_tpu.models import PluckedVoice
    from knaster_tpu.parallel import VoiceBank

    bank = VoiceBank(PluckedVoice(max_freq=440.0), 4)
    assert bank.block_invariant is False
    ctx = AudioCtx(block_size=32, sample_rate=SR, dtype=np.float32)
    bank.init(ctx)
    assert bank.superblock_cap == int(SR / 440.0)
