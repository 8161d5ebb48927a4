"""The five BASELINE.md north-star configs as deterministic CPU renders,
pinned by checked-in FLAC fixtures (tests/golden/*.flac, 24-bit — the
project's own codec, native/knaster_flac.cpp).

BASELINE.md "Reference configs to reproduce": README sine; subtractive
voice (saw -> SVF -> ADSR, 64-sample blocks); 1k detuned FM/wavetable
voices w/ smoothing; sample-accurate + audio-rate param sweep; feedback
delay network + Galactic chain. Each renders here at f32 AND f64 (the
reference's two sample types, knaster_primitives/src/float.rs) and
tests/test_golden.py asserts <= 1e-6 against the fixtures forever after —
end-to-end artifacts that survive refactors, not just per-component test
vectors.

Regenerate (after an INTENTIONAL audible change only):
    python tests/golden_configs.py --write [name ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "examples"))

GOLDEN_DIR = os.path.join(_HERE, "golden")
SR = 48000
BITS = 24  # fixture quantization: 2^-23 steps ~ 6e-8 << the 1e-6 gate


def _proc(outputs, dtype, block_size=64):
    import knaster_tpu as kt

    opts = kt.AudioProcessorOptions(block_size=block_size, sample_rate=SR)
    return kt.AudioProcessor.new(0, outputs, opts, dtype=dtype)


def render_readme_sine(dtype):
    """Config 1 — the README example: one wavetable sine at 440 Hz scaled
    to 0.2, fanned to stereo (reference knaster/README.md example)."""
    import knaster_tpu as kt

    g, proc = _proc(2, dtype)

    def build(gg):
        sine = gg.push(kt.SinWt(440.0))
        amp = gg.push(kt.Constant(0.2))
        (sine * amp).out([0, 0]).to_graph_out()

    g.edit(build)
    return np.asarray(proc.render(seconds=0.5))


def render_subtractive_voice(dtype):
    """Config 2 — subtractive voice at 64-sample blocks: polyBLEP saw ->
    SVF lowpass (sample-accurate cutoff set + smoothing sweep) -> EnvAsr
    gate with a release mid-render."""
    import knaster_tpu as kt

    g, proc = _proc(1, dtype)
    hs = {}

    def build(gg):
        saw = gg.push(kt.PolyBlep(kt.Waveform.Sawtooth, 110.0))
        svf = gg.push(kt.SvfFilter(kt.SvfFilterType.Low, 900.0, q=2.5))
        env = gg.push(kt.EnvAsr(attack_time=0.01, release_time=0.08))
        saw.to(svf)
        (svf * env * 0.5).to_graph_out()
        hs["svf"] = svf
        hs["env"] = env

    g.edit(build)
    hs["env"].param("t_restart").trig()
    cutoff = hs["svf"].param("cutoff_freq")
    cutoff.set_at(500.0, kt.Seconds.from_samples(4000, SR))
    cutoff.smooth(kt.Smoothing.linear(0.1))
    cutoff.set_at(4500.0, kt.Seconds.from_samples(4801, SR))
    hs["env"].param("t_release").trig_at(kt.Seconds.from_samples(12000, SR))
    return np.asarray(proc.render(frames=19200))  # 0.4 s


def render_detuned_banks(dtype):
    """Config 3 — 1k detuned voices with smoothing: a 512-voice FM bank
    plus a 512-voice wavetable-partial (AdditiveVoice) bank in one graph,
    every voice detuned, with per-voice smoothing ramps and sample-accurate
    sets landing mid-render."""
    import knaster_tpu as kt

    rng = np.random.default_rng(42)
    V = 512
    fm_defaults = {
        "freq": (220.0 * 2 ** rng.uniform(-1, 1, V)).astype(np.float32),
        "ratio": rng.choice([1.0, 2.0, 3.0], V).astype(np.float32),
        "index": rng.uniform(0.5, 2.0, V).astype(np.float32),
        "amp": np.full(V, 0.002, np.float32),
    }
    wt_defaults = {
        "freq": (330.0 * 2 ** rng.uniform(-1, 1, V)).astype(np.float32),
        "amp": np.full(V, 0.002, np.float32),
        "pan": rng.uniform(-1, 1, V).astype(np.float32),
    }
    harmonics = np.array([1.0, 0.6, 0.4, 0.25, 0.15, 0.08], np.float32)

    g, proc = _proc(2, dtype)
    hs = {}

    def build(gg):
        fm = gg.push(kt.VoiceBank(kt.FMVoice(), V,
                                  voice_defaults=fm_defaults,
                                  event_capacity=2048))
        wt = gg.push(kt.VoiceBank(kt.AdditiveVoice(harmonics=harmonics), V,
                                  voice_defaults=wt_defaults,
                                  event_capacity=2048))
        fm.out([0, 0]).to_graph_out()
        wt.to_graph_out()
        hs["fm"], hs["wt"] = fm, wt

    g.edit(build)

    def samples(n):
        import knaster_tpu as kt

        return kt.Seconds.from_samples(n, SR)

    tr_fm = hs["fm"].voice_param("t_restart")
    fr_fm = hs["fm"].voice_param("freq")
    tr_wt = hs["wt"].voice_param("t_restart")
    fr_wt = hs["wt"].voice_param("freq")
    for v in range(V):
        tr_fm.trig_at(v, samples(v % 64))
        tr_wt.trig_at(v, samples((v * 3) % 64))
    # per-voice smoothing ramps + sample-accurate sets mid-render
    for k in range(64):
        v = int(rng.integers(0, V))
        fr_fm.smooth(v, 0.02)
        fr_fm.set_at(v, float(rng.uniform(150, 700)), samples(1000 + 37 * k))
        w = int(rng.integers(0, V))
        fr_wt.set_at(w, float(rng.uniform(200, 900)), samples(1500 + 53 * k))
    return np.asarray(proc.render(frames=9600))  # 0.2 s


def render_param_sweep(dtype):
    """Config 4 — sample-accurate + audio-rate sweep: exact-frame sets,
    a linear smoothing ramp, and an audio-rate phasor driving a second
    oscillator's frequency through a param edge."""
    import knaster_tpu as kt

    g, proc = _proc(1, dtype)
    hs = {}

    def build(gg):
        a = gg.push(kt.SinNumeric(220.0))
        lfo = gg.push(kt.Phasor(3.0))
        b = gg.push(kt.SinWt(440.0))
        mod = (lfo * 200.0) + 330.0
        gg.connect_param(gg.handle(mod.channels[0][1]), 0, b, "freq")
        ((a + b) * 0.2).to_graph_out()
        hs["a"] = a

    g.edit(build)
    freq = hs["a"].param("freq")
    freq.set_at(330.0, kt.Seconds.from_samples(1000, SR))
    freq.set_at(550.0, kt.Seconds.from_samples(2500, SR))
    freq.smooth(kt.Smoothing.linear(0.05))
    freq.set_at(110.0, kt.Seconds.from_samples(7000, SR))
    return np.asarray(proc.render(frames=14400))  # 0.3 s


def render_fdn_galactic(dtype):
    """Config 5 — feedback delay network + Galactic chain: the
    examples/fdn_reverb.py wiring (prime-length allpass lines, one-pole
    damping, Hadamard feedback over one-block feedback edges, stereo taps
    through Galactic), excited by a 50 ms noise burst."""
    import knaster_tpu as kt
    from fdn_reverb import build_fdn

    block = 64
    g, proc = _proc(2, dtype, block_size=block)
    trig = g.edit(lambda gg: build_fdn(gg, block))
    trig.trig()
    return np.asarray(proc.render(seconds=1.0))


CONFIGS = {
    "readme_sine": render_readme_sine,
    "subtractive_voice": render_subtractive_voice,
    "detuned_banks": render_detuned_banks,
    "param_sweep": render_param_sweep,
    "fdn_galactic": render_fdn_galactic,
}


def fixture_path(name, dtype_name):
    return os.path.join(GOLDEN_DIR, f"{name}_{dtype_name}.flac")


def render(name, dtype):
    from knaster_tpu.ugens.noise import reset_randomness_seeds

    reset_randomness_seeds()
    return CONFIGS[name](dtype)


def write_fixture(name, dtype, dtype_name):
    from knaster_tpu.utils.codec import write_flac

    audio = render(name, dtype)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = fixture_path(name, dtype_name)
    write_flac(path, np.asarray(audio, np.float32), SR, bits=BITS)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"peak {np.abs(audio).max():.4f})")


def check_fixture(name, dtype, dtype_name, atol=1e-6):
    from knaster_tpu.utils.codec import read_flac

    audio = np.asarray(render(name, dtype), np.float32)
    ref, sr = read_flac(fixture_path(name, dtype_name))
    assert sr == SR
    assert ref.shape == audio.shape, (ref.shape, audio.shape)
    # the fixture is quantized to 2^-23 steps; fold that into the gate
    err = float(np.abs(audio - ref).max())
    assert err <= atol + 2.0 ** (1 - BITS), f"{name}/{dtype_name}: {err}"
    assert np.abs(ref).max() > 1e-3, f"{name}: silent fixture"
    return err


def force_cpu():
    """Direct runs start under the axon TPU platform (sitecustomize);
    goldens are CPU artifacts — flip to CPU the way tests/conftest.py
    does (the env var alone does nothing after the forced registration).

    The 8-virtual-device flag must ALSO match the test env: XLA's CPU
    codegen partitions (and so reassociates) differently with it set —
    measured 7.5e-5 on the param_sweep config's jnp.sin against a
    single-device render. Goldens are pinned to the suite's env."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as xb

        xb._clear_backends()
    except Exception:
        pass


def main():
    argv = sys.argv[1:]
    write = "--write" in argv
    f64 = "--f64" in argv
    names = [a for a in argv if not a.startswith("--")] or list(CONFIGS)
    force_cpu()

    if f64:
        import knaster_tpu as kt

        kt.enable_f64()
        dtype, dtype_name = np.float64, "f64"
    else:
        dtype, dtype_name = np.float32, "f32"

    for name in names:
        if write:
            write_fixture(name, dtype, dtype_name)
        else:
            err = check_fixture(name, dtype, dtype_name)
            print(f"OK {name}_{dtype_name} err={err:.2e}")


if __name__ == "__main__":
    main()
