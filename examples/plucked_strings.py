"""Karplus-Strong guitar: six PluckedStrings strummed with noise bursts.

The string resonators take their excitation as an audio input (the pluck
is a ~3 ms WhiteNoise*EnvAr burst), so the strum timing rides the graph
engine's sample-accurate trigger scheduling — one exciter per string,
`t_restart` fired at staggered times. Strings are `long=True` (every loop
here is >= one block), which runs each string's whole block vectorized
(ring reads + two affine-scanned one-poles) instead of a per-sample scan.

Renders an E-major strum (~3.5 s) to plucked_strings.wav, then a shimmer
texture from a 512-string `VoiceBank(PluckedVoice)` — one graph node whose
per-voice rings read gather-free (tiled + barrel-rolled; DESIGN_NOTES
"tile + barrel roll") — to plucked_shimmer.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

SR = 48000
# E-major (standard tuning): E2 A2 B3? -> E2 B2 E3 G#3 B3 E4
STRUM = [82.41, 123.47, 164.81, 207.65, 246.94, 329.63]
STRUM_GAP = 0.012  # 12 ms between string plucks


def main():
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 2, opts)

    def build(gg):
        triggers = []
        for i, f in enumerate(STRUM):
            noise = gg.push(WhiteNoise())
            env = gg.push(EnvAr(0.0008, 0.0025))
            s = gg.push(PluckedString(
                freq=f, damp=0.9965, brightness=0.65 + 0.05 * i,
                long=True, max_freq=max(STRUM) * 1.1,
            ))
            (noise * env * 0.6).to(s)
            pan = gg.push(Pan2((i - 2.5) / 4.0))
            s.to(pan)
            pan.to_graph_out()
            triggers.append(env.param("t_restart"))
        return triggers

    triggers = g.edit(build)
    # strum down, then a second strum after 1.5 s
    for strum_t in (0.05, 1.55):
        for i, trig in enumerate(triggers):
            trig.trig_at(Seconds.from_secs_f64(strum_t + i * STRUM_GAP))

    audio = proc.render(seconds=3.5)
    peak = float(np.abs(audio).max())
    out = (audio / max(peak, 1e-9) * 0.7).astype(np.float32)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "plucked_strings.wav")
    Buffer(out, SR).save_to_disk(path)
    print(f"wrote {path}  peak={peak:.3f}  f0s={STRUM}")


def shimmer(n_strings=512, seconds=6.0):
    """A cloud of plucked strings: one VoiceBank node, per-voice freqs on a
    pentatonic lattice, plucks scattered over time via set_after."""
    from knaster_tpu.models import PluckedVoice
    from knaster_tpu.parallel import VoiceBank

    rng = np.random.default_rng(11)
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)
    penta = np.array([0, 3, 5, 7, 10])
    degrees = rng.integers(0, 5, n_strings)
    octaves = rng.integers(0, 4, n_strings)
    freqs = 55.0 * 2 ** (octaves + penta[degrees] / 12.0)
    vd = {
        "vseed": np.arange(n_strings),
        "freq": freqs,
        "amp": np.full(n_strings, 2.0 / np.sqrt(n_strings)),
        "damp": rng.uniform(0.995, 0.999, n_strings),
        "brightness": rng.uniform(0.4, 0.9, n_strings),
    }

    def build(gg):
        b = gg.push(VoiceBank(PluckedVoice(max_freq=float(freqs.max()) * 1.1),
                              n_strings, voice_defaults=vd))
        b.to_graph_out()
        return b

    bank = g.edit(build)
    pluck = bank.voice_param("t_pluck")
    for v in range(n_strings):
        pluck.set_after(v, None, float(rng.uniform(0.0, seconds * 0.7)))
    audio = proc.render(seconds=seconds)
    peak = float(np.abs(audio).max())
    out = (audio / max(peak, 1e-9) * 0.7).astype(np.float32)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "plucked_shimmer.wav")
    Buffer(out, SR).save_to_disk(path)
    print(f"wrote {path}  strings={n_strings}  peak={peak:.3f}")


if __name__ == "__main__":
    main()
    shimmer()
