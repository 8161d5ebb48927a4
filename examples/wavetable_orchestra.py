"""Wavetable orchestra — a TPU-native showcase with no reference analog.

16,384 band-limited wavetable voices from ONE fused Pallas kernel
(PallasWavetableVoiceBank): a bright saw-ish table is decomposed into 24
partials and re-synthesized with exact anti-aliasing per voice. Voices are
launched in slowly-arpeggiated chord clouds with per-voice pan and
sample-accurately scheduled triggers, then released in waves. Rendered
offline to wavetable_orchestra.wav.

On one v5e chip this bank sustains hundreds of thousands of voices in
realtime; 16k voices is a light load chosen for a quick render.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

V = 16384
SECONDS = 10.0
SR = 48000


def main():
    rng = np.random.default_rng(7)

    # a bright table: saw-ish partial ladder with a resonant bump
    table = NonAaWavetable()  # noqa: F405
    table.add_saw(1, 20, 1.0)
    table.add_sine(5.0, 0.25, 0.0)

    # chord cloud: minor-eleventh voicings spread over 5 octaves
    degrees = np.array([0, 3, 7, 10, 14, 17])
    base = 55.0 * 2.0 ** (degrees[rng.integers(0, 6, V)] / 12.0)
    octave = 2.0 ** rng.integers(0, 5, V).astype(np.float32)
    detune = 2.0 ** (rng.normal(0.0, 0.004, V).astype(np.float32))
    freqs = (base * octave * detune).astype(np.float32)

    graph, proc = knaster(outputs=2)  # noqa: F405

    def build(g):
        bank = g.push(
            PallasWavetableVoiceBank(  # noqa: F405
                V,
                table=table.buffer,
                n_harmonics=24,
                attack=0.8,
                release=2.5,
                voice_defaults={
                    "freq": freqs,
                    "amp": np.full(V, 0.0035, np.float32),
                    "pan": rng.uniform(-1.0, 1.0, V).astype(np.float32),
                },
                event_capacity=4096,
            )
        )
        bank.to_graph_out()
        return bank

    bank = graph.edit(build)
    trig = bank.voice_param("t_restart")
    rel = bank.voice_param("t_release")

    # arpeggiated entries: waves of voices starting across the first 6 s,
    # each wave sample-accurately scheduled
    order = rng.permutation(V)
    n_waves = 24
    for w in range(n_waves):
        t = Seconds.from_secs_f64(0.25 * w)  # noqa: F405
        for v in order[w::n_waves][: 4096 // n_waves]:
            trig.trig(int(v), t=Time.at(t))  # noqa: F405
    # release everything in staggered waves near the end (each wave fits the
    # bank's per-block event capacity)
    n_rel = 8
    for w in range(n_rel):
        t = Seconds.from_secs_f64(6.0 + 0.15 * w)  # noqa: F405
        for v in order[w::n_rel]:
            rel.trig(int(v), t=Time.at(t))  # noqa: F405

    audio = proc.render(seconds=SECONDS)
    peak = float(np.abs(audio).max())
    if peak > 0:
        audio = audio * (0.7 / max(peak, 0.7))
    Buffer(audio, SR).save_to_disk("wavetable_orchestra.wav")  # noqa: F405
    print(f"wrote wavetable_orchestra.wav  peak={peak:.3f}")


if __name__ == "__main__":
    main()
