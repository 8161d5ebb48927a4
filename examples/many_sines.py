"""Many sines — port of knaster/examples/many_sines.rs.

600 enveloped, panned sine voices whose frequencies drift toward shifting
harmonic series. The reference pushes 600 individual node chains; here one
VoiceBank node batches all voices across VPU lanes. Rendered offline to
many_sines.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

N = 600
SECONDS = 12.0


def main():
    rng = np.random.default_rng(2026)
    graph, proc = knaster(outputs=2)  # noqa: F405

    def build(g):
        bank = g.push(
            VoiceBank(  # noqa: F405
                SineVoice(amp=0.012, attack=0.01, release=0.1),  # noqa: F405
                N,
                voice_defaults={
                    "freq": rng.uniform(3000.0, 10000.0, N).astype(np.float32),
                    "pan": rng.uniform(-1.0, 1.0, N).astype(np.float32),
                },
                event_capacity=512,
            )
        )
        bank.to_graph_out()
        return bank

    bank = graph.edit(build)
    freq = bank.voice_param("freq")
    trig = bank.voice_param("t_restart")

    ratios = [1.0, 9 / 8, 6 / 5, 3 / 2, 8 / 5, 16 / 9, 2.0]
    root = 110.0
    t, loops = 0.0, 0
    while t < SECONDS:
        if loops % 16 == 0:
            root = 55.0 * 2.0 ** rng.integers(1, 4) * ratios[rng.integers(0, 7)]
        j = 0
        while j < N and t < SECONDS:
            freq.set_at(j, root * ratios[j % len(ratios)], t)
            trig.trig_at(j, t)
            trig.trig_at(int(rng.integers(0, N)), t)
            j += int(rng.integers(1, 10))
            t += 0.01
        loops += 1

    audio = proc.render(seconds=SECONDS)
    write_wav("many_sines.wav", audio, 48000)  # noqa: F405
    print(f"wrote many_sines.wav: {audio.shape[1]} frames, "
          f"peak {np.abs(audio).max():.3f}")


if __name__ == "__main__":
    main()
