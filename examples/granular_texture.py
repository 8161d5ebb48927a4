"""Granular synthesis: a shimmering cloud over a plucked-string sample.

A Karplus-Strong pluck is bounced into a Buffer, then a `GrainPlayer`
scatters 200 grains/s over it with position, pitch, and stereo jitter —
the classic granular texture — while sequenced `pos` moves scrub through
the source and a `t_spawn` trigger line adds a rhythmic accent. Everything
is deterministic (counter-keyed Threefry per grain) and sample-accurate
(the scheduler counts down in samples; triggers land on their exact frame).

Renders granular_texture.wav (~6 s).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

SR = 48000


def render_source() -> Buffer:
    """Bounce a 1 s plucked string into a Buffer (the grain source)."""
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 1, opts)

    def build(gg):
        exciter = gg.push(WhiteNoise())
        burst = gg.push(EnvAr(0.001, 0.004))
        string = gg.push(PluckedString(220.0, damp=0.995, brightness=0.6))
        (exciter * burst).to(string)
        string.to_graph_out()
        return burst

    burst = g.edit(build)
    burst.param("t_restart").trig()
    audio = proc.render(seconds=1.0)
    return Buffer(np.asarray(audio), SR)


def main():
    src = render_source()

    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 2, opts)

    def build(gg):
        cloud = gg.push(
            GrainPlayer(
                src,
                grains=64,
                density=200.0,
                grain_dur=0.06,
                pos=0.05,
                pos_jitter=0.02,
                rate_jitter=1.0,   # +-1 octave spread
                pan_spread=1.0,
                amp=0.4,
                seed=11,
            )
        )
        verb = gg.push(Galactic(replace=0.2, brightness=0.8, detune=0.2, bigness=0.7))
        cloud.to(verb)
        verb.to_graph_out()
        return cloud

    cloud = g.edit(build)

    # scrub the read position through the source over 5 s
    pos = cloud.param("pos")
    for i in range(50):
        pos.set_at(0.05 + 0.85 * (i / 50.0), Seconds.from_secs_f64(i * 0.1))
    # a sequenced accent line on the spawn trigger
    spawn = cloud.param("t_spawn")
    for beat in range(12):
        spawn.trig_at(Seconds.from_secs_f64(0.25 + beat * 0.5))
    # thin the cloud out at the end
    cloud.param("density").set_at(40.0, Seconds.from_secs_f64(5.0))

    audio = np.asarray(proc.render(seconds=6.0))
    peak = float(np.max(np.abs(audio)))
    out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "granular_texture.wav")
    write_wav(out, audio / max(peak, 1.0) * 0.8, SR)
    print(f"granular cloud: peak {peak:.3f}, wrote {out}")


if __name__ == "__main__":
    main()
