"""Simple sine — port of knaster/examples/simple_sine.rs.

A 440 Hz sine with a linearly smoothed amplitude, rising in frequency and
volume; rendered offline to simple_sine.wav (the reference plays live via
CPAL; non-realtime is our primary path).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403


def main():
    graph, proc = knaster(outputs=2)  # noqa: F405

    def build(g):
        sine = g.push(SinWt(440.0))  # noqa: F405
        amp = g.push(Constant(0.2))  # noqa: F405
        sig = sine * amp
        sig.out([0, 0]).to_graph_out()
        return sine.param("freq"), amp.param("value")

    freq, amp = graph.edit(build)
    # linearly interpolate amplitude changes over 0.1 s
    amp.smooth(Smoothing.linear(0.1))  # noqa: F405
    t = 0.0
    for i in range(11):
        freq.set_at(440.0 + i * 44.0, t)
        amp.set_at((i + 1) / 20.0, t)
        t += 0.25
    audio = proc.render(seconds=t + 2.0)
    write_wav("simple_sine.wav", audio, 48000)  # noqa: F405
    print(f"wrote simple_sine.wav: {audio.shape[1]} frames, "
          f"peak {np.abs(audio).max():.3f}")


if __name__ == "__main__":
    main()
