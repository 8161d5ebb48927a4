"""Buffer player — port of knaster/examples/buffer_player.rs.

Plays a sound file through the graph (the reference opens a file dialog and
plays live; here: pass a path, render through a Galactic reverb, write out).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403


def main(path=None):
    if path is None:
        # synthesize a demo input if no file given
        t = np.arange(48000) / 48000
        data = (0.5 * np.sin(2 * np.pi * 440 * t) * np.exp(-3 * t)).astype(np.float32)
        buf = Buffer(data[None, :], 48000)  # noqa: F405
    else:
        buf = Buffer.from_sound_file(path)  # noqa: F405

    graph, proc = knaster(outputs=2)  # noqa: F405

    def build(g):
        player = g.push(BufferReader(buf, rate=1.0))  # noqa: F405
        reverb = g.push(Galactic(wet=0.4))  # noqa: F405
        src = player if buf.channels == 2 else player.out([0, 0])
        src.to(reverb)
        reverb.to_graph_out()

    graph.edit(build)
    audio = proc.render(seconds=buf.length_seconds() + 3.0)
    write_wav("buffer_player.wav", audio, 48000)  # noqa: F405
    print(f"wrote buffer_player.wav ({audio.shape[1]} frames)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
