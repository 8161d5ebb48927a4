"""Live editing — restructure a running graph without glitches.

The reference's signature capability: its Graph can be rebuilt while the
audio thread keeps running (commit_changes → TaskData swap). Here, a
StreamBackend runs the engine on two threads over the native C++ ring while
the control thread inserts a reverb mid-performance; the XLA recompile
happens on a worker thread and the program swaps between blocks.

(No audio device in this environment: the consumer callback collects blocks
and the result is written to live_edit.wav.)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403


def main():
    graph, proc = AudioProcessor.new(  # noqa: F405
        0, 2, AudioProcessorOptions(block_size=64)  # noqa: F405
    )

    def build(g):
        v = g.push(SubtractiveVoice(freq=73.4, amp=0.3, release=2.0))  # noqa: F405
        v.out([0, 0]).to_graph_out()
        return v

    voice = graph.edit(build)
    voice.param("t_restart").trig()
    proc.run_without_inputs()  # warm the block programs

    captured = []
    backend = StreamBackend(  # noqa: F405
        48000, 64, lookahead_blocks=200,
        consumer=lambda blk: captured.append(blk.copy()),
    )
    backend.start_processing(proc)

    time.sleep(1.5)
    print("performing... inserting a Galactic reverb live")

    def add_reverb(g):
        verb = g.push(Galactic(wet=0.8), name="verb")  # noqa: F405
        g.handle(voice.id()).out([0, 0]).to(verb)
        verb.to_graph_out_replace()

    graph.edit(add_reverb)  # compiles in the background; swaps when ready
    voice.param("t_restart").trig_after(0.5)

    deadline = time.time() + 30
    while time.time() < deadline:
        time.sleep(0.25)
        if proc.compiled and proc.compiled.revision == graph.revision:
            break
    print("swapped to the new program; playing on...")
    time.sleep(2.0)
    voice.param("t_release").trig()
    time.sleep(2.0)
    backend.stop()

    audio = np.concatenate(captured, axis=1)
    write_wav("live_edit.wav", audio, 48000)  # noqa: F405
    print(f"wrote live_edit.wav ({audio.shape[1]} frames, "
          f"{backend.underruns} underruns)")


if __name__ == "__main__":
    main()
