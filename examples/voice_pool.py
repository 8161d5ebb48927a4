"""Polyphonic note allocation with VoicePool — the many_sines idiom at
bank scale.

The reference's polyphony pattern pushes a node per note and frees it when
its envelope reports done (knaster/examples/many_sines.rs + WrDone). Here a
single 64-voice bank node absorbs an arpeggiated stream of hundreds of
notes with ZERO graph recompiles: :class:`VoicePool` hands out free voice
indices, sends sample-accurate note-on batches, and auto-releases voices
when their envelopes finish (the bank's device-side idle latch, fetched
only when the free list runs dry).

Writes voice_pool.wav (a few seconds of cascading arpeggios into a
Galactic reverb bus).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Seconds,
    SineVoice,
    VoiceBank,
    VoicePool,
)
from knaster_tpu.airwindows import Galactic
from knaster_tpu.utils.wav import write_wav

SR = 48000


def main():
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))

    def build(gg):
        bank = gg.push(
            VoiceBank(SineVoice(amp=0.02, attack=0.004, release=0.25), 64,
                      event_capacity=512)
        )
        verb = gg.push(Galactic(wet=0.35, bigness=0.8))
        bank.to(verb)
        verb.to_graph_out()
        return bank

    bank = g.edit(build)
    pool = VoicePool(proc, bank)

    # a cascading arpeggio: 300 notes over ~5 s, scheduled sample-accurately
    scale = [0, 3, 5, 7, 10]
    rng = np.random.default_rng(4)
    frame = 0
    scheduled = 0
    pieces = []
    for i in range(300):
        degree = scale[i % len(scale)] + 12 * (i // len(scale) % 3)
        freq = 110.0 * 2 ** (degree / 12.0)
        v = pool.note_on(
            {"freq": freq, "pan": float(rng.uniform(-0.8, 0.8))},
            at=Seconds.from_samples(frame, SR),
        )
        if v is not None:
            pool.note_off(
                v, at=Seconds.from_samples(frame + int(0.12 * SR), SR)
            )
            scheduled += 1
        frame += int(SR * 0.016)
        if i % 50 == 49:  # render as we go; envelopes finish, voices free up
            need = ((frame // 64) + 1) * 64 - proc.graph.clock.frames
            pieces.append(proc.render(frames=need))
            pool.refresh()

    pieces.append(proc.render(seconds=1.5))  # reverb tail
    audio = np.concatenate(pieces, axis=1)
    pool.refresh()
    print(
        f"{scheduled} notes through a {pool.n_voices}-voice pool, "
        f"{audio.shape[1]} frames, free={pool.free_count} after refresh"
    )
    write_wav("voice_pool.wav", audio, SR)
    print("wrote voice_pool.wav")


if __name__ == "__main__":
    main()
