"""Mesh-sharded voices inside a graph, atomic chord changes, hints.

Round-2 capabilities in one patch:

* a :class:`MeshVoiceBank` — a voice bank sharded over a device mesh — used
  as an ordinary graph node, mixed through an SvfFilter bus;
* :class:`SchedulingToken` batches: each chord's trigger+detune changes are
  attached to one token and activated together, landing in the SAME block;
* parameter hints: the filter's GUI surface (ranges, Nyquist resolution)
  read back through ``Handle.param_hints()``.

Runs on whatever devices exist; set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
for a virtual 8-device mesh. Writes mesh_voice_cluster.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    MeshVoiceBank,
    SchedulingToken,
    Seconds,
    SineVoice,
    SvfFilter,
    VoiceBank,
)
from knaster_tpu.utils.wav import write_wav

SR = 48000


def main():
    n_dev = len(jax.devices())
    mesh = jax.make_mesh((n_dev,), ("voices",))
    voices_per_dev = 16
    V = voices_per_dev * n_dev
    print(f"mesh: {n_dev} device(s), {V} voices")

    rng = np.random.default_rng(7)
    detune = 2.0 ** (rng.uniform(-0.01, 0.01, V))
    bank = VoiceBank(
        SineVoice(amp=0.04, attack=0.02, release=0.6),
        V,
        voice_defaults={
            "freq": (220.0 * detune).astype(np.float32),
            "pan": rng.uniform(-1, 1, V).astype(np.float32),
        },
    )

    graph, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=64, sample_rate=SR)
    )

    def build(g):
        h = g.push(MeshVoiceBank(bank, mesh))
        filt = g.push(SvfFilter(cutoff_freq=2500.0, q=0.8))
        h.out([0]).to(filt)
        filt.to_graph_out_channels([0])
        h.out([1]).to_graph_out_channels([1])
        return h, filt

    h, filt = graph.edit(build)

    # the filter's GUI-facing hint surface, Nyquist resolved for this graph
    hints = filt.param_hints()
    cut = hints["cutoff_freq"]
    print(f"cutoff hint: {cut.minimum}..{cut.maximum} Hz "
          f"(logarithmic={cut.logarithmic})")

    # a chord progression: each chord's triggers + detunes land atomically
    # in one block via a SchedulingToken
    chords = [
        [0, 4, 7],       # major
        [0, 3, 7],       # minor
        [0, 5, 9],       # sus
        [0, 4, 7, 11],   # maj7
    ]
    trig = h.voice_param("t_restart")
    rel = h.voice_param("t_release")
    freq = h.voice_param("freq")
    base = 220.0
    group = voices_per_dev  # voices per chord note
    t = 0.0
    prev = []
    for chord in chords:
        tok = SchedulingToken()
        when = Seconds.from_secs_f64(t)
        for v in prev:
            rel.trig_at(v, when, token=tok)
        prev = []
        for k, semi in enumerate(chord):
            f = base * 2.0 ** (semi / 12.0)
            for j in range(group // len(chord) + 1):
                v = (k * group // len(chord) + j) % V
                freq.set_at(v, float(f * detune[v]), when, token=tok)
                trig.trig_at(v, when, token=tok)
                prev.append(v)
        tok.activate()  # the whole chord change is one atomic batch
        t += 1.0

    audio = proc.render(seconds=t + 1.0)
    out = _os.path.join(_os.path.dirname(__file__), "mesh_voice_cluster.wav")
    write_wav(out, audio, SR)
    print(f"wrote {out}: peak {np.abs(audio).max():.3f}")


if __name__ == "__main__":
    main()
