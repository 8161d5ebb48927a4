"""Convolution reverb: place a plucked voice in a synthetic room.

Beyond-reference demo (the Rust reference has no convolution engine): a
2-second stereo impulse response — exponentially decaying noise with a
high-frequency rolloff that steepens over time, the classic synthetic
room recipe — is loaded into a `Convolver`, and a short plucked melody
(EnvAr-shaped PolyBlep saw) plays through it. The Convolver runs the IR
as a frequency-domain delay line: one FFT per block, K = ceil(L/B)
spectral multiply-adds, exact linear convolution, zero added latency.

Run: python examples/ir_reverb.py  → writes ir_reverb.wav
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403
from knaster_tpu import Convolver, Seconds, Smoothing  # noqa: F401

SR = 48000


def synthetic_room_ir(seconds=2.0, rt60=1.4, seed=7):
    """Stereo noise IR with exponential decay and time-varying damping."""
    rng = np.random.default_rng(seed)
    L = int(seconds * SR)
    t = np.arange(L, dtype=np.float32) / SR
    decay = np.exp(-6.91 * t / rt60)  # -60 dB at rt60
    ir = rng.standard_normal((2, L)).astype(np.float32) * decay[None, :]
    # darken over time: one-pole lowpass whose cutoff falls with t
    out = np.empty_like(ir)
    for c in range(2):
        y = 0.0
        a = np.clip(1.0 - t / seconds, 0.15, 1.0) * 0.6 + 0.1
        for i in range(L):
            y = y + a[i] * (ir[c, i] - y)
            out[c, i] = y
    out *= 0.15 / np.sqrt((out ** 2).sum(axis=1)).max()
    return out


def main(seconds=4.0, block_size=64):
    ir = synthetic_room_ir()
    graph, proc = knaster(outputs=2,  # noqa: F405
                          block_size=block_size, sample_rate=SR)

    def build(g):
        osc = g.push(PolyBlep(Waveform.Sawtooth, 220.0))  # noqa: F405
        env = g.push(EnvAr(0.005, 0.35))  # noqa: F405
        conv = g.push(Convolver(ir, dry_wet=0.6))
        (osc * env * 0.4).to(conv)
        conv.to_graph_out()
        return osc.param("freq"), env.param("t_restart")

    freq, trig = graph.edit(build)

    # a little melody: schedule plucks at block-exact musical times
    notes = [220.0, 277.18, 329.63, 440.0, 329.63, 277.18, 246.94, 220.0]
    for i, f in enumerate(notes):
        at = Seconds.from_secs_f64(0.35 * i)
        freq.set_at(f, at)
        trig.trig_at(at)

    audio = proc.render(seconds=seconds)
    from knaster_tpu.utils.wav import write_wav

    out = _os.path.join(_os.path.dirname(__file__), "ir_reverb.wav")
    write_wav(out, np.asarray(audio), SR)
    peak = float(np.abs(np.asarray(audio)).max())
    print(f"wrote {out} ({seconds}s, peak {peak:.3f}, "
          f"IR {ir.shape[1]} samples = {ir.shape[1] // block_size} partitions)")


if __name__ == "__main__":
    main()
