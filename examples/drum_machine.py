"""Drum machine: tiled sampler banks + sample-accurate step sequencing.

Three `VoiceBank(SamplerVoice(tiled=True))` nodes — kick, snare, hat —
play a procedurally-synthesized kit at unit rate through the gather-free
tiled read path (DESIGN_NOTES "tile + barrel roll"). The 16-step pattern
is scheduled entirely up front with `set_after` at exact musical times
(the engine applies each trigger at its exact frame, mid-block included),
and overlapping hits round-robin across each bank's voices so tails ring
out. Renders 4 bars at 124 BPM to drum_machine.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.models.voices import SamplerVoice
from knaster_tpu.parallel import VoiceBank
from knaster_tpu.prelude import *  # noqa: F403

SR = 48000
BPM = 124.0
STEP = 60.0 / BPM / 4.0  # 16th notes

# --- procedural kit ---------------------------------------------------------

def kick(n=int(0.25 * SR)):
    t = np.arange(n) / SR
    f = 120.0 * np.exp(-t * 18.0) + 45.0
    phase = 2 * np.pi * np.cumsum(f) / SR
    return (np.sin(phase) * np.exp(-t * 14.0)).astype(np.float32)


def snare(n=int(0.18 * SR), seed=2):
    t = np.arange(n) / SR
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(n) * np.exp(-t * 28.0)
    tone = np.sin(2 * np.pi * 185.0 * t) * np.exp(-t * 40.0)
    return (0.7 * noise + 0.5 * tone).astype(np.float32)


def hat(n=int(0.07 * SR), seed=3):
    t = np.arange(n) / SR
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    x = np.diff(x, prepend=0.0)  # crude highpass
    return (0.5 * x * np.exp(-t * 60.0)).astype(np.float32)


# --- pattern (16 steps, x = hit) --------------------------------------------
PATTERN = {
    "kick":  "x...x...x..x..x.",
    "snare": "....x.......x...",
    "hat":   "x.xxx.xx.xx.x.xx",
}
GAINS = {"kick": 0.9, "snare": 0.6, "hat": 0.35}
PANS = {"kick": 0.0, "snare": -0.15, "hat": 0.3}


def main(bars=4):
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 2, opts)
    kits = {"kick": kick(), "snare": snare(), "hat": hat()}
    n_voices = 4  # round-robin so ringing tails aren't cut

    def build(gg):
        banks = {}
        for name, data in kits.items():
            banks[name] = gg.push(VoiceBank(
                SamplerVoice(data, loop=False, tiled=True,
                             attack=0.0005, release=0.01),
                n_voices,
                voice_defaults={
                    "amp": np.full(n_voices, GAINS[name], np.float32),
                    "pan": np.full(n_voices, PANS[name], np.float32),
                },
            ))
            banks[name].to_graph_out()
        return banks

    banks = g.edit(build)
    counters = {name: 0 for name in kits}
    for bar in range(bars):
        for step in range(16):
            t = (bar * 16 + step) * STEP + 0.01
            for name, pat in PATTERN.items():
                if pat[step] == "x":
                    v = counters[name] % n_voices
                    counters[name] += 1
                    banks[name].voice_param("t_restart").set_after(
                        v, None, t)

    seconds = bars * 16 * STEP + 0.5
    audio = proc.render(seconds=seconds)
    peak = float(np.abs(audio).max())
    out = (audio / max(peak, 1e-9) * 0.8).astype(np.float32)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "drum_machine.wav")
    Buffer(out, SR).save_to_disk(path)
    hits = sum(counters.values())
    print(f"wrote {path}  {bars} bars @ {BPM} BPM, {hits} hits, peak={peak:.3f}")


if __name__ == "__main__":
    main()
