"""Modal synthesis: a peal of bells plus a struck-mallet ensemble.

Part 1 — graph usage: a raised-cosine mallet click (EnvAr pulse) excites a
12-mode `ModalResonator.bell` per bell; all modes of every bell run as 2x2
rotation-decay affine scans, fully parallel on VPU lanes.

Part 2 — bank scale: a `VoiceBank(ModalVoice(...), 64)` mallet ensemble
(one graph node, 64 instruments x 6 bar modes = 384 resonators) struck on a
pentatonic lattice with sample-accurate per-voice triggers; VoicePool-style
auto-release would reclaim voices as their ring-out crosses -100 dB.

Renders modal_bells.wav (~6 s).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

SR = 48000
PEAL = [220.0, 277.18, 329.63, 440.0]  # A3 C#4 E4 A4


def main():
    opts = AudioProcessorOptions(block_size=64, sample_rate=SR)
    g, proc = AudioProcessor.new(0, 2, opts)

    def build(gg):
        strikes = []
        for i, f in enumerate(PEAL):
            mallet = gg.push(EnvAr(0.001, 0.002))
            bell = gg.push(ModalResonator.bell(f, decay=3.0))
            # raw resonator: ring amplitude = pulse area x mode gain, so the
            # 3 ms mallet (area ~72 samples) gets a small scale here;
            # ModalVoice normalizes this automatically
            (mallet * 0.005).to(bell)
            pan = gg.push(Pan2((i - 1.5) / 2.0))
            bell.to(pan)
            pan.to_graph_out()
            strikes.append(mallet.param("t_restart"))
        return strikes

    strikes = g.edit(build)
    # descending peal, twice
    for t0 in (0.05, 2.1):
        for i, trig in enumerate(reversed(strikes)):
            trig.trig_at(Seconds.from_secs_f64(t0 + 0.35 * i))

    bells = proc.render(seconds=4.0)

    # --- bank-scale mallet ensemble (marimba-ish bars) -------------------
    from knaster_tpu.models import ModalVoice
    from knaster_tpu.parallel import VoiceBank
    from knaster_tpu.ugens.modal import ModalResonator as _MR

    rng = np.random.default_rng(7)
    n = 64
    penta = np.array([0, 3, 5, 7, 10])
    freqs = 110.0 * 2 ** (rng.integers(0, 3, n) + penta[rng.integers(0, 5, n)] / 12.0)

    g2, p2 = AudioProcessor.new(0, 2, opts)
    voice = ModalVoice(resonator=_MR.bar(decay=1.2), amp=0.3, strike_ms=1.5)
    vd = {"freq": freqs, "pan": rng.uniform(-0.8, 0.8, n)}
    bank = g2.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
        gg.push(VoiceBank(voice, n, voice_defaults=vd, event_capacity=256))))
    trig = bank.voice_param("t_strike")
    for k in range(48):
        trig.trig_at(int(rng.integers(0, n)),
                     Seconds.from_secs_f64(0.05 + k * 0.04))
    mallets = p2.render(seconds=2.0)

    audio = np.concatenate([bells, mallets], axis=1)
    peak = float(np.abs(audio).max())
    out = (audio / max(peak, 1e-9) * 0.7).astype(np.float32)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "modal_bells.wav")
    Buffer(out, SR).save_to_disk(path)
    print(f"wrote {path}  peak={peak:.3f}  bells={PEAL}  bars={n}")


if __name__ == "__main__":
    main()
