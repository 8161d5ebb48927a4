"""Feedback delay network reverb → Galactic — the BASELINE north-star
"feedback delay network + Galactic chain" config, composed entirely from
the public graph API (the reference ships only Galactic; its graphs wire
feedback with `to_feedback`, graph_edit.rs:295-330 — same sugar here).

A noise burst excites four prime-length delay lines; each line is damped
by a one-pole lowpass and the four damped outputs are mixed back into the
line inputs through a 4×4 Hadamard matrix (energy-preserving at gain 1,
here scaled to g=0.85 — loop loss ≈ −1.4 dB per ~30 ms pass, RT60 ≈ 1.3 s)
over one-block feedback edges.
The graph's feedback edge adds exactly one block of delay, so each line's
`delay_time` is its target length minus one block — loop lengths stay the
chosen primes. The stereo tap mix then runs through Galactic for
diffusion, and the result is bounced to fdn_reverb.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from knaster_tpu.prelude import *  # noqa: F403

SR = 48000
# prime loop lengths (samples) — mutually inharmonic tail modes
PRIMES = (1031, 1327, 1523, 1871)
HADAMARD = (
    (1, 1, 1, 1),
    (1, -1, 1, -1),
    (1, 1, -1, -1),
    (1, -1, -1, 1),
)


def build_fdn(g, block_size, feedback_gain=0.85, damp_hz=5200.0,
              burst_seconds=0.05, galactic=True):
    """Wire the FDN into graph ``g``; returns the burst envelope's restart
    trigger (fire it to excite the reverb). ``galactic=False`` taps the raw
    FDN bus straight to the graph outs (the tests measure the loop there,
    un-masked by Galactic's own tail)."""
    env = g.push(EnvAr(0.004, burst_seconds))  # noqa: F405
    burst = g.push(WhiteNoise(seed=17)) * env * 0.8  # noqa: F405

    delays, damped = [], []
    for n in PRIMES:
        # loop length = delay_time + one feedback block ⇒ subtract a block
        d = g.push(
            AllpassDelay(  # noqa: F405
                Seconds.from_samples(2 * n, SR),  # noqa: F405
                long=True,
                min_delay_time=Seconds.from_samples(  # noqa: F405
                    min(PRIMES) - block_size, SR
                ),
            )
        )
        d.param("delay_time").set(
            Seconds.from_samples(n - block_size, SR).to_secs_f64()  # noqa: F405
        )
        burst.to(d)
        lp = g.push(OnePoleLpf(damp_hz))  # noqa: F405
        d.to(lp)
        delays.append(d)
        damped.append(lp)

    # Hadamard feedback: line i gets g/2 · Σ_j H[i][j]·damped[j], through a
    # one-block feedback edge (to_feedback) to close the cycle legally
    for i in range(4):
        mix = None
        for j in range(4):
            term = damped[j] * (feedback_gain * 0.5 * HADAMARD[i][j])
            mix = term if mix is None else mix + term
        mix.to_feedback(delays[i])

    left = (damped[0] + damped[2]) * 0.35
    right = (damped[1] + damped[3]) * 0.35
    if galactic:
        gal = g.push(Galactic(replace=0.25, brightness=0.6, bigness=0.7,  # noqa: F405
                              wet=0.35))
        (left | right).to(gal)
        gal.to_graph_out()
    else:
        (left | right).to_graph_out()
    return env.param("t_restart")


def main():
    block_size = 64
    graph, proc = knaster(outputs=2, block_size=block_size)  # noqa: F405
    trig = graph.edit(lambda g: build_fdn(g, block_size))
    trig.trig()
    audio = np.asarray(proc.render(seconds=3.0))

    # decay sanity: the tail rings after the 50 ms burst and decays
    def rms(lo, hi):
        seg = audio[:, int(lo * SR):int(hi * SR)]
        return float(np.sqrt(np.mean(seg**2)))

    early, mid, late = rms(0.1, 0.4), rms(0.8, 1.2), rms(2.0, 2.6)
    write_wav("fdn_reverb.wav", audio, SR)  # noqa: F405
    print(f"wrote fdn_reverb.wav: peak {np.abs(audio).max():.3f}, "
          f"RMS early/mid/late = {early:.4f}/{mid:.4f}/{late:.5f}")


if __name__ == "__main__":
    main()
