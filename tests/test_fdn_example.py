"""The FDN reverb example (examples/fdn_reverb.py): the BASELINE
"feedback delay network + Galactic chain" config driven end-to-end —
feedback edges, long allpass delay lines, Hadamard mixing via math sugar,
Galactic on the tap bus."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from fdn_reverb import SR, build_fdn  # noqa: E402

from knaster_tpu import AudioProcessor, AudioProcessorOptions  # noqa: E402


def _render(feedback_gain, seconds=1.6, block_size=64, galactic=True):
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block_size)
    )
    trig = g.edit(
        lambda gg: build_fdn(
            gg, block_size, feedback_gain=feedback_gain, galactic=galactic
        )
    )
    trig.trig()
    return np.asarray(proc.render(seconds=seconds))


def _rms(audio, lo, hi):
    seg = audio[:, int(lo * SR):int(hi * SR)]
    return float(np.sqrt(np.mean(seg**2)))


def test_fdn_tail_rings_and_decays():
    audio = _render(0.85)
    assert np.all(np.isfinite(audio))
    early, mid, late = (
        _rms(audio, 0.1, 0.4), _rms(audio, 0.6, 0.9), _rms(audio, 1.2, 1.5)
    )
    # the burst ends at ~54 ms: everything after is recirculation
    assert early > 1e-4, "no reverb tail"
    assert late < early, "tail not decaying"
    assert late > 0.05 * early, "tail collapsed (feedback loop not closed?)"


def test_fdn_feedback_loop_carries_energy():
    """Measured on the raw FDN bus (galactic=False, so Galactic's own tail
    can't mask the loop): with the Hadamard feedback zeroed, everything
    after one pass through the ~1000-2000-sample delay lines is silence;
    the closed loop must still be ringing."""
    closed = _render(0.85, galactic=False)
    open_ = _render(0.0, galactic=False)
    late_closed = _rms(closed, 1.0, 1.5)
    late_open = _rms(open_, 1.0, 1.5)
    assert late_closed > 1e-5
    assert late_closed > 20.0 * max(late_open, 1e-12)
