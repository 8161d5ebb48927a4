"""Modal synthesis: banks of exponentially-decaying sinusoidal resonators.

Beyond-reference model family (the reference has no modal synthesis —
knaster's closest primitives are single SVF/one-pole filters,
knaster_core_dsp/src/ugens/svf.rs). Modal synthesis models a struck or
plucked body as M independent second-order resonators ("modes"), each with a
frequency ratio, a gain and a decay time; any excitation signal (a mallet
pulse, a noise burst, another graph node) drives all modes in parallel.

TPU-first design
----------------
A mode is a complex one-pole: ``s[n] = p·s[n-1] + x[n]`` with pole
``p = r·e^{iθ}``. This backend has no complex dtype, so the state is the real
pair and the update a 2x2 rotation-decay affine map — the SAME shape as the
SVF's cytomic recurrence, so the whole bank rides
:func:`~knaster_tpu.core.dsp.affine_scan_2x2_rows`: an O(log B)-depth
associative scan over ``[M, B]`` rows, all M modes in parallel on VPU lanes,
and the mixdown one ``[M]·[M, B]`` contraction. Coefficients are recomputed
per sample from the parameter arrays (house rule, see filters.py), so
audio-rate ``freq``/``decay`` modulation is exact rather than a special mode.
Modes whose frequency crosses Nyquist get their radius forced to 0 for those
samples (silent and stateless above Nyquist, ring-up from zero on return).

The impulse response of mode m struck at sample 0 is exactly
``gain_m · r^n · sin(n·θ_m)`` (the strike enters the cos rail, the output
reads the sin rail), which the tests pin against a numpy model.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.dsp import affine_scan_2x2_rows
from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat

_LN10_M3 = float(-3.0 * np.log(10.0))  # ln(10^-3): -60 dB in amplitude


class ModalResonator(UGen):
    """M parallel decaying sinusoid modes excited by the input channel.

    Static config: ``ratios`` (mode frequency = ``freq * ratios[m]``),
    ``gains`` (output mix weights) and ``decays`` (relative T60 per mode; the
    effective T60 of mode m is ``decay * decays[m]`` seconds). Parameters:

    * ``freq`` — fundamental in Hz (audio-rate capable; every mode tracks it).
    * ``decay`` — T60 scale in seconds: time for a mode with ``decays[m]==1``
      to fall 60 dB.

    Presets: :meth:`bell`, :meth:`bar`, :meth:`string`, :meth:`membrane`.
    """

    inputs = 1
    outputs = 1
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("decay", 1.0, range=(0.0, 100.0), kind=ParameterKind.SECONDS),
    )

    def __init__(
        self,
        freq: float = 440.0,
        decay: float = 1.0,
        ratios: Sequence[float] = (1.0,),
        gains: Optional[Sequence[float]] = None,
        decays: Optional[Sequence[float]] = None,
    ):
        ratios = np.asarray(ratios, np.float32)
        if ratios.ndim != 1 or ratios.size == 0:
            raise ValueError("ratios must be a non-empty 1-D sequence")
        m = ratios.size
        gains = (np.ones(m, np.float32) if gains is None
                 else np.asarray(gains, np.float32))
        decays = (np.ones(m, np.float32) if decays is None
                  else np.asarray(decays, np.float32))
        if gains.shape != (m,) or decays.shape != (m,):
            raise ValueError("gains/decays must match ratios in length")
        self.ratios, self.gains, self.decays = ratios, gains, decays
        self.n_modes = m
        self.pdefaults = {"freq": float(freq), "decay": float(decay)}

    # ---- presets ----------------------------------------------------------
    @staticmethod
    def bell(freq: float = 440.0, decay: float = 4.0) -> "ModalResonator":
        """Church-bell partial set (hum at 0.5, prime, tierce, quint,
        nominal + upper partials); the hum and prime ring longest."""
        return ModalResonator(
            freq, decay,
            ratios=(0.5, 1.0, 1.183, 1.506, 2.0, 2.514, 2.662, 3.011, 4.166,
                    5.433, 6.796, 8.215),
            gains=(0.6, 1.0, 0.75, 0.6, 0.9, 0.25, 0.2, 0.25, 0.15, 0.1,
                   0.07, 0.05),
            decays=(1.0, 0.8, 0.55, 0.45, 0.4, 0.25, 0.22, 0.18, 0.12, 0.09,
                    0.07, 0.05),
        )

    @staticmethod
    def bar(freq: float = 440.0, decay: float = 1.5, n_modes: int = 6) -> "ModalResonator":
        """Ideal free bar (vibraphone/glockenspiel family): transverse mode
        frequencies scale as ((2k+1)/3)^2 — 1, 2.78, 5.44, 9, ..."""
        k = np.arange(1, n_modes + 1, dtype=np.float64)
        ratios = ((2.0 * k + 1.0) / 3.0) ** 2
        return ModalResonator(
            freq, decay,
            ratios=ratios,
            gains=1.0 / k,
            decays=1.0 / k,
        )

    @staticmethod
    def string(freq: float = 440.0, decay: float = 2.0, n_modes: int = 16) -> "ModalResonator":
        """Harmonic series with 1/h gains and decays — a plucked-string-like
        spectrum as a linear resonator (compare ugens.physical.PluckedString,
        the waveguide formulation)."""
        h = np.arange(1, n_modes + 1, dtype=np.float64)
        return ModalResonator(freq, decay, ratios=h, gains=1.0 / h, decays=1.0 / h)

    @staticmethod
    def membrane(freq: float = 110.0, decay: float = 0.4) -> "ModalResonator":
        """Ideal circular membrane (drum): mode ratios are Bessel-zero
        quotients — dense and inharmonic."""
        return ModalResonator(
            freq, decay,
            ratios=(1.0, 1.594, 2.136, 2.296, 2.653, 2.918, 3.156, 3.501),
            gains=(1.0, 0.7, 0.5, 0.45, 0.35, 0.3, 0.25, 0.2),
            decays=(1.0, 0.7, 0.55, 0.5, 0.42, 0.38, 0.33, 0.28),
        )

    # ---- UGen protocol ----------------------------------------------------
    def batch_key(self):
        return (type(self), self.ratios.tobytes(), self.gains.tobytes(),
                self.decays.tobytes())

    def init(self, ctx: AudioCtx):
        # two distinct arrays: donated buffers must not alias
        return {"s0": jnp.zeros((self.n_modes,), ctx.dtype),
                "s1": jnp.zeros((self.n_modes,), ctx.dtype)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        sr = np.float32(ctx.sample_rate)
        ratios = jnp.asarray(self.ratios, dtype)[:, None]     # [M, 1]
        rel = jnp.asarray(self.decays, dtype)[:, None]
        gains = jnp.asarray(self.gains, dtype)

        freq = params["freq"][None, :]                        # [1, B]
        theta = (np.float32(2.0 * np.pi) / sr) * (freq * ratios)   # [M, B]
        alive = theta < np.float32(np.pi)
        # radius for a T60 of decay*rel seconds: r = 10^(-3/(t60*sr))
        n60 = jnp.maximum(params["decay"][None, :] * rel * sr, np.float32(1e-4))
        r = jnp.where(alive, jnp.exp(np.float32(_LN10_M3) / n60),
                      jnp.zeros_like(n60))
        cth = r * jnp.cos(theta)
        sth = r * jnp.sin(theta)

        x = jnp.broadcast_to(inputs[0][None, :], cth.shape)
        zero = jnp.zeros_like(x)
        s_pre0, s_pre1, sf0, sf1 = affine_scan_2x2_rows(
            cth, -sth, sth, cth, x, zero,
            state["s0"][:, None], state["s1"][:, None],
        )
        # state AFTER absorbing sample t (the strike is audible in its own
        # sample's rotation): s1' = sth*s_pre0 + cth*s_pre1 (+ 0)
        y_modes = sth * s_pre0 + cth * s_pre1                 # [M, B]
        # elementwise+sum, not einsum: a [M]x[M,B] einsum dispatches to the
        # MXU at DEFAULT precision (bf16 passes) on TPU — the round-5
        # affine_scan_2d finding (core/dsp.py)
        y = jnp.sum(gains[:, None] * y_modes, axis=0)
        return {"s0": sf0[:, 0], "s1": sf1[:, 0]}, y[None, :]

    def ring_energy(self, state) -> jnp.ndarray:
        """Gain-weighted RMS amplitude of the current ring-out — the scalar a
        voice wraps into its done/idle decision (blockwise resolution)."""
        g = jnp.asarray(self.gains, state["s0"].dtype)
        return jnp.sqrt(jnp.sum((g * state["s0"]) ** 2 + (g * state["s1"]) ** 2))
