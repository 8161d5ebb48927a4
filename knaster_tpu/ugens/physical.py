"""Physical-modeling UGens (beyond reference — knaster has no waveguide or
Karplus-Strong models; the nearest machinery is its delay family,
knaster_core_dsp/src/ugens/delay.rs, whose allpass-interpolator and
ring-buffer idioms this module shares via :class:`AllpassDelay`'s helpers).

:class:`PluckedString` is an excitation-driven Karplus-Strong string
resonator (Jaffe-Smith extensions: allpass fractional tuning, loop-filter
delay compensation). It deliberately takes the excitation as an audio
INPUT instead of owning a trigger+noise burst: "pluck" is any short burst
fed into it (``WhiteNoise * EnvAr`` is the classic), which keeps the
resonator trigger-free, composable, and chain/superblock-friendly — the
graph engine's sample-accurate triggers drive the exciter envelope
instead.

TPU mapping: the string loop is a sequential recurrence, but whenever the
loop is at least one block long (``long=True`` and freq <= sr/B — i.e.
every bass/mid string at small blocks) the WHOLE block vectorizes: ring
reads can't hit in-block writes, and the two 1-pole recurrences in the
loop (allpass interpolator, brightness lowpass) evaluate via
``affine_scan_1d`` in O(log B) depth. Short/high strings keep the exact
per-sample ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat
from .delay import AllpassDelay
from .filters import onepole_lowpass_coeffs  # noqa: F401  (re-export family)


def string_blockwise(state, x, nf, coeff, b1, damp, L, B, dtype):
    """One block of the KS loop, fully vectorized (requires nf >= B so
    ring reads never hit in-block writes). ``state`` needs keys
    buf/wp/ap_in/ap_out/d_last/lp; returns (state', out [B]). Shared by
    :class:`PluckedString` (long mode) and the bank-scale
    ``models.voices.PluckedVoice`` (where it vmaps across voices)."""
    from ..core.dsp import affine_scan_1d

    raw, d, wslots = AllpassDelay._blockwise_read(
        state, nf, coeff, L, B, dtype
    )
    d_prev = jnp.concatenate([state["d_last"][None], d[:-1]])
    h = 0.5 * (d + d_prev)
    a0 = 1.0 - b1
    lp_pre, _ = affine_scan_1d(b1, a0 * h, state["lp"])
    lp = b1 * lp_pre + a0 * h
    write = x + damp * lp
    new = {
        "buf": state["buf"].at[wslots].set(write),
        "wp": (state["wp"] + B) % L,
        "ap_in": raw[-1],
        "ap_out": d[-1],
        "d_last": d[-1],
        "lp": lp[-1],
    }
    return new, write


def string_geometry(freq, brightness, damp, sample_rate, min_freq, L, dtype):
    """(nf, coeff, b1, damp) from the loop-compensated length — see
    :meth:`PluckedString._geometry`."""
    freq = jnp.clip(freq, min_freq, sample_rate / 2)
    b1 = jnp.clip(1.0 - brightness, 0.0, 0.995).astype(dtype)
    comp = 0.5 + jnp.minimum(b1 / (1.0 - b1), 8.0)
    df = jnp.clip(sample_rate / freq - comp, 1.0, float(L - 2))
    nf, coeff = AllpassDelay._delay_geometry(df, L, dtype)
    return nf, coeff, b1, damp.astype(dtype)


class PluckedString(UGen):
    """Karplus-Strong string: ``buf`` is the traveling wave, the loop is
    delay -> allpass fractional tuning -> damping avg -> brightness
    one-pole -> *damp -> (+ excitation) -> write.

        d[n]  = allpass_read(buf, sr/freq - comp)      # fractional delay
        h[n]  = 0.5 * (d[n] + d[n-1])                  # KS damping avg
        lp[n] = b1*lp[n-1] + (1-b1)*h[n]               # brightness lowpass
        w[n]  = x[n] + damp * lp[n]                    # feedback + exciter
        out[n] = w[n]

    ``comp`` subtracts the loop filters' own delay (0.5 samples for the
    avg, ~b1/(1-b1) for the one-pole at low frequencies) so the sounding
    pitch tracks ``freq``; the allpass interpolator absorbs the fractional
    remainder (delay.rs:160-178 geometry).

    Params: ``freq`` (Hz), ``damp`` (loop gain, <1 decays; 0.996 ~ guitar),
    ``brightness`` (1 = bypass the lowpass — pure KS avg damping; smaller =
    darker, faster high-partial decay).

    ``min_freq`` bounds the buffer (lowest playable note). ``long=True``
    declares freq stays <= sr/block (loop >= one block) and unlocks the
    blockwise path; ``max_freq`` (long mode) additionally bounds the
    shortest loop so superblocks up to it stay exact (``superblock_cap``,
    same contract as the long delays)."""

    inputs = 1
    outputs = 1
    params = (
        pfloat("freq", 220.0, range=(1.0, 20000.0), logarithmic=True,
               kind=ParameterKind.FREQUENCY),
        pfloat("damp", 0.996, range=(0.0, 1.0)),
        pfloat("brightness", 1.0, range=(0.0, 1.0)),
    )

    def __init__(self, freq: float = 220.0, damp: float = 0.996,
                 brightness: float = 1.0, min_freq: float = 20.0,
                 long: bool = False, max_freq=None):
        self.min_freq = float(min_freq)
        self.long = bool(long)
        self.block_invariant = not self.long  # long clamps loops >= block
        self.max_freq = None if max_freq is None else float(max_freq)
        self.pdefaults = {
            "freq": float(freq),
            "damp": float(damp),
            "brightness": float(brightness),
        }

    def init(self, ctx: AudioCtx):
        L = int(np.ceil(ctx.sample_rate / self.min_freq)) + 4
        self._length = L
        if self.long and self.max_freq is not None:
            # loops never get shorter than sr/max_freq, so k-block programs
            # up to that length bit-match per-block rendering
            self.superblock_cap = max(
                1, min(L, int(ctx.sample_rate / self.max_freq))
            )
        return {
            "buf": jnp.zeros((L,), ctx.dtype),
            "wp": jnp.zeros((), jnp.int32),
            # allpass interpolator state (reference-quirk 1.0 init would
            # ring the string at t=0; a silent string starts at rest)
            "ap_in": jnp.zeros((), ctx.dtype),
            "ap_out": jnp.zeros((), ctx.dtype),
            "d_last": jnp.zeros((), ctx.dtype),
            "lp": jnp.zeros((), ctx.dtype),
        }

    def _geometry(self, ctx: AudioCtx, params):
        """Per-sample (nf, coeff, b1, damp): integer delay + allpass coeff
        from the filter-compensated loop length (0.5-sample avg FIR +
        one-pole DC phase delay b1/(1-b1), capped so extreme darkness
        can't starve the line), brightness pole, gain."""
        return string_geometry(
            params["freq"], params["brightness"], params["damp"],
            ctx.sample_rate, self.min_freq, self._length, ctx.dtype,
        )

    def process(self, ctx: AudioCtx, state, inputs, params):
        from ..core.dsp import affine_scan_1d

        B = ctx.block_size
        L = self._length
        dtype = ctx.dtype
        x = inputs[0]
        nf, coeff, b1, damp = self._geometry(ctx, params)

        if self.long and L >= B:
            nf = jnp.maximum(nf, B)
            new, write = string_blockwise(
                state, x, nf, coeff, b1, damp, L, B, dtype
            )
            return new, write[None, :]

        def step(carry, s):
            buf, wp, ap_in, ap_out, d_last, lp = carry
            rp = (wp + L - s["nf"]) % L
            raw = buf[rp]
            d = s["coeff"] * (raw - ap_out) + ap_in
            h = 0.5 * (d + d_last)
            lp = s["b1"] * lp + (1.0 - s["b1"]) * h
            write = s["x"] + s["damp"] * lp
            buf = buf.at[wp].set(write)
            return (buf, (wp + 1) % L, raw, d, d, lp), write

        carry0 = (state["buf"], state["wp"], state["ap_in"],
                  state["ap_out"], state["d_last"], state["lp"])
        xs = {"x": x, "nf": nf, "coeff": coeff, "b1": b1,
              "damp": jnp.broadcast_to(damp, (B,))}
        (buf, wp, ap_in, ap_out, d_last, lp), out = jax.lax.scan(
            step, carry0, xs
        )
        return {
            "buf": buf, "wp": wp, "ap_in": ap_in, "ap_out": ap_out,
            "d_last": d_last, "lp": lp,
        }, out[None, :]
