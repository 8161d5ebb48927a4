"""PolyBLEP anti-aliased oscillator (reference: polyblep.rs, itself a port of
Martin Finke's port of Tale's Jesusonic PolyBLEP generator — we port the
*math*, vectorized over the block).

TPU-first: phase is a u32 fixed-point cumulative sum over the block (2^30
units per cycle, the reference WavetablePhase convention, wavetable.rs:10-15)
— integer adds are associative, so the jnp.cumsum scan path and the kernel's
Hillis-Steele doubling produce BIT-identical phase at every block size, where
the earlier float cumsum reassociated up to 1.8e-3 at B=1024. Every waveform
is then a pure elementwise function of (t, dt, pulse_width), so a block is
one fused VPU expression. The waveform selector is an integer parameter; it's evaluated at
block rate (``lax.switch`` on the block's first sample — a deliberate, cheap
divergence from the reference, where mid-block waveform switches are anyway
an edge case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat, pinteger
from .osc import _freq_to_inc_u32

import enum


class Waveform(enum.IntEnum):
    """polyblep.rs Waveform."""

    Sawtooth = 0
    Sine = 1
    Cosine = 2
    Triangle = 3
    Square = 4
    Rectangle = 5
    Ramp = 6
    ModifiedTriangle = 7
    ModifiedSquare = 8
    HalfWaveRectifiedSine = 9
    FullWaveRectifiedSine = 10
    TriangularPulse = 11
    TrapezoidFixed = 12
    TrapezoidVariable = 13


def _frac(t):
    return t - jnp.trunc(t)  # bitwise_or_zero wrap for t >= 0


# u32 fixed-point phase: 2^30 units per cycle (the wavetable convention,
# TABLE_SIZE * FRACTIONAL_PART) — increments stay exact (unclamped) for
# freq < 2*sr, and t is read back as the top 24 bits (the f32 mantissa
# width; the i32 convert of a <2^24 value is exact on every backend incl.
# Mosaic, which has no u32->f32 convert).
_PHASE_CYCLE = float(1 << 30)
_PHASE_MASK = np.uint32((1 << 30) - 1)
_T_SCALE = 1.0 / float(1 << 24)


def _phase_to_t(ph, dtype):
    """u32 phase (mod 2^30 per cycle) -> unit ramp t in [0, 1)."""
    bits = (ph & _PHASE_MASK) >> 6  # 24-bit value
    return jax.lax.bitcast_convert_type(bits, jnp.int32).astype(dtype) * jnp.asarray(
        _T_SCALE, dtype
    )


def blep(t, dt):
    """Polynomial band-limited step residual (polyblep.rs:47-55)."""
    a = -jnp.square(t / dt - 1.0)
    b = jnp.square((t - 1.0) / dt + 1.0)
    return jnp.where(t < dt, a, jnp.where(t > 1.0 - dt, b, jnp.zeros_like(t)))


def blamp(t, dt):
    """Band-limited ramp residual (polyblep.rs:58-67)."""
    ta = t / dt - 1.0
    a = -(1.0 / 3.0) * ta * ta * ta
    tb = (t - 1.0) / dt + 1.0
    b = (1.0 / 3.0) * tb * tb * tb
    return jnp.where(t < dt, a, jnp.where(t > 1.0 - dt, b, jnp.zeros_like(t)))


TAU = 2.0 * np.pi


def _sin(t, dt, pw):
    return jnp.sin(t * TAU)


def _cos(t, dt, pw):
    return jnp.cos(t * TAU)


def _half(t, dt, pw):
    t2 = _frac(t + 0.5)
    y = jnp.where(t < 0.5, 2.0 * jnp.sin(t * TAU) - 2.0 / np.pi, -2.0 / np.pi)
    return y + TAU * dt * (blamp(t, dt) + blamp(t2, dt))


def _full(t, dt, pw):
    _t = _frac(t + 0.25)
    y = 2.0 * jnp.sin(_t * np.pi) - 4.0 / np.pi
    return y + TAU * dt * blamp(_t, dt)


def _tri(t, dt, pw):
    t1 = _frac(t + 0.25)
    t2 = _frac(t + 0.75)
    y = t * 4.0
    y = jnp.where(y >= 3.0, y - 4.0, jnp.where(y > 1.0, 2.0 - y, y))
    return y + 4.0 * dt * (blamp(t1, dt) - blamp(t2, dt))


def _tri2(t, dt, pw):
    pw = jnp.clip(pw, 0.0001, 0.9999)
    t1 = _frac(t + 0.5 * pw)
    t2 = _frac(t + 1.0 - 0.5 * pw)
    y = t * 2.0
    y = jnp.where(
        y >= 2.0 - pw,
        (y - 2.0) / pw,
        jnp.where(y >= pw, 1.0 - (y - pw) / (1.0 - pw), y / pw),
    )
    return y + dt / (pw - pw * pw) * (blamp(t1, dt) - blamp(t2, dt))


def _trip(t, dt, pw):
    t1 = _frac(t + 0.75 + 0.5 * pw)
    y1 = 4.0 * t1
    y = jnp.where(
        t1 >= pw,
        -pw,
        jnp.where(y1 >= 2.0 * pw, 4.0 - y1 / pw - pw, y1 / pw - pw),
    )
    t2 = _frac(t1 + 1.0 - 0.5 * pw)
    t3 = _frac(t1 + 1.0 - pw)
    corr = 2.0 * dt / pw * (blamp(t1, dt) - 2.0 * blamp(t2, dt) + blamp(t3, dt))
    return jnp.where(pw > 0.0, y + corr, y)


def _trap(t, dt, pw):
    y = 4.0 * t
    y = jnp.where(y >= 3.0, y - 4.0, jnp.where(y > 1.0, 2.0 - y, y))
    y = jnp.clip(2.0 * y, -1.0, 1.0)
    t1 = _frac(t + 0.125)
    t2 = _frac(t1 + 0.5)
    y = y + 4.0 * dt * (blamp(t1, dt) - blamp(t2, dt))
    t1 = _frac(t + 0.375)
    t2 = _frac(t1 + 0.5)
    return y + 4.0 * dt * (blamp(t1, dt) - blamp(t2, dt))


def _trap2(t, dt, pw):
    pw = jnp.minimum(pw, 0.9999)
    scale = 1.0 / (1.0 - pw)
    y = 4.0 * t
    y = jnp.where(y >= 3.0, y - 4.0, jnp.where(y > 1.0, 2.0 - y, y))
    y = jnp.clip(scale * y, -1.0, 1.0)
    t1 = _frac(t + 0.25 - 0.25 * pw)
    t2 = _frac(t1 + 0.5)
    y = y + scale * 2.0 * dt * (blamp(t1, dt) - blamp(t2, dt))
    t1 = _frac(t + 0.25 + 0.25 * pw)
    t2 = _frac(t1 + 0.5)
    return y + scale * 2.0 * dt * (blamp(t1, dt) - blamp(t2, dt))


def _sqr(t, dt, pw):
    t2 = _frac(t + 0.5)
    y = jnp.where(t < 0.5, 1.0, -1.0)
    return y + blep(t, dt) - blep(t2, dt)


def _sqr2(t, dt, pw):
    t1 = _frac(t + 0.875 + 0.25 * (pw - 0.5))
    t2 = _frac(t + 0.375 + 0.25 * (pw - 0.5))
    y = jnp.where(t1 < 0.5, 1.0, -1.0) + blep(t1, dt) - blep(t2, dt)
    t1 = _frac(t1 + 0.5 * (1.0 - pw))
    t2 = _frac(t2 + 0.5 * (1.0 - pw))
    y = y + jnp.where(t1 < 0.5, 1.0, -1.0) + blep(t1, dt) - blep(t2, dt)
    return 0.5 * y


def _rect(t, dt, pw):
    t2 = _frac(t + 1.0 - pw)
    y = -2.0 * pw + jnp.where(t < pw, 2.0, 0.0)
    return y + blep(t, dt) - blep(t2, dt)


def _saw(t, dt, pw):
    _t = _frac(t + 0.5)
    return 2.0 * _t - 1.0 - blep(_t, dt)


def _ramp(t, dt, pw):
    _t = _frac(t)
    return 1.0 - 2.0 * _t + blep(_t, dt)


_WAVEFORM_FNS = [
    _saw,  # Sawtooth = 0
    _sin,
    _cos,
    _tri,
    _sqr,
    _rect,
    _ramp,
    _tri2,
    _sqr2,
    _half,
    _full,
    _trip,
    _trap,
    _trap2,
]


class PolyBlep(UGen):
    """Anti-aliased classic waveforms via polyBLEP (polyblep.rs:128-509)."""

    inputs = 0
    outputs = 1
    params = (
        pinteger("waveform", Waveform.Sawtooth, enum=Waveform),
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("pulse_width", 0.5),
    )

    def __init__(self, waveform: Waveform = Waveform.Sawtooth, freq: float = 440.0):
        self.pdefaults = {"waveform": int(waveform), "freq": float(freq)}

    def batch_key(self):
        # process closes over nothing instance-specific (waveform is a
        # parameter): eligible for auto-batching and chain collapse
        return (type(self),)

    def init(self, ctx: AudioCtx):
        return {"t": jnp.zeros((), jnp.uint32)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        dtype = ctx.dtype
        sr = float(ctx.sample_rate)
        dt = params["freq"] / jnp.asarray(sr, dtype)  # freq_in_seconds_per_sample
        inc = _freq_to_inc_u32(params["freq"], _PHASE_CYCLE / sr, dtype)
        csum = jnp.cumsum(inc)  # wrapping u32, exact
        ecs = jnp.concatenate([jnp.zeros((1,), jnp.uint32), csum])
        t = _phase_to_t(state["t"] + ecs[:B], dtype)
        carry = (state["t"] + ecs[B]).astype(jnp.uint32)
        pw = params["pulse_width"]

        w = params["waveform"][0]  # block-rate waveform select
        out = jax.lax.switch(
            jnp.clip(w, 0, len(_WAVEFORM_FNS) - 1),
            _WAVEFORM_FNS,
            t,
            dt,
            pw,
        )
        # above sr/4 always fall back to the pure sine (polyblep.rs:207-211)
        out = jnp.where(params["freq"] >= sr / 4.0, jnp.sin(t * TAU), out)
        return {"t": carry}, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the same elementwise
        waveform math on [1, B] rows, phase via a Hillis-Steele u32 lane
        cumsum — wrapping integer adds are associative, so this is
        BIT-identical to the scan path's jnp.cumsum at every block size.
        The block-rate waveform select is an in-kernel ``lax.switch`` on
        the row's first lane."""
        B = ctx.block_size
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            dt = params["freq"] / sr              # [1, B]
            inc = _freq_to_inc_u32(params["freq"], _PHASE_CYCLE / sr, ctx.dtype)
            csum = inc  # inclusive u32 prefix sum by doubling
            s = 1
            while s < B:
                csum = csum + jnp.concatenate(
                    [jnp.zeros((1, s), jnp.uint32), csum[:, : B - s]], axis=1
                )
                s *= 2
            t = _phase_to_t(state["t"] + (csum - inc), ctx.dtype)
            carry = state["t"] + csum[:, B - 1 :]
            pw = params["pulse_width"]
            w = params["waveform"][0, 0]
            out = jax.lax.switch(
                jnp.clip(w, 0, len(_WAVEFORM_FNS) - 1),
                _WAVEFORM_FNS,
                t,
                dt,
                pw,
            )
            out = jnp.where(
                params["freq"] >= sr / 4.0, jnp.sin(t * TAU), out
            )
            return {"t": carry}, out

        return fn
