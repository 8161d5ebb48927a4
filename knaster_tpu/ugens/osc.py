"""Oscillators (reference: knaster_core_dsp/src/ugens/osc.rs).

TPU-first design: the reference's per-sample phase-increment loop becomes a
block-level **exclusive cumulative sum** of per-sample increments (exact in
u32 fixed point, wrap = native integer overflow), with phase-reset triggers
handled as a segmented cumsum (subtract the running sum at the latest reset
frame). Table reads are gathers into VMEM-resident constant tables. This
keeps the math bit-stable across any voice batching, because integer cumsums
are associative.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat, ptrigger
from .wavetable import (
    AA_FREQ_THRESHOLDS,
    FRACTIONAL_PART,
    TABLE_HIGH_MASK,
    TABLE_SIZE,
    Wavetable,
    shared_sine_table,
)




def _f32_to_u32(x):
    """float -> u32 via i32: Mosaic has no f32->u32 convert, and
    f32->unsigned of negatives is backend-defined anyway. The clamp bound
    is the largest f32 below 2^31 (2^31-128), so the i32 convert is exact
    and every backend (XLA CPU/TPU, Mosaic) computes the same word."""
    clamped = jnp.clip(x, 0.0, 2.0**31 - 128)
    return clamped.astype(jnp.int32).astype(jnp.uint32)


def _freq_to_inc_u32(freq, f2pi: float, dtype):
    """freq -> u32 phase increment with Rust `as u32` saturation semantics
    (negative -> 0; reference osc.rs computes `(freq * f2pi) as u32`).
    Clamped before conversion so every backend agrees."""
    return _f32_to_u32(freq * jnp.asarray(f2pi, dtype))


def _segmented_cumsum_u32(inc_u32, reset_mask, phase0_u32, block_size: int,
                          no_resets: bool = False):
    """phases[t] for t in 0..B and the carried phase after the block.

    phases[t] = phase0 + sum(inc[0:t])  (wrapping u32), unless a reset
    trigger fired at some frame r <= t, in which case the phase restarts at 0
    at frame r: phases[t] = sum(inc[r:t]).

    ``no_resets`` (the fast program's static AudioCtx.no_events hint) skips
    the reset machinery — its cummax + per-sample gather are the expensive
    part, and under vmapped batches the gather alone can dominate the block.
    """
    B = block_size
    inc = inc_u32.astype(jnp.uint32)
    csum = jnp.cumsum(inc)  # inclusive, wrapping
    ecs = jnp.concatenate([jnp.zeros((1,), jnp.uint32), csum])  # [B+1] exclusive
    if no_resets:
        return (phase0_u32 + ecs[:B]).astype(jnp.uint32), (
            phase0_u32 + ecs[B]
        ).astype(jnp.uint32)
    t_idx = jnp.arange(B, dtype=jnp.int32)
    last_reset = lax.cummax(jnp.where(reset_mask, t_idx, jnp.int32(-1)))
    has_reset = last_reset >= 0
    base_at_reset = ecs[jnp.maximum(last_reset, 0)]
    phases = jnp.where(
        has_reset, ecs[:B] - base_at_reset, phase0_u32 + ecs[:B]
    ).astype(jnp.uint32)
    # carry: phase after the last sample
    any_reset = jnp.any(reset_mask)
    last_r = jnp.max(jnp.where(reset_mask, t_idx, -1))
    carry = jnp.where(
        any_reset,
        ecs[B] - ecs[jnp.maximum(last_r, 0)],
        phase0_u32 + ecs[B],
    ).astype(jnp.uint32)
    return phases, carry


def _segmented_cumsum_f(inc, reset_mask, phase0, block_size: int, dtype,
                        no_resets: bool = False):
    """Float phase accumulation with reset triggers (for SinNumeric/Phasor)."""
    B = block_size
    csum = jnp.cumsum(inc.astype(dtype))
    ecs = jnp.concatenate([jnp.zeros((1,), dtype), csum])
    if no_resets:
        return phase0 + ecs[:B], phase0 + ecs[B]
    t_idx = jnp.arange(B, dtype=jnp.int32)
    last_reset = lax.cummax(jnp.where(reset_mask, t_idx, jnp.int32(-1)))
    has_reset = last_reset >= 0
    base_at_reset = ecs[jnp.maximum(last_reset, 0)]
    phases = jnp.where(has_reset, ecs[:B] - base_at_reset, phase0 + ecs[:B])
    any_reset = jnp.any(reset_mask)
    last_r = jnp.max(jnp.where(reset_mask, t_idx, -1))
    carry = jnp.where(any_reset, ecs[B] - ecs[jnp.maximum(last_r, 0)], phase0 + ecs[B])
    return phases, carry


class SinWt(UGen):
    """Sine with the reference's u32 fixed-point wavetable phase
    (osc.rs:97-168 SinWt: 16384-entry table, lookup without interpolation).

    TPU-first twist: the reference's table holds ``sin(2πi/16384)``, so
    instead of gathering from the table we *recompute* ``sin`` of the
    quantized index — bit-equivalent semantics (same phase quantization,
    same frequency truncation) but pure VPU math. On a v5e this is ~45×
    faster than the gather (983M random table reads/s saturate the
    scatter/gather path long before the VPU breaks a sweat). Set
    ``lookup=True`` to force the literal table read."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("phase_offset", 0.0),
        ptrigger("reset_phase"),
    )

    def batch_key(self):
        return (type(self), self.lookup)

    def __init__(self, freq: float = 440.0, lookup: bool = False):
        self.pdefaults = {"freq": float(freq)}
        self.lookup = bool(lookup)

    def init(self, ctx: AudioCtx):
        return {"phase": jnp.zeros((), dtype=jnp.uint32)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        f2pi = float(TABLE_SIZE) * float(FRACTIONAL_PART) / ctx.sample_rate
        inc = _freq_to_inc_u32(params["freq"], f2pi, ctx.dtype)
        phases, carry = _segmented_cumsum_u32(
            inc, params["reset_phase"], state["phase"], B,
            no_resets=ctx.no_events,
        )
        off = _f32_to_u32(params["phase_offset"] * FRACTIONAL_PART)
        idx = ((phases + off) >> 16) & TABLE_HIGH_MASK
        if self.lookup:
            # trace-time constant table (XLA hoists & dedupes it)
            table = jnp.asarray(shared_sine_table(ctx.dtype))
            out = table[idx]
        else:
            scale = jnp.asarray(2.0 * np.pi / TABLE_SIZE, ctx.dtype)
            out = jnp.sin(idx.astype(ctx.dtype) * scale)
        return {"phase": carry}, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the fast program's
        no-reset path — u32 phase as a log-depth wrapping prefix sum
        (exact: u32 addition is associative), quantized jnp.sin."""
        if self.lookup:
            return None  # table gather: not a Mosaic-supported chain op
        B = ctx.block_size
        f2pi = float(TABLE_SIZE) * float(FRACTIONAL_PART) / ctx.sample_rate
        scale = 2.0 * np.pi / TABLE_SIZE

        def fn(inputs, state, params):
            inc = _freq_to_inc_u32(params["freq"], f2pi, ctx.dtype)  # [1, B]
            # inclusive prefix sum by doubling (Hillis-Steele): wrapping
            # u32 adds make any summation order exact
            csum = inc
            s = 1
            while s < B:
                csum = csum + jnp.concatenate(
                    [jnp.zeros((1, s), jnp.uint32), csum[:, : B - s]], axis=1
                )
                s *= 2
            phase0 = state["phase"]  # [1, 1] u32
            phases = phase0 + (csum - inc)  # exclusive cumsum + carry-in
            carry = phase0 + csum[:, B - 1 : B]
            off = _f32_to_u32(params["phase_offset"] * FRACTIONAL_PART)
            idx = ((phases + off) >> 16) & TABLE_HIGH_MASK
            # Mosaic has no u32->f32 convert either; idx < 16384 so the
            # i32 bitcast is value-preserving
            idx_i = lax.bitcast_convert_type(idx, jnp.int32)
            out = jnp.sin(idx_i.astype(ctx.dtype) * jnp.asarray(scale, ctx.dtype))
            return {"phase": carry}, out

        return fn


class OscWt(UGen):
    """Arbitrary anti-aliased wavetable oscillator (osc.rs:30-90 OscWt).

    Owns a :class:`Wavetable` mip chain; the playback frequency selects the
    band-limited partial table per sample (nearest-neighbour read, matching
    the reference's ``Wavetable::get``)."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("phase_offset", 0.0),
        ptrigger("reset_phase"),
    )

    # the table data lives in STATE (fixed [17, TABLE_SIZE] shapes), not as
    # trace constants: graphs differing only in wavetable content share
    # cached programs (live wavetable swap = push/free at cache-hit cost),
    # and programs don't embed a megabyte of table constants per node
    signature_exclude = ("pdefaults", "wavetable")

    def __init__(self, wavetable: Wavetable, freq: float = 440.0, interpolate: bool = False):
        self.pdefaults = {"freq": float(freq)}
        self.wavetable = wavetable
        self.interpolate = bool(interpolate)

    def init(self, ctx: AudioCtx):
        tables, diffs = self.wavetable.stacked(ctx.dtype)
        st = {
            "phase": jnp.zeros((), dtype=jnp.uint32),
            "tables": jnp.asarray(tables),
        }
        if self.interpolate:
            st["diffs"] = jnp.asarray(diffs)
        return st

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        f2pi = float(TABLE_SIZE) * float(FRACTIONAL_PART) / ctx.sample_rate
        freq = params["freq"]
        inc = _freq_to_inc_u32(freq, f2pi, ctx.dtype)
        phases, carry = _segmented_cumsum_u32(
            inc, params["reset_phase"], state["phase"], B,
            no_resets=ctx.no_events,
        )
        off = _f32_to_u32(params["phase_offset"] * FRACTIONAL_PART)
        ph = phases + off
        idx = (ph >> 16) & TABLE_HIGH_MASK
        ti = jnp.searchsorted(
            jnp.asarray(AA_FREQ_THRESHOLDS), freq.astype(jnp.float32), side="left"
        )
        out = state["tables"][ti, idx]
        if self.interpolate:
            frac = (ph & jnp.uint32(0xFFFF)).astype(ctx.dtype) / jnp.asarray(
                65535.0, ctx.dtype
            )
            out = out + state["diffs"][ti, idx] * frac
        new_state = dict(state)
        new_state["phase"] = carry
        return new_state, out[None, :]


class SinNumeric(UGen):
    """Per-sample computed sine (osc.rs:222-270 SinNumeric): the teaching
    example; phase in [0,1), out = sin((phase + offset) * tau)."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("phase_offset", 0.0),
        ptrigger("reset_phase"),
    )

    def batch_key(self):
        return (type(self),)

    def __init__(self, freq: float = 440.0):
        self.pdefaults = {"freq": float(freq)}

    def init(self, ctx: AudioCtx):
        return {"phase": jnp.zeros((), dtype=ctx.dtype)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        inc = params["freq"] / jnp.asarray(float(ctx.sample_rate), ctx.dtype)
        phases, carry = _segmented_cumsum_f(
            inc, params["reset_phase"], state["phase"], B, ctx.dtype,
            no_resets=ctx.no_events,
        )
        out = jnp.sin((phases + params["phase_offset"]) * jnp.asarray(2.0 * np.pi, ctx.dtype))
        # keep the carried phase bounded (reference wraps with `-= 1.0`)
        carry = carry - jnp.floor(carry)
        return {"phase": carry}, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the fast program's
        no-resets path (plain lax.cumsum — triggers never fire there) on
        the kernel-shaped [1, B] rows, bit-equal to ``process``."""
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            inc = params["freq"] / jnp.asarray(sr, ctx.dtype)  # [1, B]
            B = inc.shape[-1]
            csum = jnp.cumsum(inc.astype(ctx.dtype), axis=-1)
            ecs = jnp.concatenate(
                [jnp.zeros((1, 1), ctx.dtype), csum], axis=-1
            )
            phases = state["phase"] + ecs[:, :B]  # state["phase"] is [1, 1]
            out = jnp.sin(
                (phases + params["phase_offset"])
                * jnp.asarray(2.0 * np.pi, ctx.dtype)
            )
            carry = state["phase"] + ecs[:, B : B + 1]
            carry = carry - jnp.floor(carry)
            return {"phase": carry}, out

        return fn


class Phasor(UGen):
    """0→1 ramp at a given frequency; aliasing (osc.rs:172-218 Phasor)."""

    inputs = 0
    outputs = 1
    params = (pfloat("freq", 0.0, kind=ParameterKind.FREQUENCY),)

    def batch_key(self):
        return (type(self),)

    def __init__(self, freq: float = 0.0):
        self.pdefaults = {"freq": float(freq)}

    def init(self, ctx: AudioCtx):
        return {"phase": jnp.zeros((), dtype=ctx.dtype)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        step = params["freq"] / jnp.asarray(float(ctx.sample_rate), ctx.dtype)
        csum = jnp.cumsum(step)
        ecs = jnp.concatenate([jnp.zeros((1,), ctx.dtype), csum])
        phases = state["phase"] + ecs[:B]
        out = phases - jnp.floor(phases)  # wrap to [0, 1)
        carry = state["phase"] + ecs[B]
        carry = carry - jnp.floor(carry)
        return {"phase": carry}, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): ``process`` verbatim on
        the kernel-shaped [1, B] rows (same lax.cumsum over the same length,
        so bit-equal to the scan executor)."""
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            step = params["freq"] / jnp.asarray(sr, ctx.dtype)  # [1, B]
            B = step.shape[-1]
            csum = jnp.cumsum(step, axis=-1)
            ecs = jnp.concatenate(
                [jnp.zeros((1, 1), ctx.dtype), csum], axis=-1
            )
            phases = state["phase"] + ecs[:, :B]  # state["phase"] is [1, 1]
            out = phases - jnp.floor(phases)
            carry = state["phase"] + ecs[:, B : B + 1]
            carry = carry - jnp.floor(carry)
            return {"phase": carry}, out

        return fn
