"""Filters: state-variable filter and one-pole (reference: svf.rs, onepole.rs).

TPU-first: these IIRs are *linear* recurrences, so instead of the reference's
per-sample loops they run as O(log B)-depth ``associative_scan``s over affine
maps (see core/dsp.py). Coefficients are recomputed from the per-sample
parameter arrays with vectorized math — identical formulas to the reference's
``set_coeffs`` (svf.rs:150-268), evaluated for every sample, which makes
audio-rate cutoff/q/gain modulation exact rather than a special mode.

SVF topology: cytomic SvfLinearTrapOptimised2 (Andrew Simper, 2013), same as
the reference (svf.rs:270-300):
    v3 = x - ic2;  v1 = a1*ic1 + a2*v3;  v2 = ic2 + a2*ic1 + a3*v3
    ic1' = 2*v1 - ic1;  ic2' = 2*v2 - ic2;  y = m0*x + m1*v1 + m2*v2
which in state-space form is s' = M s + c·x with
    M = [[2*a1-1, -2*a2], [2*a2, 1-2*a3]],  c = [2*a2, 2*a3]·x.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from ..core.dsp import (
    affine_scan_1d,
    affine_scan_2d,
    affine_scan_2x2_rows,
    tan_first_quadrant,
)
from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat, pinteger, ptrigger


class SvfFilterType(enum.IntEnum):
    """svf.rs SvfFilterType (KnasterIntegerParameter enum)."""

    Low = 0
    High = 1
    Band = 2
    Notch = 3
    Peak = 4
    All = 5
    Bell = 6
    LowShelf = 7
    HighShelf = 8


def svf_coefficients(ty, cutoff, q, gain_db, sample_rate, dtype):
    """Vectorized port of SvfFilter::set_coeffs (svf.rs:150-268).

    ``ty`` is an int array (per sample); float args are arrays of the same
    shape. Returns (a1, a2, a3, m0, m1, m2).
    """
    one = jnp.ones_like(cutoff)
    zero = jnp.zeros_like(cutoff)
    amp = jnp.power(jnp.asarray(10.0, dtype), gain_db / 40.0)
    sqrt_amp = jnp.sqrt(amp)

    is_bell = ty == SvfFilterType.Bell
    is_ls = ty == SvfFilterType.LowShelf
    is_hs = ty == SvfFilterType.HighShelf

    # polynomial tan, not jnp.tan: XLA-TPU's tan approximation measured
    # 6.2e-3 from f64 truth through a 10-deep Bell chain (core/dsp.py
    # tan_first_quadrant); the reference reaches libm tan (svf.rs:150-268)
    g_base = tan_first_quadrant((jnp.asarray(np.pi, dtype) * cutoff) / sample_rate)
    g = jnp.where(
        is_bell | is_ls, g_base / sqrt_amp, jnp.where(is_hs, g_base * sqrt_amp, g_base)
    )
    k = jnp.where(is_bell, 1.0 / (q * amp), 1.0 / q)
    a1 = 1.0 / (1.0 + g * (g + k))
    a2 = g * a1
    a3 = g * a2

    # m0/m1/m2 per type (ordered by SvfFilterType value). Chained wheres,
    # not jnp.select: select_n's integer-indexed lowering is "only
    # float32" in Mosaic, and this function traces inside the chain
    # kernel (SvfFilter.mosaic_stage). Exact same first-match semantics.
    def pick(cases, default):
        out = default
        for cond, val in reversed(cases):
            out = jnp.where(cond, val, out)
        return out

    m0 = pick(
        [
            (ty == SvfFilterType.Low, zero),
            (ty == SvfFilterType.Band, zero),
            (ty == SvfFilterType.HighShelf, amp * amp),
        ],
        one,
    )
    m1 = pick(
        [
            (ty == SvfFilterType.Low, zero),
            (ty == SvfFilterType.Band, one),
            (ty == SvfFilterType.Notch, -k),
            (ty == SvfFilterType.High, -k),
            (ty == SvfFilterType.Peak, -k),
            (ty == SvfFilterType.All, -2.0 * k),
            (ty == SvfFilterType.Bell, k * (amp * amp - 1.0)),
            (ty == SvfFilterType.LowShelf, k * (amp - 1.0)),
            (ty == SvfFilterType.HighShelf, k * (1.0 - amp) * amp),
        ],
        zero,
    )
    m2 = pick(
        [
            (ty == SvfFilterType.Low, one),
            (ty == SvfFilterType.High, -one),
            (ty == SvfFilterType.Peak, jnp.asarray(-2.0, dtype) * one),
            (ty == SvfFilterType.LowShelf, amp * amp - 1.0),
            (ty == SvfFilterType.HighShelf, 1.0 - amp * amp),
        ],
        zero,
    )
    return a1, a2, a3, m0, m1, m2


class SvfFilter(UGen):
    """Versatile EQ filter (svf.rs:40-300 SvfFilter).

    Params: filter (int enum), cutoff_freq, q, gain (dB). The reference's
    ``t_calculate_coefficients`` trigger is kept for API parity but is a
    no-op — coefficients always track the parameter arrays."""

    inputs = 1
    outputs = 1
    params = (
        pinteger("filter", SvfFilterType.Low, enum=SvfFilterType),
        pfloat("cutoff_freq", 1000.0, kind=ParameterKind.FREQUENCY),
        pfloat("q", 0.7071),
        pfloat("gain", 0.0),
        ptrigger("t_calculate_coefficients"),
    )

    def batch_key(self):
        return (type(self),)

    def __init__(
        self,
        ty: SvfFilterType = SvfFilterType.Low,
        cutoff_freq: float = 1000.0,
        q: float = 0.7071,
        gain_db: float = 0.0,
    ):
        self.pdefaults = {
            "filter": int(ty),
            "cutoff_freq": float(cutoff_freq),
            "q": float(q),
            "gain": float(gain_db),
        }

    def init(self, ctx: AudioCtx):
        return {"ic": jnp.zeros((2,), ctx.dtype)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        sr = jnp.asarray(float(ctx.sample_rate), dtype)
        a1, a2, a3, m0, m1, m2 = svf_coefficients(
            params["filter"], params["cutoff_freq"], params["q"], params["gain"],
            sr, dtype,
        )
        x = inputs[0]
        # affine map per sample: s' = M s + c
        M = jnp.stack(
            [
                jnp.stack([2.0 * a1 - 1.0, -2.0 * a2], axis=-1),
                jnp.stack([2.0 * a2, 1.0 - 2.0 * a3], axis=-1),
            ],
            axis=-2,
        )  # [B, 2, 2]
        c = jnp.stack([2.0 * a2 * x, 2.0 * a3 * x], axis=-1)  # [B, 2]
        s_pre, s_final = affine_scan_2d(M, c, state["ic"])
        ic1, ic2 = s_pre[:, 0], s_pre[:, 1]
        v3 = x - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        y = m0 * x + m1 * v1 + m2 * v2
        return {"ic": s_final}, y[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the same cytomic
        state-space recurrence on row-layout [1, B] tiles via
        affine_scan_2x2_rows (ULP-matched to affine_scan_2d), so serial EQ
        stacks of SvfFilters run as one Pallas stage loop. The reference
        runs the same stack as sequential per-sample loops
        (svf.rs:270-300)."""
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            dtype = ctx.dtype
            a1, a2, a3, m0, m1, m2 = svf_coefficients(
                params["filter"], params["cutoff_freq"], params["q"],
                params["gain"], jnp.asarray(sr, dtype), dtype,
            )
            x = inputs[0:1]
            ic = state["ic"]  # [1, 2]
            # lanes variant: associative_scan's strided slices don't
            # lower in Mosaic (core/dsp.affine_scan_1d_lanes)
            from ..core.dsp import affine_scan_2x2_rows_lanes

            s_pre0, s_pre1, sf0, sf1 = affine_scan_2x2_rows_lanes(
                2.0 * a1 - 1.0, -2.0 * a2, 2.0 * a2, 1.0 - 2.0 * a3,
                2.0 * a2 * x, 2.0 * a3 * x, ic[:, 0:1], ic[:, 1:2],
            )
            v3 = x - s_pre1
            v1 = a1 * s_pre0 + a2 * v3
            v2 = s_pre1 + a2 * s_pre0 + a3 * v3
            y = m0 * x + m1 * v1 + m2 * v2
            return {"ic": jnp.concatenate([sf0, sf1], axis=1)}, y

        return fn


def onepole_lowpass_coeffs(freq, sample_rate, dtype):
    """OnePole::set_freq_lowpass (onepole.rs:34-46): b1 = e^(-2π f/sr)."""
    b1 = jnp.exp(jnp.asarray(-2.0 * np.pi, dtype) * (freq / sample_rate))
    return 1.0 - b1, b1  # (a0, b1)


class _OnePoleBase(UGen):
    inputs = 1
    outputs = 1
    params = (pfloat("cutoff_freq", 20000.0, kind=ParameterKind.FREQUENCY),)

    def __init__(self, cutoff_freq: float = 20000.0):
        self.pdefaults = {"cutoff_freq": float(cutoff_freq)}

    def init(self, ctx: AudioCtx):
        return {"last": jnp.zeros((), ctx.dtype)}

    def _lp(self, ctx, state, x, freq):
        sr = jnp.asarray(float(ctx.sample_rate), ctx.dtype)
        a0, b1 = onepole_lowpass_coeffs(freq, sr, ctx.dtype)
        # y[t] = b1*y[t-1] + a0*x[t]  -> affine scan; we need y AFTER update
        y_pre, y_final = affine_scan_1d(b1, a0 * x, state["last"])
        y = b1 * y_pre + a0 * x  # state after each step == filter output
        return y, y_final

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the same associative
        affine scan as ``process`` on the kernel-shaped [1, B] rows, so a
        serial one-pole chain (test_period1_filter_chain's shape) runs as
        one Pallas stage loop."""
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            from ..core.dsp import affine_scan_1d_lanes

            x = inputs[0:1]
            a0, b1 = onepole_lowpass_coeffs(
                params["cutoff_freq"], jnp.asarray(sr, ctx.dtype), ctx.dtype
            )
            y_pre, y_final = affine_scan_1d_lanes(
                b1, a0 * x, state["last"]
            )
            y = b1 * y_pre + a0 * x
            return {"last": y_final}, self._mosaic_post(x, y)

        return fn

    def _mosaic_post(self, x, y):
        return y


class OnePoleLpf(_OnePoleBase):
    """One-pole lowpass, 6 dB/oct (onepole.rs:111-141 OnePoleLpf)."""

    def batch_key(self):
        return (type(self),)

    def process(self, ctx: AudioCtx, state, inputs, params):
        y, y_final = self._lp(ctx, state, inputs[0], params["cutoff_freq"])
        return {"last": y_final}, y[None, :]


class OnePoleHpf(_OnePoleBase):
    """One-pole highpass: input minus the lowpass (onepole.rs:144-186;
    the reference's set_freq_highpass delegates to the lowpass coeffs)."""

    def batch_key(self):
        return (type(self),)

    def process(self, ctx: AudioCtx, state, inputs, params):
        x = inputs[0]
        y, y_final = self._lp(ctx, state, x, params["cutoff_freq"])
        return {"last": y_final}, (x - y)[None, :]

    def _mosaic_post(self, x, y):
        return x - y
