"""Kernel-variant A/B probe for the Pallas voice banks (run on the real TPU).

Motivation (round 3): the hand-written FM kernel out-runs the sine kernel
(48.1G vs 34.5G voice-samples/s) despite ~1.3x MORE elementwise work per
voice-sample. Solving the two-kernel cost model for the per-sample
"reduce [TR, LANES] across sublanes + store one [LANES] row" term gives a
cost of ~79 elementwise-op-equivalents — as much as the entire FM body.
Hypothesis: the cross-sublane tree reduce plus the single-row store (a
1-sublane write into an 8-sublane tile = read-modify-write) dominate both
kernels.

Variant ``partial8`` stops reducing at [8, LANES]: summing the TR/8
sublane-aligned row groups is pure vreg adds (no cross-sublane shuffles),
and the per-sample store of an (8, LANES) block into a [B, 8, LANES] out
buffer is exactly one full native tile — aligned, no RMW. XLA finishes
the (cheap, once-per-block) sum outside the kernel.

Round-3 outcome: the ``panpoly`` variant probed here (carry-free polynomial
pan) measured 52.9G vs the carried rotation pack's 33.2G and IS the
production kernel now; this probe keeps the remaining variants for A/B
against it.

Usage:  python benchmarks/kernel_probe.py [variants...]
Variants: sine_base fm_base sine_p8 fm_p8 sine_nopan
          sub_base sub_nocoef sub_scform sub_scblep
          wt_base wt_hmax (default: sine/fm base + p8)

Round-3 outcomes measured with this probe and now IN production kernels:
``panpoly`` (carry-free polynomial pan, 33.2G -> 52.9G), ``sub_scform``
(one-divide SVF coefficients, 19.5G -> 39.4G), ``wt_hmax`` (hoisted
per-harmonic Nyquist thresholds, 12.18G -> 13.15G, bit-identical) — so
the ``base`` modes now measure those winners and the variant modes are
kept as A/B references against them.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VOICES = int(os.environ.get("PROBE_VOICES", 131072))
BLOCK = int(os.environ.get("PROBE_BLOCK", 64))
SR = 48000


def _slope_rate(raw_step, state0, per_iter_samples, lo=200, hi=2200):
    import jax

    def total(n, st):
        @jax.jit
        def run(s):
            def body(c, _):
                c2, out = raw_step(c)
                return c2, out.mean()
            return jax.lax.scan(body, s, None, length=n)

        st1, m = run(st)
        jax.block_until_ready(m)
        _ = np.asarray(m)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            st1, m = run(st1)
            jax.block_until_ready(m)
            _ = np.asarray(m)
            best = min(best, time.time() - t0)
        return best

    t_lo = total(lo, state0)
    t_hi = total(hi, state0)
    per = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return per_iter_samples / per


def _mk_bank(kind):
    from knaster_tpu import AudioCtx
    from knaster_tpu.parallel.pallas_bank import (
        PallasFMVoiceBank, PallasSineVoiceBank, PallasSubtractiveVoiceBank)

    ctx = AudioCtx(sample_rate=SR, block_size=BLOCK, dtype=np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(100.0, 4000.0, N_VOICES).astype(np.float32),
        "amp": np.full(N_VOICES, 0.01, np.float32),
    }
    if kind == "sine":
        defaults["pan"] = rng.uniform(-1.0, 1.0, N_VOICES).astype(np.float32)
        bank = PallasSineVoiceBank(N_VOICES, voice_defaults=defaults)
    elif kind == "wt":
        from knaster_tpu.parallel.pallas_bank import PallasWavetableVoiceBank

        defaults["freq"] = rng.uniform(100.0, 2000.0, N_VOICES).astype(np.float32)
        defaults["pan"] = rng.uniform(-1.0, 1.0, N_VOICES).astype(np.float32)
        bank = PallasWavetableVoiceBank(
            N_VOICES, harmonics=(1.0 / np.arange(1, 17)).astype(np.float32),
            voice_defaults=defaults)
    elif kind == "sub":
        defaults["freq"] = rng.uniform(60.0, 400.0, N_VOICES).astype(np.float32)
        defaults["cutoff"] = rng.uniform(400.0, 6000.0, N_VOICES).astype(np.float32)
        defaults["q"] = rng.uniform(0.6, 3.0, N_VOICES).astype(np.float32)
        bank = PallasSubtractiveVoiceBank(N_VOICES, voice_defaults=defaults)
    else:
        defaults["ratio"] = np.full(N_VOICES, 2.0, np.float32)
        defaults["index"] = np.full(N_VOICES, 1.5, np.float32)
        bank = PallasFMVoiceBank(N_VOICES, voice_defaults=defaults)
    state = bank.init(ctx)
    trig = bank.trig_index("t_restart")
    ev = bank.node_events_from_lists(
        [(0, v, trig, 1, 0.0) for v in range(min(N_VOICES, bank.event_capacity))]
    )
    import jax.numpy as jnp
    no_in = jnp.zeros((0, BLOCK), np.float32)
    state, _ = bank.process(ctx, state, no_in, {}, events=ev)
    return ctx, bank, state, no_in


def bench_base(kind):
    ctx, bank, state, no_in = _mk_bank(kind)

    def step(st):
        st, out = bank.process(ctx, st, no_in, {}, events=None)
        return st, out

    return _slope_rate(step, state, N_VOICES * BLOCK)


# ---------------------------------------------------------------------------
# partial8 variants: identical math, deferred cross-sublane reduce
# ---------------------------------------------------------------------------

def _rowsum8(x):
    """[TR, LANES] -> [8, LANES] by summing sublane-aligned row groups
    (pure vreg adds; no cross-sublane movement)."""
    TR = x.shape[0]
    acc = x[0:8]
    for r0 in range(8, TR, 8):
        acc = acc + x[r0:r0 + 8]
    return acc


def _sine_kernel_p8(B, ng, f2pi, unroll, *refs):
    """Production body (carry-free polynomial pan) + deferred cross-sublane
    reduce: stores [8, LANES] partial sums per sample (one full native tile,
    no RMW), XLA finishes the sum outside the kernel."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        N_PAN_FAST, _env_asr_free, _mat, _pan_gains, _sample_loop,
        _sin_quant, _to_inc)

    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    PAN = refs[2 * ng:2 * ng + N_PAN_FAST]
    (stage_ref, t_ref, rscale_ref, atk_ref, rel_ref, phase_ref,
     outl_ref, outr_ref, stage_out, t_out, rscale_out, phase_out) = \
        refs[2 * ng + N_PAN_FAST:]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_asr_free(stage, t, rscale, atk_ref[:],
                                           rel_ref[:])
        gain = env * _mat(i_f, AMP)
        freq = _mat(i_f, FREQ)
        osc = _sin_quant(phase)
        phase = phase + _to_inc(freq * f2pi)
        sig = osc * gain
        panl, panr = _pan_gains(i_f, PAN)
        outl_ref[0, i] = _rowsum8(sig * panl)
        outr_ref[0, i] = _rowsum8(sig * panr)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


def _sine_kernel_nopan(B, ng, f2pi, unroll, *refs):
    """Pan stripped entirely (mono mix): isolates the pan path's cost."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        _env_asr_free, _mat, _sample_loop, _sin_quant, _to_inc)

    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    (stage_ref, t_ref, rscale_ref, atk_ref, rel_ref, phase_ref,
     out_ref, stage_out, t_out, rscale_out, phase_out) = refs[2 * ng:]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_asr_free(stage, t, rscale, atk_ref[:],
                                           rel_ref[:])
        gain = env * _mat(i_f, AMP)
        osc = _sin_quant(phase)
        phase = phase + _to_inc(_mat(i_f, FREQ) * f2pi)
        out_ref[0, i, :] = jnp.sum(osc * gain, axis=0)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


def _fm_kernel_p8(B, ng, f2pi, unroll, *refs):
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        _env_ar_free, _mat, _sample_loop, _sin_quant, _to_inc)

    FREQ = refs[0:ng]
    RATIO = refs[ng:2 * ng]
    INDEX = refs[2 * ng:3 * ng]
    AMP = refs[3 * ng:4 * ng]
    (phm_ref, phc_ref, stage_ref, t_ref, atk_ref, rel_ref,
     out_ref, phm_out, phc_out, stage_out, t_out) = refs[4 * ng:]
    one = np.float32(1.0)

    def body(i, carry):
        phm, phc, stage, t = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_ar_free(stage, t, atk_ref[:], rel_ref[:])
        gain = env * _mat(i_f, AMP)
        freq = _mat(i_f, FREQ)
        mod = _sin_quant(phm)
        phm = phm + _to_inc(freq * _mat(i_f, RATIO) * f2pi)
        car_freq = freq * (one + _mat(i_f, INDEX) * mod)
        car = _sin_quant(phc)
        phc = phc + _to_inc(car_freq * f2pi)
        out_ref[0, i] = _rowsum8(car * gain)
        return phm, phc, stage, t_next

    carry = (phm_ref[:], phc_ref[:], stage_ref[:], t_ref[:])
    phm, phc, stage, t = _sample_loop(B, body, carry, unroll)
    phm_out[:] = phm
    phc_out[:] = phc
    stage_out[:] = stage
    t_out[:] = t


# ---------------------------------------------------------------------------
# subtractive coefficient variants: where does the 18.5G ceiling come from?
# ---------------------------------------------------------------------------

def _sub_kernel_var(mode, B, ng, inv_sr, unroll, *refs):
    """Trig-free _sub_kernel with swappable SVF coefficient math.

    ``nocoef``: g/k hoisted out of the sample loop from the sample-0 params —
    NOT exact under cutoff/q ramps; an upper bound on what any coefficient
    optimization could gain.
    ``scform``: per-sample, one divide total — g = s/c with the kernel's own
    odd polynomial (``_sin_poly``), and a1/a2/a3 = Q*(c^2, s*c, s^2) / (Q + s*c)
    (algebraically identical to 1/(1+g(g+k)) etc.; replaces tan + 2 divides
    with 2 polys, at ~1e-7 relative coefficient error).
    ``scblep``: scform + polyBLEP over a shared reciprocal — blep's
    t/dt - 1 and (t-1)/dt + 1 become t*r - 1 / (t-1)*r + 1 with r = 1/dt
    (one divide instead of two; ~1 ULP on corrected samples)."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        _HALF_PI, _env_asr_free, _mat, _sample_loop, _sin_poly)

    FREQ = refs[0:ng]
    CUT = refs[ng:2 * ng]
    Q = refs[2 * ng:3 * ng]
    AMP = refs[3 * ng:4 * ng]
    (t_ref, ic1_ref, ic2_ref, stage_ref, et_ref, rscale_ref,
     atk_ref, rel_ref,
     out_ref, t_out, ic1_out, ic2_out, stage_out, et_out, rscale_out) = \
        refs[4 * ng:]
    one = np.float32(1.0)
    zero = np.float32(0.0)
    two = np.float32(2.0)
    pi_inv_sr = np.float32(np.pi) * inv_sr

    def blep(t, dt):
        safe_dt = jnp.maximum(dt, np.float32(1e-9))
        if mode == "scblep":
            r = one / safe_dt
            a = t * r - one
            b = (t - one) * r + one
        else:
            a = t / safe_dt - one
            b = (t - one) / safe_dt + one
        return jnp.where(
            t < dt, -(a * a), jnp.where(t > one - dt, b * b, zero)
        )

    if mode == "nocoef":
        g0 = jnp.tan(pi_inv_sr * _mat(np.float32(0.0), CUT))
        k0 = one / _mat(np.float32(0.0), Q)
        a1_h = one / (one + g0 * (g0 + k0))
        a2_h = g0 * a1_h
        a3_h = g0 * a2_h

    def body(i, carry):
        t, ic1, ic2, stage, et, rscale = carry
        i_f = i.astype(jnp.float32)
        env, stage, et_next = _env_asr_free(
            stage, et, rscale, atk_ref[:], rel_ref[:]
        )
        dt = jnp.clip(_mat(i_f, FREQ) * inv_sr, 0.0, 0.5)
        _t = t + np.float32(0.5)
        _t = _t - jnp.floor(_t)
        saw = two * _t - one - blep(_t, dt)
        t = t + dt
        t = t - jnp.floor(t)

        if mode == "nocoef":
            a1, a2, a3 = a1_h, a2_h, a3_h
        else:
            x = pi_inv_sr * _mat(i_f, CUT)
            s = _sin_poly(x)
            c = _sin_poly(_HALF_PI - x)
            q = _mat(i_f, Q)
            sc = s * c
            d = q / (q + sc)
            a1 = d * (c * c)
            a2 = d * sc
            a3 = d * (s * s)
        v3 = saw - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = two * v1 - ic1
        ic2 = two * v2 - ic2

        gain = env * _mat(i_f, AMP)
        out_ref[0, i, :] = jnp.sum(v2 * gain, axis=0)
        return t, ic1, ic2, stage, et_next, rscale

    carry = (t_ref[:], ic1_ref[:], ic2_ref[:], stage_ref[:], et_ref[:],
             rscale_ref[:])
    t, ic1, ic2, stage, et, rscale = _sample_loop(B, body, carry, unroll)
    t_out[:] = t
    ic1_out[:] = ic1
    ic2_out[:] = ic2
    stage_out[:] = stage
    et_out[:] = et
    rscale_out[:] = rscale


def _process_sub(bank, ctx, state, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knaster_tpu.parallel.pallas_bank import (
        LANES, N_FAST, _bank_setup, _extra_specs, _fold_act, _op_specs,
        _unroll, pltpu)

    B = ctx.block_size
    R = bank.n_voices // LANES
    TR = bank.tile_rows
    n_tiles = R // TR
    dtype = ctx.dtype

    fstate, ivals, active, ramp_ops, ng, atk, rel, act, idle = _bank_setup(
        bank, ctx, state, None)
    assert ng == N_FAST
    inv_sr = np.float32(1.0 / ctx.sample_rate)
    ramp_ops = _fold_act(bank, ramp_ops, act)
    extras = (state["t"], state["ic1"], state["ic2"], state["stage"],
              state["et"], state["rscale"], atk, rel)
    tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform == "cpu"
    outs = pl.pallas_call(
        functools.partial(_sub_kernel_var, mode, B, ng, inv_sr,
                          _unroll(B, interpret)),
        grid=(n_tiles,),
        in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
        ) + (jax.ShapeDtypeStruct((R, LANES), dtype),) * 6,
        out_specs=(
            pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + (tile(),) * 6,
        interpret=interpret,
    )(*ramp_ops, *extras)
    partial_mix, t, ic1, ic2, stage, et, rscale = outs
    out = jnp.sum(partial_mix, axis=(0, 2))[None, :]
    fvals, ftarget, fstep, felapsed, fdur, fsdur = bank._advance_ramps(
        fstate, B)
    new_state = dict(state)
    new_state.update({
        "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
        "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
        "ivals": ivals, "active": active,
        "idle": idle | (stage.reshape(-1) == 0),
        "t": t, "ic1": ic1, "ic2": ic2, "stage": stage, "et": et,
        "rscale": rscale,
    })
    return new_state, out


def _wt_kernel_var(mode, B, ng, f2pi, acoef, bcoef, nyq, unroll, *refs):
    """Event-free wavetable-kernel variants (vs pallas_bank._wt_kernel).

    ``hmax``: hoist the per-harmonic Nyquist test — ``freq*(h+1) <= nyq``
    becomes ``freq <= f32(nyq/(h+1))`` against a baked constant, removing
    one multiply per harmonic per sample (boundary rounding may differ by
    1 ULP of freq at the exact Nyquist crossing).

    ``cheb``: hmax + the angle-addition harmonic ladder
    (s,c <- s*c1 + c*s1, c*c1 - s*s1: 4 mul + 2 addsub per harmonic)
    replaced by the Chebyshev three-term recurrence
    (x_{h+1} = 2*c1*x_h - x_{h-1} for both rails: 2 mul + 2 sub), with
    2*c1 computed once per sample. Algebraically identical; floats differ
    by the recurrence's rounding path (error grows ~linearly in h, still
    ~1e-6 at H=16)."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        _env_asr_free, _mat, _pan_gains, _sample_loop, _theta_full, _to_inc)

    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    PAN = refs[2 * ng:2 * ng + 5]  # N_PAN_FAST rotation pack
    (phase_ref, stage_ref, t_ref, rscale_ref, atk_ref, rel_ref,
     outl_ref, outr_ref, phase_out, stage_out, t_out, rscale_out) = \
        refs[2 * ng + 5:]
    H = len(acoef)
    zero = np.float32(0.0)
    thr = [np.float32(nyq / float(h + 1)) for h in range(H)]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_asr_free(
            stage, t, rscale, atk_ref[:], rel_ref[:])
        freq = _mat(i_f, FREQ)
        theta = _theta_full(phase)
        s1 = jnp.sin(theta)
        c1 = jnp.cos(theta)
        phase = phase + _to_inc(freq * f2pi)
        s, c = s1, c1
        acc = jnp.where(freq <= thr[0],
                        np.float32(acoef[0]) * s + np.float32(bcoef[0]) * c,
                        zero)
        if mode == "cheb":
            two_c1 = c1 + c1
            sm, cm = jnp.zeros_like(s1), jnp.ones_like(c1)  # sin0, cos0
        for h in range(1, H):
            if mode == "cheb":
                s, sm = two_c1 * s - sm, s
                c, cm = two_c1 * c - cm, c
            else:
                s, c = s * c1 + c * s1, c * c1 - s * s1
            part = np.float32(acoef[h]) * s + np.float32(bcoef[h]) * c
            if mode in ("hmax", "cheb"):
                m = freq <= thr[h]
            else:
                m = freq * np.float32(h + 1) <= np.float32(nyq)
            acc = acc + jnp.where(m, part, zero)
        gain = env * _mat(i_f, AMP)
        sig = acc * gain
        panl, panr = _pan_gains(i_f, PAN)
        outl_ref[0, i, :] = jnp.sum(sig * panl, axis=0)
        outr_ref[0, i, :] = jnp.sum(sig * panr, axis=0)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


def _process_wt(bank, ctx, state, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knaster_tpu.parallel.pallas_bank import (
        FRACTIONAL_PART, LANES, N_FAST, TABLE_SIZE, _bank_setup,
        _extra_specs, _fold_act, _op_specs, _pan_fast_operands, _unroll,
        pltpu)

    B = ctx.block_size
    R = bank.n_voices // LANES
    TR = bank.tile_rows
    n_tiles = R // TR
    dtype = ctx.dtype

    fstate, ivals, active, ramp_ops, ng, atk, rel, act, idle = _bank_setup(
        bank, ctx, state, None)
    assert ng == N_FAST
    f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
    ramp_ops = _fold_act(bank, ramp_ops, act)
    ramp_ops = ramp_ops[:2 * ng] + _pan_fast_operands(bank, fstate, dtype)
    extras = (state["phase"], state["stage"], state["t"], state["rscale"],
              atk, rel)
    phi = bank.offsets.astype(np.float64) * (2.0 * np.pi / 2.0**32)
    acoef = tuple(float(x) for x in
                  (bank.mags * np.cos(phi)).astype(np.float32))
    bcoef = tuple(float(x) for x in
                  (bank.mags * np.sin(phi)).astype(np.float32))
    tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform == "cpu"
    outs = pl.pallas_call(
        functools.partial(_wt_kernel_var, mode, B, ng, f2pi, acoef, bcoef,
                          float(ctx.sample_rate / 2.0),
                          _unroll(B, interpret)),
        grid=(n_tiles,),
        in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
            jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), dtype),
            jax.ShapeDtypeStruct((R, LANES), dtype),
            jax.ShapeDtypeStruct((R, LANES), dtype),
        ),
        out_specs=(
            pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tile(), tile(), tile(), tile(),
        ),
        interpret=interpret,
    )(*ramp_ops, *extras)
    outl, outr, phase, stage, t, rscale = outs
    out = jnp.stack([jnp.sum(outl, axis=(0, 2)), jnp.sum(outr, axis=(0, 2))])
    fvals, ftarget, fstep, felapsed, fdur, fsdur = bank._advance_ramps(
        fstate, B)
    new_state = dict(state)
    new_state.update({
        "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
        "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
        "ivals": ivals, "active": active,
        "idle": idle | (stage.reshape(-1) == 0),
        "phase": phase, "stage": stage, "t": t, "rscale": rscale,
    })
    return new_state, out


def _process_p8(kind, bank, ctx, state, no_in, mode="p8"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knaster_tpu.parallel.pallas_bank import (
        LANES, N_FAST, TABLE_SIZE, FRACTIONAL_PART, _bank_setup,
        _extra_specs, _fold_act, _op_specs, _pan_fast_operands, _unroll,
        pltpu)

    B = ctx.block_size
    R = bank.n_voices // LANES
    TR = bank.tile_rows
    n_tiles = R // TR
    dtype = ctx.dtype

    fstate, ivals, active, ramp_ops, ng, atk, rel, act, idle = _bank_setup(
        bank, ctx, state, None)
    f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
    assert ng == N_FAST
    ramp_ops = _fold_act(bank, ramp_ops, act)
    tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    out8 = lambda: pl.BlockSpec((1, B, 8, LANES), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    interpret = jax.devices()[0].platform == "cpu"
    if kind == "sine":
        extras = (state["stage"], state["t"], state["rscale"], atk, rel,
                  state["phase"])
        if mode == "nopan":
            kern = _sine_kernel_nopan
            ramp_ops = ramp_ops[:2 * N_FAST]
            outspecs = [pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)]
            outshapes = [jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype)]
        else:
            kern = _sine_kernel_p8
            ramp_ops = ramp_ops[:2 * N_FAST] + _pan_fast_operands(
                bank, fstate, dtype)
            outspecs = [out8(), out8()]
            outshapes = [jax.ShapeDtypeStruct((n_tiles, B, 8, LANES),
                                              dtype)] * 2
        outs = pl.pallas_call(
            functools.partial(kern, B, ng, f2pi, _unroll(B, interpret)),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=tuple(outshapes) + (
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            ),
            out_specs=tuple(outspecs) + (tile(), tile(), tile(), tile()),
            interpret=interpret,
        )(*ramp_ops, *extras)
        if mode == "nopan":
            partial_m, stage, t, rscale, phase = outs
            out = jnp.sum(partial_m, axis=(0, 2))[None, :]
        else:
            partial_l, partial_r = outs[0], outs[1]
            stage, t, rscale, phase = outs[2:]
            red = (0, 2, 3) if partial_l.ndim == 4 else (0, 2)
            out = jnp.stack([jnp.sum(partial_l, axis=red),
                             jnp.sum(partial_r, axis=red)])
        extra_state = {"phase": phase, "stage": stage, "t": t,
                       "rscale": rscale}
    else:
        extras = (state["phm"], state["phc"], state["stage"],
                  state["t"], atk, rel)
        outs = pl.pallas_call(
            functools.partial(_fm_kernel_p8, B, ng, f2pi,
                              _unroll(B, interpret)),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, 8, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(out8(), tile(), tile(), tile(), tile()),
            interpret=interpret,
        )(*ramp_ops, *extras)
        partial, phm, phc, stage, t = outs
        out = jnp.sum(partial, axis=(0, 2, 3))[None, :]
        extra_state = {"phm": phm, "phc": phc, "stage": stage, "t": t}

    fvals, ftarget, fstep, felapsed, fdur, fsdur = bank._advance_ramps(
        fstate, B)
    new_state = dict(state)
    new_state.update({
        "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
        "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
        "ivals": ivals, "active": active,
        "idle": idle | (extra_state["stage"].reshape(-1) == 0),
    })
    new_state.update(extra_state)
    return new_state, out


def bench_variant(kind, mode):
    ctx, bank, state, no_in = _mk_bank(kind)
    if kind == "sub":
        variant = lambda s: _process_sub(bank, ctx, s, mode)
    elif kind == "wt":
        variant = lambda s: _process_wt(bank, ctx, s, mode)
    else:
        variant = lambda s: _process_p8(kind, bank, ctx, s, no_in, mode)

    # parity check vs the production kernel before timing
    import jax
    st_a, out_a = jax.jit(
        lambda s: bank.process(ctx, s, no_in, {}, events=None))(state)
    st_b, out_b = jax.jit(variant)(state)
    a = np.asarray(out_a)
    b = np.asarray(out_b)
    if mode == "nopan":  # mono variant: compare the summed bus
        a = a.sum(axis=0, keepdims=True)
    da = float(np.max(np.abs(a - b)))
    print(f"  {kind}_{mode} parity vs base: max|d| = {da:.3e}",
          file=sys.stderr)

    return _slope_rate(variant, state, N_VOICES * BLOCK)


def main():
    variants = sys.argv[1:] or ["sine_base", "sine_p8", "fm_base", "fm_p8"]
    for v in variants:
        kind, mode = v.split("_", 1)
        t0 = time.time()
        rate = bench_base(kind) if mode == "base" else bench_variant(kind, mode)
        print(f"{v}: {rate / 1e9:.2f}G voice-samples/s "
              f"({rate / SR:,.0f} rt voices)  [{time.time() - t0:.0f}s]")


if __name__ == "__main__":
    main()
