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

Usage:  python benchmarks/kernel_probe.py [variants...]
Variants: sine_base fm_base sine_p8 fm_p8 (default: all)
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
        PallasFMVoiceBank, PallasSineVoiceBank)

    ctx = AudioCtx(sample_rate=SR, block_size=BLOCK, dtype=np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(100.0, 4000.0, N_VOICES).astype(np.float32),
        "amp": np.full(N_VOICES, 0.01, np.float32),
    }
    if kind == "sine":
        defaults["pan"] = rng.uniform(-1.0, 1.0, N_VOICES).astype(np.float32)
        bank = PallasSineVoiceBank(N_VOICES, voice_defaults=defaults)
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
        phase, stage, t, rscale, pan_c = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_asr_free(stage, t, rscale, atk_ref[:],
                                           rel_ref[:])
        gain = env * _mat(i_f, AMP)
        freq = _mat(i_f, FREQ)
        osc = _sin_quant(phase)
        phase = phase + _to_inc(freq * f2pi)
        sig = osc * gain
        panl, panr, pan_c = _pan_gains(i_f, PAN, pan_c)
        outl_ref[0, i] = _rowsum8(sig * panl)
        outr_ref[0, i] = _rowsum8(sig * panr)
        return phase, stage, t_next, rscale, pan_c

    pan_c = (PAN[0][:], PAN[1][:])
    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:], pan_c)
    phase, stage, t, rscale, _ = _sample_loop(B, body, carry, unroll)
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


_HALF_PI_F = np.float32(np.pi / 2)


def _sin_poly(u):
    """sin(u) for u in [-pi/2, pi/2] via the same degree-9 odd minimax
    polynomial the quantized sine uses (error <= 1.2e-7)."""
    from knaster_tpu.parallel.pallas_bank import _SIN_C
    u2 = u * u
    p = _SIN_C[4]
    p = p * u2 + _SIN_C[3]
    p = p * u2 + _SIN_C[2]
    p = p * u2 + _SIN_C[1]
    return (p * u2 + _SIN_C[0]) * u


def _sine_kernel_panpoly(B, ng, f2pi, unroll, *refs):
    """Carry-free pan: per-sample angle = clamp-at-target linear ramp;
    gains = sin(angle) / sin(pi/2 - angle) with the kernel's own odd
    polynomial. Exact per-sample equal-power gains even mid-ramp (the
    production rotation pack approximates those), and two fewer
    [TR, LANES] carries across the unrolled sample loop.
    PAN pack here: (a0, da, at, rem) — 4 refs."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import (
        _env_asr_free, _mat, _sample_loop, _sin_quant, _to_inc)

    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    a0_ref, da_ref, at_ref, rem_ref = refs[2 * ng:2 * ng + 4]
    (stage_ref, t_ref, rscale_ref, atk_ref, rel_ref, phase_ref,
     outl_ref, outr_ref, stage_out, t_out, rscale_out, phase_out) = \
        refs[2 * ng + 4:]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        env, stage, t_next = _env_asr_free(stage, t, rscale, atk_ref[:],
                                           rel_ref[:])
        gain = env * _mat(i_f, AMP)
        osc = _sin_quant(phase)
        phase = phase + _to_inc(_mat(i_f, FREQ) * f2pi)
        sig = osc * gain
        angle = jnp.where(i_f >= rem_ref[:], at_ref[:],
                          a0_ref[:] + da_ref[:] * i_f)
        panr = _sin_poly(angle)
        panl = _sin_poly(_HALF_PI_F - angle)
        outl_ref[0, i, :] = jnp.sum(sig * panl, axis=0)
        outr_ref[0, i, :] = jnp.sum(sig * panr, axis=0)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


def _pan_poly_operands(bank, fstate, dtype):
    """(a0, da, at, rem) tiles for the panpoly kernel."""
    import jax.numpy as jnp
    from knaster_tpu.parallel.pallas_bank import _grid2, _HALF_PI
    i = bank.float_index("pan")
    fvals, ftgt, fstep, fel, fdur, _ = fstate
    v0 = jnp.where(fel[i] >= fdur[i], ftgt[i],
                   fvals[i] + fstep[i] * fel[i].astype(dtype))
    a0 = (v0 * 0.5 + 0.5) * _HALF_PI
    da = fstep[i] * np.float32(np.pi / 4.0)
    at = (ftgt[i] * 0.5 + 0.5) * _HALF_PI
    g2 = lambda x: _grid2(bank, x.astype(dtype))
    return [g2(a0), g2(da), g2(at), g2((fdur[i] - fel[i]).astype(dtype))]


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
        elif mode == "panpoly":
            kern = _sine_kernel_panpoly
            ramp_ops = ramp_ops[:2 * N_FAST] + _pan_poly_operands(
                bank, fstate, dtype)
            mono = lambda: pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
            outspecs = [mono(), mono()]
            outshapes = [jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype)] * 2
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

    # parity check vs the production kernel before timing
    import jax
    st_a, out_a = jax.jit(
        lambda s: bank.process(ctx, s, no_in, {}, events=None))(state)
    st_b, out_b = jax.jit(
        lambda s: _process_p8(kind, bank, ctx, s, no_in, mode))(state)
    a = np.asarray(out_a)
    b = np.asarray(out_b)
    if mode == "nopan":  # mono variant: compare the summed bus
        a = a.sum(axis=0, keepdims=True)
    da = float(np.max(np.abs(a - b)))
    print(f"  {kind}_{mode} parity vs base: max|d| = {da:.3e}",
          file=sys.stderr)

    def step(st):
        return _process_p8(kind, bank, ctx, st, no_in, mode)

    return _slope_rate(step, state, N_VOICES * BLOCK)


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
