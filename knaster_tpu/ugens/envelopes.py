"""Envelope UGens (reference: knaster_core_dsp/src/ugens/envelopes.rs).

Envelopes are trigger-dependent state machines, so the general (eventful)
path runs per-sample inside ``lax.scan``. In the EVENT-FREE fast program
(``ctx.no_events`` — every trigger statically False) the machine can make
at most one spontaneous transition per block (attack→sustain or
release→stopped for ASR; attack→release→stopped for AR), so the whole
block has a piecewise CLOSED FORM over cumulative rates — no scan at all.

Which form wins depends on the batch width (``ctx.wide_batch``): for
single nodes and modest auto-batched groups the closed form removes the
64-iteration scan's per-step overhead; under a WIDE vmap (multi-thousand-
voice banks) the scan body fuses into one on-chip loop and beats the
closed form's HBM-materialized [V, B] planes by ~3.7× (v5e, 32k voices),
so banks keep the scan.

Rates are derived from the per-sample ``*_time`` parameter arrays
*outside* the scan (vectorized divides), matching the reference
recomputing rates in ``param_apply``. The closed forms use cumulative
sums where the scan accumulates sequentially — identical math, float
reassociation ≤ ~1e-6 over a block. Consequence: because the cumsum's
association depends on the evaluation length, closed-form envelope
values are PARTITION-SENSITIVE at the ULP level — rendering the same
stream per-block vs superblocked (or with different block sizes) can
differ by ~1 ULP of ``t`` per boundary while a stage is advancing. The
scan path is partition-invariant by construction (sequential adds with
carried state, the reference's own summation order), and anchored param
ramps (param_engine / voicebank) are bit-identical under any partition;
only this documented closed-form reassociation remains chunk-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat, pinteger, ptrigger

# EnvAsr stages (envelopes.rs AsrState)
STOPPED, ATTACKING, SUSTAINING, RELEASING = 0, 1, 2, 3


def _rate_from_time(seconds, sr, dtype):
    """1/(t*sr), with t == 0 mapping to rate 1 (instant) — envelopes.rs:88-111."""
    t = seconds.astype(dtype)
    return jnp.where(t == 0, jnp.ones_like(t), 1.0 / (t * sr))


def _csum_lanes(x, B):
    """Inclusive prefix sum over the lane axis of a [1, B] row by
    Hillis-Steele doubling — Mosaic has no cumsum primitive. Float
    association differs from jnp.cumsum (ULP-level vs the closed forms,
    which are already documented as reassociation-sensitive)."""
    s = 1
    while s < B:
        x = x + jnp.concatenate(
            [jnp.zeros((1, s), x.dtype), x[:, : B - s]], axis=1
        )
        s *= 2
    return x


def _shift1(x, fill=0.0):
    """[1, B] row shifted one lane right, ``fill`` in lane 0 — the
    closed forms' concat([x0, v[:-1]]) in kernel shape."""
    return jnp.concatenate(
        [jnp.full((1, 1), fill, x.dtype), x[:, :-1]], axis=1
    )


class EnvAsr(UGen):
    """Attack-Sustain-Release envelope: linear attack, cubic release
    (envelopes.rs:19-163 EnvAsr). Marks done at the frame the release ends."""

    may_set_done = True

    inputs = 0
    outputs = 1
    params = (
        pfloat("attack_time", 0.0, kind=ParameterKind.SECONDS),
        pfloat("release_time", 0.0, kind=ParameterKind.SECONDS),
        ptrigger("t_release"),
        ptrigger("t_restart"),
    )

    def batch_key(self):
        return (type(self),)

    def __init__(self, attack_time: float = 0.0, release_time: float = 0.0):
        self.pdefaults = {
            "attack_time": float(attack_time),
            "release_time": float(release_time),
        }

    def init(self, ctx: AudioCtx):
        return {
            "stage": jnp.asarray(STOPPED, jnp.int32),
            "t": jnp.zeros((), ctx.dtype),
            "release_scale": jnp.ones((), ctx.dtype),
        }

    def _process_no_events(self, ctx: AudioCtx, state, atk_rate, rel_rate):
        """Event-free closed form: at most ONE spontaneous transition per
        block (attack→sustain or release→stopped), so the scan's repeated
        addition becomes cumulative sums + selects. Behavior matches the
        scan with all-False triggers (float reassociation aside)."""
        dtype = ctx.dtype
        B = ctx.block_size
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)
        stage0, t0, rscale = state["stage"], state["t"], state["release_scale"]
        i0 = jnp.arange(B) == 0

        inc_atk = t0 + jnp.cumsum(atk_rate)          # t AFTER step i
        e_atk = jnp.concatenate([t0[None], inc_atk[:-1]])  # t AT step i
        crossed = inc_atk >= one
        atk_any = jnp.any(crossed)
        k_atk = jnp.argmax(crossed)
        # out during attack is the RAW t (the scan never clamps it);
        # sustain (after the crossing step) holds exactly 1
        out_atk = jnp.where(
            atk_any & (jnp.arange(B) > k_atk), one, e_atk
        )
        # pin t to exactly 1 on the sustain transition (matches the scan)
        t_atk_final = jnp.where(atk_any, one, inc_atk[B - 1])
        stage_atk_final = jnp.where(atk_any, SUSTAINING, ATTACKING)

        inc_rel = t0 - jnp.cumsum(rel_rate)
        e_rel = jnp.concatenate([t0[None], inc_rel[:-1]])
        alive = i0 | (e_rel > zero)
        out_rel = jnp.where(alive, e_rel * e_rel * e_rel * rscale, zero)
        done_rel = alive & (inc_rel <= zero)
        rel_done = jnp.any(done_rel)
        t_rel_final = jnp.where(rel_done, zero, inc_rel[B - 1])
        stage_rel_final = jnp.where(rel_done, STOPPED, RELEASING)

        out = jnp.select(
            [stage0 == ATTACKING, stage0 == SUSTAINING, stage0 == RELEASING],
            [out_atk, jnp.full((B,), one), out_rel],
            jnp.zeros((B,), dtype),
        )
        done = jnp.where(stage0 == RELEASING, done_rel,
                         jnp.zeros((B,), bool))
        t_final = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [t_atk_final, t_rel_final], t0,
        )
        stage_final = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [stage_atk_final, stage_rel_final], stage0,
        )
        new_state = {"stage": stage_final, "t": t_final,
                     "release_scale": rscale}
        return new_state, out[None, :], done

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        sr = jnp.asarray(float(ctx.sample_rate), dtype)
        atk_rate = _rate_from_time(params["attack_time"], sr, dtype)
        rel_rate = _rate_from_time(params["release_time"], sr, dtype)
        if ctx.no_events and not ctx.wide_batch:
            # narrow batches: the closed form beats the 64-iteration scan;
            # wide vmaps (voice banks) keep the scan (AudioCtx.wide_batch)
            return self._process_no_events(ctx, state, atk_rate, rel_rate)
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)

        def step(carry, x):
            stage, t, rscale = carry
            # --- triggers (applied before the sample, like param_apply) ---
            restart = x["t_restart"]
            release = x["t_release"]
            stage = jnp.where(restart, ATTACKING, stage)
            # t_release: from Attacking -> scale by t; Sustaining -> scale 1
            rel_from_atk = release & (stage == ATTACKING)
            rel_from_sus = release & (stage == SUSTAINING)
            rscale = jnp.where(rel_from_atk, t, jnp.where(rel_from_sus, one, rscale))
            t = jnp.where(rel_from_atk | rel_from_sus, one, t)
            stage = jnp.where(rel_from_atk | rel_from_sus, RELEASING, stage)
            # --- next_sample (envelopes.rs:52-80) ---
            out = jnp.where(
                stage == ATTACKING,
                t,
                jnp.where(
                    stage == SUSTAINING,
                    one,
                    jnp.where(stage == RELEASING, t * t * t * rscale, zero),
                ),
            )
            t_next = jnp.where(
                stage == ATTACKING,
                t + x["atk_rate"],
                jnp.where(stage == RELEASING, t - x["rel_rate"], t),
            )
            to_sustain = (stage == ATTACKING) & (t_next >= one)
            # pin t to exactly 1 in sustain: the summation-order-dependent
            # overshoot (t can land anywhere in [1, 1+atk_rate)) is otherwise
            # carried silently and re-emitted for one sample by a restart
            # while sustaining — the closed form / long-scan / per-block
            # paths would round differently and pop differently
            t_next = jnp.where(to_sustain, one, t_next)
            done = (stage == RELEASING) & (t_next <= zero)
            stage = jnp.where(to_sustain, SUSTAINING, stage)
            stage = jnp.where(done, STOPPED, stage)
            t_next = jnp.where(done, zero, t_next)
            return (stage, t_next, rscale), (out, done)

        xs = {
            "t_restart": params["t_restart"],
            "t_release": params["t_release"],
            "atk_rate": atk_rate,
            "rel_rate": rel_rate,
        }
        carry0 = (state["stage"], state["t"], state["release_scale"])
        (stage, t, rscale), (out, done) = jax.lax.scan(step, carry0, xs)
        new_state = {"stage": stage, "t": t, "release_scale": rscale}
        return new_state, out[None, :], done

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the event-free
        closed form of ``_process_no_events`` with the cumsums as
        Hillis-Steele lane scans, returning the done row the release end
        produces. Rates are strictly positive, so the trajectories are
        monotone and argmax/any reduce to last-lane tests."""
        B = ctx.block_size
        dtype = ctx.dtype
        # python floats only: jnp scalars made here would be captured
        # constants inside the pallas_call (rejected at trace time)
        sr = float(ctx.sample_rate)

        def fn(inputs, state, params):
            one = jnp.ones((), dtype)
            zero = jnp.zeros((), dtype)
            atk_rate = _rate_from_time(params["attack_time"], sr, dtype)
            rel_rate = _rate_from_time(params["release_time"], sr, dtype)
            stage0 = state["stage"]          # [1, 1] i32
            t0 = state["t"]                  # [1, 1]
            rscale = state["release_scale"]  # [1, 1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

            A = _csum_lanes(atk_rate, B)
            inc_atk = t0 + A                 # t AFTER step i
            e_atk = t0 + _shift1(A)          # t AT step i
            crossed = inc_atk >= one
            # crossed shifted one lane == (e_atk >= 1): e_atk[i] is exactly
            # inc_atk[i-1] and t0 < 1 while ATTACKING — avoids a bool
            # concatenate, which Mosaic rejects as a vector register cast
            crossed_prev = e_atk >= one
            atk_any = crossed[:, B - 1:]     # [1, 1] — inc_atk increasing
            out_atk = jnp.where(crossed_prev, one, e_atk)
            t_atk_fin = jnp.where(atk_any, one, inc_atk[:, B - 1:])
            stage_atk_fin = jnp.where(atk_any, SUSTAINING, ATTACKING)

            R = _csum_lanes(rel_rate, B)
            inc_rel = t0 - R
            e_rel = t0 - _shift1(R)
            alive = (lane == 0) | (e_rel > zero)
            out_rel = jnp.where(alive, e_rel * e_rel * e_rel * rscale, zero)
            done_rel = alive & (inc_rel <= zero)
            rel_done = inc_rel[:, B - 1:] <= zero  # [1, 1] — decreasing
            t_rel_fin = jnp.where(rel_done, zero, inc_rel[:, B - 1:])
            stage_rel_fin = jnp.where(rel_done, STOPPED, RELEASING)

            is_atk = stage0 == ATTACKING
            is_sus = stage0 == SUSTAINING
            is_rel = stage0 == RELEASING
            out = jnp.where(
                is_atk, out_atk,
                jnp.where(is_sus, jnp.full((1, B), one),
                          jnp.where(is_rel, out_rel, zero)),
            )
            done = jnp.where(is_rel & done_rel, one, zero)
            t_fin = jnp.where(is_atk, t_atk_fin,
                              jnp.where(is_rel, t_rel_fin, t0))
            stage_fin = jnp.where(
                is_atk, stage_atk_fin,
                jnp.where(is_rel, stage_rel_fin, stage0),
            )
            new_state = {
                "stage": stage_fin, "t": t_fin, "release_scale": rscale
            }
            return new_state, out, done

        return fn


class EnvAr(UGen):
    """Attack-Release one-shot envelope (envelopes.rs:174-315 EnvAr)."""

    may_set_done = True

    inputs = 0
    outputs = 1
    params = (
        pfloat("attack_time", 0.0, kind=ParameterKind.SECONDS),
        pfloat("release_time", 0.0, kind=ParameterKind.SECONDS),
        ptrigger("t_restart"),
    )

    def batch_key(self):
        return (type(self),)

    def __init__(self, attack_time: float = 0.0, release_time: float = 0.0):
        self.pdefaults = {
            "attack_time": float(attack_time),
            "release_time": float(release_time),
        }

    def init(self, ctx: AudioCtx):
        return {
            "stage": jnp.asarray(STOPPED, jnp.int32),
            "t": jnp.zeros((), ctx.dtype),
            "release_scale": jnp.ones((), ctx.dtype),
        }

    def _process_no_events(self, ctx: AudioCtx, state, atk_rate, rel_rate):
        """Event-free closed form. Unlike ASR, AR can make TWO spontaneous
        transitions in one block (attack→release at t crossing 1, which
        pins t to exactly 1, then release→stopped): the release segment's
        trajectory is 1 - (R[i-1] - R[k]) over the release-rate cumsum R
        anchored at the crossing step k."""
        dtype = ctx.dtype
        B = ctx.block_size
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)
        stage0, t0, rscale = state["stage"], state["t"], state["release_scale"]
        idx = jnp.arange(B)
        i0 = idx == 0

        # --- starting in ATTACKING ---
        inc_atk = t0 + jnp.cumsum(atk_rate)
        e_atk = jnp.concatenate([t0[None], inc_atk[:-1]])
        crossed = inc_atk >= one
        atk_any = jnp.any(crossed)
        k = jnp.argmax(crossed)
        R = jnp.cumsum(rel_rate)
        R_prev = jnp.concatenate([zero[None], R[:-1]])
        Rk = jnp.where(atk_any, R[k], zero)
        t_rel2 = one - (R_prev - Rk)     # t at step i in the post-cross release
        in_rel2 = atk_any & (idx > k)
        alive2 = t_rel2 > zero
        out_a = jnp.where(
            in_rel2,
            jnp.where(alive2, t_rel2 * t_rel2 * t_rel2, zero),
            e_atk,
        )
        done_a = in_rel2 & alive2 & ((one - (R - Rk)) <= zero)
        a_done = jnp.any(done_a)
        t_a_final = jnp.where(
            a_done, zero,
            jnp.where(atk_any, one - (R[B - 1] - Rk), inc_atk[B - 1]),
        )
        stage_a_final = jnp.where(
            a_done, STOPPED, jnp.where(atk_any, RELEASING, ATTACKING)
        )
        rscale_a = jnp.where(atk_any, one, rscale)

        # --- starting in RELEASING ---
        inc_rel = t0 - R
        e_rel = jnp.concatenate([t0[None], inc_rel[:-1]])
        alive = i0 | (e_rel > zero)
        out_r = jnp.where(alive, e_rel * e_rel * e_rel * rscale, zero)
        done_r = alive & (inc_rel <= zero)
        r_done = jnp.any(done_r)
        t_r_final = jnp.where(r_done, zero, inc_rel[B - 1])
        stage_r_final = jnp.where(r_done, STOPPED, RELEASING)

        out = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [out_a, out_r], jnp.zeros((B,), dtype),
        )
        done = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [done_a, done_r], jnp.zeros((B,), bool),
        )
        t_final = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [t_a_final, t_r_final], t0,
        )
        stage_final = jnp.select(
            [stage0 == ATTACKING, stage0 == RELEASING],
            [stage_a_final, stage_r_final], stage0,
        )
        rscale_final = jnp.where(stage0 == ATTACKING, rscale_a, rscale)
        return (
            {"stage": stage_final, "t": t_final, "release_scale": rscale_final},
            out[None, :],
            done,
        )

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        sr = jnp.asarray(float(ctx.sample_rate), dtype)
        atk_rate = _rate_from_time(params["attack_time"], sr, dtype)
        rel_rate = _rate_from_time(params["release_time"], sr, dtype)
        if ctx.no_events and not ctx.wide_batch:
            # narrow batches: the closed form beats the 64-iteration scan;
            # wide vmaps (voice banks) keep the scan (AudioCtx.wide_batch)
            return self._process_no_events(ctx, state, atk_rate, rel_rate)
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)

        def step(carry, x):
            stage, t, rscale = carry
            stage = jnp.where(x["t_restart"], ATTACKING, stage)
            out = jnp.where(
                stage == ATTACKING,
                t,
                jnp.where(stage == RELEASING, t * t * t * rscale, zero),
            )
            t_next = jnp.where(
                stage == ATTACKING,
                t + x["atk_rate"],
                jnp.where(stage == RELEASING, t - x["rel_rate"], t),
            )
            to_rel = (stage == ATTACKING) & (t_next >= one)
            rscale = jnp.where(to_rel, one, rscale)
            stage = jnp.where(to_rel, RELEASING, stage)
            t_next = jnp.where(to_rel, one, t_next)
            done = (stage == RELEASING) & ~to_rel & (t_next <= zero)
            stage = jnp.where(done, STOPPED, stage)
            t_next = jnp.where(done, zero, t_next)
            return (stage, t_next, rscale), (out, done)

        xs = {
            "t_restart": params["t_restart"],
            "atk_rate": atk_rate,
            "rel_rate": rel_rate,
        }
        carry0 = (state["stage"], state["t"], state["release_scale"])
        (stage, t, rscale), (out, done) = jax.lax.scan(step, carry0, xs)
        return {"stage": stage, "t": t, "release_scale": rscale}, out[None, :], done

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the event-free
        closed form of ``_process_no_events`` — including the in-block
        attack→release→stopped double transition — with the cumsums as
        Hillis-Steele lane scans. R[k] at the crossing step comes from a
        masked lane-min (R is increasing, so the first crossed lane has
        the minimum)."""
        B = ctx.block_size
        dtype = ctx.dtype
        sr = float(ctx.sample_rate)  # python float: see EnvAsr.mosaic_stage
        big = 3.4e38                 # > any reachable cumsum

        def fn(inputs, state, params):
            one = jnp.ones((), dtype)
            zero = jnp.zeros((), dtype)
            atk_rate = _rate_from_time(params["attack_time"], sr, dtype)
            rel_rate = _rate_from_time(params["release_time"], sr, dtype)
            stage0 = state["stage"]
            t0 = state["t"]
            rscale = state["release_scale"]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

            A = _csum_lanes(atk_rate, B)
            R = _csum_lanes(rel_rate, B)
            Rexc = _shift1(R)
            R_last = R[:, B - 1:]

            # --- starting in ATTACKING -------------------------------------
            inc_atk = t0 + A
            e_atk = t0 + _shift1(A)
            crossed = inc_atk >= one
            crossed_prev = e_atk >= one      # see EnvAsr.mosaic_stage
            atk_any = crossed[:, B - 1:]
            Rk = jnp.min(
                jnp.where(crossed, R, jnp.full((1, B), big, dtype)),
                axis=1, keepdims=True,
            )
            Rk = jnp.where(atk_any, Rk, zero)
            t_rel2 = one - (Rexc - Rk)       # release t at step i, post-cross
            in_rel2 = crossed_prev           # == atk_any & (i > k)
            alive2 = t_rel2 > zero
            out_a = jnp.where(
                in_rel2,
                jnp.where(alive2, t_rel2 * t_rel2 * t_rel2, zero),
                e_atk,
            )
            done_a = in_rel2 & alive2 & ((one - (R - Rk)) <= zero)
            a_done = atk_any & ((one - (R_last - Rk)) <= zero)  # [1, 1]
            t_a_fin = jnp.where(
                a_done, zero,
                jnp.where(atk_any, one - (R_last - Rk), inc_atk[:, B - 1:]),
            )
            stage_a_fin = jnp.where(
                a_done, STOPPED, jnp.where(atk_any, RELEASING, ATTACKING)
            )
            rscale_a = jnp.where(atk_any, one, rscale)

            # --- starting in RELEASING (same as ASR) -----------------------
            inc_rel = t0 - R
            e_rel = t0 - Rexc
            alive = (lane == 0) | (e_rel > zero)
            out_r = jnp.where(alive, e_rel * e_rel * e_rel * rscale, zero)
            done_r = alive & (inc_rel <= zero)
            r_done = inc_rel[:, B - 1:] <= zero
            t_r_fin = jnp.where(r_done, zero, inc_rel[:, B - 1:])
            stage_r_fin = jnp.where(r_done, STOPPED, RELEASING)

            is_atk = stage0 == ATTACKING
            is_rel = stage0 == RELEASING
            out = jnp.where(
                is_atk, out_a, jnp.where(is_rel, out_r, zero)
            )
            done = jnp.where(
                (is_atk & done_a) | (is_rel & done_r), one, zero
            )
            t_fin = jnp.where(is_atk, t_a_fin,
                              jnp.where(is_rel, t_r_fin, t0))
            stage_fin = jnp.where(
                is_atk, stage_a_fin,
                jnp.where(is_rel, stage_r_fin, stage0),
            )
            rscale_fin = jnp.where(is_atk, rscale_a, rscale)
            new_state = {
                "stage": stage_fin, "t": t_fin, "release_scale": rscale_fin
            }
            return new_state, out, done

        return fn


class EnvelopeShape:
    """Per-segment interpolation shape (envelopes.rs:339-348 EnvelopeShape).

    The reference *declares* this enum but evaluates every segment linearly;
    we implement all four declared shapes (documented extension):

    * LINEAR      — straight line from the previous value to the target.
    * EXPONENTIAL — equal-ratio (geometric) curve ``from·(to/from)^frac``;
      falls back to linear when the endpoints differ in sign or either is 0
      (the geometric curve is undefined across zero).
    * SINUSOIDAL  — raised-cosine ease-in/out.
    * STEP        — the target value from the segment's first sample; the
      segment duration only delays the next transition.
    """

    LINEAR = 0
    EXPONENTIAL = 1
    SINUSOIDAL = 2
    STEP = 3

    _NAMES = {
        "linear": LINEAR,
        "exponential": EXPONENTIAL,
        "sinusoidal": SINUSOIDAL,
        "step": STEP,
    }

    @classmethod
    def code(cls, shape) -> int:
        if isinstance(shape, str):
            return cls._NAMES[shape.lower()]
        return int(shape)


class EnvelopeSegment:
    """(duration seconds, target value, shape) — envelopes.rs EnvelopeSegment
    (the reference stores reciprocal_duration/duration/value; shape is our
    implementation of its declared-but-unused EnvelopeShape)."""

    def __init__(self, duration: float, value: float, shape=EnvelopeShape.LINEAR):
        self.duration = float(duration)
        self.value = float(value)
        self.shape = EnvelopeShape.code(shape)


def _segment_value(shape, from_v, to_v, frac, dtype):
    """Evaluate one segment at normalized position frac ∈ [0, 1]."""
    frac = jnp.clip(frac, 0.0, 1.0).astype(dtype)
    lin = from_v + frac * (to_v - from_v)
    sinu = from_v + (to_v - from_v) * (1.0 - jnp.cos(jnp.pi * frac)) * 0.5
    same_sign = from_v * to_v > 0
    fa = jnp.maximum(jnp.abs(from_v), jnp.asarray(1e-12, dtype))
    ta = jnp.maximum(jnp.abs(to_v), jnp.asarray(1e-12, dtype))
    geo = jnp.sign(from_v) * fa * (ta / fa) ** frac
    expo = jnp.where(same_sign, geo, lin)
    return jnp.where(
        shape == EnvelopeShape.LINEAR,
        lin,
        jnp.where(
            shape == EnvelopeShape.EXPONENTIAL,
            expo,
            jnp.where(shape == EnvelopeShape.SINUSOIDAL, sinu, to_v),
        ),
    )


class Envelope(UGen):
    """Multi-segment envelope with per-segment shapes, looping and time
    scaling (envelopes.rs:322-528 Envelope). Params: time_scale,
    jump_to_segment, t_restart, t_stop.

    jump_to_segment is a *retrigger* integer param: every set event re-jumps,
    even to the currently-active segment index (reference param_apply runs
    per event, envelopes.rs:488-508)."""

    may_set_done = True

    inputs = 0
    outputs = 1
    params = (
        # hint parity: envelopes.rs:469 (logarithmic, 0..=20)
        pfloat("time_scale", 1.0, range=(0.0, 20.0), logarithmic=True),
        pinteger("jump_to_segment", 0, retrigger=True),
        ptrigger("t_restart"),
        ptrigger("t_stop"),
    )

    def __init__(self, start_value: float, segments, looping: bool = False,
                 time_scale: float = 1.0):
        self.start_value = float(start_value)
        self.segments = [
            s if isinstance(s, EnvelopeSegment) else EnvelopeSegment(*s)
            for s in segments
        ]
        if not self.segments:
            raise ValueError("Envelope needs at least one segment")
        self.looping = bool(looping)
        self.pdefaults = {"time_scale": float(time_scale)}

    def init(self, ctx: AudioCtx):
        import numpy as np

        segs = np.asarray(
            [[1.0 / s.duration, s.duration, s.value] for s in self.segments],
            dtype=ctx.dtype,
        )
        self._segs = segs  # trace-time constant
        self._shapes = np.asarray([s.shape for s in self.segments], np.int32)
        return {
            "running": jnp.zeros((), bool),
            "seg": jnp.zeros((), jnp.int32),
            "time": jnp.zeros((), ctx.dtype),
            "from_value": jnp.asarray(self.start_value, ctx.dtype),
            # last seen jump_to_segment value — fallback set-detection for
            # hosts that don't materialize the set-event mask (voice banks)
            "last_jump": jnp.zeros((), jnp.int32),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        segs = jnp.asarray(self._segs)  # [S, 3] (recip, duration, value)
        shapes = jnp.asarray(self._shapes)  # [S]
        n_seg = segs.shape[0]
        base_scale = jnp.asarray(1.0 / ctx.sample_rate, dtype)
        start_value = jnp.asarray(self.start_value, dtype)
        looping = self.looping
        # the graph param engine provides a per-sample set-event mask for
        # retrigger ints; fall back to value-change detection without it
        jump_set = params.get("jump_to_segment_set")

        def step(carry, x):
            running, seg_i, t, from_v, last_jump = carry
            # --- triggers/params before the sample ---
            jump = jnp.clip(x["jump"], 0, n_seg - 1)
            if jump_set is None:
                do_jump = x["jump"] != last_jump
            else:
                do_jump = x["jump_set"]
            last_jump = x["jump"]
            seg_i = jnp.where(do_jump, jump, seg_i)
            t = jnp.where(do_jump, jnp.zeros((), dtype), t)
            running = running | do_jump
            restart = x["t_restart"]
            seg_i = jnp.where(restart, 0, seg_i)
            t = jnp.where(restart, jnp.zeros((), dtype), t)
            from_v = jnp.where(restart, start_value, from_v)
            running = running | restart
            # t_stop: freeze at current value
            recip, dur, val = segs[seg_i, 0], segs[seg_i, 1], segs[seg_i, 2]
            shape = shapes[seg_i]
            cur_val = _segment_value(shape, from_v, val, t * recip, dtype)
            stop = x["t_stop"]
            from_v = jnp.where(stop & running, cur_val, from_v)
            running = running & ~stop

            # --- process (envelopes.rs Envelope::process) ---
            dt = x["time_scale"] * base_scale
            in_seg = t < dur
            has_next = seg_i + 1 < n_seg
            out_running = jnp.where(
                in_seg,
                _segment_value(shape, from_v, val, t * recip, dtype),
                val,
            )
            out = jnp.where(running, out_running, from_v)
            # transitions
            adv = running & ~in_seg & has_next
            fin = running & ~in_seg & ~has_next
            from_v = jnp.where(adv | fin, val, from_v)
            t = jnp.where(
                running & in_seg,
                t + dt,
                jnp.where(adv, t - dur + dt, t),
            )
            seg_i = jnp.where(adv, seg_i + 1, seg_i)
            if looping:
                seg_i = jnp.where(fin, 0, seg_i)
                t = jnp.where(fin, jnp.zeros((), dtype), t)
                done = jnp.zeros((), bool)
            else:
                running = running & ~fin
                done = fin
            return (running, seg_i, t, from_v, last_jump), (out, done)

        xs = {
            "time_scale": params["time_scale"],
            "jump": params["jump_to_segment"],
            "t_restart": params["t_restart"],
            "t_stop": params["t_stop"],
        }
        if jump_set is not None:
            xs["jump_set"] = jump_set
        carry0 = (
            state["running"],
            state["seg"],
            state["time"],
            state["from_value"],
            state["last_jump"],
        )
        (running, seg_i, t, from_v, last_jump), (out, done) = jax.lax.scan(
            step, carry0, xs
        )
        new_state = {
            "running": running,
            "seg": seg_i,
            "time": t,
            "from_value": from_v,
            "last_jump": last_jump,
        }
        return new_state, out[None, :], done
