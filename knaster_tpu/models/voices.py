"""Voice models: ready-made instrument voices for VoiceBank batching.

These compose library UGens *functionally* (a UGen's process is a pure
function, so composition is ordinary function calls — no graph nodes needed
inside a voice). They are the flagship workloads:

* :class:`SineVoice` — the reference's ``many_sines`` voice
  (knaster/examples/many_sines.rs: EnvAr * (SinWt.wr_mul(amp)) >> Pan2).
* :class:`FMVoice` — 2-operator FM with an AR envelope (the fm_bench
  workload family, knaster_benchmarks/src/bin/fm_bench.rs).
* :class:`SubtractiveVoice` — AA saw -> SVF lowpass -> ASR envelope
  (BASELINE.md config: "Subtractive voice: wavetable saw → SVF → ADSR").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen, normalize_process_result
from ..primitives.params import ParameterKind, pfloat, pinteger, ptrigger
from ..ugens.envelopes import EnvAr, EnvAsr
from ..ugens.filters import SvfFilter, SvfFilterType
from ..ugens.osc import SinWt
from ..ugens.pan import Pan2
from ..ugens.polyblep import PolyBlep, Waveform


class SineVoice(UGen):
    """Enveloped, panned sine voice (many_sines.rs parity)."""

    inputs = 0
    outputs = 2
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("amp", 0.0125),
        pfloat("pan", 0.0),
        ptrigger("t_restart"),
        ptrigger("t_release"),
    )

    def __init__(self, freq: float = 440.0, amp: float = 0.0125, pan: float = 0.0,
                 attack: float = 0.01, release: float = 0.1):
        self.pdefaults = {"freq": float(freq), "amp": float(amp), "pan": float(pan)}
        self.osc = SinWt(freq)
        self.env = EnvAsr(attack, release)
        self.panner = Pan2(pan)

    def init(self, ctx: AudioCtx):
        return {
            "osc": self.osc.init(ctx),
            "env": self.env.init(ctx),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        atk = getattr(self.env, "pdefaults", {})
        osc_state, osc_out, _ = normalize_process_result(
            self.osc.process(
                ctx, state["osc"],
                no_in,
                {
                    "freq": params["freq"],
                    "phase_offset": jnp.zeros((B,), ctx.dtype),
                    "reset_phase": jnp.zeros((B,), bool),
                },
            ),
            ctx,
        )
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"],
                no_in,
                {
                    "attack_time": jnp.full((B,), atk.get("attack_time", 0.01), ctx.dtype),
                    "release_time": jnp.full((B,), atk.get("release_time", 0.1), ctx.dtype),
                    "t_restart": params["t_restart"],
                    "t_release": params["t_release"],
                },
            ),
            ctx,
        )
        sig = osc_out * env_out * params["amp"]
        _, out = self.panner.process(ctx, {}, sig, {"pan": params["pan"]})
        return {"osc": osc_state, "env": env_state}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body for the generic PallasVoiceBank: SinWt's
        u32 phase + table-quantized sine, EnvAsr state machine, exact
        equal-power Pan2 gains (cos/sin of the materialized pan every
        sample — the hand-written PallasSineVoiceBank's fast path instead
        rotates a phasor, an approximation while pan ramps)."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (
            _HALF_PI, _env_asr, _env_asr_free, _sin_quant, _to_inc,
        )
        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        env_d = self.env.pdefaults
        atk = np.float32(
            1.0 / max(env_d["attack_time"] * ctx.sample_rate, 1.0)
        )
        rel = np.float32(
            1.0 / max(env_d["release_time"] * ctx.sample_rate, 1.0)
        )
        half = np.float32(0.5)

        def body(i_f, carry, P, T):
            phase = carry["phase"]
            stage, t, rscale = carry["stage"], carry["t"], carry["rscale"]
            restart, release = T["t_restart"], T["t_release"]
            if restart is None:
                env, stage, t = _env_asr_free(stage, t, rscale, atk, rel)
            else:
                env, stage, t, rscale = _env_asr(
                    stage, t, rscale, restart, release, atk, rel
                )
            sig = _sin_quant(phase) * (env * P["amp"])
            phase = phase + _to_inc(P["freq"] * f2pi)
            angle = (P["pan"] * half + half) * _HALF_PI
            new = {"phase": phase, "stage": stage, "t": t, "rscale": rscale}
            return new, (sig * jnp.cos(angle), sig * jnp.sin(angle))

        return MosaicVoiceSpec(
            carry={
                "phase": (jnp.uint32, 0),
                "stage": (ctx.dtype, 0.0),
                "t": (ctx.dtype, 0.0),
                "rscale": (ctx.dtype, 1.0),
            },
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


class EnvelopeVoice(UGen):
    """Sine voice gated by a MULTI-SEGMENT :class:`Envelope` with
    per-segment shapes, looping and live ``time_scale`` — the bank-scale
    carrier for arbitrary envelope programs (reference
    envelopes.rs:322-528; the 2-segment ASR/AR voices cover only
    attack/release shapes).

    The vmap path runs the engine's own ``Envelope.process`` scan
    verbatim; the ``mosaic_voice`` body folds the trace-time segment
    table as unrolled selects (``_make_env_multiseg``) so pool-managed
    voices with 4+-segment envelopes run at fused-kernel scale. The
    envelope-finished bit is the VoicePool idle latch on both paths."""

    inputs = 0
    outputs = 2
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("amp", 0.0125),
        pfloat("pan", 0.0),
        # hint parity with Envelope.time_scale (envelopes.rs:469)
        pfloat("time_scale", 1.0, range=(0.0, 20.0), logarithmic=True),
        ptrigger("t_restart"),
        ptrigger("t_stop"),
    )

    def __init__(self, envelope=None, freq: float = 440.0,
                 amp: float = 0.0125, pan: float = 0.0,
                 time_scale: float = 1.0):
        from ..ugens.envelopes import Envelope

        if envelope is None:
            # default 4-segment pluck-ish program: rise, drop, sag, fade
            envelope = Envelope(0.0, [
                (0.01, 1.0), (0.05, 0.6), (0.2, 0.4, "sinusoidal"),
                (0.3, 0.0),
            ])
        if not isinstance(envelope, Envelope):
            raise ValueError("envelope must be an Envelope instance")
        self.env = envelope
        self.osc = SinWt(freq)
        self.panner = Pan2(pan)
        self.pdefaults = {
            "freq": float(freq), "amp": float(amp), "pan": float(pan),
            "time_scale": float(time_scale),
        }

    def init(self, ctx: AudioCtx):
        return {
            "osc": self.osc.init(ctx),
            "env": self.env.init(ctx),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        osc_state, osc_out, _ = normalize_process_result(
            self.osc.process(
                ctx, state["osc"], no_in,
                {
                    "freq": params["freq"],
                    "phase_offset": jnp.zeros((B,), ctx.dtype),
                    "reset_phase": jnp.zeros((B,), bool),
                },
            ),
            ctx,
        )
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"], no_in,
                {
                    "time_scale": params["time_scale"],
                    "jump_to_segment": jnp.zeros((B,), jnp.int32),
                    "t_restart": params["t_restart"],
                    "t_stop": params["t_stop"],
                },
            ),
            ctx,
        )
        sig = osc_out * env_out * params["amp"]
        _, out = self.panner.process(ctx, {}, sig, {"pan": params["pan"]})
        return {"osc": osc_state, "env": env_state}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body: SinWt phase + the unrolled segment-table
        envelope fold + exact Pan2 gains. Carry mirrors the engine's
        Envelope state with the running flag folded into ``eseg`` as
        sentinels (pallas_bank.ENV_SEG_FINISHED / _STOPPED) — one fewer
        carry row per sample. Pan gains use the kernel's odd sin
        polynomial, not hardware cos/sin (the round-4 pan-stage lesson:
        carried/hardware transcendentals are the modal bank's 30%-of-
        ceiling bottleneck class)."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (
            _HALF_PI, _make_env_multiseg, _sin_poly, _sin_quant, _to_inc,
            ENV_SEG_FINISHED,
        )
        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        segs = np.asarray(
            [[1.0 / s.duration, s.duration, s.value]
             for s in self.env.segments],
            np.float32,
        )
        shapes = [s.shape for s in self.env.segments]
        estep = _make_env_multiseg(
            segs, self.env.looping, self.env.start_value, shapes
        )
        base_scale = np.float32(1.0 / ctx.sample_rate)
        half = np.float32(0.5)

        def body(i_f, carry, P, T):
            phase = carry["phase"]
            dt = P["time_scale"] * base_scale
            env, eseg, et, efrom, _fin = estep(
                carry["eseg"], carry["et"], carry["efrom"],
                dt, T["t_restart"], T["t_stop"],
            )
            sig = _sin_quant(phase) * (env * P["amp"])
            phase = phase + _to_inc(P["freq"] * f2pi)
            angle = (P["pan"] * half + half) * _HALF_PI
            new = {"phase": phase, "eseg": eseg, "et": et, "efrom": efrom}
            return new, (
                sig * _sin_poly(_HALF_PI - angle), sig * _sin_poly(angle)
            )

        return MosaicVoiceSpec(
            carry={
                "phase": (jnp.uint32, 0),
                "eseg": (ctx.dtype, float(ENV_SEG_FINISHED)),
                "et": (ctx.dtype, 0.0),
                "efrom": (ctx.dtype, float(self.env.start_value)),
            },
            body=body,
            idle_of=lambda c: c["eseg"] == float(ENV_SEG_FINISHED),
        )


class FMVoice(UGen):
    """2-operator FM voice: modulator sine FMs a carrier sine, AR envelope.

    carrier_freq, ratio (mod freq = carrier*ratio), index (mod depth in units
    of carrier freq) — the classic FM patch the reference's fm_bench cascades.
    """

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 220.0, kind=ParameterKind.FREQUENCY),
        pfloat("ratio", 2.0),
        pfloat("index", 1.5),
        pfloat("amp", 0.1),
        ptrigger("t_restart"),
    )

    def __init__(self, freq: float = 220.0, ratio: float = 2.0, index: float = 1.5,
                 amp: float = 0.1, attack: float = 0.005, release: float = 0.3):
        self.pdefaults = {
            "freq": float(freq),
            "ratio": float(ratio),
            "index": float(index),
            "amp": float(amp),
        }
        self.mod = SinWt(freq * ratio)
        self.car = SinWt(freq)
        self.env = EnvAr(attack, release)
        self._attack = float(attack)
        self._release = float(release)

    def init(self, ctx: AudioCtx):
        return {
            "mod": self.mod.init(ctx),
            "car": self.car.init(ctx),
            "env": self.env.init(ctx),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        zeros = jnp.zeros((B,), ctx.dtype)
        no_trig = jnp.zeros((B,), bool)
        mod_state, mod_out, _ = normalize_process_result(
            self.mod.process(
                ctx, state["mod"], no_in,
                {"freq": params["freq"] * params["ratio"],
                 "phase_offset": zeros, "reset_phase": no_trig},
            ),
            ctx,
        )
        # audio-rate FM: carrier freq modulated per sample (WrArParams parity)
        car_freq = params["freq"] * (1.0 + params["index"] * mod_out[0])
        car_state, car_out, _ = normalize_process_result(
            self.car.process(
                ctx, state["car"], no_in,
                {"freq": car_freq, "phase_offset": zeros, "reset_phase": no_trig},
            ),
            ctx,
        )
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"], no_in,
                {
                    "attack_time": jnp.full((B,), self._attack, ctx.dtype),
                    "release_time": jnp.full((B,), self._release, ctx.dtype),
                    "t_restart": params["t_restart"],
                },
            ),
            ctx,
        )
        out = car_out * env_out * params["amp"]
        return {"mod": mod_state, "car": car_state, "env": env_state}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body for the generic PallasVoiceBank (mirrors
        pallas_bank._fm_kernel's math exactly — the hand-written
        PallasFMVoiceBank is the bit-parity A/B reference)."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (
            _env_ar, _env_ar_free, _sin_quant, _to_inc,
        )
        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        atk = np.float32(1.0 / max(self._attack * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(self._release * ctx.sample_rate, 1.0))
        one = np.float32(1.0)

        def body(i_f, carry, P, T):
            phm, phc = carry["phm"], carry["phc"]
            stage, t = carry["stage"], carry["t"]
            restart = T["t_restart"]
            if restart is None:
                env, stage, t = _env_ar_free(stage, t, atk, rel)
            else:
                env, stage, t = _env_ar(stage, t, restart, atk, rel)
            gain = env * P["amp"]
            freq = P["freq"]
            mod = _sin_quant(phm)
            phm = phm + _to_inc(freq * P["ratio"] * f2pi)
            car_freq = freq * (one + P["index"] * mod)
            car = _sin_quant(phc)
            phc = phc + _to_inc(car_freq * f2pi)
            new = {"phm": phm, "phc": phc, "stage": stage, "t": t}
            return new, (car * gain,)

        return MosaicVoiceSpec(
            carry={
                "phm": (jnp.uint32, 0),
                "phc": (jnp.uint32, 0),
                "stage": (ctx.dtype, 0.0),
                "t": (ctx.dtype, 0.0),
            },
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


class SubtractiveVoice(UGen):
    """PolyBLEP saw -> SVF lowpass -> ASR envelope (BASELINE config #2)."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 110.0, kind=ParameterKind.FREQUENCY),
        pfloat("cutoff", 2000.0, kind=ParameterKind.FREQUENCY),
        pfloat("q", 1.0),
        pfloat("amp", 0.2),
        ptrigger("t_restart"),
        ptrigger("t_release"),
    )

    def __init__(self, freq: float = 110.0, cutoff: float = 2000.0, q: float = 1.0,
                 amp: float = 0.2, attack: float = 0.01, release: float = 0.2):
        self.pdefaults = {
            "freq": float(freq),
            "cutoff": float(cutoff),
            "q": float(q),
            "amp": float(amp),
        }
        self.osc = PolyBlep(Waveform.Sawtooth, freq)
        self.filt = SvfFilter(SvfFilterType.Low, cutoff, q, 0.0)
        self.env = EnvAsr(attack, release)
        self._attack = float(attack)
        self._release = float(release)

    def init(self, ctx: AudioCtx):
        return {
            "osc": self.osc.init(ctx),
            "filt": self.filt.init(ctx),
            "env": self.env.init(ctx),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        osc_state, osc_out, _ = normalize_process_result(
            self.osc.process(
                ctx, state["osc"], no_in,
                {
                    "waveform": jnp.zeros((B,), jnp.int32),
                    "freq": params["freq"],
                    "pulse_width": jnp.full((B,), 0.5, ctx.dtype),
                },
            ),
            ctx,
        )
        filt_state, filt_out, _ = normalize_process_result(
            self.filt.process(
                ctx, state["filt"], osc_out,
                {
                    "filter": jnp.zeros((B,), jnp.int32),
                    "cutoff_freq": params["cutoff"],
                    "q": params["q"],
                    "gain": jnp.zeros((B,), ctx.dtype),
                    "t_calculate_coefficients": jnp.zeros((B,), bool),
                },
            ),
            ctx,
        )
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"], no_in,
                {
                    "attack_time": jnp.full((B,), self._attack, ctx.dtype),
                    "release_time": jnp.full((B,), self._release, ctx.dtype),
                    "t_restart": params["t_restart"],
                    "t_release": params["t_release"],
                },
            ),
            ctx,
        )
        out = filt_out * env_out * params["amp"]
        return {"osc": osc_state, "filt": filt_state, "env": env_state}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body for the generic PallasVoiceBank (mirrors
        pallas_bank._sub_kernel's math exactly — the hand-written
        PallasSubtractiveVoiceBank is the bit-parity A/B reference).

        Same caveat as the hand kernel: the saw is the plain polyBLEP
        without the > sr/4 sine fallback — keep fundamentals below sr/4."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (_env_asr, _env_asr_free,
                                            _svf_low_coeffs)

        inv_sr = np.float32(1.0 / ctx.sample_rate)
        pi_inv_sr = np.float32(np.pi) * inv_sr
        atk = np.float32(1.0 / max(self._attack * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(self._release * ctx.sample_rate, 1.0))
        one = np.float32(1.0)
        zero = np.float32(0.0)
        two = np.float32(2.0)
        half = np.float32(0.5)

        def blep(t, dt):
            safe_dt = jnp.maximum(dt, np.float32(1e-9))
            a = t / safe_dt - one
            b = (t - one) / safe_dt + one
            return jnp.where(
                t < dt, -(a * a), jnp.where(t > one - dt, b * b, zero)
            )

        def body(i_f, carry, P, T):
            t, ic1, ic2 = carry["t"], carry["ic1"], carry["ic2"]
            stage, et, rscale = carry["stage"], carry["et"], carry["rscale"]
            restart, release = T["t_restart"], T["t_release"]
            if restart is None:
                env, stage, et = _env_asr_free(stage, et, rscale, atk, rel)
            else:
                env, stage, et, rscale = _env_asr(
                    stage, et, rscale, restart, release, atk, rel
                )

            # polyBLEP sawtooth (polyblep.rs saw): y = 2*frac(t+0.5)-1 - blep
            dt = jnp.clip(P["freq"] * inv_sr, 0.0, 0.5)
            _t = t + half
            _t = _t - jnp.floor(_t)
            saw = two * _t - one - blep(_t, dt)
            t = t + dt
            t = t - jnp.floor(t)

            # SVF lowpass coefficients per sample (one-divide sc-form,
            # bit-identical to the hand kernel; see _svf_low_coeffs)
            a1, a2, a3 = _svf_low_coeffs(pi_inv_sr * P["cutoff"], P["q"])
            # SVF step (svf.rs process_sample, m = (0, 0, 1))
            v3 = saw - ic2
            v1 = a1 * ic1 + a2 * v3
            v2 = ic2 + a2 * ic1 + a3 * v3
            ic1 = two * v1 - ic1
            ic2 = two * v2 - ic2

            new = {"t": t, "ic1": ic1, "ic2": ic2, "stage": stage,
                   "et": et, "rscale": rscale}
            return new, (v2 * (env * P["amp"]),)

        return MosaicVoiceSpec(
            carry={
                "t": (ctx.dtype, 0.0),
                "ic1": (ctx.dtype, 0.0),
                "ic2": (ctx.dtype, 0.0),
                "stage": (ctx.dtype, 0.0),
                "et": (ctx.dtype, 0.0),
                "rscale": (ctx.dtype, 1.0),
            },
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


class FMCascade(UGen):
    """N-stage FM cascade: each sine FM-modulates the next
    (the reference's fm_bench / graph_dsp_performance cascade workload,
    knaster_benchmarks/benches/graph_dsp_performance.rs:38-80).

    TPU-native expression: instead of N graph nodes (an N-deep chain of tiny
    ops, launch-overhead-bound on accelerators), one UGen scans over the
    stage axis — stage k's frequency is ``base + depth * out[k-1]``.

    NOTE: since the chain-collapse pass + Pallas chain executor landed
    (graph/compile.py, graph/chain_kernel.py), the same cascade built from
    plain graph nodes runs FASTER than this hand-fused UGen (149x vs 45x
    realtime super-bounce on a v5e — benchmarks/RESULTS.md): the compiler
    collapses the node chain and runs the stage loop in one kernel, with
    per-stage live parameters the fused UGen can't offer. Prefer graph
    nodes; this model remains as the fused A/B reference point."""

    inputs = 0
    outputs = 1
    params = (
        pfloat("freq", 100.0, kind=ParameterKind.FREQUENCY),
        pfloat("base", 200.0, kind=ParameterKind.FREQUENCY),
        pfloat("depth", 100.0),
        pfloat("amp", 0.1),
    )

    def __init__(self, n_stages: int = 256, freq: float = 100.0,
                 base: float = 200.0, depth: float = 100.0, amp: float = 0.1,
                 use_pallas: bool = True):
        self.n_stages = int(n_stages)
        self.pdefaults = {
            "freq": float(freq),
            "base": float(base),
            "depth": float(depth),
            "amp": float(amp),
        }
        # the Pallas kernel keeps the stage loop in VMEM/SMEM: ~23x faster
        # than the lax.scan form on a v5e (45x vs 1.9x realtime at 256
        # stages). Parameters are read at block rate in this path.
        self.use_pallas = bool(use_pallas)

    def init(self, ctx: AudioCtx):
        import jax.numpy as jnp

        return {"phases": jnp.zeros((self.n_stages,), jnp.uint32)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        import jax
        import numpy as np

        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_HIGH_MASK, TABLE_SIZE

        B = ctx.block_size
        dtype = ctx.dtype
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        scale = np.float32(2.0 * np.pi / TABLE_SIZE)

        if self.use_pallas and dtype == np.float32:
            return self._process_pallas(ctx, state, params, f2pi, scale)

        base = params["base"]
        depth = params["depth"]

        def stage(carry_block, ph0):
            freq = base + depth * carry_block
            inc = jnp.clip(freq * f2pi, 0.0, 2.0**31 - 1).astype(jnp.uint32)
            ecs = jnp.concatenate(
                [jnp.zeros((1,), jnp.uint32), jnp.cumsum(inc)]
            )
            idx = (((ph0 + ecs[:B]) >> 16) & TABLE_HIGH_MASK).astype(dtype)
            out = jnp.sin(idx * scale)
            return out, ph0 + ecs[B]

        # stage 0 is driven by the plain `freq` param (constant "modulator")
        first_freq = params["freq"]
        inc0 = jnp.clip(first_freq * f2pi, 0.0, 2.0**31 - 1).astype(jnp.uint32)
        ecs0 = jnp.concatenate([jnp.zeros((1,), jnp.uint32), jnp.cumsum(inc0)])
        idx0 = (((state["phases"][0] + ecs0[:B]) >> 16) & TABLE_HIGH_MASK).astype(dtype)
        out0 = jnp.sin(idx0 * scale)
        ph0_new = state["phases"][0] + ecs0[B]

        last, new_rest = jax.lax.scan(stage, out0, state["phases"][1:])
        phases = jnp.concatenate([ph0_new[None], new_rest])
        return {"phases": phases}, (last * params["amp"])[None, :]

    def _process_pallas(self, ctx: AudioCtx, state, params, f2pi, scale):
        import jax
        import numpy as np
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ugens.wavetable import TABLE_HIGH_MASK

        B = ctx.block_size
        N = self.n_stages
        mask = np.uint32(TABLE_HIGH_MASK)

        def cumsum_lanes(x):
            # Mosaic has no cumsum primitive: Hillis-Steele over lanes
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            s = 1
            while s < x.shape[1]:
                shifted = pltpu.roll(x, s, axis=1)
                x = x + jnp.where(lane >= s, shifted, jnp.zeros_like(x))
                s *= 2
            return x

        def kernel(p_ref, phases_ref, out_ref, phases_out):
            # p_ref (SMEM): [freq, base, depth, amp] at block rate
            def stage_osc(ph0, freq_blk):
                inc = pltpu.bitcast(
                    jnp.clip(freq_blk * f2pi, 0.0, 2.0**31 - 1).astype(jnp.int32),
                    jnp.uint32,
                )
                csum = cumsum_lanes(inc)
                phase_t = ph0 + csum - inc
                idx = pltpu.bitcast(
                    (phase_t >> 16) & mask, jnp.int32
                ).astype(jnp.float32)
                return jnp.sin(idx * scale), ph0 + csum[0, B - 1]

            first, ph_new = stage_osc(
                phases_ref[0], jnp.full((1, B), p_ref[0], jnp.float32)
            )
            phases_out[0] = ph_new

            def body(k, carry):
                freq_blk = p_ref[1] + p_ref[2] * carry
                out, ph_new = stage_osc(phases_ref[k], freq_blk)
                phases_out[k] = ph_new
                return out

            out = jax.lax.fori_loop(1, N, body, first)
            out_ref[:] = out * p_ref[3]

        interpret = jax.devices()[0].platform == "cpu"
        p = jnp.stack(
            [params["freq"][0], params["base"][0], params["depth"][0],
             params["amp"][0]]
        )
        out, phases = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((N,), jnp.uint32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(p, state["phases"])
        return {"phases": phases}, out


class AdditiveVoice(UGen):
    """Band-limited arbitrary-wavetable voice: enveloped, panned additive
    synthesis from a table's harmonic decomposition.

    The TPU-native answer to OscWt at voice-bank scale
    (knaster_core/src/dsp/wavetable.rs mip-table reads): a wavetable cycle is
    decomposed into H partials (``harmonics_from_table``) and re-synthesized
    by phasor recurrence — sin/cos of the quantized fundamental computed
    once, harmonic h's phasor obtained by complex multiply (phase-locked and
    one VPU multiply per harmonic instead of a transcendental), partials
    above Nyquist masked per sample. No gathers, exact anti-aliasing at
    every frequency (the reference's 1.5x-spaced mip chain only bounds
    aliasing).

    Pass ``table`` (one cycle) or ``harmonics`` (mags [H], or (mags,
    offsets_u32) for non-sine-phase partials).
    """

    inputs = 0
    outputs = 2
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("amp", 0.0125),
        pfloat("pan", 0.0),
        ptrigger("t_restart"),
        ptrigger("t_release"),
    )

    def __init__(self, table=None, harmonics=None, n_harmonics: int = 16,
                 freq: float = 440.0, amp: float = 0.0125, pan: float = 0.0,
                 attack: float = 0.01, release: float = 0.1):
        import numpy as np

        from ..ugens.wavetable import harmonics_from_table

        if (table is None) == (harmonics is None):
            raise ValueError("pass exactly one of table= or harmonics=")
        if table is not None:
            if hasattr(table, "buffer"):  # NonAaWavetable
                table = table.buffer
            mags, offs = harmonics_from_table(table, n_harmonics)
        elif isinstance(harmonics, tuple):
            mags = np.asarray(harmonics[0], np.float32)
            offs = np.asarray(harmonics[1], np.uint32)
        else:
            mags = np.asarray(harmonics, np.float32)
            offs = np.zeros(len(mags), np.uint32)
        self.mags = mags
        self.offsets = offs
        self.n_harmonics = len(mags)
        self.pdefaults = {"freq": float(freq), "amp": float(amp), "pan": float(pan)}
        self.env = EnvAsr(attack, release)
        self._attack = float(attack)
        self._release = float(release)
        from ..ugens.pan import Pan2 as _P
        self.panner = _P(pan)

    def batch_key(self):
        return (type(self), self.n_harmonics, bytes(self.mags.tobytes()),
                bytes(self.offsets.tobytes()), self._attack, self._release)

    def init(self, ctx: AudioCtx):
        return {"phase": jnp.zeros((), jnp.uint32), "env": self.env.init(ctx)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        import numpy as np

        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_HIGH_MASK, TABLE_SIZE

        B = ctx.block_size
        dtype = ctx.dtype
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        scale = np.float32(2.0 * np.pi / TABLE_SIZE)
        freq = params["freq"]
        inc = jnp.clip(freq * f2pi, 0.0, 2.0**31 - 1).astype(jnp.uint32)
        ecs = jnp.concatenate([jnp.zeros((1,), jnp.uint32), jnp.cumsum(inc)])
        phase_t = state["phase"] + ecs[:B]  # [B]
        # sin/cos of the exact fundamental angle once; harmonic h's phasor by
        # complex-multiply recurrence (one mul per harmonic instead of one
        # transcendental); per-harmonic table phases fold into static A/B.
        # One cycle = TABLE_SIZE*FRACTIONAL_PART = 2**30 phase units.
        cycle = float(TABLE_SIZE) * float(FRACTIONAL_PART)
        theta = (phase_t & jnp.uint32(cycle - 1)).astype(dtype) * np.float32(
            2.0 * np.pi / cycle
        )
        s1, c1 = jnp.sin(theta), jnp.cos(theta)
        phi = self.offsets.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        A = (self.mags * np.cos(phi)).astype(np.float32)
        Bc = (self.mags * np.sin(phi)).astype(np.float32)
        # hoisted per-harmonic Nyquist thresholds: mask = freq <= nyq/h with
        # the division done once in f64 and rounded to f32 (one compare per
        # harmonic per sample instead of multiply+compare — measured +8% on
        # the wavetable kernel, kernel_probe wt_hmax; all three wavetable
        # paths use the identical thresholds so parity stays bit-exact)
        hvec = np.arange(1, self.n_harmonics + 1, dtype=np.float64)
        thr = (np.float64(ctx.sample_rate / 2.0) / hvec).astype(np.float32)
        alive = (freq[:, None] <= thr[None, :]).astype(dtype)  # [B, H]
        s, c = s1, c1
        osc = (A[0] * s + Bc[0] * c) * alive[:, 0]
        for h in range(1, self.n_harmonics):
            s, c = s * c1 + c * s1, c * c1 - s * s1
            osc = osc + (A[h] * s + Bc[h] * c) * alive[:, h]

        no_in = jnp.zeros((0, B), dtype)
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"], no_in,
                {
                    "attack_time": jnp.full((B,), self._attack, dtype),
                    "release_time": jnp.full((B,), self._release, dtype),
                    "t_restart": params["t_restart"],
                    "t_release": params["t_release"],
                },
            ),
            ctx,
        )
        sig = (osc * env_out[0] * params["amp"])[None, :]
        _, out = self.panner.process(ctx, {}, sig, {"pan": params["pan"]})
        return {"phase": state["phase"] + ecs[B], "env": env_state}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body for the generic PallasVoiceBank (mirrors
        pallas_bank._wt_kernel's additive math exactly: full-resolution
        fundamental angle, per-harmonic phasor recurrence with baked A/B
        coefficients, per-sample Nyquist masking, EnvAsr). Pan uses exact
        cos/sin of the materialized pan each sample (Pan2/vmap parity; the
        hand-written PallasWavetableVoiceBank's fast path rotates a phasor
        instead, an approximation while pan ramps)."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (
            _HALF_PI, _env_asr, _env_asr_free, _theta_full, _to_inc,
        )
        from ..ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        atk = np.float32(1.0 / max(self._attack * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(self._release * ctx.sample_rate, 1.0))
        phi = self.offsets.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        acoef = (self.mags * np.cos(phi)).astype(np.float32)
        bcoef = (self.mags * np.sin(phi)).astype(np.float32)
        H = self.n_harmonics
        # same hoisted f64-divided thresholds as AdditiveVoice.process
        thr = [np.float32(np.float64(ctx.sample_rate / 2.0) / (h + 1))
               for h in range(H)]
        zero = np.float32(0.0)
        half = np.float32(0.5)

        def body(i_f, carry, P, T):
            phase = carry["phase"]
            stage, t, rscale = carry["stage"], carry["t"], carry["rscale"]
            restart, release = T["t_restart"], T["t_release"]
            if restart is None:
                env, stage, t = _env_asr_free(stage, t, rscale, atk, rel)
            else:
                env, stage, t, rscale = _env_asr(
                    stage, t, rscale, restart, release, atk, rel
                )

            freq = P["freq"]
            theta = _theta_full(phase)
            s1 = jnp.sin(theta)
            c1 = jnp.cos(theta)
            phase = phase + _to_inc(freq * f2pi)

            # per-sample AA mask against the hoisted thresholds, same
            # constants as AdditiveVoice.process so the boundary rounds
            # identically (one compare per harmonic, no multiply)
            s, c = s1, c1
            acc = jnp.where(
                freq <= thr[0],
                np.float32(acoef[0]) * s + np.float32(bcoef[0]) * c, zero
            )
            for h in range(1, H):
                s, c = s * c1 + c * s1, c * c1 - s * s1
                part = np.float32(acoef[h]) * s + np.float32(bcoef[h]) * c
                acc = acc + jnp.where(freq <= thr[h], part, zero)

            sig = acc * (env * P["amp"])
            angle = (P["pan"] * half + half) * _HALF_PI
            new = {"phase": phase, "stage": stage, "t": t, "rscale": rscale}
            return new, (sig * jnp.cos(angle), sig * jnp.sin(angle))

        return MosaicVoiceSpec(
            carry={
                "phase": (jnp.uint32, 0),
                "stage": (ctx.dtype, 0.0),
                "t": (ctx.dtype, 0.0),
                "rscale": (ctx.dtype, 1.0),
            },
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


class SamplerVoice(UGen):
    """Sample-playback voice for bank batching: one shared buffer, per-voice
    rate/amp/pan, ASR envelope, restart trigger.

    The TPU-native answer to BufferReader (ugens/buffer.rs:21-190) at voice
    scale: instead of a per-sample scan, read positions are computed in
    closed form for the whole block (loop wrap = integer modulus, a restart
    re-anchors positions from its exact frame via a mask), so a bank of V
    voices is two batched [V, B] gathers from the shared buffer plus
    elementwise math. Divergences from BufferReader (documented): the loop
    boundary is rounded to whole frames, and one restart per block per voice
    (the most recent wins).

    Three read paths (same position trajectory; DESIGN_NOTES "Gathers
    bill per element" + "Windowed resampling"):
      * default — two element gathers per sample; any rate incl. negative;
        gather-bound (~1.4k rt voices on a v5e at 48 k-frame buffers).
      * ``tiled=True`` — UNIT rate only; contiguous tile reads + barrel
        roll; ~26x the gather path.
      * ``resample=True`` — rate clamped to [0, ``max_rate``]; per-chunk
        contiguous tile windows + one-hot in-window matmuls at HIGHEST
        precision (an exact gather): BIT-identical to the gather path
        at ~20x its throughput (28.4k vs 1.45k rt voices on a v5e) —
        pitched sample playback at bank scale.
        Above ``_RS_BLOCK_CAP`` trace-time frames (long superblocks) it
        falls back to the gather read — seamless, because the paths are
        bit-identical.
    """

    inputs = 0
    outputs = 2
    params = (
        pfloat("rate", 1.0),
        pfloat("amp", 0.5),
        pfloat("pan", 0.0),
        ptrigger("t_restart"),
        ptrigger("t_release"),
    )

    def __init__(self, buffer, rate: float = 1.0, amp: float = 0.5,
                 pan: float = 0.0, loop: bool = True,
                 start_s: float = 0.0, end_s: float = -1.0,
                 attack: float = 0.005, release: float = 0.05,
                 tiled: bool = False, resample: bool = False,
                 max_rate: float = 2.0):
        import numpy as np

        data = np.asarray(buffer.data if hasattr(buffer, "data") else buffer)
        if data.ndim == 2:
            data = data[0]
        self._data = data.astype(np.float32)
        self._buf_sr = float(getattr(buffer, "sample_rate", 48000))
        n = len(self._data)
        self._start = int(round(start_s * self._buf_sr))
        end = n if end_s < 0 else min(n, int(round(end_s * self._buf_sr)))
        self._loop_len = max(end - self._start, 1)
        self.loop = bool(loop)
        # tiled=True: UNIT-RATE gather-free playback (DESIGN_NOTES "tile +
        # barrel roll") — the rate param is ignored (positions advance one
        # buffer frame per engine frame; the buffer must be at the engine's
        # sample rate, checked in init). 15-30x the gather path at bank
        # scale; drum machines and one-shot samplers are unit-rate anyway.
        self.tiled = bool(tiled)
        # resample=True: BOUNDED-rate gather-free playback (DESIGN_NOTES
        # "Windowed resampling") — rate is clamped to [0, max_rate]; the
        # block's read window spans <= max_rate*B+1 source frames, so a few
        # contiguous tiles row-fetched per voice cover every tap and the
        # in-window two-tap read is a one-hot matmul at HIGHEST precision
        # (an exact gather, granular precedent) — bit-identical to the
        # gather path, without the per-element HBM gather cost.
        self.resample = bool(resample)
        if self.tiled and self.resample:
            raise ValueError("tiled and resample are mutually exclusive")
        self.max_rate = float(max_rate)
        self.pdefaults = {"rate": float(rate), "amp": float(amp),
                          "pan": float(pan)}
        self.env = EnvAsr(attack, release)
        self._attack = float(attack)
        self._release = float(release)
        from ..ugens.pan import Pan2 as _P
        self.panner = _P(pan)

    def batch_key(self):
        return (type(self), id(self._data), self._start, self._loop_len,
                self.loop, self._attack, self._release, self.tiled,
                self.resample, self.max_rate)

    def init(self, ctx: AudioCtx):
        import numpy as np

        if self.tiled:
            if self._buf_sr != float(ctx.sample_rate):
                raise ValueError(
                    "tiled SamplerVoice needs the buffer at the engine "
                    f"sample rate ({self._buf_sr} != {ctx.sample_rate})"
                )
            if self._loop_len < ctx.block_size:
                raise ValueError(
                    f"tiled SamplerVoice needs loop_len >= block_size "
                    f"({self._loop_len} < {ctx.block_size}); the window "
                    f"may wrap more than once"
                )
            # block-dependent (the tiling IS the program block size):
            # superblock programs are exact up to one loop length
            self.block_invariant = False
            self.superblock_cap = self._loop_len
            self._ext_cache = {}
        if self.resample:
            self._rs_cache = {}
        return {
            "pos_int": jnp.zeros((), jnp.int32),  # frames into the loop
            "pos_frac": jnp.zeros((), ctx.dtype),
            "playing": jnp.zeros((), bool),
            "env": self.env.init(ctx),
        }

    def _read_tiled(self, ctx: AudioCtx, state, params):
        """Gather-free unit-rate block read: per voice the window
        [p0, p0+B] spans two adjacent tiles of the extended source —
        row-fetch both, barrel-roll by p0 % B, lerp with the window's
        static shift-by-one. A restart at frame tf re-anchors at position
        0, whose window is the STATIC first tile pair."""
        import numpy as np

        B = ctx.block_size
        dtype = ctx.dtype
        L = self._loop_len
        if B not in self._ext_cache:
            # extended source for THIS program's block size (trace-time,
            # cached per B — superblock programs retile): the loop segment
            # plus its first B+1 frames, so any unit-rate window [p, p+B]
            # with p in [0, L) is one CONTIGUOUS read (the loop wrap is
            # baked in); one spare zero row keeps tiles[q+1] in bounds
            if L < B:
                raise ValueError(
                    f"tiled SamplerVoice: program block {B} exceeds "
                    f"loop_len {L}"
                )
            src = self._data[self._start:self._start + L]
            ext = np.concatenate([src, src[:B + 1]])
            pad = (-len(ext)) % B + B
            ext = np.concatenate([ext, np.zeros(pad, np.float32)])
            self._ext_cache[B] = ext.reshape(-1, B)
        tiles = jnp.asarray(self._ext_cache[B], dtype)  # [Te, B] shared

        trig = params["t_restart"]
        any_trig = jnp.any(trig)
        tf = jnp.max(jnp.where(trig, jnp.arange(B), -1))
        playing = state["playing"] | any_trig

        n_stages = max(1, int(np.ceil(np.log2(B))))

        def barrel(w2, r, sign):
            # roll w2 by sign*r via static rolls selected on r's bits
            for k in range(n_stages):
                rolled = jnp.roll(w2, sign * (1 << k))
                w2 = jnp.where(((r >> k) & 1).astype(bool), rolled, w2)
            return w2

        def window(p0):
            q, r = p0 // B, p0 % B
            # w2[t] = ext[p0 + t] for t in [0, 2B - r)
            return barrel(jnp.concatenate([tiles[q], tiles[q + 1]]), r, -1)

        p0 = state["pos_int"]  # in [0, L)
        w_cont = window(p0)
        # restart at frame tf: value at sample t is ext[t - tf] — the first
        # tile pair rolled RIGHT by tf (pre-tf garbage is masked below)
        w_fresh = barrel(
            jnp.concatenate([tiles[0], tiles[1]]), jnp.maximum(tf, 0), 1
        )
        t_idx = jnp.arange(B)
        after = any_trig & (t_idx >= tf)
        w0 = jnp.where(after, w_fresh[:B], w_cont[:B])
        w1_cont = jnp.roll(w_cont, -1)[:B]
        w1 = jnp.where(after, jnp.roll(w_fresh, -1)[:B], w1_cont)
        # per-sample positions for wrap/end handling
        pos_cont = p0 + t_idx
        pos = jnp.where(after, t_idx - tf, pos_cont)
        frac = jnp.where(any_trig, jnp.zeros((), dtype), state["pos_frac"])
        sig = w0 + (w1 - w0) * frac
        if self.loop:
            alive = playing & jnp.ones((B,), bool)
        else:
            alive = playing & (pos < L)
        sig = jnp.where(alive, sig, jnp.zeros_like(sig))

        end_pos = jnp.where(any_trig, B - tf, p0 + B)
        if self.loop:
            pos_int = jnp.mod(end_pos, L)
        else:
            pos_int = jnp.minimum(end_pos, L)
        return sig, pos_int, frac, playing

    # -------------------------------------------------- windowed resampling

    _RS_BLOCK_CAP = 256  # above this trace-time B, fall back to gathers

    def _rs_tiles(self, B: int, C: int, dtype):
        """Extended loop-baked source reshaped to [rows, C] (trace-time,
        cached per (B, C)). Covers every unwrapped read position
        ipos+1 <= L + max_rate*B + 1 (pos_int wraps to [0, L) only at
        block ends). Loop mode tiles the source periodically (== the
        gather path's mod-L indexing, even when the window wraps the loop
        more than once); one-shot appends src[L-1] once (the gather
        path's idx1 clamp at ipos == L-1 — every farther read is masked
        by ``alive``) then zeros."""
        import numpy as np

        key = (B, C)
        if key not in self._rs_cache:
            nT = int(np.ceil(self.max_rate)) + 2
            src = self._data[self._start:self._start + self._loop_len]
            L = self._loop_len
            frames = L + int(np.ceil(self.max_rate * B)) + C + 2
            rows = -(-frames // C) + nT + 1
            if self.loop:
                ext = np.resize(src, rows * C)
            else:
                ext = np.concatenate(
                    [src, src[-1:],
                     np.zeros(max(rows * C - L - 1, 0), np.float32)]
                )[: rows * C]
            self._rs_cache[key] = ext.reshape(rows, C)
        return jnp.asarray(self._rs_cache[key], dtype)

    def _read_resample(self, ctx: AudioCtx, state, params):
        """Gather-free bounded-rate read (DESIGN_NOTES "Windowed
        resampling"): positions are the gather path's trajectory verbatim;
        taps come from per-chunk contiguous tile windows via one-hot
        matmuls at HIGHEST precision — an exact gather, so the output is
        BIT-IDENTICAL to the gather path while fetching only contiguous
        rows from HBM."""
        import numpy as np
        from jax import lax

        B = ctx.block_size
        dtype = ctx.dtype
        L = self._loop_len
        C = B
        for cand in (16, 8):
            if B % cand == 0 and B > cand:
                C = cand
                break
        nc = B // C
        nT = int(np.ceil(self.max_rate)) + 2
        W = nT * C
        tiles = self._rs_tiles(B, C, dtype)

        base = np.float32(self._buf_sr / ctx.sample_rate)
        step = jnp.clip(params["rate"][0] * base, 0.0,
                        np.float32(self.max_rate))
        t = jnp.arange(B, dtype=dtype)
        cont = (state["pos_int"].astype(dtype) + state["pos_frac"]
                + step * t)
        fcont = jnp.floor(cont)
        icont = fcont.astype(jnp.int32).reshape(nc, C)
        q_cont = icont[:, 0] // C  # [nc]

        def window(qrow):
            # one-shot pos_int keeps advancing past L (gather-path
            # parity), so a fully-dead chunk's qrow can point past the
            # zero tail; clamp so the read never relies on backend OOB
            # semantics — affected lanes are masked by ``alive``, so the
            # output is unchanged
            qrow = jnp.minimum(qrow, tiles.shape[0] - nT)
            return jnp.concatenate(
                [tiles[qrow + k] for k in range(nT)], axis=-1)

        j = jnp.arange(W)

        if ctx.no_events:
            playing = state["playing"]
            win = window(q_cont)  # [nc, W]
            w = icont - (q_cont * C)[:, None]
            frac = (cont - fcont).reshape(nc, C)
            ipos = icont
        else:
            trig = params["t_restart"]
            any_trig = jnp.any(trig)
            tf = jnp.max(jnp.where(trig, jnp.arange(B), -1))
            playing = state["playing"] | any_trig
            fresh = step * (t - tf.astype(dtype))
            after = (any_trig & (t >= tf)).reshape(nc, C)
            ffresh = jnp.floor(fresh)
            ifresh = ffresh.astype(jnp.int32).reshape(nc, C)
            q_fresh = jnp.maximum(ifresh[:, 0], 0) // C
            # [cont window | fresh window] per chunk; the seam is never
            # read (w+1 stays inside its own window, see DESIGN_NOTES)
            win = jnp.concatenate(
                [window(q_cont), window(q_fresh)], axis=-1)
            W = 2 * W
            j = jnp.arange(W)
            w = jnp.where(after,
                          ifresh - (q_fresh * C)[:, None] + nT * C,
                          icont - (q_cont * C)[:, None])
            pos = jnp.where(after.reshape(-1), fresh, cont)
            frac = (pos - jnp.floor(pos)).reshape(nc, C)
            ipos = jnp.where(after, ifresh, icont)

        # TWO one-hot matrices (w and w+1), each consumed by exactly one
        # einsum: a single m0 feeding both taps (the old roll form) has
        # two consumers, so XLA materializes the [V, nc, C, W] one-hot
        # through HBM under vmap — measured 7.2k rt voices vs ~28k with
        # the fusable single-consumer form (benchmarks/_sampler_probe.py
        # "chunked one-hot x2"). Bit-identical: [w+1 == j] @ win selects
        # win[w+1], exactly the rolled read (w+1 < W by the seam bound).
        m0 = (w[:, :, None] == j[None, None, :]).astype(dtype)
        m1 = ((w + 1)[:, :, None] == j[None, None, :]).astype(dtype)
        s0 = jnp.einsum("ncw,nw->nc", m0, win,
                        precision=lax.Precision.HIGHEST)
        s1 = jnp.einsum("ncw,nw->nc", m1, win,
                        precision=lax.Precision.HIGHEST)
        sig = (s0 + (s1 - s0) * frac).reshape(B)

        ipos_flat = ipos.reshape(B)
        if self.loop:
            alive = playing & jnp.ones((B,), bool)
        else:
            alive = playing & (ipos_flat < L)
        sig = jnp.where(alive, sig, jnp.zeros_like(sig))

        # end-of-block pointer: the gather path's advance verbatim
        end_cont = (state["pos_int"].astype(dtype) + state["pos_frac"]
                    + step * B)
        if ctx.no_events:
            end_pos = end_cont
        else:
            end_fresh = step * (B - tf.astype(dtype))
            end_pos = jnp.where(any_trig, end_fresh, end_cont)
        e_int = jnp.floor(end_pos)
        pos_frac = (end_pos - e_int).astype(dtype)
        pos_int = e_int.astype(jnp.int32)
        if self.loop:
            pos_int = jnp.mod(pos_int, L)
        return sig, pos_int, pos_frac, playing

    def process(self, ctx: AudioCtx, state, inputs, params):
        import numpy as np

        B = ctx.block_size
        dtype = ctx.dtype
        L = self._loop_len

        if self.tiled:
            sig, pos_int, pos_frac, playing = self._read_tiled(
                ctx, state, params
            )
        elif self.resample and B <= self._RS_BLOCK_CAP:
            sig, pos_int, pos_frac, playing = self._read_resample(
                ctx, state, params
            )
        else:
            buf = jnp.asarray(self._data, dtype)
            base = np.float32(self._buf_sr / ctx.sample_rate)
            step = params["rate"][0] * base  # block-rate pitch
            if self.resample:  # B > _RS_BLOCK_CAP fallback: same clamp
                step = jnp.clip(step, 0.0, np.float32(self.max_rate))
            t = jnp.arange(B, dtype=dtype)

            trig = params["t_restart"]
            any_trig = jnp.any(trig)
            # most recent restart frame (scan-free): highest t with trig set
            tf = jnp.max(jnp.where(trig, jnp.arange(B), -1))
            playing = state["playing"] | any_trig

            # closed-form positions: continue from state, or re-anchor at tf
            cont = (state["pos_int"].astype(dtype) + state["pos_frac"]
                    + step * t)
            fresh = step * (t - tf.astype(dtype))
            after = t >= tf
            pos = jnp.where(any_trig & after, fresh, cont)
            ipos = jnp.floor(pos)
            frac = pos - ipos
            ipos = ipos.astype(jnp.int32)
            # Two plain gathers: tap-pairing via slice_sizes=(2,) is
            # bit-exact but perf-neutral — gather cost ∝ elements fetched
            # (DESIGN_NOTES "Gathers bill per element").
            if self.loop:
                idx = jnp.mod(ipos, L)
                idx1 = jnp.mod(ipos + 1, L)
                alive = playing
            else:
                ended = ipos >= L
                idx = jnp.clip(ipos, 0, L - 1)
                idx1 = jnp.clip(ipos + 1, 0, L - 1)
                alive = playing & ~ended
            s0 = self._start
            sig = buf[s0 + idx] + (buf[s0 + idx1] - buf[s0 + idx]) * frac
            sig = jnp.where(alive, sig, jnp.zeros_like(sig))

            # end-of-block pointer (same trajectory evaluated at t = B)
            end_cont = (state["pos_int"].astype(dtype) + state["pos_frac"]
                        + step * B)
            end_fresh = step * (B - tf.astype(dtype))
            end_pos = jnp.where(any_trig, end_fresh, end_cont)
            e_int = jnp.floor(end_pos)
            pos_frac = (end_pos - e_int).astype(dtype)
            pos_int = e_int.astype(jnp.int32)
            if self.loop:
                pos_int = jnp.mod(pos_int, L)

        no_in = jnp.zeros((0, B), dtype)
        env_state, env_out, done = normalize_process_result(
            self.env.process(
                ctx, state["env"], no_in,
                {
                    "attack_time": jnp.full((B,), self._attack, dtype),
                    "release_time": jnp.full((B,), self._release, dtype),
                    "t_restart": params["t_restart"],
                    "t_release": params["t_release"],
                },
            ),
            ctx,
        )
        out_sig = (sig * env_out[0] * params["amp"])[None, :]
        _, out = self.panner.process(ctx, {}, out_sig, {"pan": params["pan"]})
        new_state = {
            "pos_int": pos_int,
            "pos_frac": pos_frac,
            "playing": playing,
            "env": env_state,
        }
        return new_state, out, done


class PluckedVoice(UGen):
    """Bank-scale Karplus-Strong string (beyond reference — see
    ``ugens/physical.py``): the exciter is BUILT IN (per-voice threefry
    noise gated by a one-pole burst envelope retriggered by ``t_pluck``),
    so a ``VoiceBank(PluckedVoice(), V)`` is a V-string ensemble with
    sample-accurate per-voice plucks and zero graph nodes per string.

    The whole voice is blockwise — the KS loop runs
    ``physical.string_blockwise`` (requires loop >= one block, i.e.
    freq <= sample_rate / block_size; higher freqs clamp, same contract as
    the long delays), the burst envelope is an affine scan over the
    trigger plane, and the noise is counter-keyed by
    (seed, ``vseed`` param, absolute frame) — give ``vseed`` a per-voice
    ``voice_defaults=dict(vseed=np.arange(V))`` to decorrelate plucks
    (block-size invariant, like every noise stream).

    Params: freq/amp/damp/brightness floats (per-voice smoothable),
    ``t_pluck`` trigger, ``vseed`` int.

    The blockwise read makes the voice BLOCK-DEPENDENT (the ``nf >= block``
    clamp would stretch loops inside a longer superblock program), so it
    declares ``block_invariant = False`` — which VoiceBank propagates to
    the graph node, keeping such banks out of superblocking unless
    ``max_freq`` declares the shortest loop (``superblock_cap = sr /
    max_freq``; same contract as the long delays' ``min_delay_time``).
    """

    inputs = 0
    outputs = 1
    block_invariant = False
    # the ring tile pointer and frame counter advance identically for every
    # voice: VoiceBank keeps them UNBATCHED through the vmap, so the tile
    # write is ONE dynamic_update_slice at a scalar index (a V-row scatter
    # or full-buffer select otherwise — 60x slower at 64k voices)
    shared_state_keys = ("wq", "frame")
    params = (
        pfloat("freq", 220.0, range=(1.0, 20000.0), logarithmic=True,
               kind=ParameterKind.FREQUENCY),
        pfloat("amp", 0.5),
        pfloat("damp", 0.996, range=(0.0, 1.0)),
        pfloat("brightness", 0.7, range=(0.0, 1.0)),
        ptrigger("t_pluck"),
        pinteger("vseed", 0),
    )

    def __init__(self, freq: float = 220.0, amp: float = 0.5,
                 damp: float = 0.996, brightness: float = 0.7,
                 min_freq: float = 27.5, burst_seconds: float = 0.0015,
                 seed: int | None = None, max_freq: float | None = None):
        from ..ugens.noise import next_randomness_seed

        self.min_freq = float(min_freq)
        self.max_freq = None if max_freq is None else float(max_freq)
        self.burst_seconds = float(burst_seconds)
        self.seed = next_randomness_seed() if seed is None else int(seed)
        self.pdefaults = {
            "freq": float(freq), "amp": float(amp),
            "damp": float(damp), "brightness": float(brightness),
        }

    def init(self, ctx: AudioCtx):
        import numpy as np

        B = ctx.block_size
        # ring length: a multiple of the block size with one spare write
        # tile plus interp headroom, tiled [T, B] for the gather-free read
        L = int(np.ceil((ctx.sample_rate / self.min_freq + 2) / B)) * B + B
        self._length = L
        self._tiles = L // B
        if self.max_freq is not None:
            # loops never get shorter than sr/max_freq: superblock programs
            # up to that length keep every read behind the write frontier
            self.superblock_cap = max(
                1, min(L, int(ctx.sample_rate / self.max_freq))
            )
        return {
            "buf": jnp.zeros((self._tiles, B), ctx.dtype),
            "wq": jnp.zeros((), jnp.int32),
            "ap_in": jnp.zeros((), ctx.dtype),
            "ap_out": jnp.zeros((), ctx.dtype),
            "d_last": jnp.zeros((), ctx.dtype),
            "lp": jnp.zeros((), ctx.dtype),
            "env": jnp.zeros((), ctx.dtype),
            "frame": jnp.zeros((), jnp.uint32),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        import jax
        import numpy as np

        from ..core.dsp import affine_scan_1d
        from ..ugens.physical import string_geometry

        B = ctx.block_size
        L = self._length
        dtype = ctx.dtype

        # per-voice burst noise: counter-keyed by (seed, vseed, abs frame)
        frames = state["frame"] + jnp.arange(B, dtype=jnp.uint32)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), params["vseed"][0]
        )
        u = jax.vmap(
            lambda t: jax.random.uniform(
                jax.random.fold_in(key, t), (), dtype=dtype
            )
        )(frames) * 2.0 - 1.0

        # burst envelope: e[t] = 1 on a pluck, else g*e[t-1] (affine scan)
        trig = params["t_pluck"].astype(dtype)
        g = jnp.asarray(
            np.exp(-1.0 / max(self.burst_seconds * ctx.sample_rate, 1.0)),
            dtype,
        )
        a = g * (1.0 - trig)
        e_pre, _ = affine_scan_1d(a, trig, state["env"])
        env = a * e_pre + trig
        exc = u * env * params["amp"]

        # block-rate loop geometry (per-voice freq/brightness/damp from the
        # block's first sample): the gather-free read needs ONE contiguous
        # window per voice per block; 64-sample-granular bends are inaudible
        # on a string and PluckedString keeps the per-sample path for the
        # single-instance case
        nf, coeff, b1, damp = string_geometry(
            params["freq"][0], params["brightness"][0], params["damp"][0],
            ctx.sample_rate, self.min_freq, L, dtype,
        )
        # blockwise contract: reads stay >= one tile behind the write tile
        nf = jnp.clip(nf, B, L - B)

        # --- gather-free ring read (see DESIGN_NOTES "tile + barrel roll"):
        # the window [s, s+B) spans at most two ring tiles; fetch those two
        # rows by index, then rotate the [2B] window left by the in-tile
        # offset with a log2(2B)-stage barrel shift of STATIC rolls — no
        # per-element gather anywhere (57x the take_along_axis read at 4k
        # voices on the v5e)
        T = self._tiles
        buf, wq = state["buf"], state["wq"]
        s = (wq * B - nf) % L
        q, r = s // B, s % B
        t0 = buf[q]
        t1 = buf[(q + 1) % T]
        w2 = jnp.concatenate([t0, t1])  # [2B]
        n_stages = max(1, int(np.ceil(np.log2(B))))  # r = s % B < B
        for k in range(n_stages):
            rolled = jnp.roll(w2, -(1 << k))
            w2 = jnp.where(((r >> k) & 1).astype(bool), rolled, w2)
        raw = w2[:B]

        # allpass fractional-delay interpolator (same recurrence as
        # physical.string_blockwise), then avg + brightness one-pole
        raw_prev = jnp.concatenate([state["ap_in"][None], raw[:-1]])
        bvec = coeff * raw + raw_prev
        a_ap = jnp.broadcast_to(-coeff, (B,))
        d_pre, _ = affine_scan_1d(a_ap, bvec, state["ap_out"])
        d = a_ap * d_pre + bvec
        d_prev = jnp.concatenate([state["d_last"][None], d[:-1]])
        h = 0.5 * (d + d_prev)
        a0 = 1.0 - b1
        lp_pre, _ = affine_scan_1d(
            jnp.broadcast_to(b1, (B,)), a0 * h, state["lp"]
        )
        lp = b1 * lp_pre + a0 * h
        write = exc + damp * lp

        # write = one tile at wq — wq is SHARED (unbatched) state, so under
        # the bank's vmap this is a single dynamic_update_slice at a scalar
        # index over the whole [V, T, B] buffer
        buf = jax.lax.dynamic_update_slice(buf, write[None, :], (wq, 0))
        new = {
            "buf": buf,
            "wq": (wq + 1) % T,
            "ap_in": raw[-1],
            "ap_out": d[-1],
            "d_last": d[-1],
            "lp": lp[-1],
            "env": env[-1],
            "frame": state["frame"] + jnp.uint32(B),
        }
        return new, write[None, :]


class ModalVoice(UGen):
    """Struck modal-resonator voice: mallet pulse -> ModalResonator -> Pan2
    (beyond reference -- see ``ugens/modal.py``; the reference has no modal
    synthesis, its closest primitive is one SvfFilter, svf.rs:40).

    The mallet is BUILT IN: an :class:`~knaster_tpu.ugens.envelopes.EnvAr`
    pulse of ``strike_ms`` milliseconds retriggered by ``t_strike`` (so
    strikes ride the engine's sample-accurate per-voice triggers), scaled by
    ``amp`` and normalized by the pulse area so ``amp`` reads as per-mode
    ring amplitude regardless of ``strike_ms`` (a raw ModalResonator driven
    by an unnormalized pulse rings at pulse-area x gain instead). All M modes of the resonator update in parallel as 2x2
    rotation-decay affine scans -- a ``VoiceBank(ModalVoice(...), V)`` is a
    V-instrument mallet ensemble running V*M resonators on VPU lanes with
    zero graph nodes per instrument.

    Done semantics (for VoicePool auto-release): the voice marks done at the
    LAST frame of the block in which its gain-weighted ring-out RMS first
    falls below ``done_threshold`` after a strike (blockwise resolution --
    the tail below the threshold is inaudible by construction; the strike
    pulse itself must also have finished). A fresh, never-struck voice is
    not done (same one-shot contract as EnvAr, envelopes.rs:174-315).
    """

    inputs = 0
    outputs = 2
    may_set_done = True
    params = (
        pfloat("freq", 440.0, kind=ParameterKind.FREQUENCY),
        pfloat("amp", 0.25),
        pfloat("pan", 0.0, range=(-1.0, 1.0)),
        pfloat("decay", 1.0, range=(0.0, 100.0), kind=ParameterKind.SECONDS),
        ptrigger("t_strike"),
    )

    def __init__(self, resonator=None, freq: float = 440.0, amp: float = 0.25,
                 pan: float = 0.0, strike_ms: float = 2.0,
                 done_threshold: float = 1e-5):
        from ..ugens.modal import ModalResonator

        self.res = resonator if resonator is not None else ModalResonator.bell(freq)
        half = max(float(strike_ms), 0.05) * 5e-4  # attack+release = strike_ms
        self.exciter = EnvAr(half, half)
        # a pulse drives a slow-rotating mode nearly coherently, so the ring
        # amplitude scales with the pulse AREA (half*sr samples for the
        # triangular EnvAr pulse); normalize by it so `amp` reads as per-mode
        # ring amplitude, not an area-dependent 50-100x multiple of it
        self._half = half
        self.done_threshold = float(done_threshold)
        self.pdefaults = {
            "freq": float(freq),
            "amp": float(amp),
            "pan": float(pan),
            "decay": float(self.res.pdefaults["decay"]),
        }
        self.panner = Pan2(pan)

    def batch_key(self):
        return (type(self), self.res.batch_key(), self.done_threshold,
                self.exciter.pdefaults["attack_time"])

    def init(self, ctx: AudioCtx):
        return {
            "res": self.res.init(ctx),
            "exc": self.exciter.init(ctx),
            "struck": jnp.zeros((), bool),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        import numpy as np

        from ..ugens.envelopes import STOPPED

        B = ctx.block_size
        exc_d = self.exciter.pdefaults
        exc_state, pulse, _ = normalize_process_result(
            self.exciter.process(
                ctx, state["exc"], jnp.zeros((0, B), ctx.dtype),
                {
                    "attack_time": jnp.full((B,), exc_d["attack_time"], ctx.dtype),
                    "release_time": jnp.full((B,), exc_d["release_time"], ctx.dtype),
                    "t_restart": params["t_strike"],
                },
            ),
            ctx,
        )
        res_state, wet = self.res.process(
            ctx, state["res"],
            pulse * (params["amp"] * np.float32(
                1.0 / max(self._half * ctx.sample_rate, 1.0))),
            {"freq": params["freq"], "decay": params["decay"]},
        )
        _, out = self.panner.process(ctx, {}, wet, {"pan": params["pan"]})

        struck = state["struck"] | jnp.any(params["t_strike"])
        quiet = self.res.ring_energy(res_state) < jnp.asarray(
            self.done_threshold, ctx.dtype
        )
        exc_idle = exc_state["stage"] == STOPPED
        fire = struck & quiet & exc_idle
        done = jnp.zeros((B,), bool).at[-1].set(fire)
        new_state = {
            "res": res_state,
            "exc": exc_state,
            "struck": struck & ~fire,
        }
        return new_state, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        """Per-sample kernel body for the generic PallasVoiceBank: a whole
        mallet ensemble as ONE fused kernel — M rotation-decay modes per
        voice unrolled over the mode axis, EnvAr mallet, exact Pan2.

        Mirrors ``ModalResonator.process`` op-for-op per mode (the affine
        scan evaluates the same recurrence ``s[t] = R(theta) s[t-1] + (x, 0)``
        through a combine tree, so kernel-vs-vmap divergence is the tree's
        own ~1e-7/block fma reordering, same as the chain kernel). The one
        algebraic substitution: the vmap path divides ``ln(1e-3)`` by
        ``n60 = max(decay*rel_m*sr, 1e-4)`` per MODE (M divides/sample);
        here ``1/decay`` is computed ONCE per sample and each mode's exp
        argument is ``(K/(rel_m*sr)) * (1/decay)`` — one extra f32 rounding
        (~1 ULP on the exp argument; the n60 clamp only matters where
        exp underflows to 0 either way, decay <= 1e-4/(rel_m*sr) s)."""
        import numpy as np

        from ..parallel.generic_bank import MosaicVoiceSpec
        from ..parallel.pallas_bank import (
            _HALF_PI, _env_ar, _env_ar_free, _exp_poly, _sin_poly,
            _sincos_halfturn,
        )
        from ..ugens.modal import _LN10_M3

        res = self.res
        M = res.n_modes
        sr = np.float32(ctx.sample_rate)
        exc_d = self.exciter.pdefaults
        atk = np.float32(1.0 / max(exc_d["attack_time"] * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(exc_d["release_time"] * ctx.sample_rate, 1.0))
        inv_area = np.float32(1.0 / max(self._half * ctx.sample_rate, 1.0))
        c2pi = np.float32(2.0 * np.pi) / sr
        pi_f = np.float32(np.pi)
        half = np.float32(0.5)
        zero = np.float32(0.0)
        one = np.float32(1.0)
        # per-mode baked constants (ratios/gains/decays are static config)
        ratios = [np.float32(res.ratios[m]) for m in range(M)]
        k_exp = [np.float32(np.float32(_LN10_M3)
                            / (np.float32(res.decays[m]) * sr))
                 for m in range(M)]
        gains = [np.float32(res.gains[m]) for m in range(M)]
        g2 = [np.float32(float(res.gains[m]) ** 2) for m in range(M)]
        thr2 = np.float32(self.done_threshold ** 2)

        def body(i_f, carry, P, T):
            stage, t = carry["stage"], carry["t"]
            strike = T["t_strike"]
            if strike is None:
                pulse, stage, t = _env_ar_free(stage, t, atk, rel)
                struck = carry["struck"]
            else:
                pulse, stage, t = _env_ar(stage, t, strike, atk, rel)
                struck = jnp.maximum(carry["struck"],
                                     strike.astype(jnp.float32))
            x = pulse * (P["amp"] * inv_area)
            inv_decay = one / P["decay"]
            freq = P["freq"]
            new = {"stage": stage, "t": t, "struck": struck}
            acc = zero
            for m in range(M):
                # same f32 grouping as ModalResonator: (2pi/sr) * (freq*ratio)
                theta = c2pi * (freq * ratios[m])
                # polynomial transcendentals (round 5): the hw exp/cos/sin
                # slots were 36 per voice-sample and the roofline pinned
                # this body at ~30% of ceiling on exactly that class
                # (RESULTS.md). _exp_poly/_sincos_halfturn are <=2e-7 from
                # the hw ops; above pi the mode is dead (r = 0), where the
                # fold's out-of-domain values are masked like before.
                r = _exp_poly(k_exp[m] * inv_decay)
                r = jnp.where(theta < pi_f, r, zero)
                sth_u, cth_u = _sincos_halfturn(theta)
                cth = r * cth_u
                sth = r * sth_u
                s0, s1 = carry[f"s{m}a"], carry[f"s{m}b"]
                s0n = cth * s0 - sth * s1 + x
                s1n = sth * s0 + cth * s1
                new[f"s{m}a"], new[f"s{m}b"] = s0n, s1n
                acc = acc + gains[m] * s1n
            angle = (P["pan"] * half + half) * _HALF_PI
            return new, (
                acc * _sin_poly(_HALF_PI - angle), acc * _sin_poly(angle)
            )

        def idle_of(c):
            e2 = zero
            for m in range(M):
                e2 = e2 + g2[m] * (c[f"s{m}a"] * c[f"s{m}a"]
                                   + c[f"s{m}b"] * c[f"s{m}b"])
            return (c["struck"] > zero) & (e2 < thr2) & (c["stage"] == zero)

        carry = {"stage": (ctx.dtype, 0.0), "t": (ctx.dtype, 0.0),
                 "struck": (ctx.dtype, 0.0)}
        for m in range(M):
            carry[f"s{m}a"] = (ctx.dtype, 0.0)
            carry[f"s{m}b"] = (ctx.dtype, 0.0)
        return MosaicVoiceSpec(carry=carry, body=body, idle_of=idle_of)
