"""PallasSineVoiceBank: the fused hot-path kernel for massed sine voices.

The VoiceBank path builds the voice from composable UGens (vmap over a scan
for the envelope, cumsum for the oscillator). This kernel fuses the whole
many_sines voice — phasor-rotation sine oscillator (no per-sample
transcendental; the exact u32 fixed-point phase is carried across blocks),
ASR envelope state machine, equal-power pan, mix-down — into ONE Pallas
kernel: state lives in VMEM, voices ride the 8×128 vector lanes, and the
per-sample loop is a register loop instead of an XLA scan. Same control
surface as VoiceBank (per-voice float sets at block rate, sample-accurate
triggers via the event channel).

Layout: voices as [V/128, 128] tiles (sublane × lane); the grid walks voice
tiles of ``tile_rows``×128 voices; each grid step emits its partial stereo
mix [B, 2], summed in XLA afterwards.

Triggers are packed host→kernel as uint32 bitmasks (2 words per voice for
block sizes up to 64), so the kernel reads one bit per sample instead of a
[B, V] boolean array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..core.ugen import AudioCtx
from ..models.voices import SineVoice
from ..ugens.wavetable import FRACTIONAL_PART, TABLE_HIGH_MASK, TABLE_SIZE
from .voicebank import VoiceBank

LANES = 128


def _env_rate(seconds, sr):
    return jnp.where(seconds == 0, jnp.ones_like(seconds), 1.0 / (seconds * sr))



def _cap_tile_rows(tile_rows: int, n_voices: int) -> int:
    """Cap tiles at 64x128 voices and keep the grid at >= 2 tiles: the
    unrolled sample loop's scoped-VMEM stack exceeds Mosaic's 16M limit with
    128-row tiles (observed 20.5-20.7M in several surrounding-program
    contexts; 64-row tiles fit everywhere measured)."""
    R = max(n_voices // LANES, 1)
    tr = min(int(tile_rows), R, 64)
    if tr >= R and R > 1:
        tr = R // 2
    while tr > 1 and R % tr:
        tr -= 1
    return max(tr, 1)

def _bank_kernel(
    B: int,
    unroll: bool,
    s_ref, c_ref, rs_ref, rc_ref, stage_ref, t_ref, rscale_ref,
    atk_ref, rel_ref, amp_ref, panl_ref, panr_ref, active_ref,
    restart_lo_ref, restart_hi_ref, release_lo_ref, release_hi_ref,
    out_ref, stage_out, t_out, rscale_out,
):
    one = np.float32(1.0)
    zero = np.float32(0.0)

    def body(i, carry):
        s, c, stage, t, rscale = carry
        iu = i.astype(jnp.uint32)
        word_restart = jnp.where(i < 32, restart_lo_ref[:], restart_hi_ref[:])
        word_release = jnp.where(i < 32, release_lo_ref[:], release_hi_ref[:])
        bit = jnp.where(i < 32, iu, iu - 32)
        restart = ((word_restart >> bit) & 1) == 1
        release = ((word_release >> bit) & 1) == 1

        # --- EnvAsr triggers (stages: 0 stop, 1 atk, 2 sus, 3 rel) ---
        stage = jnp.where(restart, one, stage)
        rel_from_atk = release & (stage == 1.0)
        rel_from_sus = release & (stage == 2.0)
        rscale = jnp.where(rel_from_atk, t, jnp.where(rel_from_sus, one, rscale))
        t = jnp.where(rel_from_atk | rel_from_sus, one, t)
        stage = jnp.where(rel_from_atk | rel_from_sus, np.float32(3.0), stage)

        # --- envelope value + advance ---
        env = jnp.where(
            stage == 1.0, t,
            jnp.where(stage == 2.0, one,
                      jnp.where(stage == 3.0, t * t * t * rscale, zero)),
        )
        t_next = jnp.where(
            stage == 1.0, t + atk_ref[:],
            jnp.where(stage == 3.0, t - rel_ref[:], t),
        )
        to_sus = (stage == 1.0) & (t_next >= one)
        done = (stage == 3.0) & (t_next <= zero)
        stage = jnp.where(to_sus, np.float32(2.0), stage)
        stage = jnp.where(done, zero, stage)
        t_next = jnp.where(done, zero, t_next)

        # --- sine by phasor rotation: no transcendental in the loop ---
        # s/c are sin/cos of the exact u32 phase at block start (computed in
        # XLA once per block); each sample advances by the complex multiply
        # (rs, rc) = (sin, cos) of the true per-sample angle. The u32 phase
        # is still carried exactly outside the kernel, so there is no drift
        # across blocks; within a block the rotation is *more* accurate than
        # the table-quantized read it replaces (error <= 2*pi/TABLE_SIZE).
        # Mix: reduce only the sublane axis here (cheap on the VPU); the
        # 128-lane reduction happens once per block in XLA afterwards.
        sig = s * env * amp_ref[:] * active_ref[:]
        out_ref[0, i, :] = jnp.stack(
            [jnp.sum(sig * panl_ref[:], axis=0), jnp.sum(sig * panr_ref[:], axis=0)]
        )
        return (s * rc_ref[:] + c * rs_ref[:], c * rc_ref[:] - s * rs_ref[:],
                stage, t_next, rscale)

    carry = (s_ref[:], c_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    # fully unrolled on hardware: Mosaic's loop overhead costs ~20% at this
    # body size (the CPU interpreter keeps the rolled loop: cheap to trace)
    s, c, stage, t, rscale = jax.lax.fori_loop(0, B, body, carry, unroll=unroll)
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


class PallasSineVoiceBank(VoiceBank):
    """Drop-in VoiceBank for SineVoice with a fused Pallas kernel core."""

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.01, release: float = 0.1, tile_rows: int = 128):
        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            SineVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasSineBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasSineVoiceBank":
        return PallasSineVoiceBank(
            n_local,
            event_capacity=self.event_capacity,
            attack=self._attack,
            release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
        )

    def init(self, ctx: AudioCtx):
        if ctx.block_size > 64:
            raise ValueError("PallasSineVoiceBank supports block_size <= 64")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phase"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        # the nested per-voice UGen state from VoiceBank is unused here
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = ctx.block_size
        V = self.n_voices
        R = V // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, _, _ = self._apply_events(
            ctx, state, events, trig_tensor=False
        )
        # the kernel reads block-rate floats: ramps advance as block stairs
        fvals = fstate[0]

        def grid2(x):
            return x.reshape(R, LANES)

        freq = grid2(fvals[self.float_index("freq")])
        amp = grid2(fvals[self.float_index("amp")])
        pan = grid2(fvals[self.float_index("pan")])
        p = pan * 0.5 + 0.5
        panl = jnp.cos(p * (np.pi / 2)).astype(dtype)
        panr = jnp.sin(p * (np.pi / 2)).astype(dtype)
        f2pi = float(TABLE_SIZE) * float(FRACTIONAL_PART) / ctx.sample_rate
        inc = jnp.clip(freq * np.float32(f2pi), 0.0, 2.0**31 - 1).astype(
            jnp.uint32
        )
        # block-start phasor + per-sample rotation angle (freq is block-rate
        # in this kernel, so the rotation is exact-frequency; the u32 phase
        # carries exactly across blocks below). One cycle is
        # TABLE_SIZE*FRACTIONAL_PART = 2**30 phase units (osc.rs convention).
        cycle = float(TABLE_SIZE) * float(FRACTIONAL_PART)
        u2rad = np.float32(2.0 * np.pi / cycle)
        theta0 = (state["phase"] & jnp.uint32(cycle - 1)).astype(dtype) * u2rad
        s0 = jnp.sin(theta0)
        c0 = jnp.cos(theta0)
        ang = inc.astype(dtype) * u2rad
        rs = jnp.sin(ang)
        rc = jnp.cos(ang)
        atk = jnp.full((R, LANES), 1.0 / max(self._attack * ctx.sample_rate, 1.0), dtype)
        rel = jnp.full((R, LANES), 1.0 / max(self._release * ctx.sample_rate, 1.0), dtype)
        act = grid2(active.astype(dtype))

        restart_lo, restart_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_restart"))
        )
        release_lo, release_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_release"))
        )

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        # tests run on CPU: use the pallas interpreter there
        interpret = jax.devices()[0].platform == "cpu"
        outs = pl.pallas_call(
            functools.partial(_bank_kernel, B, not interpret),
            grid=(n_tiles,),
            in_specs=[tile() for _ in range(17)],
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, 2, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, 2, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(
            s0, c0, rs, rc, state["stage"], state["t"], state["rscale"],
            atk, rel, amp, panl, panr, act,
            restart_lo, restart_hi, release_lo, release_hi,
        )
        partial_mix, stage, t, rscale = outs
        out = jnp.sum(partial_mix, axis=(0, 3)).T  # [2, B]
        # exact u32 phase advance (wrapping multiply; phase is mod 2**32)
        phase = state["phase"] + inc * jnp.uint32(B)
        fvals, ftarget, fstep, frem, fsdur = self._advance_ramps(
            fstate, B, dtype
        )
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "frem": frem, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "phase": phase, "stage": stage, "t": t, "rscale": rscale,
        }
        return new_state, out


def _fm_bank_kernel(
    B: int,
    unroll: bool,
    sm_ref, cm_ref, rsm_ref, rcm_ref, phc_ref, stage_ref, t_ref,
    freq_ref, index_ref, amp_ref, atk_ref, rel_ref, active_ref,
    restart_lo_ref, restart_hi_ref,
    out_ref, phc_out, stage_out, t_out,
):
    """2-op FM voice bank: modulator sine FMs the carrier per sample,
    AR envelope (models.FMVoice semantics), mono mix. The modulator's
    frequency (freq*ratio) is block-constant, so it runs as a rotating
    phasor (no transcendental); the carrier's instantaneous frequency is
    audio-rate, so it keeps the per-sample computed sine."""
    from ..ugens.wavetable import FRACTIONAL_PART, TABLE_HIGH_MASK, TABLE_SIZE

    scale = np.float32(2.0 * np.pi / TABLE_SIZE)
    f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / 48000.0)
    mask = np.uint32(TABLE_HIGH_MASK)
    one = np.float32(1.0)
    zero = np.float32(0.0)

    def to_inc(f):
        # Rust `as u32` saturation for negative FM frequencies
        return pltpu.bitcast(
            jnp.clip(f, 0.0, 2.0**31 - 1).astype(jnp.int32), jnp.uint32
        )

    def sine_of(phase):
        # degree-7 odd minimax polynomial on [-pi, pi): max error 2.5e-4,
        # below the 2*pi/TABLE_SIZE = 3.8e-4 table-quantization bound this
        # path emulates, at ~1/3 the op count of jnp.sin
        idx = pltpu.bitcast((phase >> 16) & mask, jnp.int32).astype(jnp.float32)
        r = idx * scale - np.float32(np.pi)
        r2 = r * r
        p = r * (np.float32(9.9927639488e-01) + r2 * (
            np.float32(-1.6566749647e-01) + r2 * (
                np.float32(7.9581818171e-03) + r2 * np.float32(-1.4508485394e-04)
            )
        ))
        return -p  # sin(theta) = -sin(theta - pi)

    def body(i, carry):
        sm, cm, phc, stage, t = carry
        iu = i.astype(jnp.uint32)
        word = jnp.where(i < 32, restart_lo_ref[:], restart_hi_ref[:])
        bit = jnp.where(i < 32, iu, iu - 32)
        restart = ((word >> bit) & 1) == 1

        # EnvAr (stages: 0 stopped, 1 attack, 2 release)
        stage = jnp.where(restart, one, stage)
        env = jnp.where(
            stage == 1.0, t,
            jnp.where(stage == 2.0, t * t * t, zero),
        )
        t_next = jnp.where(
            stage == 1.0, t + atk_ref[:],
            jnp.where(stage == 2.0, t - rel_ref[:], t),
        )
        to_rel = (stage == 1.0) & (t_next >= one)
        stage = jnp.where(to_rel, np.float32(2.0), stage)
        t_next = jnp.where(to_rel, one, t_next)
        done = (stage == 2.0) & ~to_rel & (t_next <= zero)
        stage = jnp.where(done, zero, stage)
        t_next = jnp.where(done, zero, t_next)

        car_freq = freq_ref[:] * (one + index_ref[:] * sm)
        inc_c = to_inc(car_freq * f2pi)
        car = sine_of(phc)
        phc = phc + inc_c

        sig = car * env * amp_ref[:] * active_ref[:]
        out_ref[0, i, :] = jnp.sum(sig, axis=0)
        return (sm * rcm_ref[:] + cm * rsm_ref[:],
                cm * rcm_ref[:] - sm * rsm_ref[:], phc, stage, t_next)

    carry = (sm_ref[:], cm_ref[:], phc_ref[:], stage_ref[:], t_ref[:])
    _, _, phc, stage, t = jax.lax.fori_loop(0, B, body, carry, unroll=unroll)
    phc_out[:] = phc
    stage_out[:] = stage
    t_out[:] = t


class PallasFMVoiceBank(VoiceBank):
    """Drop-in VoiceBank for FMVoice with a fused Pallas kernel core.

    Caveats vs the vmap path: the modulator's own freq*ratio increment is
    block-rate (the vmap path recomputes it per sample, identical when ratio
    and freq are block-rate anyway), and the sample rate is baked at 48 kHz
    in the kernel constants."""

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.005, release: float = 0.3,
                 tile_rows: int = 128):
        from ..models.voices import FMVoice

        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            FMVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasFMBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasFMVoiceBank":
        return PallasFMVoiceBank(
            n_local, event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
        )

    def init(self, ctx: AudioCtx):
        if ctx.block_size > 64:
            raise ValueError("PallasFMVoiceBank supports block_size <= 64")
        if ctx.sample_rate != 48000:
            raise ValueError("PallasFMVoiceBank is tuned for 48 kHz")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phm"] = jnp.zeros((R, LANES), jnp.uint32)
        base["phc"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        import functools

        from jax.experimental import pallas as pl

        B = ctx.block_size
        V = self.n_voices
        R = V // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, _, _ = self._apply_events(
            ctx, state, events, trig_tensor=False
        )
        fvals = fstate[0]

        def grid2(x):
            return x.reshape(R, LANES)

        freq = grid2(fvals[self.float_index("freq")])
        ratio = grid2(fvals[self.float_index("ratio")])
        index = grid2(fvals[self.float_index("index")])
        amp = grid2(fvals[self.float_index("amp")])
        atk = jnp.full((R, LANES), 1.0 / max(self._attack * ctx.sample_rate, 1.0), dtype)
        rel = jnp.full((R, LANES), 1.0 / max(self._release * ctx.sample_rate, 1.0), dtype)
        act = grid2(active.astype(dtype))

        # modulator phasor (freq*ratio is block-rate): same saturating u32
        # increment as the carrier, rotated per sample inside the kernel
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / 48000.0)
        inc_m = jnp.clip(freq * ratio * f2pi, 0.0, 2.0**31 - 1).astype(jnp.uint32)
        cycle = float(TABLE_SIZE) * float(FRACTIONAL_PART)
        u2rad = np.float32(2.0 * np.pi / cycle)
        thm = (state["phm"] & jnp.uint32(cycle - 1)).astype(dtype) * u2rad
        sm0 = jnp.sin(thm)
        cm0 = jnp.cos(thm)
        angm = inc_m.astype(dtype) * u2rad
        rsm = jnp.sin(angm)
        rcm = jnp.cos(angm)

        r_lo, r_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_restart"))
        )

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        outs = pl.pallas_call(
            functools.partial(_fm_bank_kernel, B, not interpret),
            grid=(n_tiles,),
            in_specs=[tile() for _ in range(15)],
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(
            sm0, cm0, rsm, rcm, state["phc"], state["stage"], state["t"],
            freq, index, amp, atk, rel, act, r_lo, r_hi,
        )
        partial_mix, phc, stage, t = outs
        out = jnp.sum(partial_mix, axis=(0, 2))[None, :]  # [1, B]
        phm = state["phm"] + inc_m * jnp.uint32(B)
        fvals, ftarget, fstep, frem, fsdur = self._advance_ramps(fstate, B, dtype)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "frem": frem, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "phm": phm, "phc": phc, "stage": stage, "t": t,
        }
        return new_state, out


def _sub_bank_kernel(
    B: int,
    unroll: bool,
    t_ref, ic1_ref, ic2_ref, stage_ref, et_ref, rscale_ref,
    dt_ref, a1_ref, a2_ref, a3_ref, amp_ref, atk_ref, rel_ref, active_ref,
    restart_lo_ref, restart_hi_ref, release_lo_ref, release_hi_ref,
    out_ref, t_out, ic1_out, ic2_out, stage_out, et_out, rscale_out,
):
    """Subtractive voice bank: polyBLEP saw -> SVF lowpass -> ASR envelope.

    Coefficients (dt = freq/sr; SVF a1/a2/a3 from cutoff & q) are computed
    block-rate outside the kernel; the per-sample loop carries oscillator
    phase, the SVF integrator pair and the envelope state machine in VMEM.
    """
    one = np.float32(1.0)
    zero = np.float32(0.0)
    two = np.float32(2.0)

    def blep(t, dt):
        safe_dt = jnp.maximum(dt, np.float32(1e-9))
        a = t / safe_dt - one
        b = (t - one) / safe_dt + one
        return jnp.where(
            t < dt, -(a * a), jnp.where(t > one - dt, b * b, zero)
        )

    def body(i, carry):
        t, ic1, ic2, stage, et, rscale = carry
        iu = i.astype(jnp.uint32)
        word_restart = jnp.where(i < 32, restart_lo_ref[:], restart_hi_ref[:])
        word_release = jnp.where(i < 32, release_lo_ref[:], release_hi_ref[:])
        bit = jnp.where(i < 32, iu, iu - 32)
        restart = ((word_restart >> bit) & 1) == 1
        release = ((word_release >> bit) & 1) == 1

        # EnvAsr (identical state machine to the sine bank kernel)
        stage = jnp.where(restart, one, stage)
        rel_from_atk = release & (stage == 1.0)
        rel_from_sus = release & (stage == 2.0)
        rscale = jnp.where(rel_from_atk, et, jnp.where(rel_from_sus, one, rscale))
        et = jnp.where(rel_from_atk | rel_from_sus, one, et)
        stage = jnp.where(rel_from_atk | rel_from_sus, np.float32(3.0), stage)
        env = jnp.where(
            stage == 1.0, et,
            jnp.where(stage == 2.0, one,
                      jnp.where(stage == 3.0, et * et * et * rscale, zero)),
        )
        et_next = jnp.where(
            stage == 1.0, et + atk_ref[:],
            jnp.where(stage == 3.0, et - rel_ref[:], et),
        )
        to_sus = (stage == 1.0) & (et_next >= one)
        done = (stage == 3.0) & (et_next <= zero)
        stage = jnp.where(to_sus, np.float32(2.0), stage)
        stage = jnp.where(done, zero, stage)
        et_next = jnp.where(done, zero, et_next)

        # polyBLEP sawtooth (polyblep.rs saw): y = 2*frac(t+0.5)-1 - blep
        dt = dt_ref[:]
        _t = t + np.float32(0.5)
        _t = _t - jnp.floor(_t)
        saw = two * _t - one - blep(_t, dt)
        t = t + dt
        t = t - jnp.floor(t)

        # SVF lowpass (cytomic; svf.rs process_sample, m = (0, 0, 1))
        a1, a2, a3 = a1_ref[:], a2_ref[:], a3_ref[:]
        v3 = saw - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = two * v1 - ic1
        ic2 = two * v2 - ic2

        sig = v2 * env * amp_ref[:] * active_ref[:]
        out_ref[0, i, :] = jnp.sum(sig, axis=0)
        return t, ic1, ic2, stage, et_next, rscale

    carry = (t_ref[:], ic1_ref[:], ic2_ref[:], stage_ref[:], et_ref[:],
             rscale_ref[:])
    t, ic1, ic2, stage, et, rscale = jax.lax.fori_loop(
        0, B, body, carry, unroll=unroll
    )
    t_out[:] = t
    ic1_out[:] = ic1
    ic2_out[:] = ic2
    stage_out[:] = stage
    et_out[:] = et
    rscale_out[:] = rscale


class PallasSubtractiveVoiceBank(VoiceBank):
    """Drop-in VoiceBank for SubtractiveVoice with a fused Pallas kernel.

    Caveat vs the vmap path: the oscillator is the plain polyBLEP saw without
    the >sr/4 sine fallback (keep fundamentals below 12 kHz), and parameters
    are block-rate in the kernel."""

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.01, release: float = 0.2,
                 tile_rows: int = 128):
        from ..models.voices import SubtractiveVoice

        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            SubtractiveVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasSubtractiveBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasSubtractiveVoiceBank":
        return PallasSubtractiveVoiceBank(
            n_local, event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
        )

    def init(self, ctx: AudioCtx):
        if ctx.block_size > 64:
            raise ValueError("PallasSubtractiveVoiceBank supports block_size <= 64")
        base = super().init(ctx)
        R = self.n_voices // LANES
        z = lambda: jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = z()
        base["ic1"] = z()
        base["ic2"] = z()
        base["stage"] = z()
        base["et"] = z()
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        import functools

        from jax.experimental import pallas as pl

        B = ctx.block_size
        V = self.n_voices
        R = V // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype
        sr = float(ctx.sample_rate)

        fstate, ivals, active, _, _ = self._apply_events(
            ctx, state, events, trig_tensor=False
        )
        fvals = fstate[0]

        def grid2(x):
            return x.reshape(R, LANES)

        freq = grid2(fvals[self.float_index("freq")])
        cutoff = grid2(fvals[self.float_index("cutoff")])
        q = grid2(fvals[self.float_index("q")])
        amp = grid2(fvals[self.float_index("amp")])
        dt = jnp.clip(freq / sr, 0.0, 0.5).astype(dtype)
        # svf.rs set_coeffs, Low type
        g = jnp.tan(jnp.asarray(np.pi, dtype) * cutoff / sr)
        k = 1.0 / q
        a1 = (1.0 / (1.0 + g * (g + k))).astype(dtype)
        a2 = (g * a1).astype(dtype)
        a3 = (g * a2).astype(dtype)
        atk = jnp.full((R, LANES), 1.0 / max(self._attack * sr, 1.0), dtype)
        rel = jnp.full((R, LANES), 1.0 / max(self._release * sr, 1.0), dtype)
        act = grid2(active.astype(dtype))

        r_lo, r_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_restart"))
        )
        rel_lo, rel_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_release"))
        )

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        outs = pl.pallas_call(
            functools.partial(_sub_bank_kernel, B, not interpret),
            grid=(n_tiles,),
            in_specs=[tile() for _ in range(18)],
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(), tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(
            state["t"], state["ic1"], state["ic2"], state["stage"],
            state["et"], state["rscale"],
            dt, a1, a2, a3, amp, atk, rel, act,
            r_lo, r_hi, rel_lo, rel_hi,
        )
        partial_mix, t, ic1, ic2, stage, et, rscale = outs
        out = jnp.sum(partial_mix, axis=(0, 2))[None, :]  # [1, B]
        fvals, ftarget, fstep, frem, fsdur = self._advance_ramps(fstate, B, dtype)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "frem": frem, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "t": t, "ic1": ic1, "ic2": ic2, "stage": stage, "et": et,
            "rscale": rscale,
        }
        return new_state, out


def _wt_bank_kernel(
    B: int,
    H: int,
    unroll: bool,
    s_ref, c_ref, rs_ref, rc_ref, stage_ref, t_ref, rscale_ref,
    atk_ref, rel_ref, amp_ref, panl_ref, panr_ref, active_ref,
    ha_ref, hb_ref,  # [H, TR, LANES] band-limited sin/cos partial coeffs
    restart_lo_ref, restart_hi_ref, release_lo_ref, release_hi_ref,
    out_ref, stage_out, t_out, rscale_out,
):
    """Additive wavetable bank: H partials per voice by phasor recurrence,
    ASR envelope, equal-power pan, stereo mix. No transcendental in the
    loop: the fundamental phasor rotates per sample by the block-constant
    (rs, rc) (sin/cos computed once per block in XLA from the exact u32
    phase); harmonic h's phasor comes from a complex multiply against the
    fundamental (phase-locked, one VPU multiply each); per-harmonic table
    phases are folded into the static A/B coefficients (a*sin + b*cos)."""
    one = np.float32(1.0)
    zero = np.float32(0.0)

    def body(i, carry):
        s1, c1, stage, t, rscale = carry
        iu = i.astype(jnp.uint32)
        word_restart = jnp.where(i < 32, restart_lo_ref[:], restart_hi_ref[:])
        word_release = jnp.where(i < 32, release_lo_ref[:], release_hi_ref[:])
        bit = jnp.where(i < 32, iu, iu - 32)
        restart = ((word_restart >> bit) & 1) == 1
        release = ((word_release >> bit) & 1) == 1

        # --- EnvAsr (identical state machine to _bank_kernel) ---
        stage = jnp.where(restart, one, stage)
        rel_from_atk = release & (stage == 1.0)
        rel_from_sus = release & (stage == 2.0)
        rscale = jnp.where(rel_from_atk, t, jnp.where(rel_from_sus, one, rscale))
        t = jnp.where(rel_from_atk | rel_from_sus, one, t)
        stage = jnp.where(rel_from_atk | rel_from_sus, np.float32(3.0), stage)
        env = jnp.where(
            stage == 1.0, t,
            jnp.where(stage == 2.0, one,
                      jnp.where(stage == 3.0, t * t * t * rscale, zero)),
        )
        t_next = jnp.where(
            stage == 1.0, t + atk_ref[:],
            jnp.where(stage == 3.0, t - rel_ref[:], t),
        )
        to_sus = (stage == 1.0) & (t_next >= one)
        done = (stage == 3.0) & (t_next <= zero)
        stage = jnp.where(to_sus, np.float32(2.0), stage)
        stage = jnp.where(done, zero, stage)
        t_next = jnp.where(done, zero, t_next)

        # --- additive partials: harmonic recurrence from the fundamental ---
        s, c = s1, c1
        acc = ha_ref[0] * s + hb_ref[0] * c
        for h in range(1, H):
            s, c = s * c1 + c * s1, c * c1 - s * s1
            acc = acc + ha_ref[h] * s + hb_ref[h] * c

        sig = acc * env * amp_ref[:] * active_ref[:]
        out_ref[0, i, :] = jnp.stack(
            [jnp.sum(sig * panl_ref[:], axis=0),
             jnp.sum(sig * panr_ref[:], axis=0)]
        )
        return (s1 * rc_ref[:] + c1 * rs_ref[:],
                c1 * rc_ref[:] - s1 * rs_ref[:], stage, t_next, rscale)

    carry = (s_ref[:], c_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    # measured: unrolling this kernel is a net loss (the harmonic loop
    # already fills the VPU; 64x body duplication only bloats the program)
    _, _, stage, t, rscale = jax.lax.fori_loop(
        0, B, body, carry, unroll=unroll
    )
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


class PallasWavetableVoiceBank(VoiceBank):
    """Drop-in VoiceBank for AdditiveVoice with a fused Pallas kernel core:
    arbitrary band-limited wavetables (OscWt's role,
    knaster_core/src/dsp/wavetable.rs) at voice-bank scale.

    Pass ``table`` (one waveform cycle) or ``harmonics`` (mags, or (mags,
    u32 offsets)); the table is decomposed into ``n_harmonics`` partials and
    re-synthesized gather-free with exact per-voice anti-aliasing (partials
    above Nyquist masked, block-rate). Cost scales linearly with
    ``n_harmonics``."""

    def __init__(self, n_voices: int, table=None, harmonics=None,
                 n_harmonics: int = 16, voice_defaults=None,
                 event_capacity=256, attack: float = 0.01,
                 release: float = 0.1, tile_rows: int = 128):
        from ..models.voices import AdditiveVoice

        voice = AdditiveVoice(
            table=table, harmonics=harmonics, n_harmonics=n_harmonics,
            attack=attack, release=release,
        )
        # the A/B coefficient tiles are [H, tile_rows, 128]: shrink the tile
        # to keep the kernel's VMEM footprint under the ~16M scoped limit
        # (x8 = 4 bytes x Mosaic's double-buffered input windows)
        H = len(voice.mags)
        while tile_rows > 8 and (2 * H + 24) * tile_rows * LANES * 8 > (10 << 20):
            tile_rows //= 2
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            voice, n_voices,
            voice_defaults=voice_defaults, event_capacity=event_capacity,
        )
        self.mags = voice.mags
        self.offsets = voice.offsets
        self.tile_rows = int(tile_rows)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasWavetableBank[{self.n_voices}x{len(self.mags)}h]"

    def make_local(self, n_local: int) -> "PallasWavetableVoiceBank":
        return PallasWavetableVoiceBank(
            n_local, harmonics=(self.mags, self.offsets),
            event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
        )

    def init(self, ctx: AudioCtx):
        if ctx.block_size > 64:
            raise ValueError("PallasWavetableVoiceBank supports block_size <= 64")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phase"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl

        B = ctx.block_size
        V = self.n_voices
        R = V // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        H = len(self.mags)
        dtype = ctx.dtype

        fstate, ivals, active, _, _ = self._apply_events(
            ctx, state, events, trig_tensor=False
        )
        fvals = fstate[0]

        def grid2(x):
            return x.reshape(R, LANES)

        freq = grid2(fvals[self.float_index("freq")])
        amp = grid2(fvals[self.float_index("amp")])
        pan = grid2(fvals[self.float_index("pan")])
        p = pan * 0.5 + 0.5
        panl = jnp.cos(p * (np.pi / 2)).astype(dtype)
        panr = jnp.sin(p * (np.pi / 2)).astype(dtype)
        f2pi = float(TABLE_SIZE) * float(FRACTIONAL_PART) / ctx.sample_rate
        inc = jnp.clip(freq * np.float32(f2pi), 0.0, 2.0**31 - 1).astype(jnp.uint32)
        # block-start fundamental phasor + per-sample rotation angle (one
        # cycle is TABLE_SIZE*FRACTIONAL_PART = 2**30 phase units)
        cycle = float(TABLE_SIZE) * float(FRACTIONAL_PART)
        u2rad = np.float32(2.0 * np.pi / cycle)
        theta0 = (state["phase"] & jnp.uint32(cycle - 1)).astype(dtype) * u2rad
        s0 = jnp.sin(theta0)
        c0 = jnp.cos(theta0)
        ang = inc.astype(dtype) * u2rad
        rs = jnp.sin(ang)
        rc = jnp.cos(ang)
        atk = jnp.full((R, LANES), 1.0 / max(self._attack * ctx.sample_rate, 1.0), dtype)
        rel = jnp.full((R, LANES), 1.0 / max(self._release * ctx.sample_rate, 1.0), dtype)
        act = grid2(active.astype(dtype))

        # band-limited per-voice partial coefficients (block-rate AA mask);
        # table phases folded in: partial_h = A_h*sin(h*theta) + B_h*cos(...)
        hvec = jnp.arange(1, H + 1, dtype=dtype)
        alive = (freq[None, :, :] * hvec[:, None, None] <= np.float32(
            ctx.sample_rate / 2.0
        )).astype(dtype)
        phi = self.offsets.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        acoef = (self.mags * np.cos(phi)).astype(np.float32)
        bcoef = (self.mags * np.sin(phi)).astype(np.float32)
        ha = jnp.asarray(acoef, dtype)[:, None, None] * alive
        hb = jnp.asarray(bcoef, dtype)[:, None, None] * alive

        restart_lo, restart_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_restart"))
        )
        release_lo, release_hi = (
            grid2(w) for w in
            self._packed_trigs(ctx, events, self.trig_index("t_release"))
        )

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        hspec = lambda: pl.BlockSpec((H, TR, LANES), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        outs = pl.pallas_call(
            functools.partial(_wt_bank_kernel, B, H, False),
            grid=(n_tiles,),
            in_specs=[tile() for _ in range(13)] + [hspec(), hspec()]
                     + [tile() for _ in range(4)],
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, 2, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, 2, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(
            s0, c0, rs, rc, state["stage"], state["t"], state["rscale"],
            atk, rel, amp, panl, panr, act, ha, hb,
            restart_lo, restart_hi, release_lo, release_hi,
        )
        partial_mix, stage, t, rscale = outs
        out = jnp.sum(partial_mix, axis=(0, 3)).T  # [2, B]
        phase = state["phase"] + inc * jnp.uint32(B)
        fvals, ftarget, fstep, frem, fsdur = self._advance_ramps(fstate, B, dtype)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "frem": frem, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "phase": phase, "stage": stage, "t": t, "rscale": rscale,
        }
        return new_state, out
