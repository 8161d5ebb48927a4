"""Custom voice at kernel speed — the generic PallasVoiceBank story.

The reference's extension point is "write a UGen struct and a process loop"
(knaster_core/src/ugen.rs:232-369). Here a USER-defined voice — a little
drawbar organ: three harmonics with per-voice drawbar mix, AR envelope,
equal-power pan — opts into the fused Pallas kernel path with a ~25-line
``mosaic_voice`` body, and ``PallasVoiceBank`` supplies the rest: the
sample-accurate per-voice event machinery, voice tiling across the VPU
lanes, VMEM state carry, and the stereo mix-down. No hand-written bank
needed. Renders an evolving chord wash to custom_voice_bank.wav.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from knaster_tpu.prelude import *  # noqa: F403
from knaster_tpu import MosaicVoiceSpec, PallasVoiceBank, UGen, pfloat, ptrigger
from knaster_tpu.core.ugen import AudioCtx, normalize_process_result

N = 512
SECONDS = 10.0


class OrganVoice(UGen):
    """Three-drawbar organ voice: fundamental + 2nd + 3rd harmonic, AR env,
    equal-power pan. ``process`` is the plain composable form (works in any
    VoiceBank); ``mosaic_voice`` is the same math as a per-sample kernel
    body."""

    inputs = 0
    outputs = 2
    params = (
        pfloat("freq", 220.0),
        pfloat("amp", 0.02),
        pfloat("bar2", 0.5),   # 2nd-harmonic drawbar
        pfloat("bar3", 0.25),  # 3rd-harmonic drawbar
        pfloat("pan", 0.0),
        ptrigger("t_restart"),
    )

    def __init__(self, attack: float = 0.02, release: float = 1.2):
        self.pdefaults = {"freq": 220.0, "amp": 0.02, "bar2": 0.5,
                          "bar3": 0.25, "pan": 0.0}
        self.o1, self.o2, self.o3 = SinWt(220.0), SinWt(440.0), SinWt(660.0)  # noqa: F405
        self.env = EnvAr(attack, release)  # noqa: F405
        self._attack, self._release = float(attack), float(release)

    def init(self, ctx: AudioCtx):
        return {"o1": self.o1.init(ctx), "o2": self.o2.init(ctx),
                "o3": self.o3.init(ctx), "env": self.env.init(ctx)}

    def process(self, ctx, state, inputs, params):
        B = ctx.block_size
        no_in = jnp.zeros((0, B), ctx.dtype)
        zeros = jnp.zeros((B,), ctx.dtype)
        no_trig = jnp.zeros((B,), bool)

        def osc(o, st, f):
            s, out, _ = normalize_process_result(
                o.process(ctx, st, no_in, {"freq": f, "phase_offset": zeros,
                                           "reset_phase": no_trig}), ctx)
            return s, out[0]

        s1, h1 = osc(self.o1, state["o1"], params["freq"])
        s2, h2 = osc(self.o2, state["o2"], params["freq"] * 2.0)
        s3, h3 = osc(self.o3, state["o3"], params["freq"] * 3.0)
        se, env, done = normalize_process_result(self.env.process(
            ctx, state["env"], no_in,
            {"attack_time": jnp.full((B,), self._attack, ctx.dtype),
             "release_time": jnp.full((B,), self._release, ctx.dtype),
             "t_restart": params["t_restart"]}), ctx)
        sig = (h1 + params["bar2"] * h2 + params["bar3"] * h3) \
            * env[0] * params["amp"]
        angle = (params["pan"] * 0.5 + 0.5) * jnp.asarray(
            np.pi / 2.0, ctx.dtype)
        out = jnp.stack([sig * jnp.cos(angle), sig * jnp.sin(angle)])
        return {"o1": s1, "o2": s2, "o3": s3, "env": se}, out, done

    def mosaic_voice(self, ctx: AudioCtx):
        from knaster_tpu.parallel.pallas_bank import (
            _HALF_PI, _env_ar, _env_ar_free, _sin_quant, _to_inc,
        )
        from knaster_tpu.ugens.wavetable import FRACTIONAL_PART, TABLE_SIZE

        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        atk = np.float32(1.0 / max(self._attack * ctx.sample_rate, 1.0))
        rel = np.float32(1.0 / max(self._release * ctx.sample_rate, 1.0))
        half = np.float32(0.5)

        def body(i_f, carry, P, T):
            restart = T["t_restart"]
            stage, t = carry["stage"], carry["t"]
            if restart is None:
                env, stage, t = _env_ar_free(stage, t, atk, rel)
            else:
                env, stage, t = _env_ar(stage, t, restart, atk, rel)
            freq = P["freq"]
            sig = (_sin_quant(carry["p1"])
                   + P["bar2"] * _sin_quant(carry["p2"])
                   + P["bar3"] * _sin_quant(carry["p3"])) * (env * P["amp"])
            new = {
                "p1": carry["p1"] + _to_inc(freq * f2pi),
                "p2": carry["p2"] + _to_inc(freq * np.float32(2.0) * f2pi),
                "p3": carry["p3"] + _to_inc(freq * np.float32(3.0) * f2pi),
                "stage": stage, "t": t,
            }
            angle = (P["pan"] * half + half) * _HALF_PI
            return new, (sig * jnp.cos(angle), sig * jnp.sin(angle))

        return MosaicVoiceSpec(
            carry={"p1": (jnp.uint32, 0), "p2": (jnp.uint32, 0),
                   "p3": (jnp.uint32, 0),
                   "stage": (ctx.dtype, 0.0), "t": (ctx.dtype, 0.0)},
            body=body,
            idle_of=lambda c: c["stage"] == 0.0,
        )


def main():
    rng = np.random.default_rng(7)
    graph, proc = knaster(outputs=2)  # noqa: F405

    defaults = {
        "freq": rng.uniform(110, 880, N).astype(np.float32),
        "amp": np.full(N, 0.003, np.float32),
        "bar2": rng.uniform(0.2, 0.8, N).astype(np.float32),
        "bar3": rng.uniform(0.0, 0.5, N).astype(np.float32),
        "pan": rng.uniform(-0.9, 0.9, N).astype(np.float32),
    }
    bank = graph.edit(lambda g: (lambda b: (b.to_graph_out(), b)[1])(
        g.push(PallasVoiceBank(OrganVoice(), N, voice_defaults=defaults,
                               event_capacity=4096))))

    # evolving chord wash: retune groups of voices to chord tones, retrigger
    chords = [
        [0, 4, 7, 11],   # maj7
        [0, 3, 7, 10],   # m7
        [0, 5, 7, 10],   # 7sus4
        [0, 4, 9, 14],   # add9-ish
    ]
    restart = bank.voice_param("t_restart")
    freq = bank.voice_param("freq")
    sr = 48000
    step = SECONDS / len(chords)
    for ci, chord in enumerate(chords):
        t = Seconds.from_secs_f64(ci * step)  # noqa: F405
        for v in range(N):
            semitone = chord[v % len(chord)] + 12 * ((v // len(chord)) % 3)
            f = 110.0 * 2.0 ** (semitone / 12.0)
            freq.set_at(v, f, t)
            restart.trig_at(v, t)
    audio = proc.render(seconds=SECONDS)
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "custom_voice_bank.wav")
    from knaster_tpu.utils.wav import write_wav

    write_wav(path, np.asarray(audio), sr)
    print(f"wrote {path} ({audio.shape[1]} frames, peak "
          f"{float(np.abs(np.asarray(audio)).max()):.3f})")


if __name__ == "__main__":
    main()
