"""Galactic stereo reverb — port of the airwindows Galactic plugin.

Reference: knaster_airwindows/src/galactic.rs (itself MIT-licensed airwindows
code). Demonstrates the plugin tier: third-party UGen packages only need the
core UGen protocol (the reference's knaster_airwindows depends only on
knaster_core + core_dsp).

Structure per channel: input → 256-sample vibrato (detune) delay read with a
drifting sine offset → pre lowpass → three cascaded banks of 4 delay lines
mixed with a Householder-like matrix (2·b[i] − Σb) → feedback to the opposite
channel's first bank → post lowpass → wet/dry.

TPU mapping: the 12 delay lines per channel live in one padded ``[12, Lmax]``
buffer; each scan step does 12-lane vector reads/writes. The per-sample loop
is a ``lax.scan`` (the feedback matrix makes it genuinely sequential); block
rate parameters are computed vectorized outside the scan.

The reference's floating-point dither adds ~1e-17-scale noise (inaudible and
below f32 resolution at signal level); we keep the xorshift state because the
vibrato drift reseeds from it, and apply the dither in the same formula.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat
from ..ugens.noise import next_randomness_seed

GALACTIC_DELAY_TIMES = np.array(
    [6480, 3660, 1720, 680, 9700, 6000, 2320, 940, 15220, 8460, 4540, 3200],
    dtype=np.int64,
)


def _xorshift(x):
    x = x ^ (x << 13)
    x = x ^ (x >> 17)
    x = x ^ (x << 5)
    return x


class Galactic(UGen):
    """Stereo 'galactic' reverb (galactic.rs:15-400).

    Params (galactic.rs order): replace, detune, brightness, bigness, wet —
    all 0..1."""

    inputs = 2
    outputs = 2
    params = (
        pfloat("replace", 0.5),
        pfloat("detune", 0.5),
        pfloat("brightness", 0.5),
        pfloat("bigness", 1.0),
        pfloat("wet", 1.0),
    )

    def __init__(self, replace=0.5, detune=0.5, brightness=0.5, bigness=1.0,
                 wet=1.0, seed: int | None = None):
        self.pdefaults = {
            "replace": float(replace),
            "detune": float(detune),
            "brightness": float(brightness),
            "bigness": float(bigness),
            "wet": float(wet),
        }
        self.seed = next_randomness_seed() if seed is None else int(seed)

    def init(self, ctx: AudioCtx):
        sr = ctx.sample_rate
        base_lens = ((GALACTIC_DELAY_TIMES / 44100.0) * sr).astype(np.int64)
        base_lens = np.maximum(base_lens, 1)
        self._base_lens = base_lens
        Lmax = int(base_lens.max())
        self._Lmax = Lmax
        self._overallscale = sr / 44100.0
        rng = np.random.default_rng(self.seed)
        fpd_l = np.uint32(rng.integers(16386, 2**32 - 1))
        fpd_r = np.uint32(rng.integers(16386, 2**32 - 1))
        z12 = jnp.zeros((2, 12, Lmax), ctx.dtype)
        return {
            "dbuf": z12,  # [channel, line, Lmax]
            "dpos": jnp.zeros((2, 12), jnp.int32),
            "vib_buf": jnp.zeros((2, 256), ctx.dtype),
            "vib_pos": jnp.zeros((2,), jnp.int32),
            "feedback": jnp.zeros((2, 4), ctx.dtype),
            "iir_a": jnp.zeros((2,), ctx.dtype),
            "iir_b": jnp.zeros((2,), ctx.dtype),
            "fpd": jnp.asarray([fpd_l, fpd_r], jnp.uint32),
            "vib_m": jnp.zeros((), ctx.dtype),
            "oldfpd": jnp.asarray(429496.7295, ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        B = ctx.block_size
        base_lens = jnp.asarray(self._base_lens, jnp.int32)

        # block-rate derived parameters, vectorized (galactic.rs:176-190)
        replace = params["replace"]
        regen = 0.0625 + (1.0 - replace) * 0.0625
        attenuate = (1.0 - regen / 0.125) * 1.333
        lowpass = jnp.square(1.00001 - (1.0 - params["brightness"])) / np.sqrt(
            self._overallscale
        )
        drift = params["detune"] ** 3 * 0.001
        size = params["bigness"] * 0.9 + 0.1
        wet = 1.0 - (1.0 - params["wet"]) ** 3

        # effective per-line lengths from `size` (set_delay_length_fraction)
        eff_lens = (base_lens[None, :].astype(dtype) * size[:, None]).astype(
            jnp.int32
        )  # [B, 12]
        eff_lens = jnp.clip(eff_lens, 1, self._Lmax)

        lines4 = jnp.arange(4, dtype=jnp.int32)

        def mix4(b):
            # b[i] - (b[i+1]+b[i+2]+b[i+3]) == 2*b[i] - sum(b); works for [..., 4]
            return 2.0 * b - jnp.sum(b, axis=-1, keepdims=True)

        def bank(dbuf, dpos, eff, first, values):
            """write `values` [2,4] into lines first..first+3, read delayed."""
            rows = lines4 + first
            pos = dpos[:, rows]  # [2, 4]
            ch = jnp.arange(2)[:, None]
            dbuf = dbuf.at[ch, rows[None, :], pos].set(values)
            new_pos = (pos + 1) % eff[rows][None, :]
            out = dbuf[ch, rows[None, :], new_pos]
            dpos = dpos.at[:, rows].set(new_pos)
            return dbuf, dpos, out

        def step(carry, x):
            (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b, fpd,
             vib_m, oldfpd) = carry
            inp = x["in"]  # [2]

            # floating-point-dither replacement of silence (galactic.rs:214-224)
            tiny = fpd.astype(dtype) * jnp.asarray(1.18e-17, dtype)
            inp = jnp.where(jnp.abs(inp) < 1.18e-23, tiny, inp)
            dry = inp

            # vibrato phase (galactic.rs:229-235)
            vib_m = vib_m + oldfpd * x["drift"]
            reset = vib_m > jnp.asarray(2.0 * np.pi, dtype)
            oldfpd = jnp.where(
                reset,
                jnp.asarray(0.4294967295, dtype)
                + fpd[0].astype(dtype) * jnp.asarray(0.0000000000618, dtype),
                oldfpd,
            )
            vib_m = jnp.where(reset, jnp.zeros((), dtype), vib_m)

            # detune delay: write, then read at drifting offset (lin interp)
            vib_buf = vib_buf.at[jnp.arange(2), vib_pos].set(inp * x["attenuate"])
            vib_pos = (vib_pos + 1) % 256
            offset = jnp.stack(
                [
                    (jnp.sin(vib_m) + 1.0) * 127.0,
                    (jnp.sin(vib_m + np.pi / 2.0) + 1.0) * 127.0,
                ]
            ).astype(dtype)
            working = vib_pos.astype(dtype) + offset
            low = jnp.floor(working).astype(jnp.int32) % 256
            high = (low + 1) % 256
            frac = working - jnp.floor(working)
            v_lo = vib_buf[jnp.arange(2), low]
            v_hi = vib_buf[jnp.arange(2), high]
            inp = v_lo + (v_hi - v_lo) * frac

            # pre lowpass (iirA)
            lp = x["lowpass"]
            iir_a = iir_a * (1.0 - lp) + inp * lp
            inp = iir_a

            # three cascaded 4-line banks with cross-channel feedback
            fb_cross = feedback[::-1]  # left bank gets right feedback & v.v.
            write0 = fb_cross * x["regen"] + inp[:, None]
            dbuf, dpos, b0 = bank(dbuf, dpos, x["eff"], 0, write0)
            dbuf, dpos, b1 = bank(dbuf, dpos, x["eff"], 4, mix4(b0))
            dbuf, dpos, b2 = bank(dbuf, dpos, x["eff"], 8, mix4(b1))
            feedback = mix4(b2)
            inp = jnp.sum(b2, axis=-1) * 0.125

            # post lowpass (iirB)
            iir_b = iir_b * (1.0 - lp) + inp * lp
            inp = iir_b

            w = x["wet"]
            inp = jnp.where(w < 1.0, inp * w + dry * (1.0 - w), inp)

            # airwindows fp dither (state matters for vib reseed; the added
            # noise is ~1e-17-scale)
            m, e = jnp.frexp(inp)
            e = jnp.clip(e, 0, 64).astype(dtype)
            fpd = _xorshift(fpd)
            dither = (
                (fpd.astype(jnp.float32) - np.float32(0x7FFFFFFF))
                * np.float32(5.5e-36)
                * jnp.exp2(e + 62.0)
            ).astype(dtype)
            inp = inp + dither

            carry = (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b,
                     fpd, vib_m, oldfpd)
            return carry, inp

        xs = {
            "in": jnp.swapaxes(inputs, 0, 1),  # [B, 2]
            "regen": regen,
            "attenuate": attenuate,
            "lowpass": lowpass,
            "drift": drift,
            "wet": wet,
            "eff": eff_lens,
        }
        carry0 = (
            state["dbuf"], state["dpos"], state["vib_buf"], state["vib_pos"],
            state["feedback"], state["iir_a"], state["iir_b"], state["fpd"],
            state["vib_m"], state["oldfpd"],
        )
        carry, out = jax.lax.scan(step, carry0, xs)
        (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b, fpd,
         vib_m, oldfpd) = carry
        new_state = {
            "dbuf": dbuf, "dpos": dpos, "vib_buf": vib_buf, "vib_pos": vib_pos,
            "feedback": feedback, "iir_a": iir_a, "iir_b": iir_b, "fpd": fpd,
            "vib_m": vib_m, "oldfpd": oldfpd,
        }
        return new_state, jnp.swapaxes(out, 0, 1)
