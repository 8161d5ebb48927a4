"""Noise UGens (reference: knaster_core_dsp/src/ugens/noise.rs).

TPU-native RNG: instead of the reference's stateful wyrand/xorshift streams,
we use JAX's counter-based Threefry — stateless per (seed, absolute frame),
so noise vectorizes across voices, shards across chips without sequence
coupling, renders are deterministic for a given graph construction order
(parity with the reference's global NEXT_SEED counter, noise.rs:11-22), and
the stream is block-size invariant: superblocked renders bit-match
per-block renders.
Output *values* therefore differ from the Rust reference (different RNG);
the distributions and spectra match.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat

_NEXT_SEED = itertools.count()

PINK_NOISE_OCTAVES = 9


def next_randomness_seed() -> int:
    """Deterministic per-construction-order seed (noise.rs:20 NEXT_SEED)."""
    return next(_NEXT_SEED)


def reset_randomness_seeds() -> None:
    global _NEXT_SEED
    _NEXT_SEED = itertools.count()


class _NoiseBase(UGen):
    inputs = 0
    outputs = 1
    params = ()

    def __init__(self, seed: int | None = None):
        self.seed = next_randomness_seed() if seed is None else int(seed)

    def batch_key(self):
        # the Threefry seed rides STATE (not the traced closure), so
        # same-kind noise nodes at one depth auto-batch into one vmapped
        # call, and WhiteNoise can join collapsed chains
        return (type(self),)

    def init(self, ctx: AudioCtx):
        return {
            "seed": jnp.asarray(self.seed, jnp.uint32),
            "frame": jnp.zeros((), jnp.uint32),
        }

    def _block_uniforms(self, ctx, state, shape):
        """Counter-mode uniforms: one threefry per SAMPLE, keyed by the
        absolute frame index — the noise stream is a pure function of
        (seed, frame), so any block partitioning renders bit-identically
        (a per-BLOCK key would make superblocked renders diverge). The u32
        frame counter wraps after ~24.8 h at 48 kHz."""
        B = shape[0]
        frames = state["frame"] + jnp.arange(B, dtype=jnp.uint32)
        base = jax.random.PRNGKey(state["seed"])
        k = 1 if len(shape) == 1 else int(np.prod(shape[1:]))
        u = jax.vmap(
            lambda t: jax.random.uniform(
                jax.random.fold_in(base, t), (k,), dtype=ctx.dtype
            )
        )(frames)
        return u[:, 0] if len(shape) == 1 else u.reshape(shape)


class WhiteNoise(_NoiseBase):
    """Uniform white noise in (-1, 1) (noise.rs:25-50 WhiteNoise)."""

    def process(self, ctx: AudioCtx, state, inputs, params):
        u = self._block_uniforms(ctx, state, (ctx.block_size,))
        out = u * 2.0 - 1.0
        return {
            "seed": state["seed"],
            "frame": state["frame"] + ctx.block_size,
        }, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the SAME
        (seed, frame)-keyed stream, computed by an in-kernel Threefry-2x32
        (jax.random's algorithm re-stated as [1, B]-lane u32 math —
        integer adds/rotates/xors, so values are BIT-IDENTICAL to
        ``_block_uniforms``). Two threefry evaluations per sample:
        fold_in(key, frame) then the single-block random_bits draw."""
        import jax as _jax

        # the bits combine below (b0 ^ b1) restates jax.random's
        # PARTITIONABLE random_bits path; if the config flag is off (or a
        # future jax flips the default) the scan path's _block_uniforms
        # would draw from the other (odd-counter) path and the kernel
        # stream would silently diverge while still claiming bit-identity
        # (advisor round-4 finding). Fall back to the scan executor then.
        if not _jax.config.jax_threefry_partitionable:
            return None
        B = ctx.block_size

        def rotl(x, r):
            return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

        _ROT = ((13, 15, 26, 6), (17, 29, 16, 24))

        def threefry2x32(k1, k2, x0, x1):
            ks = (k1, k2, k1 ^ k2 ^ np.uint32(0x1BD11BDA))
            x0 = x0 + ks[0]
            x1 = x1 + ks[1]
            for i in range(5):
                for r in _ROT[i % 2]:
                    x0 = x0 + x1
                    x1 = rotl(x1, r)
                    x1 = x0 ^ x1
                x0 = x0 + ks[(i + 1) % 3]
                x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
            return x0, x1

        def fn(inputs, state, params):
            from jax import lax

            seed = state["seed"]              # [1, 1] u32
            frame0 = state["frame"]           # [1, 1] u32
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
            lane = lax.bitcast_convert_type(lane_i, jnp.uint32)
            frames = frame0 + lane            # [1, B]
            zero = jnp.zeros((1, B), jnp.uint32)
            k1 = zero + seed * np.uint32(0)   # broadcast 0 key halves
            k2 = zero + seed
            # fold_in(key, frame): threefry over the [0, frame] seed pair
            a, b = threefry2x32(k1, k2, zero, frames)
            # random_bits(key, 32, (1,)), partitionable path: threefry
            # over the 2x32 iota (both halves 0 for one draw), XORed
            b0, b1 = threefry2x32(a, b, zero, zero)
            bits = b0 ^ b1
            mant = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
            u = lax.bitcast_convert_type(mant, ctx.dtype) - 1.0
            out = u * 2.0 - 1.0
            new_state = {
                "seed": seed,
                "frame": frame0 + np.uint32(B),
            }
            return new_state, out

        return fn


class PinkNoise(_NoiseBase):
    """Voss-McCartney pink noise (noise.rs:51-120 PinkNoise).

    Stacked white-noise octaves selected by trailing_zeros of a wrapping
    counter, plus an always-on white source; usually within ±0.75."""

    def init(self, ctx: AudioCtx):
        return {
            "seed": jnp.asarray(self.seed, jnp.uint32),
            "frame": jnp.zeros((), jnp.uint32),
            "whites": jnp.zeros((PINK_NOISE_OCTAVES,), ctx.dtype),
            "always_on": jnp.zeros((), ctx.dtype),
            "counter": jnp.ones((), jnp.uint32),
            "pink": jnp.zeros((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        # Vectorized Voss-McCartney (no per-sample scan): the per-sample
        # recurrence is pink_t = pink_{t-1} - whites_before[i_t] + x0_t
        # - x1_{t-1} + x1_t, where i_t = trailing_zeros(counter_t) and
        # whites_before[i_t] is the x0 at the PREVIOUS occurrence of octave
        # i_t (or the carried octave value). Per octave, the previous
        # occurrence is an exclusive running-max of masked sample indices —
        # log-depth on the VPU instead of a B-iteration loop.
        B = ctx.block_size
        dtype = ctx.dtype
        u = self._block_uniforms(ctx, state, (B, 2)) * 2.0 - 1.0
        x0, x1 = u[:, 0], u[:, 1]
        mask = jnp.uint32(2 ** (PINK_NOISE_OCTAVES - 1))

        t = jnp.arange(B, dtype=jnp.uint32)
        counter = ((state["counter"] - 1 + t) & (mask - 1)) + 1
        lsb = counter & (jnp.uint32(0) - counter)
        idx = jax.lax.population_count(lsb - 1).astype(jnp.int32)  # [B]

        ti = jnp.arange(B, dtype=jnp.int32)
        # all octaves at once ([O, B] planes): exactly one octave fires per
        # sample, so `removed` is a sum of disjoint selects — one cummax and
        # one gather for the whole block instead of one per octave
        orange = jnp.arange(PINK_NOISE_OCTAVES, dtype=jnp.int32)
        m = idx[None, :] == orange[:, None]  # [O, B]
        occ = jnp.where(m, ti[None, :], -1)
        cm = jax.lax.cummax(occ, axis=1)  # inclusive running max
        prev = jnp.concatenate(
            [jnp.full((PINK_NOISE_OCTAVES, 1), -1, jnp.int32), cm[:, :-1]],
            axis=1,
        )
        val = jnp.where(
            prev >= 0, x0[jnp.maximum(prev, 0)], state["whites"][:, None]
        )
        removed = jnp.sum(jnp.where(m, val, jnp.zeros((), dtype)), axis=0)
        last = cm[:, -1]
        new_whites = jnp.where(
            last >= 0, x0[jnp.maximum(last, 0)], state["whites"]
        )
        x1_prev = jnp.concatenate([state["always_on"][None], x1[:-1]])
        pink = state["pink"] + jnp.cumsum(x0 - removed + x1 - x1_prev)
        out = pink / (PINK_NOISE_OCTAVES + 1.0)
        new_state = {
            "seed": state["seed"],
            "frame": state["frame"] + B,
            "whites": new_whites,
            "always_on": x1[-1],
            "counter": ((state["counter"] - 1 + B) & (mask - 1)) + 1,
            "pink": pink[-1],
        }
        return new_state, out[None, :].astype(dtype)


class BrownNoise(_NoiseBase):
    """Integrated white noise, clamped to ±1 (noise.rs:122-160 BrownNoise)."""

    def init(self, ctx: AudioCtx):
        return {
            "seed": jnp.asarray(self.seed, jnp.uint32),
            "frame": jnp.zeros((), jnp.uint32),
            "last": jnp.zeros((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        w = self._block_uniforms(ctx, state, (ctx.block_size,)) * 2.0 - 1.0

        def step(last, white):
            last = jnp.clip(last + white * 0.1, -1.0, 1.0)
            return last, last

        last, out = jax.lax.scan(step, state["last"], w)
        return {
            "seed": state["seed"],
            "frame": state["frame"] + ctx.block_size,
            "last": last,
        }, out[None, :]


class RandomLin(_NoiseBase):
    """Linearly interpolated random values in [0, 1) at a given frequency
    (noise.rs:163-230 RandomLin)."""

    params = (pfloat("freq", 1.0, kind=ParameterKind.FREQUENCY),)

    def __init__(self, freq: float = 1.0, seed: int | None = None):
        super().__init__(seed)
        self.pdefaults = {"freq": float(freq)}

    def init(self, ctx: AudioCtx):
        k = jax.random.PRNGKey(self.seed)
        k0, k1 = jax.random.split(k)
        first = jax.random.uniform(k0, (), dtype=ctx.dtype)
        second = jax.random.uniform(k1, (), dtype=ctx.dtype)
        return {
            "seed": jnp.asarray(self.seed, jnp.uint32),
            "frame": jnp.zeros((), jnp.uint32),
            "current": first,
            "width": second - first,
            "phase": jnp.zeros((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        rand = self._block_uniforms(ctx, state, (B,))
        step_arr = params["freq"] / jnp.asarray(float(ctx.sample_rate), ctx.dtype)

        def step(carry, x):
            cur, width, phase = carry
            out = cur + phase * width
            phase = phase + x["step"]
            wrap = phase >= 1.0
            old_target = cur + width
            cur = jnp.where(wrap, old_target, cur)
            width = jnp.where(wrap, x["rand"] - old_target, width)
            phase = jnp.where(wrap, jnp.zeros((), ctx.dtype), phase)
            return (cur, width, phase), out

        carry0 = (state["current"], state["width"], state["phase"])
        (cur, width, phase), out = jax.lax.scan(
            step, carry0, {"step": step_arr, "rand": rand}
        )
        new_state = {
            "seed": state["seed"],
            "frame": state["frame"] + B,
            "current": cur,
            "width": width,
            "phase": phase,
        }
        return new_state, out[None, :]
