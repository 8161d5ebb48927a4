"""Noise UGens (reference: knaster_core_dsp/src/ugens/noise.rs).

TPU-native RNG: instead of the reference's stateful wyrand/xorshift streams,
we use JAX's counter-based Threefry — stateless per (seed, block, sample),
so noise vectorizes across voices and shards across chips without sequence
coupling, and renders are deterministic for a given graph construction order
(parity with the reference's global NEXT_SEED counter, noise.rs:11-22).
Output *values* therefore differ from the Rust reference (different RNG);
the distributions and spectra match.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

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

    def init(self, ctx: AudioCtx):
        return {"block": jnp.zeros((), jnp.uint32)}

    def _block_uniforms(self, ctx, state, shape):
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), state["block"])
        return jax.random.uniform(key, shape, dtype=ctx.dtype)


class WhiteNoise(_NoiseBase):
    """Uniform white noise in (-1, 1) (noise.rs:25-50 WhiteNoise)."""

    def process(self, ctx: AudioCtx, state, inputs, params):
        u = self._block_uniforms(ctx, state, (ctx.block_size,))
        out = u * 2.0 - 1.0
        return {"block": state["block"] + 1}, out[None, :]


class PinkNoise(_NoiseBase):
    """Voss-McCartney pink noise (noise.rs:51-120 PinkNoise).

    Stacked white-noise octaves selected by trailing_zeros of a wrapping
    counter, plus an always-on white source; usually within ±0.75."""

    def init(self, ctx: AudioCtx):
        return {
            "block": jnp.zeros((), jnp.uint32),
            "whites": jnp.zeros((PINK_NOISE_OCTAVES,), ctx.dtype),
            "always_on": jnp.zeros((), ctx.dtype),
            "counter": jnp.ones((), jnp.uint32),
            "pink": jnp.zeros((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        u = self._block_uniforms(ctx, state, (B, 2)) * 2.0 - 1.0
        mask = jnp.uint32(2 ** (PINK_NOISE_OCTAVES - 1))

        def step(carry, x):
            whites, always_on, counter, pink = carry
            lsb = counter & (jnp.uint32(0) - counter)
            index = jax.lax.population_count(lsb - 1).astype(jnp.int32)
            pink = pink - whites[index] + x[0]
            whites = whites.at[index].set(x[0])
            pink = pink - always_on + x[1]
            always_on = x[1]
            counter = (counter & (mask - 1)) + 1
            out = pink / (PINK_NOISE_OCTAVES + 1.0)
            return (whites, always_on, counter, pink), out

        carry0 = (state["whites"], state["always_on"], state["counter"], state["pink"])
        (whites, always_on, counter, pink), out = jax.lax.scan(step, carry0, u)
        new_state = {
            "block": state["block"] + 1,
            "whites": whites,
            "always_on": always_on,
            "counter": counter,
            "pink": pink,
        }
        return new_state, out[None, :]


class BrownNoise(_NoiseBase):
    """Integrated white noise, clamped to ±1 (noise.rs:122-160 BrownNoise)."""

    def init(self, ctx: AudioCtx):
        return {
            "block": jnp.zeros((), jnp.uint32),
            "last": jnp.zeros((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        w = self._block_uniforms(ctx, state, (ctx.block_size,)) * 2.0 - 1.0

        def step(last, white):
            last = jnp.clip(last + white * 0.1, -1.0, 1.0)
            return last, last

        last, out = jax.lax.scan(step, state["last"], w)
        return {"block": state["block"] + 1, "last": last}, out[None, :]


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
            "block": jnp.zeros((), jnp.uint32),
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
            "block": state["block"] + 1,
            "current": cur,
            "width": width,
            "phase": phase,
        }
        return new_state, out[None, :]
