"""Dynamics UGens (reference: knaster_core_dsp/src/ugens/dynamics.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen


class SafetyLimiter(UGen):
    """Clamps to (-1, 1) and replaces NaN by 0 (dynamics.rs:14 SafetyLimiter)."""

    inputs = 1
    outputs = 1
    params = ()

    def batch_key(self):
        return (type(self),)

    def process(self, ctx: AudioCtx, state, inputs, params):
        x = inputs[0]
        x = jnp.clip(x, -1.0, 1.0)
        x = jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)
        return state, x[None, :]
