"""Panning UGens (reference: knaster_core_dsp/src/ugens/pan.rs)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat


class Pan2(UGen):
    """Mono→stereo cos/sin equal-power pan law (pan.rs:12-40 Pan2).

    Pan is in (-1, 1), 0 = center. The reference uses fastapprox cos/sin;
    we use exact cos/sin (≤1e-3 divergence from the reference, strictly more
    accurate)."""

    inputs = 1
    outputs = 2
    params = (pfloat("pan", 0.0, range=(-1.0, 1.0)),)

    def batch_key(self):
        return (type(self),)

    def __init__(self, pan: float = 0.0):
        self.pdefaults = {"pan": float(pan)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        x = inputs[0]
        p = params["pan"] * 0.5 + 0.5
        angle = p * jnp.asarray(np.pi / 2.0, ctx.dtype)
        left = x * jnp.cos(angle)
        right = x * jnp.sin(angle)
        return state, jnp.stack([left, right])

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): ``process`` verbatim
        on [1, B] rows — pure elementwise cos/sin pan law."""

        def fn(inputs, state, params):
            x = inputs[0:1, :]
            p = params["pan"] * 0.5 + 0.5
            angle = p * (np.pi / 2.0)
            out = jnp.concatenate(
                [x * jnp.cos(angle), x * jnp.sin(angle)], axis=0
            )
            return state, out

        return fn
