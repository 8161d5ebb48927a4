"""Deterministic test fixture UGens.

Parity with knaster_graph/src/tests/utils.rs: outputs are chosen so that any
graph wiring error changes exact sample values.
"""

import jax.numpy as jnp

from knaster_tpu import UGen, pfloat


class TestNumUGen(UGen):
    """Outputs a static number every frame (tests/utils.rs:4-18)."""

    __test__ = False  # not a pytest class
    inputs = 0
    outputs = 1
    params = ()

    def __init__(self, n: float):
        self.n = float(n)

    def process(self, ctx, state, inputs, params):
        return state, jnp.full((1, ctx.block_size), self.n, dtype=ctx.dtype)


class TestInPlusParamUGen(UGen):
    """Outputs input + param per sample (tests/utils.rs:21-67)."""

    __test__ = False  # not a pytest class
    inputs = 1
    outputs = 1
    params = (pfloat("number", 0.0),)

    def process(self, ctx, state, inputs, params):
        return state, (inputs[0] + params["number"])[None, :]
