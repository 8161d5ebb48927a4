"""Arithmetic UGens (reference: knaster_core_dsp/src/ugens/math.rs).

``MathUGen(op, channels)`` takes 2×channels inputs (first half = left
operand, second half = right; reference math.rs:94-171 with
``Inputs = Double<Channels>``) and applies the op channel-wise. On TPU these
vanish into XLA fusion — the reference's finding that special-cased dispatch
didn't pay (NOTES.md "Special case arithmetic operators") holds even more
strongly here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen

_BINOPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "pow": lambda a, b: a**b,
}

_UNOPS = {
    "ceil": jnp.ceil,
    "floor": jnp.floor,
    "sqrt": jnp.sqrt,
    "trunc": jnp.trunc,
    "fract": lambda x: x - jnp.trunc(x),
    "exp": jnp.exp,
    "abs": jnp.abs,
    "neg": lambda x: -x,
    "log": jnp.log,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tanh": jnp.tanh,
}


class MathUGen(UGen):
    """Binary math over stacked channel pairs (math.rs:17-171)."""

    params = ()

    def batch_key(self):
        return (type(self), self.op, self.channels)

    def __init__(self, op: str, channels: int = 1):
        if op not in _BINOPS:
            raise ValueError(f"unknown binary op {op!r}; have {sorted(_BINOPS)}")
        self.op = op
        self.channels = int(channels)
        self.inputs = 2 * self.channels
        self.outputs = self.channels

    def name(self) -> str:
        return f"Math<{self.op}>"

    def process(self, ctx: AudioCtx, state, inputs, params):
        c = self.channels
        return state, _BINOPS[self.op](inputs[:c], inputs[c:])

    def mosaic_stage(self, ctx: AudioCtx):
        if self.op == "pow":
            return None  # general powf lowering is not guaranteed in Mosaic
        op, c = _BINOPS[self.op], self.channels

        def fn(inputs, state, params):
            return state, op(inputs[:c], inputs[c:])

        return fn


# free constructor functions (reference knaster/src/math_ugens.rs)
def mul(channels: int = 1) -> "MathUGen":
    return MathUGen("mul", channels)


def add(channels: int = 1) -> "MathUGen":
    return MathUGen("add", channels)


def sub(channels: int = 1) -> "MathUGen":
    return MathUGen("sub", channels)


def div(channels: int = 1) -> "MathUGen":
    return MathUGen("div", channels)


class Math1UGen(UGen):
    """Unary math (math.rs:168-320 Math1UGen)."""

    params = ()

    def batch_key(self):
        return (type(self), self.op, self.channels)

    def __init__(self, op: str, channels: int = 1):
        if op not in _UNOPS:
            raise ValueError(f"unknown unary op {op!r}; have {sorted(_UNOPS)}")
        self.op = op
        self.channels = int(channels)
        self.inputs = self.channels
        self.outputs = self.channels

    def name(self) -> str:
        return f"Math1<{self.op}>"

    def process(self, ctx: AudioCtx, state, inputs, params):
        return state, _UNOPS[self.op](inputs)

    # unary ops with known Mosaic lowerings (trunc/fract excluded)
    _MOSAIC_UNOPS = frozenset(
        {"ceil", "floor", "sqrt", "exp", "abs", "neg", "log", "sin", "cos",
         "tanh"}
    )

    def mosaic_stage(self, ctx: AudioCtx):
        if self.op not in self._MOSAIC_UNOPS:
            return None
        op = _UNOPS[self.op]

        def fn(inputs, state, params):
            return state, op(inputs)

        return fn
