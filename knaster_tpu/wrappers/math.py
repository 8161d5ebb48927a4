"""Scalar math wrapper combinators fused around an inner UGen.

Parity with knaster_core_dsp/src/wrappers_core/math.rs (WrMul/WrAdd/WrSub/
WrVSub/WrDiv/WrVDiv/WrPowf/WrPowi) and closure.rs (WrClosure). On TPU these
compile to fused elementwise epilogues — they exist for API familiarity and
to keep single-node graphs cheap (no extra Constant/Math nodes).

Semantics (from the reference's wrapper_arithmetic test):
  wr_sub(c)   -> out - c          wr_v_sub(c) -> c - out
  wr_div(c)   -> out / c          wr_v_div(c) -> c / out
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen, normalize_process_result


class WrapUGen(UGen):
    """Base wrapper: delegates channel/param surface to the inner UGen."""

    def __init__(self, inner: UGen):
        self.inner = inner
        self.inputs = inner.inputs
        self.outputs = inner.outputs
        self.params = inner.params
        self.pdefaults = getattr(inner, "pdefaults", {})

    def name(self) -> str:
        return f"{type(self).__name__}({self.inner.name()})"

    def batch_key(self):
        # wrappers batch when their inner UGen does and the epilogue config
        # matches (auto-batching pass, compile.py)
        inner_key = self.inner.batch_key()
        if inner_key is None:
            return None
        extra = getattr(self, "c", None)
        extra = getattr(self, "n", extra)
        if type(self) is WrClosure:
            return None  # arbitrary closures aren't comparable
        return (type(self), inner_key, extra)

    def init(self, ctx: AudioCtx):
        return self.inner.init(ctx)

    def process(self, ctx: AudioCtx, state, inputs, params):
        st, out, done = normalize_process_result(
            self.inner.process(ctx, state, inputs, params), ctx
        )
        return st, self.post(ctx, out), done

    def post(self, ctx: AudioCtx, out):
        return out


class _WrConst(WrapUGen):
    def __init__(self, inner: UGen, c):
        super().__init__(inner)
        self.c = float(c)


class WrMul(_WrConst):
    def post(self, ctx, out):
        return out * jnp.asarray(self.c, ctx.dtype)


class WrAdd(_WrConst):
    def post(self, ctx, out):
        return out + jnp.asarray(self.c, ctx.dtype)


class WrSub(_WrConst):
    def post(self, ctx, out):
        return out - jnp.asarray(self.c, ctx.dtype)


class WrVSub(_WrConst):
    def post(self, ctx, out):
        return jnp.asarray(self.c, ctx.dtype) - out


class WrDiv(_WrConst):
    def post(self, ctx, out):
        return out / jnp.asarray(self.c, ctx.dtype)


class WrVDiv(_WrConst):
    def post(self, ctx, out):
        return jnp.asarray(self.c, ctx.dtype) / out


class WrPowf(_WrConst):
    def post(self, ctx, out):
        return out ** jnp.asarray(self.c, ctx.dtype)


class WrPowi(WrapUGen):
    def __init__(self, inner: UGen, n: int):
        super().__init__(inner)
        self.n = int(n)

    def post(self, ctx, out):
        return out**self.n


class WrClosure(WrapUGen):
    """Apply an arbitrary jax-traceable elementwise function (closure.rs WrClosure)."""

    def __init__(self, inner: UGen, fn: Callable):
        super().__init__(inner)
        self.fn = fn

    def post(self, ctx, out):
        return self.fn(out)
