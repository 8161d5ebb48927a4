"""The ``@ugen`` decorator: terse UGen declaration.

The reference's ergonomics centerpiece is the ``#[impl_ugen]`` proc-macro
(knaster_macros/src/lib.rs:74-770), which infers channel counts and the
parameter table from function signatures. This is the Python analog: decorate
a function, declare parameters as keyword-only arguments, and their types are
inferred from the defaults (float → float param, TRIG sentinel → trigger,
bool → bool, int/IntEnum → integer).

Block form (the function sees whole blocks; params are [block] arrays)::

    @ugen(inputs=1, outputs=1)
    def gain(ctx, state, inputs, *, amount=1.0):
        return state, inputs * amount[None, :]

Per-sample form (wrapped in lax.scan; params are scalars per step)::

    @ugen.sample(inputs=0, outputs=1, state=lambda ctx: {"phase": jnp.zeros((), ctx.dtype)})
    def saw(carry, frame, *, freq=110.0, t_reset=TRIG):
        phase = jnp.where(t_reset, 0.0, carry["phase"])
        out = phase * 2.0 - 1.0
        return {"phase": (phase + freq / 48000.0) % 1.0}, jnp.asarray([out])
"""

from __future__ import annotations

import dataclasses
import enum
import inspect
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..primitives.params import Param, pbool, pfloat, pinteger, ptrigger
from .ugen import AudioCtx, UGen


class _Trig:
    """Sentinel default marking a trigger parameter."""

    def __repr__(self):
        return "TRIG"


TRIG = _Trig()


def _infer_params(fn: Callable, skip: int) -> tuple:
    sig = inspect.signature(fn)
    specs = []
    for name, p in list(sig.parameters.items()):
        if p.kind != inspect.Parameter.KEYWORD_ONLY:
            continue
        d = p.default
        if d is inspect.Parameter.empty:
            raise TypeError(
                f"@ugen parameter {name!r} needs a default to infer its type"
            )
        if isinstance(d, Param):
            # full declaration with hints: freq=pfloat(440.0, range=(20,
            # NYQUIST), logarithmic=True) — the keyword supplies the name
            # (the reference macro's #[param(range=…, logarithmic=…)],
            # knaster_macros/src/lib.rs:773-779)
            specs.append(
                d if d.name == name else dataclasses.replace(d, name=name)
            )
        elif isinstance(d, _Trig):
            specs.append(ptrigger(name))
        elif isinstance(d, bool):
            specs.append(pbool(name, d))
        elif isinstance(d, enum.IntEnum):
            specs.append(pinteger(name, int(d), enum=type(d)))
        elif isinstance(d, int):
            specs.append(pinteger(name, d))
        elif isinstance(d, float):
            specs.append(pfloat(name, d))
        else:
            raise TypeError(
                f"@ugen cannot infer a parameter type from default {d!r}"
            )
    return tuple(specs)


def _positional_adapter(fn: Callable):
    """Flexible-signature adapter (the reference macro lets user fns take
    any subset of ``(&mut AudioCtx, &mut UGenFlags, input)``,
    knaster_macros/src/lib.rs:824-870): the block function may declare any
    subset of the positional args ``ctx``/``state``/``inputs`` (recognized
    by name), in any order; missing ones simply aren't passed."""
    sig = inspect.signature(fn)
    names = [
        p.name for p in sig.parameters.values()
        if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                      inspect.Parameter.POSITIONAL_OR_KEYWORD)
    ]
    allowed = {"ctx", "state", "st", "inputs", "inp", "input"}
    unknown = [n for n in names if n not in allowed]
    if unknown:
        raise TypeError(
            f"@ugen positional args must be a subset of ctx/state/inputs, "
            f"got {unknown!r}"
        )
    canon = {"st": "state", "inp": "inputs", "input": "inputs"}
    order = [canon.get(n, n) for n in names]

    def call(ctx, st, inp, params):
        avail = {"ctx": ctx, "state": st, "inputs": inp}
        return fn(*[avail[n] for n in order], **params)

    return call, ("state" in order)


def ugen(
    inputs: int = 0,
    outputs: int = 1,
    state: Optional[Callable[[AudioCtx], dict]] = None,
    name: Optional[str] = None,
):
    """Build a UGen class from a block function (see module docstring)."""

    def deco(fn: Callable) -> Callable[..., UGen]:
        specs = _infer_params(fn, 3)
        call, takes_state = _positional_adapter(fn)

        class _FnUGen(UGen):
            params = specs

            def __init__(self, **defaults):
                self.inputs = inputs
                self.outputs = outputs
                for k in defaults:
                    if k not in {p.name for p in specs}:
                        raise TypeError(f"unknown parameter {k!r}")
                self.pdefaults = {
                    k: (v.value if hasattr(v, "value") else v)
                    for k, v in defaults.items()
                }

            def name(self):
                return name or fn.__name__

            def init(self, ctx: AudioCtx):
                return state(ctx) if state else {}

            def process(self, ctx, st, inp, params):
                result = call(ctx, st, inp, params)
                if not takes_state:
                    # stateless form: the fn returns just the output block
                    return st, result
                return result

        _FnUGen.__name__ = name or fn.__name__
        _FnUGen.__doc__ = fn.__doc__
        return _FnUGen

    return deco


def _ugen_sample(
    inputs: int = 0,
    outputs: int = 1,
    state: Optional[Callable[[AudioCtx], dict]] = None,
    name: Optional[str] = None,
):
    """Build a UGen from a per-sample function scanned over the block
    (the analog of the reference's default per-frame ``process``)."""

    def deco(fn: Callable) -> Callable[..., UGen]:
        specs = _infer_params(fn, 2)

        class _SampleUGen(UGen):
            params = specs

            def __init__(self, **defaults):
                self.inputs = inputs
                self.outputs = outputs
                for k in defaults:
                    if k not in {p.name for p in specs}:
                        raise TypeError(f"unknown parameter {k!r}")
                self.pdefaults = {
                    k: (v.value if hasattr(v, "value") else v)
                    for k, v in defaults.items()
                }

            def name(self):
                return name or fn.__name__

            def init(self, ctx: AudioCtx):
                return state(ctx) if state else {}

            def process(self, ctx, st, inp, params):
                B = ctx.block_size
                xs = dict(params)
                if inputs:
                    xs["__in"] = jnp.swapaxes(inp, 0, 1)

                def step(carry, x):
                    frame = x.pop("__in", jnp.zeros((0,), ctx.dtype))
                    return fn(carry, frame, **x)

                carry, ys = jax.lax.scan(
                    lambda c, x: step(c, dict(x)), st, xs, length=B
                )
                return carry, jnp.swapaxes(ys, 0, 1)

        _SampleUGen.__name__ = name or fn.__name__
        _SampleUGen.__doc__ = fn.__doc__
        return _SampleUGen

    return deco


ugen.sample = _ugen_sample
