"""Utility UGens (reference: knaster_core_dsp/src/ugens/util.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat, ptrigger


class Constant(UGen):
    """Emits a constant value; its ``value`` param is the target of
    audio-rate modulation in graph arithmetic (reference util.rs:37-67)."""

    inputs = 0
    outputs = 1
    params = (pfloat("value"),)

    def batch_key(self):
        return (type(self),)

    def __init__(self, value: float = 0.0):
        self.pdefaults = {"value": float(value)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        return state, params["value"][None, :].astype(ctx.dtype)

    def mosaic_stage(self, ctx: AudioCtx):
        def fn(inputs, state, params):
            return state, params["value"].astype(ctx.dtype)  # already [1, B]

        return fn


class DoneOnTrig(UGen):
    """Sets the done flag when it receives a trigger (reference util.rs:8-34).

    Use with ``Graph.push_with_done_action`` and a ``Done`` action that frees
    more than the current node.
    """

    may_set_done = True

    inputs = 0
    outputs = 0
    params = (ptrigger("t_done"),)

    def init(self, ctx):
        return {"triggered": jnp.zeros((), dtype=bool)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        trig = params["t_done"]
        # reference semantics: the trigger sets a flag; done is marked on the
        # next processed sample (= from the trigger frame here, one-block
        # latency collapsed since our triggers are sample-stamped).
        done = jnp.logical_or(trig, state["triggered"])
        new_state = {"triggered": jnp.logical_or(state["triggered"], jnp.any(trig))}
        out = jnp.zeros((0, ctx.block_size), dtype=ctx.dtype)
        return new_state, out, done


class LogProbe(UGen):
    """Taps a signal's value into the probe log every N samples
    (reference util.rs:70-95 LogProbe + rt_log).

    The graph compiler collects probe outputs into a device-side log buffer
    drained by the host (see knaster_tpu.core.log)."""

    inputs = 1
    outputs = 0
    params = ()

    def __init__(self, name: str = "probe", samples_between_logs: int | None = None):
        self.probe_name = name
        self.samples_between_logs = samples_between_logs

    def init(self, ctx):
        n = self.samples_between_logs or ctx.sample_rate
        return {
            "counter": jnp.zeros((), dtype=jnp.int32),
            "period": jnp.asarray(n, dtype=jnp.int32),
            "last_value": jnp.zeros((), dtype=ctx.dtype),
            "fired": jnp.zeros((), dtype=bool),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        t = jnp.arange(B, dtype=jnp.int32)
        period = state["period"]
        c0 = state["counter"]
        fires = (c0 + t) % period == 0
        any_fire = jnp.any(fires)
        first = jnp.argmax(fires)
        new_state = {
            "counter": (c0 + B) % period,
            "period": period,
            "last_value": jnp.where(any_fire, inputs[0][first], state["last_value"]),
            "fired": any_fire,
        }
        return new_state, jnp.zeros((0, B), dtype=ctx.dtype)
