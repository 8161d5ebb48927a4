"""Ad-hoc UGens from plain functions (reference: ugens/closure.rs UGenClosure).

Any jax-traceable function over blocks (or per-sample, wrapped in a scan)
becomes a UGen — the Python analog of the reference's closure-to-UGen
conversions for arities U1..U8.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import Param


class ClosureUGen(UGen):
    """UGen from a block function ``fn(ctx, state, inputs, params)``.

    ``fn`` may return ``out``, ``(state, out)`` or ``(state, out, done)``;
    ``inputs`` is ``[inputs, block]``, out must be ``[outputs, block]``."""

    may_set_done = True

    def __init__(
        self,
        fn: Callable,
        inputs: int = 0,
        outputs: int = 1,
        params: Tuple[Param, ...] = (),
        init_state: Optional[Callable] = None,
        name: str = "Closure",
    ):
        self.fn = fn
        self.inputs = int(inputs)
        self.outputs = int(outputs)
        self.params = tuple(params)
        self._init_state = init_state
        self._name = name

    def name(self) -> str:
        return self._name

    def init(self, ctx: AudioCtx):
        return self._init_state(ctx) if self._init_state else {}

    def process(self, ctx: AudioCtx, state, inputs, params):
        result = self.fn(ctx, state, inputs, params)
        if isinstance(result, tuple):
            return result
        return state, result


def ugen_from_sample_fn(
    fn: Callable,
    inputs: int = 0,
    outputs: int = 1,
    name: str = "SampleClosure",
) -> ClosureUGen:
    """UGen from a per-sample function ``fn(frame [inputs]) -> [outputs]``
    (stateless), scanned over the block. For stateful per-sample closures use
    ClosureUGen with an explicit lax.scan."""

    def block_fn(ctx, state, inp, params):
        if inputs == 0:
            frames = jnp.zeros((ctx.block_size, 0), ctx.dtype)
        else:
            frames = jnp.swapaxes(inp, 0, 1)
        out = jax.vmap(fn)(frames)  # stateless: vmap IS the sample loop
        return state, jnp.swapaxes(out, 0, 1)

    return ClosureUGen(block_fn, inputs, outputs, (), None, name)
