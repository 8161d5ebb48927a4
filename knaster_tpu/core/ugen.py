"""The UGen protocol — the core abstraction of knaster_tpu.

TPU-native re-design of the reference's ``UGen`` trait
(knaster_core/src/ugen.rs:232-369). The key inversion: a reference UGen is a
mutable struct processed sample-by-sample on a realtime thread; here a UGen is
a *pure function over a block* plus an explicit state pytree, so the graph
compiler can fuse every node into one XLA program and ``vmap`` thousands of
voices across VPU lanes.

Contract
--------
A UGen instance holds only **static configuration** (Python numbers, enums,
numpy tables). Runtime state lives in the pytree returned by :meth:`init`.

* ``inputs`` / ``outputs`` — channel counts (ints; reference uses typenums).
* ``params`` — tuple of :class:`~knaster_tpu.primitives.params.Param`
  declarations, in order (parity with ``#[impl_ugen]``'s generated table).
* ``init(ctx) -> state`` — allocate the state pytree (called on the control
  side, allocation allowed; reference ugen.rs:247).
* ``process(ctx, state, inputs, params) -> (state, out[, done])`` — process
  one block. ``inputs`` is ``f[inputs, block]``; ``params`` maps param name →
  per-sample array of shape ``[block]`` (float32 for floats, bool for
  triggers, int32 for integer/bool params). ``out`` is ``f[outputs, block]``.
  ``done`` (optional) is ``bool[block]``, True at the frame where the UGen
  signals completion (reference UGenFlags::mark_done, ugen.rs:121-224).

Because every parameter arrives as a *per-sample* array, the reference's
WrSmoothParams / WrArParams / WrPreciseTiming block-splitting machinery
(knaster_core_dsp/src/wrappers_core/*) is subsumed by the graph's parameter
engine: a UGen that reads ``params["freq"]`` per sample is automatically
sample-accurate, smoothable and audio-rate-modulatable.

UGens written per-sample use :func:`sample_scan` (the analog of the
reference's default ``process_block`` loop, ugen.rs:263-284); UGens with a
closed block form (oscillator phase via cumsum, stateless math) override with
vectorized code — the analog of the reference's hand-vectorized
``process_block`` overrides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..primitives.params import Param
from .signature import DEFAULT_SIGNATURE_EXCLUDE


@dataclass(frozen=True)
class AudioCtx:
    """Static per-graph context (reference: knaster_core/src/ugen.rs:8 AudioCtx).

    Everything here is static at trace time — XLA specializes the program on
    it. The running frame clock is carried in the graph state instead.
    """

    sample_rate: int = 48000
    block_size: int = 64
    dtype: Any = np.float32
    # True inside the event-free fast program: every trigger param is
    # statically all-False, so nodes may skip trigger machinery entirely
    # (e.g. oscillators drop the segmented-reset cumsum's gathers). Purely
    # an optimization hint — behavior must match no_events=False with
    # all-False triggers.
    no_events: bool = False
    # True when process() runs under a WIDE vmap (e.g. a multi-thousand-voice
    # bank): per-sample scans there fuse into one on-chip loop and beat
    # closed forms that materialize [V, B] planes through HBM (measured:
    # bare envelopes 9.2G vs 2.5G voice-samples/s at 32k voices on a v5e).
    # Purely an optimization hint — must not change behavior.
    wide_batch: bool = False

    @property
    def nyquist(self) -> float:
        return self.sample_rate / 2.0


class UGen:
    """Base class for unit generators. See module docstring for the contract."""

    inputs: int = 0
    outputs: int = 1
    params: Tuple[Param, ...] = ()
    # Nodes with a private event channel (e.g. VoiceBank's per-voice events)
    # set this > 0; the compiler then passes an `events` kwarg to process()
    # built by empty_node_events / node_events_from_lists.
    event_capacity: int = 0
    # True when ``process`` over one block of k*B samples equals k calls of
    # B samples (state carried through). Almost every UGen is — phase cumsums,
    # scans and closed forms are length-parametric. Set False on instances
    # whose algorithm treats "the block" semantically (e.g. blockwise delay
    # modes that read the previous block's buffer); such nodes exclude their
    # graph from the multi-block superblock fast path (compile.build_super).
    block_invariant: bool = True
    # True when ``process`` can return a done mask (envelopes, buffer
    # readers, DoneOnTrig, user closures). The Pallas chain executor
    # (graph/chain_kernel.py) then expects the unit's mosaic_stage body
    # (if any) to return a third element: a [1, B] 0/1 done row.
    may_set_done: bool = False
    # Instance attributes that are runtime DATA, not trace config: excluded
    # from the structural signature (core/signature.py) so graphs differing
    # only in them share cached programs. Only safe for values consumed
    # exclusively as state/parameter data (``init()`` outputs, param-engine
    # defaults) — anything ``process`` reads at trace time must stay in.
    signature_exclude: Tuple[str, ...] = DEFAULT_SIGNATURE_EXCLUDE

    def empty_node_events(self, dtype=np.float32):
        raise NotImplementedError

    def node_events_from_lists(self, events, dtype=np.float32):
        raise NotImplementedError

    def batch_key(self):
        """Key for the compiler's auto-batching pass, or None.

        Nodes at the same dataflow depth whose batch_key is equal (and not
        None) are executed as ONE vmapped call — the optimization that makes
        a graph of hundreds of small same-type nodes (the reference's
        256-sines benchmark shape) run at VPU width instead of op-by-op.

        Return None (default) if ``process`` reads instance attributes that
        can differ between instances (tables, lengths, nested UGens);
        otherwise return a tuple identifying everything ``process`` closes
        over. State shapes must be identical for equal keys."""
        return None

    # ---- overridable ------------------------------------------------------
    def init(self, ctx: AudioCtx):
        """Return the initial state pytree. Default: stateless."""
        return {}

    def process(self, ctx: AudioCtx, state, inputs, params):
        raise NotImplementedError

    def mosaic_stage(self, ctx: AudioCtx):
        """Optional Mosaic-traceable stage body for the Pallas chain
        executor (graph/chain_kernel.py), or None (default).

        When a collapsed chain's every unit provides one, the event-free
        fast program runs the whole stage loop inside ONE Pallas kernel
        (block rows carried in VMEM) instead of a lax.scan of XLA ops.

        Returns ``fn(inputs, state, params) -> (new_state, out)`` with
        kernel-shaped values: ``inputs`` [in_ch, B]; ``state`` leaves
        [1, n] (n = the leaf's flattened per-node size, scalars -> [1, 1]);
        ``params`` maps each float/int param name to a [1, B] row; ``out``
        [outputs, B]. UGens with ``may_set_done`` return a third element:
        a [1, B] done mask as 0/1 rows in ``ctx.dtype`` (bool planes don't
        lower to kernel outputs) — the executor materializes it per stage
        and feeds the host's free/mortality machinery exactly like the
        scan executor's done masks. The body must be equivalent to
        ``process`` under the fast program's guarantees (no events:
        triggers never fire, int-set masks are all-false) and restricted
        to Mosaic-supported ops (elementwise/VPU math, lane reductions,
        static shapes, no gathers)."""
        return None

    # ---- introspection ----------------------------------------------------
    def param_index(self, name_or_idx) -> int:
        if isinstance(name_or_idx, int):
            if not 0 <= name_or_idx < len(self.params):
                raise KeyError(f"param index {name_or_idx} out of range")
            return name_or_idx
        for i, p in enumerate(self.params):
            if p.name == name_or_idx:
                return i
        raise KeyError(f"{type(self).__name__} has no parameter {name_or_idx!r}")

    def param_names(self) -> Tuple[str, ...]:
        return tuple(p.name for p in self.params)

    def name(self) -> str:
        return type(self).__name__

    # ---- fluent wrapper combinators (parity with UGenWrapperCoreExt,
    #      knaster_core_dsp/src/wrappers_core.rs:26-120) ---------------------
    def wr_mul(self, c):
        from ..wrappers.math import WrMul

        return WrMul(self, c)

    def wr_add(self, c):
        from ..wrappers.math import WrAdd

        return WrAdd(self, c)

    def wr_sub(self, c):
        from ..wrappers.math import WrSub

        return WrSub(self, c)

    def wr_v_sub(self, c):
        from ..wrappers.math import WrVSub

        return WrVSub(self, c)

    def wr_div(self, c):
        from ..wrappers.math import WrDiv

        return WrDiv(self, c)

    def wr_v_div(self, c):
        from ..wrappers.math import WrVDiv

        return WrVDiv(self, c)

    def wr_powf(self, c):
        from ..wrappers.math import WrPowf

        return WrPowf(self, c)

    def wr_powi(self, c):
        from ..wrappers.math import WrPowi

        return WrPowi(self, int(c))

    def wr(self, fn):
        from ..wrappers.math import WrClosure

        return WrClosure(self, fn)

    # In the reference these opt into per-node features
    # (wrappers_core/smooth_params.rs, audio_rate.rs, precise_timing.rs).
    # In knaster_tpu the parameter engine provides smoothing, audio-rate and
    # sample-accurate changes natively for every node, so these are identity
    # combinators kept for API familiarity.
    def smooth_params(self):
        return self

    def ar_params(self):
        return self

    def precise_timing(self, max_changes_per_block: int = 0):
        return self

    def __repr__(self):
        return (
            f"<{type(self).__name__} in={self.inputs} out={self.outputs} "
            f"params={[p.name for p in self.params]}>"
        )


# ---------------------------------------------------------------------------
# Helpers for writing UGens
# ---------------------------------------------------------------------------

def zeros_block(ctx: AudioCtx, channels: int) -> jnp.ndarray:
    return jnp.zeros((channels, ctx.block_size), dtype=ctx.dtype)


def ensure_done(done, ctx: AudioCtx):
    if done is None:
        return jnp.zeros((ctx.block_size,), dtype=bool)
    return done


def normalize_process_result(result, ctx: AudioCtx):
    """Normalize a process() return to (state, out, done[block])."""
    if len(result) == 2:
        state, out = result
        done = None
    else:
        state, out, done = result
    return state, out, ensure_done(done, ctx)


def sample_scan(
    fn: Callable,
    state,
    ctx: AudioCtx,
    inputs: Optional[jnp.ndarray] = None,
    params: Optional[Dict[str, jnp.ndarray]] = None,
    n_out: int = 1,
    with_done: bool = False,
):
    """Run a per-sample function over one block with ``lax.scan``.

    The TPU analog of the reference's default ``process_block`` loop
    (knaster_core/src/ugen.rs:263-284). ``fn(carry, frame) -> (carry, out)``
    or ``(carry, (out, done))`` when ``with_done``; ``frame`` is a dict with
    ``frame["in"]`` = ``f[inputs]`` and one entry per param (scalars).

    Prefer closed-form/vectorized ``process`` implementations where possible —
    use this for genuinely sequential recurrences (envelope state machines,
    data-dependent feedback).
    """
    xs: Dict[str, jnp.ndarray] = {}
    if inputs is not None and inputs.shape[0] > 0:
        xs["in"] = jnp.swapaxes(inputs, 0, 1)  # [block, ch]
    if params:
        for k, v in params.items():
            xs[k] = v

    def body(carry, x):
        return fn(carry, x)

    carry, ys = jax.lax.scan(body, state, xs, length=ctx.block_size)
    if with_done:
        out, done = ys
        return carry, jnp.swapaxes(out, 0, 1), done
    return carry, jnp.swapaxes(ys, 0, 1)
