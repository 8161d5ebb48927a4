"""Generic fused-kernel voice bank: ANY voice with a per-sample Mosaic body.

The four hand-written banks in pallas_bank.py each pair one voice model with
~170 lines of kernel + operand staging. This module factors the harness out:
a voice UGen opts in by implementing ``mosaic_voice(ctx)`` (a ~15-line
per-sample body over voice tiles, see :class:`MosaicVoiceSpec`), and
:class:`PallasVoiceBank` supplies everything else — the anchored-ramp /
burst-breakpoint event machinery (sample-accurate per-voice float sets,
smoothing ramps, triggers, smoothing-config freezes; identical semantics to
``VoiceBank``/the graph engine), packed trigger words, [rows, 128] voice
tiling with grid walking, VMEM state carry, active masking, and the stereo
mix-down. This is the bank-scale analog of the chain executor's
``UGen.mosaic_stage`` (graph/chain_kernel.py): the harness is generic, the
per-voice sound is a small pure function.

The reference's equivalent extension point is "write a UGen struct and a
process loop" (knaster_core/src/ugen.rs:232-369); here the same effort buys
a kernel that batches 100k+ voices across VPU lanes.

Exactness: the body receives the SAME materialized per-sample params
(``_mat``) and trigger bits (``_trig_bit``) the hand-written kernels use, so
a body that mirrors a hand kernel's math is bit-identical to it, and within
float-rounding of the composable vmap path (tests pin both). The active
mask is exactly 0 or 1, applied per sample in the harness — exact under
multiplication in any order.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx
from .pallas_bank import (
    LANES,
    MAX_BLOCK,
    N_EVENTFUL,
    N_FAST,
    _bank_setup,
    _cap_tile_rows,
    _eventful_tile_rows,
    _check_block,
    _extra_specs,
    _grid3,
    _mat,
    _op_specs,
    _sample_loop,
    _trig_bit,
    _unroll,
)
from .voicebank import VoiceBank


@dataclass
class MosaicVoiceSpec:
    """What a voice's ``mosaic_voice(ctx)`` returns.

    carry: ordered {name: (dtype, init_scalar)} — per-voice scalar state,
        carried through the sample loop as [rows, LANES] tiles (one scalar
        per voice; array-per-voice state such as delay lines is not
        expressible in this harness — keep those voices on the vmap path).
    body: ``body(i_f, carry, P, T) -> (carry', out_rows)`` — ONE sample for
        every voice in the tile. ``i_f`` is the sample index as float32;
        ``carry`` is {name: [rows, LANES]}; ``P[name]`` materializes float
        param ``name`` at this sample (anchored ramps + burst breakpoints,
        exactly the engine's trajectories); ``T[name]`` is the trigger's
        bool rows — or ``None`` in event-free blocks (triggers only arrive
        via events), so bodies branch statically on ``is None`` and the
        trigger plumbing vanishes from the fast program. ``out_rows`` is a
        tuple of ``voice.outputs`` rows; the harness masks inactive voices
        and mix-sums across the bank. Restrict ops to the Mosaic-friendly
        set (elementwise jnp, jnp.sin/cos, pltpu.bitcast, the pallas_bank
        helpers _sin_quant/_to_inc/_env_ar/_env_asr...).
    idle_of: optional ``carry -> bool rows`` evaluated on the final carry —
        marks voices whose envelope has stopped (VoicePool auto-release).
    """

    carry: Dict[str, Tuple]
    body: Callable
    idle_of: Optional[Callable] = None


class _ParamView:
    """P[name] -> materialized [rows, LANES] float param at this sample,
    cached so repeated reads trace one _mat per param per sample."""

    def __init__(self, i_f, groups):
        self._i_f = i_f
        self._groups = groups
        self._cache = {}

    def __getitem__(self, name):
        if name not in self._cache:
            self._cache[name] = _mat(self._i_f, self._groups[name])
        return self._cache[name]


def _generic_kernel(B, ng, fnames, carry_names, trig_names, C, body_fn,
                    unroll, *refs):
    eventful = ng == N_EVENTFUL
    nf, nc, nt = len(fnames), len(carry_names), len(trig_names)
    pos = 0
    groups = {}
    for name in fnames:
        groups[name] = refs[pos:pos + ng]
        pos += ng
    carry_refs = refs[pos:pos + nc]
    pos += nc
    act_ref = refs[pos]
    pos += 1
    n_words = nt if eventful else 0
    words = refs[pos:pos + n_words]
    pos += n_words
    out_refs = refs[pos:pos + C]
    carry_out = refs[pos + C:pos + C + nc]

    def loop_body(i, carry):
        i_f = i.astype(jnp.float32)
        P = _ParamView(i_f, groups)
        T = {
            name: (_trig_bit(i, words[k]) if eventful else None)
            for k, name in enumerate(trig_names)
        }
        new_carry, rows = body_fn(i_f, dict(zip(carry_names, carry)), P, T)
        act = act_ref[:]
        for c in range(C):
            out_refs[c][0, i, :] = jnp.sum(rows[c] * act, axis=0)
        return tuple(new_carry[name] for name in carry_names)

    final = _sample_loop(
        B, loop_body, tuple(r[:] for r in carry_refs), unroll
    )
    for ref, val in zip(carry_out, final):
        ref[:] = val


# Mosaic-validation verdicts per kernel structure (chain_kernel._validated's
# role): a body is only known to lower by compiling it, and a failure inside
# the graph program would kill the whole compile — so the kernel is compiled
# standalone once per structure, with a clear error naming the voice.
_VALIDATED: Dict[Tuple, bool] = {}


def _validate(kernel_call, voice, operands, B) -> None:
    key = (
        type(voice).__qualname__,
        tuple((tuple(x.shape), str(x.dtype)) for x in operands),
        B,
    )
    ok = _VALIDATED.get(key)
    if ok is None:
        try:
            shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in operands]
            jax.jit(kernel_call).lower(*shapes).compile()
            ok = True
        except Exception as e:  # noqa: BLE001 — report whatever Mosaic said
            _VALIDATED[key] = False
            raise RuntimeError(
                f"{type(voice).__name__}.mosaic_voice body failed Mosaic "
                f"lowering on this backend — keep this voice on the vmap "
                f"VoiceBank path, or restrict the body to the documented op "
                f"subset (see MosaicVoiceSpec). Backend said: {e}"
            ) from e
        _VALIDATED[key] = ok
    elif not ok:
        raise RuntimeError(
            f"{type(voice).__name__}.mosaic_voice body failed Mosaic "
            f"lowering on this backend (cached verdict) — use the vmap "
            f"VoiceBank path for this voice."
        )


class PallasVoiceBank(VoiceBank):
    """Fused-kernel bank for ANY voice implementing ``mosaic_voice``.

    Drop-in for ``VoiceBank(voice, n)`` with the hand-written banks'
    performance class: state in VMEM tiles, voices across the 8x128 vector
    lanes, the sample loop as a register loop, params materialized
    per-sample from ramp groups instead of [V, B] planes through HBM.

    Restrictions (checked at construction): float + trigger params only
    (per-voice int-set machinery is not materialized in-kernel), scalar
    per-voice carry state, block-invariant voices. Mosaic-rejection of a
    body raises with the voice's name at first use (on-CPU tests run the
    pallas interpreter, which accepts everything)."""

    kernel_burst_depth = 3
    superblock_cap = MAX_BLOCK

    def __init__(self, voice, n_voices: int, voice_defaults=None,
                 event_capacity: int = 256, tile_rows: int = 128,
                 kernel_burst_depth: int = 3):
        if not hasattr(voice, "mosaic_voice"):
            raise ValueError(
                f"{type(voice).__name__} has no mosaic_voice body — use "
                f"VoiceBank (vmap) for this voice"
            )
        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(
                f"n_voices must be a multiple of {tile_rows * LANES}"
            )
        super().__init__(
            voice, n_voices, voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        if self._int_names:
            raise ValueError(
                "PallasVoiceBank supports float + trigger params only; "
                f"{voice.name()} has integer params {self._int_names} — "
                "use VoiceBank (vmap)"
            )
        if not getattr(voice, "block_invariant", True):
            raise ValueError(
                "PallasVoiceBank needs a block-invariant voice "
                "(per-sample bodies are by construction; this voice "
                "declares otherwise)"
            )
        self.tile_rows = int(tile_rows)
        if int(kernel_burst_depth) < 1:
            raise ValueError("kernel_burst_depth must be >= 1")
        self.kernel_burst_depth = int(kernel_burst_depth)

    def name(self):
        return f"PallasVoiceBank[{self.n_voices}x{self.voice.name()}]"

    def make_local(self, n_local: int) -> "PallasVoiceBank":
        return PallasVoiceBank(
            self.voice, n_local, event_capacity=self.event_capacity,
            tile_rows=min(self.tile_rows, max(n_local // LANES, 1)),
            kernel_burst_depth=self.kernel_burst_depth,
        )

    def _spec(self, ctx: AudioCtx) -> MosaicVoiceSpec:
        return self.voice.mosaic_voice(ctx)

    def init(self, ctx: AudioCtx):
        _check_block(ctx, "PallasVoiceBank")
        base = super().init(ctx)
        spec = self._spec(ctx)
        R = self.n_voices // LANES
        for cname, (dtype, init_val) in spec.carry.items():
            if cname in base:
                raise ValueError(
                    f"mosaic carry name {cname!r} collides with bank state"
                )
            base[cname] = jnp.full((R, LANES), init_val, dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        B = ctx.block_size
        R = self.n_voices // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype
        spec = self._spec(ctx)
        carry_names = tuple(spec.carry)
        C = self.voice.outputs

        fstate, ivals, active, ramp_ops, ng, _atk, _rel, act, \
            idle = _bank_setup(self, ctx, state, events)

        extras = tuple(state[cname] for cname in carry_names) + (act,)
        if ng != N_FAST:
            extras = extras + tuple(
                _grid3(self, self._packed_trigs(ctx, events,
                                                self.trig_index(name)))
                for name in self._trig_names
            )
            TR = _eventful_tile_rows(TR, R, len(self._float_names))
            n_tiles = R // TR

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        out_shape = tuple(
            jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype)
            for _ in range(C)
        ) + tuple(
            jax.ShapeDtypeStruct((R, LANES), spec.carry[cname][0])
            for cname in carry_names
        )
        out_specs = tuple(
            pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(C)
        ) + tuple(tile() for _ in carry_names)
        kernel_call = pl.pallas_call(
            functools.partial(
                _generic_kernel, B, ng, tuple(self._float_names),
                carry_names, tuple(self._trig_names), C, spec.body,
                _unroll(B, interpret),
            ),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=out_shape,
            out_specs=out_specs,
            interpret=interpret,
        )
        operands = tuple(ramp_ops) + extras
        if not interpret:
            _validate(kernel_call, self.voice, operands, B)
        results = kernel_call(*operands)

        out = jnp.stack(
            [jnp.sum(results[c], axis=(0, 2)) for c in range(C)]
        )  # [C, B]
        new_carry = dict(zip(carry_names, results[C:]))
        if spec.idle_of is not None:
            idle = idle | spec.idle_of(new_carry).reshape(-1)
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B
        )
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
            "ivals": ivals, "active": active, "idle": idle,
            **new_carry,
        }
        return new_state, out
