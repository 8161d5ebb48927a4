"""The parameter engine: sample-accurate, smoothable, schedulable parameters.

This module replaces three reference subsystems with one TPU-native mechanism:

* ``WrPreciseTiming`` (knaster_core_dsp/src/wrappers_core/precise_timing.rs):
  sample-accurate changes by *splitting blocks* at event frames.
* ``WrSmoothParams`` (wrappers_core/smooth_params.rs): linear ramps, at audio
  rate (per-sample) or block rate (stair-step at block starts).
* the audio-thread side of parameter scheduling
  (knaster_graph/src/graph_gen.rs:143-166, scheduling.rs).

Instead of splitting blocks, every float parameter is **materialized as a
per-sample array** ``[P, block]`` on device from carried ramp state plus a
padded tensor of scheduled events. Masked ramps are nearly free on the VPU,
and the result is exact: a change scheduled at frame ``f`` takes effect at
sample ``f``, reproducing the reference's
``[0,0,0,0,0,5,6,6,8,9,10,...]`` sample-accuracy test
(wrappers_core.rs ``sample_accurate_parameters_test``).

Event model (per block, statically padded to a capacity):
  float events: (frame, slot, value, kind, smode, sdur, srate)
      kind 0 = set value (immediate, or ramped if the slot has smoothing
               configured), kind 1 = configure smoothing. Configuring
               smoothing freezes any in-flight ramp at its current value,
               matching WrSmoothParams::set_smoothing.
  trigger events: (frame, slot) — a True at exactly that sample.
  int events: (frame, slot, value) — step change from that sample onward.

Slots with no events ride their carried ramp; state is carried across blocks
as (value, target, step, elapsed, dur, smode, sdur, srate). Ramps are
**anchored**: ``value`` is the ramp's start value (the trajectory value at the
set event's frame) and ``elapsed`` counts integer samples since that frame, so
every materialization computes ``anchor + step * absolute_progress`` in ONE
float rounding. Any partition of the stream into blocks/superblocks therefore
produces bit-identical rows AND bit-identical carried state — the per-block
path, the eventful-superblock program and the fast multi-block program cannot
drift apart (sequentially advancing a current-value carry re-rounds per block
and diverges at the ULP level, which phase-accumulating consumers like
oscillators amplify audibly).

Known deliberate divergence from the reference: for *block-rate* smoothing the
reference advances the ramp clock by one full block even when the change
arrives mid-block; we advance it by the actual number of frames elapsed since
the event. Both update values only at block boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SMOOTH_NONE = 0
SMOOTH_LINEAR = 1
RATE_AUDIO = 0
RATE_BLOCK = 1

KIND_SET = 0
KIND_SMOOTH_CFG = 1


@dataclass
class ParamLayout:
    """Static mapping from (node_id, param_index) to engine slots."""

    # (node_id, param_idx) -> ("float"|"trigger"|"int", slot)
    slots: Dict[Tuple[int, int], Tuple[str, int]] = field(default_factory=dict)
    n_float: int = 0
    n_trig: int = 0
    n_int: int = 0
    # defaults, indexed by slot
    float_defaults: List[float] = field(default_factory=list)
    int_defaults: List[int] = field(default_factory=list)

    def add(self, node_id: int, param_idx: int, ptype: str, default) -> int:
        if ptype == "float":
            slot = self.n_float
            self.n_float += 1
            self.float_defaults.append(float(default))
            self.slots[(node_id, param_idx)] = ("float", slot)
        elif ptype == "trigger":
            slot = self.n_trig
            self.n_trig += 1
            self.slots[(node_id, param_idx)] = ("trigger", slot)
        elif ptype in ("integer", "bool"):
            slot = self.n_int
            self.n_int += 1
            self.int_defaults.append(int(default))
            self.slots[(node_id, param_idx)] = ("int", slot)
        else:
            raise ValueError(ptype)
        return slot

    def lookup(self, node_id: int, param_idx: int) -> Tuple[str, int]:
        return self.slots[(node_id, param_idx)]


def init_state(layout: ParamLayout, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    # note: value/target must be distinct buffers — the render fn donates its
    # state argument and XLA rejects donating one buffer twice
    fd = np.asarray(layout.float_defaults, dtype=dtype)
    return {
        "value": jnp.asarray(fd.copy()),
        "target": jnp.asarray(fd.copy()),
        "step": jnp.zeros((layout.n_float,), dtype=dtype),
        "elapsed": jnp.zeros((layout.n_float,), dtype=jnp.int32),
        "dur": jnp.zeros((layout.n_float,), dtype=jnp.int32),
        "smode": jnp.zeros((layout.n_float,), dtype=jnp.int32),
        "sdur": jnp.zeros((layout.n_float,), dtype=jnp.int32),
        "srate": jnp.zeros((layout.n_float,), dtype=jnp.int32),
        "int_value": jnp.asarray(layout.int_defaults, dtype=jnp.int32),
    }


def empty_events_np(capacity: int, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Host-side (numpy) all-padding event tensors — build events here, NOT
    by round-tripping the device constants (each np.array(jnp_array) is a
    device→host fetch, ~RTT each over a remote-TPU tunnel)."""
    E = capacity
    zi = np.zeros((E,), dtype=np.int32)
    return {
        "f_frame": zi.copy(),
        "f_slot": np.full((E,), -1, dtype=np.int32),
        "f_value": np.zeros((E,), dtype=dtype),
        "f_kind": zi.copy(),
        "f_smode": zi.copy(),
        "f_sdur": zi.copy(),
        "f_srate": zi.copy(),
        "t_frame": zi.copy(),
        "t_slot": np.full((E,), -1, dtype=np.int32),
        "i_frame": zi.copy(),
        "i_slot": np.full((E,), -1, dtype=np.int32),
        "i_value": zi.copy(),
    }


def empty_events(capacity: int, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    """All-padding event tensors (slot == -1 means 'no event')."""
    E = capacity
    zi = jnp.zeros((E,), dtype=jnp.int32)
    return {
        "f_frame": zi,
        "f_slot": jnp.full((E,), -1, dtype=jnp.int32),
        "f_value": jnp.zeros((E,), dtype=dtype),
        "f_kind": zi,
        "f_smode": zi,
        "f_sdur": zi,
        "f_srate": zi,
        "t_frame": zi,
        "t_slot": jnp.full((E,), -1, dtype=jnp.int32),
        "i_frame": zi,
        "i_slot": jnp.full((E,), -1, dtype=jnp.int32),
        "i_value": zi,
    }


def events_from_lists(
    capacity: int,
    float_events: List[Tuple[int, int, float, int, int, int, int]],
    trig_events: List[Tuple[int, int]],
    int_events: List[Tuple[int, int, int]],
    dtype=np.float32,
) -> Dict[str, jnp.ndarray]:
    """Host-side helper: pack python event lists into padded tensors.

    ``float_events`` entries: (frame, slot, value, kind, smode, sdur, srate),
    sorted by frame (stable in send order).
    """
    if (
        len(float_events) > capacity
        or len(trig_events) > capacity
        or len(int_events) > capacity
    ):
        raise ValueError(
            f"more than {capacity} events in one block; raise "
            f"GraphOptions.event_capacity"
        )
    ev = empty_events_np(capacity, dtype)
    for i, (f, s, v, k, m, d, r) in enumerate(sorted(float_events, key=lambda e: e[0])):
        ev["f_frame"][i] = f
        ev["f_slot"][i] = s
        ev["f_value"][i] = v
        ev["f_kind"][i] = k
        ev["f_smode"][i] = m
        ev["f_sdur"][i] = d
        ev["f_srate"][i] = r
    for i, (f, s) in enumerate(trig_events):
        ev["t_frame"][i] = f
        ev["t_slot"][i] = s
    for i, (f, s, v) in enumerate(sorted(int_events, key=lambda e: e[0])):
        ev["i_frame"][i] = f
        ev["i_slot"][i] = s
        ev["i_value"][i] = v
    # stays numpy: uploaded when the render call consumes it (converting to
    # device arrays here would also block stacking for the chunked scans)
    return ev


class PEngine:
    """Bound parameter engine for a fixed layout (created per compiled graph).

    ``native_block`` is the graph's semantic block size: block-rate smoothing
    stairs at its boundaries even when the engine materializes a larger
    superblock (``block_size`` = k * native_block, the event-free multi-block
    fast path)."""

    def __init__(self, layout: ParamLayout, block_size: int, dtype=np.float32,
                 native_block: Optional[int] = None):
        self.layout = layout
        self.block_size = int(block_size)
        self.native_block = int(native_block or block_size)
        self.dtype = dtype

    # -- jax-traced -------------------------------------------------------
    def materialize(self, state, events):
        """Returns (pf, pt, pi, pset, new_state): per-sample float/trigger/int
        parameter arrays plus the int set-event mask (True at the frame an
        int set event lands — param_apply-per-event parity for retrigger
        params like Envelope.jump_to_segment)."""
        pf, fstate = self._materialize_floats(state, events)
        pt = self._materialize_triggers(events)
        pi, pset, int_value = self._materialize_ints(state, events)
        new_state = dict(fstate)
        new_state["int_value"] = int_value
        return pf, pt, pi, pset, new_state

    def materialize_rows_fast(self, state, idx):
        """[len(idx), B] per-sample values for the given float slots,
        computed straight from the ramp state — the no-events program's
        param access. Gathering the tiny [n] ramp vectors and materializing
        in place avoids both the [slots, B] intermediate and the [n, B]
        row gathers that dominated the generic-graph block program."""
        B = self.block_size
        nb = self.native_block
        dtype = self.dtype
        t = jnp.arange(B, dtype=jnp.int32)
        anchor = state["value"][idx]
        target = state["target"][idx]
        step = state["step"][idx]
        E = state["elapsed"][idx]
        dur = state["dur"][idx]
        srate = state["srate"][idx]
        ar = E[:, None] + t[None, :]
        br = E[:, None] + (t[None, :] // nb) * nb
        prog = jnp.where((srate == RATE_AUDIO)[:, None], ar, br)
        return jnp.where(
            prog >= dur[:, None],
            target[:, None],
            anchor[:, None] + step[:, None] * prog.astype(dtype),
        )

    def advance_fast(self, state):
        """The pe-state carry after one (super)block of event-free ramping,
        without materializing any per-sample plane (what the fast program's
        sequential per-block stepping would produce)."""
        B = self.block_size
        dur = state["dur"]
        return {
            "value": state["value"],
            "target": state["target"],
            "step": state["step"],
            # clamping at dur keeps the carry bit-identical between one
            # superblock advance and k native-block advances (integers)
            "elapsed": jnp.minimum(state["elapsed"] + B, dur),
            "dur": dur,
            "smode": state["smode"],
            "sdur": state["sdur"],
            "srate": state["srate"],
            "int_value": state["int_value"],
        }

    def _materialize_floats(self, state, events):
        B = self.block_size
        Pf = self.layout.n_float
        dtype = self.dtype
        if Pf == 0:
            return jnp.zeros((0, B), dtype=dtype), {
                k: state[k] for k in ("value", "target", "step", "elapsed",
                                       "dur", "smode", "sdur", "srate")
            }
        t = jnp.arange(B + 1, dtype=jnp.int32)  # one-past-end for c_f reads

        anchor = state["value"]
        target = state["target"]
        step = state["step"]
        el0 = state["elapsed"]
        dur0 = state["dur"]
        smode = state["smode"]
        sdur = state["sdur"]
        srate = state["srate"]

        # Base ramp (no events): audio-rate advances per sample; block-rate
        # holds within each NATIVE block and advances at its boundary.
        # ``(t // nb) * nb`` is the stair: at the engine's native size
        # (nb == B) it is 0 within the block and B at the one-past-end
        # sample, and at superblock sizes (the eventful-superblock program,
        # nb < B) it steps at every native-block boundary. Progress is the
        # ABSOLUTE sample count since the ramp's anchor frame (``elapsed``
        # carries it across blocks), so the value at any sample is
        # ``anchor + step * progress`` in one rounding — bit-identical for
        # every block partition. When the ramp completes (progress reaches
        # ``dur``) we snap to `target` exactly — parity with the reference
        # computing start + mix*(end-start) with mix clamped to 1
        # (smooth_params.rs).
        nb = self.native_block
        ar_prog = el0[:, None] + t[None, :]
        br_prog = el0[:, None] + (t[None, :] // nb) * nb
        prog = jnp.where((srate == RATE_AUDIO)[:, None], ar_prog, br_prog)
        ramp_done = prog >= dur0[:, None]
        vals = jnp.where(
            ramp_done,
            target[:, None],
            anchor[:, None] + step[:, None] * prog.astype(dtype),
        )

        el_next = jnp.minimum(el0 + B, dur0)
        dur_next = dur0

        E = events["f_slot"].shape[0]
        carry = (vals, anchor, target, step, el_next, dur_next,
                 smode, sdur, srate)

        def body(e, carry):
            (vals, anchor, target, step, el_next, dur_next,
             smode, sdur, srate) = carry
            s_raw = events["f_slot"][e]
            valid = s_raw >= 0
            s = jnp.maximum(s_raw, 0)
            f = events["f_frame"][e]
            v = events["f_value"][e].astype(dtype)
            kind = events["f_kind"][e]

            row = vals[s]  # [B+1]
            c_f = row[f]  # ramp value at the event frame (before this event)

            mode = smode[s]
            cfg_dur = sdur[s]
            slot_rate = srate[s]

            is_cfg = kind == KIND_SMOOTH_CFG
            is_ramp_set = (kind == KIND_SET) & (mode == SMOOTH_LINEAR) & (cfg_dur > 0)

            dur = jnp.maximum(cfg_dur, 1)
            stp = (v - c_f) / dur.astype(dtype)
            ar_p = jnp.clip(t - f, 0, dur)
            # block-rate set events stair at native-block boundaries after
            # the landing frame: progress 0 within the landing native block,
            # (boundary - f) samples at each later boundary (nb == B reduces
            # to the old t == B / min(B - f, dur) form)
            br_p = jnp.clip((t // nb) * nb - f, 0, dur)
            p = jnp.where(slot_rate == RATE_AUDIO, ar_p, br_p)
            ramp_tail = jnp.where(p >= dur, v, c_f + stp * p.astype(dtype))
            imm_tail = jnp.full((B + 1,), v, dtype=dtype)
            frz_tail = jnp.full((B + 1,), c_f, dtype=dtype)  # cfg freezes ramp
            tail = jnp.where(is_cfg, frz_tail, jnp.where(is_ramp_set, ramp_tail, imm_tail))
            new_row = jnp.where(t >= f, tail, row)

            # a ramp set re-anchors at the event frame (anchor = the old
            # trajectory's value there); cfg freezes the ramp at that value;
            # an immediate set is a zero-length ramp parked at its target
            new_anchor = jnp.where(is_cfg | is_ramp_set, c_f, v)
            new_target = jnp.where(is_cfg, c_f, v)
            new_step = jnp.where(is_ramp_set, stp, jnp.zeros((), dtype=dtype))
            new_dur = jnp.where(is_ramp_set, dur, 0)
            new_el = jnp.where(is_ramp_set, jnp.minimum(B - f, dur), 0)
            new_smode = jnp.where(is_cfg, events["f_smode"][e], smode[s])
            new_sdur = jnp.where(is_cfg, events["f_sdur"][e], sdur[s])
            new_srate = jnp.where(is_cfg, events["f_srate"][e], srate[s])

            def u(arr, nv):
                return arr.at[s].set(jnp.where(valid, nv, arr[s]))

            vals = vals.at[s].set(jnp.where(valid, new_row, row))
            return (
                vals,
                u(anchor, new_anchor),
                u(target, new_target),
                u(step, new_step),
                u(el_next, new_el),
                u(dur_next, new_dur),
                u(smode, new_smode),
                u(sdur, new_sdur),
                u(srate, new_srate),
            )

        # the sequential event fold only runs when this block has any float
        # events — most blocks don't, and the fold is the expensive part
        has_events = jnp.any(events["f_slot"] >= 0)
        (vals, anchor, target, step, el_next, dur_next,
         smode, sdur, srate) = jax.lax.cond(
            has_events,
            lambda c: jax.lax.fori_loop(0, E, body, c),
            lambda c: c,
            carry,
        )

        pf = vals[:, :B]
        new_state = {
            "value": anchor,
            "target": target,
            "step": step,
            "elapsed": el_next,
            "dur": dur_next,
            "smode": smode,
            "sdur": sdur,
            "srate": srate,
        }
        return pf, new_state

    def _materialize_triggers(self, events):
        B = self.block_size
        Pt = self.layout.n_trig
        if Pt == 0:
            return jnp.zeros((0, B), dtype=bool)
        slot = events["t_slot"]
        frame = events["t_frame"]
        # padded events (slot == -1) scatter into a sacrificial extra row
        s_safe = jnp.where(slot >= 0, slot, Pt)
        grid = jnp.zeros((Pt + 1, B), dtype=bool)
        grid = grid.at[s_safe, frame].set(True)
        return grid[:Pt]

    def _materialize_ints(self, state, events):
        B = self.block_size
        Pi = self.layout.n_int
        int_value = state["int_value"]
        if Pi == 0:
            z = jnp.zeros((0, B), dtype=jnp.int32)
            return z, jnp.zeros((0, B), dtype=bool), int_value
        t = jnp.arange(B, dtype=jnp.int32)
        vals = jnp.broadcast_to(int_value[:, None], (Pi, B))
        # set-event mask: one scatter (padding rows land in a sacrificial row)
        s_safe = jnp.where(events["i_slot"] >= 0, events["i_slot"], Pi)
        setm = jnp.zeros((Pi + 1, B), dtype=bool)
        setm = setm.at[s_safe, events["i_frame"]].set(True)[:Pi]
        E = events["i_slot"].shape[0]

        def body(e, carry):
            vals, nxt = carry
            s_raw = events["i_slot"][e]
            valid = s_raw >= 0
            s = jnp.maximum(s_raw, 0)
            f = events["i_frame"][e]
            v = events["i_value"][e]
            row = vals[s]
            new_row = jnp.where(t >= f, v, row)
            vals = vals.at[s].set(jnp.where(valid, new_row, row))
            nxt = nxt.at[s].set(jnp.where(valid, v, nxt[s]))
            return vals, nxt

        has_events = jnp.any(events["i_slot"] >= 0)
        vals, int_next = jax.lax.cond(
            has_events,
            lambda c: jax.lax.fori_loop(0, E, body, c),
            lambda c: c,
            (vals, int_value),
        )
        return vals, setm, int_next
