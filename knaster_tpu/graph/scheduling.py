"""Scheduling primitives: when a parameter change takes effect.

TPU-native analog of knaster_graph/src/scheduling.rs. The reference streams
``SchedulingEvent``s over a lock-free ring to the audio thread, which converts
``Time`` to a sample delay against the shared frame clock
(scheduling.rs:95-121). Here the host converts queued events to frame-stamped
slots in the padded per-block event tensors consumed on device (see
param_engine.py); the frame clock is plain integer bookkeeping on the host,
mirrored on device for bounce renders.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

from ..primitives.time import Seconds


@dataclass(frozen=True)
class Time:
    """When an event should be applied (scheduling.rs:73-139).

    kind 'asap'  — start of the next processed block.
    kind 'at'    — absolute time from stream start.
    kind 'after' — relative to the frame clock when the event is *queued*
                   (resolved to absolute at queue time by the processor).
    """

    kind: str = "asap"
    seconds: Optional[Seconds] = None

    @staticmethod
    def asap() -> "Time":
        return Time("asap", None)

    @staticmethod
    def at(t) -> "Time":
        return Time("at", _secs(t))

    @staticmethod
    def after(t) -> "Time":
        return Time("after", _secs(t))


def _secs(t) -> Seconds:
    if isinstance(t, Seconds):
        return t
    return Seconds.from_secs_f64(float(t))


@dataclass
class ScheduledEvent:
    """One queued parameter event, host side.

    ``due_frame`` is the absolute frame index at which it applies (resolved
    from Time by the processor when queued); payload is a tuple tagged with
    the operation ('set_float', v) | ('smooth_cfg', smode, dur_frames, srate)
    | ('trig',) | ('set_int', v).
    """

    due_frame: int
    node_id: int
    param_idx: int
    payload: Tuple[Any, ...]
    order: int = 0  # stable tie-break: send order
