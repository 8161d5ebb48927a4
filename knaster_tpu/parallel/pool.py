"""VoicePool: a voice allocator over a VoiceBank graph node.

The reference's polyphony idiom is "push a voice node per note, free it when
its envelope reports done" (knaster/examples/many_sines.rs:1-60 +
knaster_graph/src/wrappers_graph/done.rs:27-121 WrDone). At bank scale that
becomes: allocate a free voice index, send its note-on events, and release
the index automatically when the voice's envelope finishes — with ZERO graph
recompiles.

Auto-release rides the bank's per-voice **idle latch**: a device-side bool
per voice that the bank sets when the voice's UGen reports done (vmap banks)
or its envelope reaches the stopped stage (Pallas kernel banks), and that a
note-on clears (event kind 5). The pool fetches the latch ONLY when its
host-side free list runs dry (the ``has_*``-gate rule: a device→host fetch
costs a full tunnel round-trip, so the steady state does none).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import numpy as np


class VoicePool:
    """Allocate/auto-release voices of a VoiceBank pushed into a graph.

    processor:   the AudioProcessor running the graph.
    bank_handle: the Handle returned by pushing the VoiceBank.
    note_on_trigger: trigger param fired by :meth:`note_on` (None = none).
    steal: voice-stealing policy when the pool is exhausted — ``None``
           (note_on returns None; no active voice is ever stolen) or
           ``"oldest"`` (reuse the longest-held voice).
    """

    def __init__(self, processor, bank_handle, note_on_trigger="t_restart",
                 steal: Optional[str] = None):
        if steal not in (None, "oldest"):
            raise ValueError("steal must be None or 'oldest'")
        self.processor = processor
        self.graph = bank_handle.graph
        self.node_id = bank_handle.node_id
        self.bank = self.graph._node(self.node_id).ugen
        self.handle = bank_handle
        self.steal = steal
        self.note_on_trigger = note_on_trigger
        self._trig_idx = (
            self.bank.trig_index(note_on_trigger)
            if note_on_trigger is not None
            else None
        )
        if not getattr(self.bank, "track_idle", False):
            # idle tracking is off by default (it defeats done-flag DCE in
            # banks without a pool); turn it on, re-freeze the node's
            # structural signature (the program cache must not serve the
            # latch-free program for this topology), and force a recompile
            from ..core.signature import ugen_signature

            self.bank.track_idle = True
            self.graph._node(self.node_id).sig = ugen_signature(self.bank)
            self.graph.root().revision += 1
        self._free = list(range(self.bank.n_voices))
        self._held: "OrderedDict[int, bool]" = OrderedDict()  # insertion = age

    # ------------------------------------------------------------ queries
    @property
    def n_voices(self) -> int:
        return self.bank.n_voices

    @property
    def free_count(self) -> int:
        return len(self._free)

    @property
    def held_count(self) -> int:
        return len(self._held)

    # ------------------------------------------------------------ control
    def note_on(self, params: Optional[Dict[str, float]] = None, at=None,
                token=None) -> Optional[int]:
        """Allocate a voice and start a note: clears its idle latch, sets
        the given per-voice float params, and fires the note-on trigger —
        all at the same (sample-accurate) time. Returns the voice id, or
        None when the pool is exhausted and stealing is disabled."""
        from .voicebank import VoiceBank  # noqa: F401  (doc anchor)
        from ..graph.scheduling import Time

        t = Time.at(at) if at is not None else Time.asap()
        if not self._free:
            self.refresh()
        if self._free:
            voice = self._free.pop(0)
        elif self.steal == "oldest":
            voice, _ = self._held.popitem(last=False)
        else:
            return None
        # a voice only becomes auto-releasable once the block containing
        # its note-on has actually rendered — before that the idle latch
        # still reflects the PRE-note state (refresh guards on this)
        if t.kind == "at" and t.seconds is not None:
            due = t.seconds.to_samples(self.graph.sample_rate)
        else:
            due = self.graph.clock.frames
        self._held[voice] = due
        q = self.graph._queue_event
        q(self.node_id, 0, ("voice_idle_clear", voice), t, token=token)
        for name, value in (params or {}).items():
            q(
                self.node_id,
                self.bank.float_index(name),
                ("voice_float", voice, self.bank.float_index(name),
                 float(value)),
                t,
                token=token,
            )
        if self._trig_idx is not None:
            q(
                self.node_id,
                self._trig_idx,
                ("voice_trig", voice, self._trig_idx),
                t,
                token=token,
            )
        return voice

    def note_off(self, voice: int, trigger: str = "t_release", at=None,
                 token=None) -> None:
        """Fire a release trigger on a held voice (gate-style voices). The
        voice stays held until its envelope finishes (auto-release via the
        idle latch) or :meth:`release` is called."""
        from ..graph.scheduling import Time

        t = Time.at(at) if at is not None else Time.asap()
        idx = self.bank.trig_index(trigger)
        self.graph._queue_event(
            self.node_id, idx, ("voice_trig", voice, idx), t, token=token
        )

    def release(self, voice: int) -> None:
        """Return a voice to the free list immediately (host-side only)."""
        if self._held.pop(voice, None) is not None:
            self._free.append(voice)

    # ------------------------------------------------------------ refresh
    def _idle_vector(self) -> np.ndarray:
        proc = self.processor
        proc._ensure_compiled()
        # render programs donate their state argument; when note_on/refresh
        # runs on a control thread against a live stream, the leaf can be
        # donated-deleted between reading proc.state and the fetch — retry
        # against the fresh state (same hazard/fix as processor.probe_log)
        for _ in range(3):
            cg = proc.compiled
            loc = cg._node_loc(self.node_id)
            if loc is None or loc[0] != "single":
                raise RuntimeError(
                    "VoiceBank node not found in the compiled plan"
                )
            leaf = proc.state["nodes"][loc[1]]["idle"]
            try:
                return np.asarray(leaf)  # ONE device->host fetch
            except RuntimeError:
                continue  # donated under us by a concurrent render
        return np.asarray(proc.state["nodes"][loc[1]]["idle"])

    def refresh(self) -> int:
        """Fetch the bank's idle latch (one device→host round-trip) and
        auto-release held voices whose envelopes have finished. Returns the
        number of voices released. note_on calls this automatically — but
        only when the free list is empty."""
        idle = self._idle_vector()
        clock = self.graph.clock.frames
        B = self.graph.block_size
        released = 0
        for voice in [
            v for v, due in self._held.items()
            if idle[v] and clock >= due + B
        ]:
            self.release(voice)
            released += 1
        return released
