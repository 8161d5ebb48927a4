"""VoiceBank: thousands of voices batched across VPU lanes.

This is the TPU-native answer to the reference's voice-level parallelism
story (SURVEY §2.9): knaster's ``many_sines`` example pushes 600 individual
enveloped sine nodes and relies on fast sequential Rust; here a single
:class:`VoiceBank` node ``vmap``s one voice UGen over a ``[n_voices]`` axis,
so a 10k-voice bank is one fused program whose scans run 10k lanes wide.
The bank's summed output is the mix bus.

Per-voice control rides a private **bank event channel** (the node-level
events extension in compile.py): float sets, triggers, int sets and
smoothing-ramp starts are all sample-accurate per voice — samples before an
event's frame follow the pre-event trajectory, samples at/after it the new
one, and ramps anchor at their event frame starting from the old
trajectory's value at that frame (WrPreciseTiming + WrSmoothParams
semantics at bank scale, without block splitting). Same-block BURSTS on
one (param, voice) — several sets, smoothing configs, int sets, in any
interleaving — are exact too: the host assigns each event a per-slot
``round`` (frame order) and the device folds rounds sequentially
(``_apply_events_rounds``), reproducing the graph engine's sequential
event fold sample-for-sample. The Pallas kernel banks use the same round
machinery through per-round trajectory BREAKPOINTS
(``_apply_events_breakpoints``): their in-kernel materialization folds up
to ``kernel_burst_depth`` breakpoints per (param, voice) slot per block —
exact for bursts up to that depth (default 3); deeper bursts keep the
last ``kernel_burst_depth`` events (the earliest events of such a burst
are dropped, a ≤1-block transient; the vmap bank and the graph engine
remain exact at any depth). Retrigger int params
(e.g. Envelope.jump_to_segment) additionally receive a per-sample
``<name>_set`` mask so repeated sets of the same value re-apply, exactly as
the graph engine's param_apply-per-event does.

Voices can be masked inactive; inactive voices render but are muted — the
"free" that never needs a recompile (SURVEY §7.4 voice-pool masking).
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen, normalize_process_result


class VoiceBank(UGen):
    """``n_voices`` copies of a voice UGen, vmapped, mixed to one bus.

    voice:          any UGen with no audio inputs (a generator/voice model).
    n_voices:       number of parallel voices.
    voice_defaults: optional {param_name: np.ndarray[n_voices]} per-voice
                    initial parameter values (e.g. detuned freqs).
    mix:            'sum' (mix bus) or 'stack' (outputs = voices*voice.outputs,
                    for per-voice post-processing).
    """

    event_capacity = 256
    # consume per-voice done flags into the idle latch. Off by default:
    # reading `dones` defeats XLA's dead-code elimination of the whole
    # [V, B] done computation, which costs real bandwidth at 100k voices.
    # VoicePool turns it on (and recompiles) when it attaches.
    track_idle = False
    # exact same-block event bursts per (param, voice): events carry a
    # per-slot ``round`` (frame order) and the device applies rounds
    # sequentially. The Pallas banks keep this True and additionally set
    # ``kernel_burst_depth`` = D: host packing caps each slot's burst at
    # its LAST D events (kernel operands carry D trajectory breakpoints).
    burst_rounds = True
    kernel_burst_depth: Optional[int] = None
    # voice_defaults arrays are consumed only by init() (per-voice initial
    # fvals/ivals — state data): banks differing only in their detune
    # tables share cached programs
    signature_exclude = ("pdefaults", "voice_defaults", "_burst_depth_warned")

    def __init__(
        self,
        voice: UGen,
        n_voices: int,
        voice_defaults: Optional[Dict[str, np.ndarray]] = None,
        mix: str = "sum",
        event_capacity: int = 256,
    ):
        if voice.inputs != 0:
            raise ValueError("VoiceBank voices must be generators (no audio inputs)")
        self.voice = voice
        self.n_voices = int(n_voices)
        self.inputs = 0
        self.mix = mix
        if mix == "sum":
            self.outputs = voice.outputs
        elif mix == "stack":
            self.outputs = voice.outputs * self.n_voices
        else:
            raise ValueError("mix must be 'sum' or 'stack'")
        self.event_capacity = int(event_capacity)
        # a block-dependent voice (e.g. models.PluckedVoice's blockwise
        # ring reads) makes the whole bank block-dependent: propagate so
        # the compiler keeps such graphs out of (uncapped) superblocking
        if not getattr(voice, "block_invariant", True):
            self.block_invariant = False
        self.voice_defaults = dict(voice_defaults or {})
        # bank-level params deliberately empty: control flows via voice events
        self.params = ()
        self._float_names = [p.name for p in voice.params if p.ptype == "float"]
        self._trig_names = [p.name for p in voice.params if p.ptype == "trigger"]
        self._int_names = [
            p.name for p in voice.params if p.ptype in ("integer", "bool")
        ]

    def name(self) -> str:
        return f"VoiceBank[{self.n_voices}x{self.voice.name()}]"

    def make_local(self, n_local: int) -> "VoiceBank":
        """A bank describing one mesh shard's voices (used by
        ShardedVoiceBank); subclasses with different constructors override."""
        local = VoiceBank(
            self.voice, n_local, mix="sum", event_capacity=self.event_capacity
        )
        local.track_idle = self.track_idle
        return local

    # ------------------------------------------------------------- indices
    def float_index(self, name: str) -> int:
        return self._float_names.index(name)

    def trig_index(self, name: str) -> int:
        return self._trig_names.index(name)

    def int_index(self, name: str) -> int:
        return self._int_names.index(name)

    # --------------------------------------------------------------- state
    def init(self, ctx: AudioCtx):
        V = self.n_voices
        voice_state = self.voice.init(ctx)
        # voices may declare a superblock cap during init (needs the sample
        # rate — e.g. PluckedVoice's shortest loop); the bank node carries it
        vcap = getattr(self.voice, "superblock_cap", None)
        if vcap is not None:
            mycap = getattr(self, "superblock_cap", None)
            self.superblock_cap = vcap if mycap is None else min(mycap, vcap)
        # replicate the single-voice state across the voice axis —
        # except shared_state_keys leaves, which stay unbatched (see process)
        shared = set(getattr(self.voice, "shared_state_keys", ()) or ())

        def rep(x):
            x = jnp.asarray(x)
            return jnp.broadcast_to(x[None, ...], (V,) + x.shape).copy()

        if shared and isinstance(voice_state, dict):
            state_v = {
                k: (jnp.asarray(v) if k in shared
                    else jax.tree_util.tree_map(rep, v))
                for k, v in voice_state.items()
            }
        else:
            state_v = jax.tree_util.tree_map(rep, voice_state)
        fvals = np.zeros((len(self._float_names), V), dtype=ctx.dtype)
        for i, name in enumerate(self._float_names):
            default = None
            for p in self.voice.params:
                if p.name == name:
                    default = getattr(self.voice, "pdefaults", {}).get(
                        name, p.default_value()
                    )
            fvals[i, :] = default
            if name in self.voice_defaults:
                fvals[i, :] = np.asarray(self.voice_defaults[name], dtype=ctx.dtype)
        ivals = np.zeros((len(self._int_names), V), dtype=np.int32)
        for i, name in enumerate(self._int_names):
            for p in self.voice.params:
                if p.name == name:
                    d = getattr(self.voice, "pdefaults", {}).get(name, p.default_value())
                    ivals[i, :] = int(d)
            if name in self.voice_defaults:
                ivals[i, :] = np.asarray(self.voice_defaults[name], dtype=np.int32)
        nf = len(self._float_names)
        return {
            "voices": state_v,
            "fvals": jnp.asarray(fvals),
            "ftarget": jnp.asarray(fvals.copy()),
            "fstep": jnp.zeros((nf, V), dtype=ctx.dtype),
            # anchored ramps (see param_engine): ``fvals`` is the ramp's
            # ANCHOR value (the trajectory value at the last set event's
            # frame), ``felapsed`` counts integer samples since that frame
            # at block start, ``fdur`` the ramp's total length. Every
            # materialization computes anchor + step * absolute_progress in
            # ONE float rounding, so any block partitioning of a render is
            # bit-identical (a current-value carry re-rounds per block)
            "felapsed": jnp.zeros((nf, V), dtype=jnp.int32),
            "fdur": jnp.zeros((nf, V), dtype=jnp.int32),
            "fsdur": jnp.zeros((nf, V), dtype=jnp.int32),
            "ivals": jnp.asarray(ivals),
            "active": jnp.ones((V,), dtype=bool),
            # per-voice done latch: set when a voice's UGen reports done,
            # cleared by a note-on (event kind 5). VoicePool reads this to
            # auto-release voices — the bank equivalent of the reference's
            # free-on-done idiom (many_sines.rs + wrappers_graph/done.rs)
            "idle": jnp.zeros((V,), dtype=bool),
        }

    # --------------------------------------------------------------- events
    def empty_node_events(self, dtype=np.float32):
        E = self.event_capacity
        ev = {
            "frame": jnp.zeros((E,), jnp.int32),
            "voice": jnp.full((E,), -1, jnp.int32),
            "param": jnp.zeros((E,), jnp.int32),
            # kind: 0 float set, 1 trigger, 2 int set, 3 set-active,
            #       4 smoothing config, 5 clear idle latch (note-on)
            "kind": jnp.zeros((E,), jnp.int32),
            "value": jnp.zeros((E,), dtype),
        }
        if self.burst_rounds:
            ev["round"] = jnp.zeros((E,), jnp.int32)
        return ev

    def node_events_from_lists(self, events, dtype=np.float32):
        """events: list of (frame, voice, param_idx, kind, value), in order.

        With ``burst_rounds`` (the vmap bank) every float-set / smoothing-
        config / int-set event is kept and assigned a per-slot ``round``:
        float-family events (kinds 0 and 4) on one (param, voice) are
        ordered jointly by frame (list order breaking ties — the engine's
        queue order), int sets per (param, voice) likewise, and the device
        applies rounds sequentially — exact graph-engine burst semantics.
        Active/idle sets (kinds 3, 5) are block-rate flags; the latest-
        frame event per (kind, voice) wins. Triggers keep every event.

        Banks with ``kernel_burst_depth`` = D (the Pallas kernel banks)
        keep each slot's LAST D events of a family — the kernels fold D
        trajectory breakpoints per slot; bursts up to depth D are exact,
        deeper ones drop their earliest events (≤1-block transient,
        documented). Without ``burst_rounds`` non-trigger kinds are
        deduplicated host-side — latest frame per (kind, param, voice)
        wins."""
        trigs = {}
        if self.burst_rounds:
            dedup = {}  # kinds 3/5 only: latest frame per (kind, voice)
            fam = {}  # (family, param, voice) -> [events], frame-ordered
            for e in events:
                f, v, p, k, val = e
                if k == 1:
                    trigs[(f, p, v)] = e
                elif k in (3, 5):
                    prev = dedup.get((k, v))
                    if prev is None or f >= prev[0]:
                        dedup[(k, v)] = e
                else:
                    # kinds 0 and 4 share one round space per slot: a cfg
                    # between two sets must fold between them
                    key = (0 if k in (0, 4) else 2, p, v)
                    fam.setdefault(key, []).append(e)
            flat, rounds = [], []
            for evs in fam.values():
                evs.sort(key=lambda e: e[0])  # stable: list order on ties
                if self.kernel_burst_depth is not None:
                    if len(evs) > self.kernel_burst_depth and not getattr(
                        self, "_burst_depth_warned", False
                    ):
                        self._burst_depth_warned = True
                        warnings.warn(
                            f"{self.name()}: a (param, voice) slot received "
                            f"{len(evs)} same-block events but "
                            f"kernel_burst_depth={self.kernel_burst_depth}; "
                            "keeping the last "
                            f"{self.kernel_burst_depth} (<=1-block "
                            "transient). Construct the bank with "
                            "kernel_burst_depth>="
                            f"{len(evs)} for exact deep bursts.",
                            stacklevel=3,
                        )
                    evs = evs[-self.kernel_burst_depth:]
                for r, e in enumerate(evs):
                    flat.append(e)
                    rounds.append(r)
            for e in dedup.values():
                flat.append(e)
                rounds.append(0)
            for e in trigs.values():
                flat.append(e)
                rounds.append(0)
        else:
            dedup = {}
            for e in events:
                f, v, p, k, val = e
                if k == 1:
                    trigs[(f, p, v)] = e  # same-frame duplicates: one trigger
                else:
                    prev = dedup.get((k, p, v))
                    if prev is None or f >= prev[0]:
                        dedup[(k, p, v)] = e
            flat = list(dedup.values()) + list(trigs.values())
            rounds = None
        if len(flat) > self.event_capacity:
            raise ValueError(
                f"more than {self.event_capacity} voice events in one block; "
                f"raise VoiceBank(event_capacity=...)"
            )
        E = self.event_capacity
        # build host-side (a np.array() of the device constants would be 5
        # device->host fetches, ~RTT each over a remote-TPU tunnel)
        ev = {
            "frame": np.zeros((E,), np.int32),
            "voice": np.full((E,), -1, np.int32),
            "param": np.zeros((E,), np.int32),
            "kind": np.zeros((E,), np.int32),
            "value": np.zeros((E,), dtype),
        }
        if rounds is not None:
            ev["round"] = np.zeros((E,), np.int32)
        for i, (f, v, p, k, val) in enumerate(flat):
            ev["frame"][i] = f
            ev["voice"][i] = v
            ev["param"][i] = p
            ev["kind"][i] = k
            ev["value"][i] = val
            if rounds is not None:
                ev["round"][i] = rounds[i]
        return ev  # numpy: uploaded by the consuming render call

    # -------------------------------------------------------------- process
    def _packed_trigs(self, ctx: AudioCtx, events, trig_idx: int):
        """Sample-accurate triggers as ``ceil(B/32)`` u32 bitmask words per
        voice, stacked ``[W, V]`` (what the Pallas kernels consume — one
        dynamic row slice per sample, see pallas_bank._trig_bit), built
        directly from the event tensor — O(E) instead of materializing the
        [V, B] boolean plane. Word w holds frames [32w, 32w+32). Host dedup
        guarantees one event per (frame, param, voice), so a scatter-add of
        single bits cannot collide."""
        V = self.n_voices
        W = (ctx.block_size + 31) // 32
        if events is None:
            return jnp.zeros((W, V), jnp.uint32)
        voice = events["voice"]
        kind = events["kind"]
        param = events["param"]
        frame = events["frame"]
        sel = (voice >= 0) & (kind == 1) & (param == trig_idx)
        v_sel = jnp.where(sel, voice, V)
        bit = jnp.asarray(1, jnp.uint32) << (frame.astype(jnp.uint32) & 31)
        word_idx = frame >> 5
        z = jnp.zeros((W, V + 1), jnp.uint32)
        return z.at[word_idx, v_sel].add(bit)[:, :V]

    def _apply_events(self, ctx: AudioCtx, state, events, trig_tensor=True):
        """Apply the bank event channel: returns (fstate, ivals, active,
        trig [n_trig, V, B], fframe, iinfo, idle, old_fstate) where fstate =
        (fvals, ftarget, fstep, felapsed, fdur, fsdur) carrying anchored
        per-(param, voice) linear smoothing ramps (fvals = anchor value,
        felapsed = samples since the anchor frame at block start — set
        events write ``-frame`` so local progress is uniformly
        ``felapsed + t`` — fdur = ramp length), fframe is the
        per-(param, voice) float-event frame (the old/new trajectory
        select), iinfo = (iframe [ni, V], iset [ni, V, B] or None) carries
        the int-set frames and the retrigger set mask, and old_fstate =
        (fvals, ftarget, fstep, felapsed, fdur) is the PRE-set trajectory
        for the before-the-event-frame samples — the block-start state with
        any smoothing-config freeze applied (a cfg event at frame f stops
        an in-flight ramp there, engine KIND_SMOOTH_CFG parity).
        ``trig_tensor=False`` skips the [n_trig, V, B] boolean plane (the
        Pallas banks read packed bitmasks via ``_packed_trigs`` instead)."""
        V = self.n_voices
        B = ctx.block_size
        dtype = ctx.dtype
        n_trig_ = len(self._trig_names)
        if events is None:
            # no-events fast path: skip every scatter (XLA scatters serialize
            # on TPU; an empty-but-materialized event tensor still costs
            # O(capacity) sequential updates). fframe=None tells process the
            # pre/post trajectories coincide.
            fstate = (state["fvals"], state["ftarget"], state["fstep"],
                      state["felapsed"], state["fdur"], state["fsdur"])
            trig = (jnp.zeros((max(n_trig_, 1), V, B), bool)
                    if trig_tensor else None)
            return (fstate, state["ivals"], state["active"], trig, None,
                    (None, None), state["idle"], None)

        fvals = state["fvals"]  # [nf, V] ramp anchor value
        ftarget = state["ftarget"]
        fstep = state["fstep"]
        felapsed = state["felapsed"]  # i32 samples ramped by block start
        fdur = state["fdur"]  # i32 total ramp length
        fsdur = state["fsdur"]  # i32 configured smoothing duration
        ivals = state["ivals"]  # [ni, V]
        active = state["active"]
        n_trig = len(self._trig_names)

        voice = events["voice"]
        param = events["param"]
        kind = events["kind"]
        value = events["value"]
        frame = events["frame"]
        valid = voice >= 0

        # one vectorized scatter per kind; invalid/other-kind events land in
        # a sacrificial voice column V that is sliced off (host deduped the
        # block-rate kinds, so duplicate indices only occur in that column)
        def pad(arr):
            return jnp.concatenate(
                [arr, jnp.zeros((arr.shape[0], 1), arr.dtype)], axis=1
            )

        def apply_set(arr, k, vals):
            sel = valid & (kind == k)
            v_sel = jnp.where(sel, voice, V)
            p_sel = jnp.clip(param, 0, max(arr.shape[0] - 1, 0))
            return pad(arr).at[p_sel, v_sel].set(vals)[:, :V]

        nf = fvals.shape[0]
        fframe = jnp.zeros((max(nf, 1), V), jnp.int32)
        old_fstate = (fvals, ftarget, fstep, felapsed, fdur)
        if nf:
            old_fsdur = fsdur
            # smoothing config (kind 4): value = ramp duration in frames.
            # Engine parity (param_engine KIND_SMOOTH_CFG): a cfg event at
            # frame f_c FREEZES an in-flight ramp at its value there. A
            # ramp-then-hold trajectory expresses that exactly: clamp the
            # slot's total duration to the absolute progress at f_c and
            # retarget the frozen value, leaving anchor/step/elapsed alone.
            sel_c = valid & (kind == 4)
            v_c = jnp.where(sel_c, voice, V)
            p_c = jnp.clip(param, 0, nf - 1)
            fsdur = apply_set(fsdur, 4, value.astype(jnp.int32))
            has_cfg = pad(jnp.zeros((nf, V), bool)).at[p_c, v_c].set(
                sel_c
            )[:, :V]
            cfg_frame = pad(jnp.zeros((nf, V), jnp.int32)).at[p_c, v_c].set(
                frame
            )[:, :V]
            cfg_prog = felapsed + cfg_frame  # absolute progress at f_c
            cut = has_cfg & (fdur > cfg_prog)
            frozen_tgt = jnp.where(
                cut, fvals + fstep * cfg_prog.astype(dtype), ftarget
            )
            fdur = jnp.where(cut, cfg_prog, fdur)
            ftarget = frozen_tgt
            old_fstate = (fvals, ftarget, fstep, felapsed, fdur)
            # float set (kind 0): jump, or start a linear ramp if configured
            sel = valid & (kind == 0)
            v_sel = jnp.where(sel, voice, V)
            p_sel = jnp.clip(param, 0, nf - 1)
            # frame order vs a same-block cfg on the same slot: a set AFTER
            # the cfg uses the new duration; a set BEFORE it uses the old
            # duration and the cfg then freezes the new ramp at its frame
            e_cfg = pad(has_cfg)[p_sel, v_sel]
            e_cfg_f = pad(cfg_frame)[p_sel, v_sel]
            set_before_cfg = e_cfg & (frame < e_cfg_f)
            dur = jnp.where(
                set_before_cfg,
                pad(old_fsdur)[p_sel, v_sel],
                pad(fsdur)[p_sel, v_sel],
            )
            # ramps anchor at the event frame and start from the OLD
            # trajectory's value AT that frame (the engine's c_f = row[f],
            # param_engine._materialize_floats) — the frozen-old state, so a
            # cfg earlier in the block anchors the set at the frozen value
            old_v0 = pad(fvals)[p_sel, v_sel]
            old_step = pad(fstep)[p_sel, v_sel]
            old_el = pad(felapsed)[p_sel, v_sel]
            old_dur = pad(fdur)[p_sel, v_sel]
            old_tgt = pad(ftarget)[p_sel, v_sel]
            ln_e = old_el + frame  # absolute progress at the event frame
            cur = jnp.where(
                ln_e >= old_dur, old_tgt,
                old_v0 + old_step * ln_e.astype(dtype),
            )
            ramp = dur > 0
            new_step = jnp.where(
                ramp, (value - cur) / jnp.maximum(dur, 1).astype(dtype), 0.0
            )
            # a cfg AFTER the set freezes the set's ramp at the cfg frame:
            # clamp its length and land on the value reached there
            clamp = set_before_cfg & ramp
            eff_dur = jnp.where(
                clamp, jnp.minimum(dur, e_cfg_f - frame), dur
            )
            new_tgt = jnp.where(
                clamp & (dur > eff_dur),
                cur + new_step * eff_dur.astype(dtype),
                value,
            )
            new_val = jnp.where(ramp, cur, value)
            new_dur = jnp.where(ramp, eff_dur, 0)
            fvals = pad(fvals).at[p_sel, v_sel].set(new_val)[:, :V]
            ftarget = pad(ftarget).at[p_sel, v_sel].set(new_tgt)[:, :V]
            fstep = pad(fstep).at[p_sel, v_sel].set(new_step)[:, :V]
            fdur = pad(fdur).at[p_sel, v_sel].set(new_dur)[:, :V]
            # the new ramp anchors at the event frame: elapsed-at-block-start
            # is -frame, so local progress ``felapsed + t`` = t - frame and
            # the uniform integer advance min(felapsed + B, fdur) lands on
            # B - frame frames ramped by the boundary
            felapsed = pad(felapsed).at[p_sel, v_sel].set(-frame)[:, :V]
            # sample-accurate sets: remember the event frame per slot so the
            # materialization keeps the OLD trajectory before it and anchors
            # the new one (ramp progress counts from this frame)
            fframe = pad(fframe).at[p_sel, v_sel].set(frame)[:, :V]
        ni = ivals.shape[0]
        iframe = jnp.zeros((max(ni, 1), V), jnp.int32)
        iset = None
        if ni:
            old_ivals = ivals
            ivals = apply_set(ivals, 2, value.astype(jnp.int32))
            sel_i = valid & (kind == 2)
            v_i = jnp.where(sel_i, voice, V)
            p_i = jnp.clip(param, 0, ni - 1)
            # int sets are sample-accurate too: keep the old value before
            # the event frame (engine _materialize_ints parity)
            iframe = pad(iframe).at[p_i, v_i].set(frame)[:, :V]
            if trig_tensor and any(
                getattr(p, "retrigger", False)
                for p in self.voice.params
                if p.ptype in ("integer", "bool")
            ):
                # per-sample set mask for retrigger params (the engine's
                # pset plane): repeated same-value sets must re-apply
                iset = jnp.zeros((ni, V + 1, B), dtype=bool)
                iset = iset.at[p_i, v_i, frame].set(sel_i)[:, :V, :]
            del old_ivals  # kept via iframe select in process()
        sel_a = valid & (kind == 3)
        v_a = jnp.where(sel_a, voice, V)
        active = jnp.concatenate([active, jnp.zeros((1,), bool)]).at[v_a].set(
            value > 0.5
        )[:V]
        # note-on (kind 5): clear the voice's idle latch
        sel_n = valid & (kind == 5)
        v_n = jnp.where(sel_n, voice, V)
        idle = jnp.concatenate(
            [state["idle"], jnp.zeros((1,), bool)]
        ).at[v_n].set(False)[:V]

        if trig_tensor:
            trig = jnp.zeros((max(n_trig, 1), V + 1, B), dtype=bool)
            sel_t = valid & (kind == 1)
            v_t = jnp.where(sel_t, voice, V)
            trig = trig.at[
                jnp.clip(param, 0, trig.shape[0] - 1), v_t, frame
            ].set(True)
            trig = trig[:, :V, :]
        else:
            trig = None
        return ((fvals, ftarget, fstep, felapsed, fdur, fsdur), ivals,
                active, trig, fframe, (iframe, iset), idle, old_fstate)

    def _apply_events_rounds(self, ctx: AudioCtx, state, events):
        """Exact same-block burst semantics (graph-engine parity): apply
        the event tensor round by round — round r holds each slot's r-th
        event in frame order (host-assigned, ``node_events_from_lists``) —
        folding the per-sample parameter planes as it goes. One
        ``fori_loop`` iteration per round; a block whose slots each see at
        most one event (the overwhelmingly common case) runs exactly one
        iteration, the same scatter work as the single-round path.

        Per round and slot there is at most ONE float-family event (set OR
        smoothing cfg — they share a round space), so the single-round
        path's set-vs-cfg frame-order special cases disappear: ordering IS
        the round sequence. Trajectories are ANCHORED (fvals = anchor
        value, felapsed = progress at local frame 0, set events write
        ``-frame``), so each round's "value at frame f" reads the true
        in-flight trajectory (the engine's c_f = row[f]) at absolute
        progress ``felapsed + f`` in one rounding.

        Returns (planes_f [nf,V,B]|None, fstate, ivals,
        planes_i [ni,V,B]|None, iset, trig, active, idle)."""
        V = self.n_voices
        B = ctx.block_size
        dtype = ctx.dtype
        nf = state["fvals"].shape[0]
        ni = state["ivals"].shape[0]
        n_trig = len(self._trig_names)

        voice = events["voice"]
        param = events["param"]
        kind = events["kind"]
        value = events["value"]
        frame = events["frame"]
        rnd = events["round"]
        valid = voice >= 0
        t_idx = jnp.arange(B, dtype=jnp.int32)

        def pad(arr):
            return jnp.concatenate(
                [arr, jnp.zeros((arr.shape[0], 1), arr.dtype)], axis=1
            )

        def scat(arr, p_sel, v_sel, vals):
            return pad(arr).at[p_sel, v_sel].set(vals)[:, :V]

        def traj(fvals, ftarget, fstep, felapsed, fdur):
            ln = felapsed[:, :, None] + t_idx[None, None, :]
            return jnp.where(
                ln >= fdur[:, :, None],
                ftarget[:, :, None],
                fvals[:, :, None] + fstep[:, :, None] * ln.astype(dtype),
            )

        carry = {
            "fvals": state["fvals"], "ftarget": state["ftarget"],
            "fstep": state["fstep"], "felapsed": state["felapsed"],
            "fdur": state["fdur"],
            "fsdur": state["fsdur"], "ivals": state["ivals"],
        }
        if nf:
            carry["pf"] = traj(
                state["fvals"], state["ftarget"], state["fstep"],
                state["felapsed"], state["fdur"],
            )
        if ni:
            carry["pi"] = jnp.broadcast_to(
                state["ivals"][:, :, None], (ni, V, B)
            )

        def body(r, c):
            if nf:
                fvals, ftarget = c["fvals"], c["ftarget"]
                fstep, felapsed = c["fstep"], c["felapsed"]
                fdur, fsdur, pf = c["fdur"], c["fsdur"], c["pf"]
                # smoothing config (kind 4) freezes the in-flight
                # trajectory at its frame (engine KIND_SMOOTH_CFG): clamp
                # the ramp's total duration to the absolute progress at the
                # cfg frame and retarget the value reached there
                sel_c = valid & (kind == 4) & (rnd == r)
                v_c = jnp.where(sel_c, voice, V)
                p_c = jnp.clip(param, 0, nf - 1)
                fsdur = scat(fsdur, p_c, v_c, value.astype(jnp.int32))
                has_cfg = scat(jnp.zeros((nf, V), bool), p_c, v_c, sel_c)
                cfg_frame = scat(
                    jnp.zeros((nf, V), jnp.int32), p_c, v_c, frame
                )
                ln_c = felapsed + cfg_frame
                cur_c = jnp.where(
                    ln_c >= fdur, ftarget,
                    fvals + fstep * ln_c.astype(dtype),
                )
                cut = has_cfg & (fdur > ln_c)
                fdur = jnp.where(cut, ln_c, fdur)
                ftarget = jnp.where(cut, cur_c, ftarget)
                pf = jnp.where(
                    has_cfg[:, :, None]
                    & (t_idx[None, None, :] >= cfg_frame[:, :, None]),
                    cur_c[:, :, None], pf,
                )
                # float set (kind 0): jump, or ramp anchored at the event
                # frame starting from the trajectory's value there
                sel_f = valid & (kind == 0) & (rnd == r)
                v_s = jnp.where(sel_f, voice, V)
                p_s = jnp.clip(param, 0, nf - 1)
                ln_e = pad(felapsed)[p_s, v_s] + frame
                old_v0 = pad(fvals)[p_s, v_s]
                old_step = pad(fstep)[p_s, v_s]
                old_dur = pad(fdur)[p_s, v_s]
                old_tgt = pad(ftarget)[p_s, v_s]
                cur = jnp.where(
                    ln_e >= old_dur, old_tgt,
                    old_v0 + old_step * ln_e.astype(dtype),
                )
                dur = pad(fsdur)[p_s, v_s]
                ramp = dur > 0
                new_step = jnp.where(
                    ramp,
                    (value - cur) / jnp.maximum(dur, 1).astype(dtype),
                    0.0,
                )
                fvals = scat(fvals, p_s, v_s, jnp.where(ramp, cur, value))
                ftarget = scat(ftarget, p_s, v_s, value)
                fstep = scat(fstep, p_s, v_s, new_step)
                fdur = scat(fdur, p_s, v_s, jnp.where(ramp, dur, 0))
                felapsed = scat(felapsed, p_s, v_s, -frame)
                ev_frame = scat(jnp.zeros((nf, V), jnp.int32), p_s, v_s,
                                frame)
                touched = scat(jnp.zeros((nf, V), bool), p_s, v_s, sel_f)
                row = traj(fvals, ftarget, fstep, felapsed, fdur)
                pf = jnp.where(
                    touched[:, :, None]
                    & (t_idx[None, None, :] >= ev_frame[:, :, None]),
                    row, pf,
                )
                c = dict(c, fvals=fvals, ftarget=ftarget, fstep=fstep,
                         felapsed=felapsed, fdur=fdur, fsdur=fsdur, pf=pf)
            if ni:
                sel_i = valid & (kind == 2) & (rnd == r)
                v_i = jnp.where(sel_i, voice, V)
                p_i = jnp.clip(param, 0, ni - 1)
                ivals = scat(c["ivals"], p_i, v_i, value.astype(jnp.int32))
                touched_i = scat(jnp.zeros((ni, V), bool), p_i, v_i, sel_i)
                if_frame = scat(
                    jnp.zeros((ni, V), jnp.int32), p_i, v_i, frame
                )
                pi = jnp.where(
                    touched_i[:, :, None]
                    & (t_idx[None, None, :] >= if_frame[:, :, None]),
                    ivals[:, :, None], c["pi"],
                )
                c = dict(c, ivals=ivals, pi=pi)
            return c

        relevant = valid & ((kind == 0) | (kind == 2) | (kind == 4))
        n_rounds = jnp.max(jnp.where(relevant, rnd, -1)) + 1
        carry = jax.lax.fori_loop(0, n_rounds, body, carry)

        # retrigger set masks, block-rate flags, triggers: round-free (a
        # mask fires at every event's frame; flags were host-deduped)
        iset = None
        if ni and any(
            getattr(p, "retrigger", False)
            for p in self.voice.params
            if p.ptype in ("integer", "bool")
        ):
            sel_i = valid & (kind == 2)
            v_i = jnp.where(sel_i, voice, V)
            p_i = jnp.clip(param, 0, ni - 1)
            iset = jnp.zeros((ni, V + 1, B), dtype=bool)
            iset = iset.at[p_i, v_i, frame].set(sel_i)[:, :V, :]
        sel_a = valid & (kind == 3)
        v_a = jnp.where(sel_a, voice, V)
        active = jnp.concatenate(
            [state["active"], jnp.zeros((1,), bool)]
        ).at[v_a].set(value > 0.5)[:V]
        sel_n = valid & (kind == 5)
        v_n = jnp.where(sel_n, voice, V)
        idle = jnp.concatenate(
            [state["idle"], jnp.zeros((1,), bool)]
        ).at[v_n].set(False)[:V]
        trig = jnp.zeros((max(n_trig, 1), V + 1, B), dtype=bool)
        sel_t = valid & (kind == 1)
        v_t = jnp.where(sel_t, voice, V)
        trig = trig.at[
            jnp.clip(param, 0, trig.shape[0] - 1), v_t, frame
        ].set(True)[:, :V, :]

        fstate = (carry["fvals"], carry["ftarget"], carry["fstep"],
                  carry["felapsed"], carry["fdur"], carry["fsdur"])
        return (carry.get("pf"), fstate, carry["ivals"],
                carry.get("pi"), iset, trig, active, idle)

    def _apply_events_breakpoints(self, ctx: AudioCtx, state, events):
        """Round fold for the Pallas kernel banks: same sequential burst
        semantics as ``_apply_events_rounds`` but instead of materializing
        [nf, V, B] per-sample planes (too much HBM traffic at 100k+ voices)
        it emits D = ``kernel_burst_depth`` per-round trajectory
        BREAKPOINTS per slot — (v0, step, rem, tgt, frame), each [D, nf, V]
        — that the kernels fold per sample in VMEM (``_mat``): a piece is
        live for ``i >= frame``; untouched rounds get the ``frame = B``
        sentinel so their select is a no-op. D is static (kernel operand
        shapes), so the fold is a D-step Python loop; host packing caps
        each slot's burst at its last D events.

        Returns (fstate, pieces, ivals, active, idle) with fstate =
        (fvals, ftarget, fstep, felapsed, fdur, fsdur) the post-burst
        anchored ramp state (set events write felapsed = -frame), and
        pieces = (bv0, bstep, bdur, btgt, bframe) — each piece's ramp
        anchors at its own event frame, so its in-kernel progress is
        ``i - frame`` with no elapsed term."""
        V = self.n_voices
        B = ctx.block_size
        dtype = ctx.dtype
        D = int(self.kernel_burst_depth or 1)
        nf = state["fvals"].shape[0]
        ni = state["ivals"].shape[0]

        voice = events["voice"]
        param = events["param"]
        kind = events["kind"]
        value = events["value"]
        frame = events["frame"]
        rnd = events["round"]
        valid = voice >= 0

        def pad(arr):
            return jnp.concatenate(
                [arr, jnp.zeros((arr.shape[0], 1), arr.dtype)], axis=1
            )

        def scat(arr, p_sel, v_sel, vals):
            return pad(arr).at[p_sel, v_sel].set(vals)[:, :V]

        fvals, ftarget = state["fvals"], state["ftarget"]
        fstep, felapsed = state["fstep"], state["felapsed"]
        fdur, fsdur, ivals = state["fdur"], state["fsdur"], state["ivals"]
        pieces = []
        for r in range(D):
            if nf:
                # smoothing config (kind 4): freeze an in-flight ramp at its
                # frame (engine KIND_SMOOTH_CFG; see _apply_events_rounds)
                sel_c = valid & (kind == 4) & (rnd == r)
                v_c = jnp.where(sel_c, voice, V)
                p_c = jnp.clip(param, 0, nf - 1)
                fsdur = scat(fsdur, p_c, v_c, value.astype(jnp.int32))
                has_cfg = scat(jnp.zeros((nf, V), bool), p_c, v_c, sel_c)
                cfg_frame = scat(
                    jnp.zeros((nf, V), jnp.int32), p_c, v_c, frame
                )
                ln_c = felapsed + cfg_frame
                cur_c = jnp.where(
                    ln_c >= fdur, ftarget,
                    fvals + fstep * ln_c.astype(dtype),
                )
                cut = has_cfg & (fdur > ln_c)
                fdur = jnp.where(cut, ln_c, fdur)
                ftarget = jnp.where(cut, cur_c, ftarget)
                # the cfg's visible piece: hold the frozen value from its
                # frame on (a cfg that doesn't cut changes nothing visible)
                pv0 = jnp.where(cut, cur_c, jnp.zeros((), dtype))
                pstep = jnp.zeros((nf, V), dtype)
                pdur = jnp.zeros((nf, V), jnp.int32)
                ptgt = pv0
                pframe = jnp.where(cut, cfg_frame, B)
                # float set (kind 0): ramp/jump anchored at the event frame
                # from the current trajectory's value there
                sel_f = valid & (kind == 0) & (rnd == r)
                v_s = jnp.where(sel_f, voice, V)
                p_s = jnp.clip(param, 0, nf - 1)
                ln_e = pad(felapsed)[p_s, v_s] + frame
                old_v0 = pad(fvals)[p_s, v_s]
                old_step = pad(fstep)[p_s, v_s]
                old_dur = pad(fdur)[p_s, v_s]
                old_tgt = pad(ftarget)[p_s, v_s]
                cur = jnp.where(
                    ln_e >= old_dur, old_tgt,
                    old_v0 + old_step * ln_e.astype(dtype),
                )
                dur = pad(fsdur)[p_s, v_s]
                ramp = dur > 0
                new_step = jnp.where(
                    ramp,
                    (value - cur) / jnp.maximum(dur, 1).astype(dtype),
                    0.0,
                )
                new_v0 = jnp.where(ramp, cur, value)
                new_dur = jnp.where(ramp, dur, 0)
                fvals = scat(fvals, p_s, v_s, new_v0)
                ftarget = scat(ftarget, p_s, v_s, value)
                fstep = scat(fstep, p_s, v_s, new_step)
                fdur = scat(fdur, p_s, v_s, new_dur)
                felapsed = scat(felapsed, p_s, v_s, -frame)
                pv0 = scat(pv0, p_s, v_s, new_v0)
                pstep = scat(pstep, p_s, v_s, new_step)
                pdur = scat(pdur, p_s, v_s, new_dur)
                ptgt = scat(ptgt, p_s, v_s, value)
                pframe = scat(pframe, p_s, v_s, frame)
                pieces.append((pv0, pstep, pdur, ptgt, pframe))
            if ni:
                sel_i = valid & (kind == 2) & (rnd == r)
                v_i = jnp.where(sel_i, voice, V)
                p_i = jnp.clip(param, 0, ni - 1)
                ivals = scat(ivals, p_i, v_i, value.astype(jnp.int32))
        if nf:
            stacked = tuple(
                jnp.stack([p[j] for p in pieces]) for j in range(5)
            )
        else:
            stacked = None

        sel_a = valid & (kind == 3)
        v_a = jnp.where(sel_a, voice, V)
        active = jnp.concatenate(
            [state["active"], jnp.zeros((1,), bool)]
        ).at[v_a].set(value > 0.5)[:V]
        sel_n = valid & (kind == 5)
        v_n = jnp.where(sel_n, voice, V)
        idle = jnp.concatenate(
            [state["idle"], jnp.zeros((1,), bool)]
        ).at[v_n].set(False)[:V]

        fstate = (fvals, ftarget, fstep, felapsed, fdur, fsdur)
        return fstate, stacked, ivals, active, idle

    @staticmethod
    def _advance_ramps(fstate, B):
        """State after one block of per-sample ramping: integer-only —
        the anchor value/step/target never change between events, so any
        block partitioning carries bit-identical state (a ramp set at
        frame f wrote felapsed = -f, landing on B - f frames ramped by
        the boundary; the min clamp at fdur keeps one superblock advance
        identical to k native advances)."""
        fvals, ftarget, fstep, felapsed, fdur, fsdur = fstate
        el_next = jnp.minimum(felapsed + B, fdur)
        return (fvals, ftarget, fstep, el_next, fdur, fsdur)

    # above this many voices, per-sample scans inside voices beat
    # closed forms (AudioCtx.wide_batch; measured crossover on a v5e)
    WIDE_BATCH_VOICES = 4096

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        import dataclasses

        V = self.n_voices
        B = ctx.block_size
        dtype = ctx.dtype
        if V >= self.WIDE_BATCH_VOICES and not ctx.wide_batch:
            ctx = dataclasses.replace(ctx, wide_batch=True)

        int_specs = [
            p for p in self.voice.params if p.ptype in ("integer", "bool")
        ]
        if events is not None and "round" in events:
            # burst path (burst_rounds banks): the round fold already
            # materialized exact per-sample planes for floats and ints —
            # engine-parity for arbitrary same-block event bursts
            (pf, fstate, ivals, pi, iset, trig, active, idle) = \
                self._apply_events_rounds(ctx, state, events)
            voice_params = {}
            for i, name in enumerate(self._float_names):
                voice_params[name] = pf[i]
            for i, name in enumerate(self._int_names):
                voice_params[name] = pi[i]
                if getattr(int_specs[i], "retrigger", False):
                    voice_params[name + "_set"] = (
                        iset[i] if iset is not None
                        else jnp.zeros((V, B), dtype=bool)
                    )
            for i, name in enumerate(self._trig_names):
                voice_params[name] = trig[i]
        else:
            (fstate, ivals, active, trig, fframe, (iframe, iset), idle,
             old_fstate) = self._apply_events(ctx, state, events)
            fvals, ftarget, fstep, felapsed, fdur, fsdur = fstate

            # build per-voice param dict: [V, B] leaves for vmap axis 0.
            # Floats ramp per sample toward their target (per-voice
            # smoothing), snapping exactly to the target when the ramp
            # completes. Float sets are sample-accurate: samples before the
            # event frame follow the OLD trajectory (pre-event ramp state),
            # samples at/after it the new one, and a ramp's progress counts
            # from its event frame (knaster WrPreciseTiming +
            # WrSmoothParams semantics at bank scale; with no event the two
            # trajectories are identical, so the select is free).
            t_idx = jnp.arange(B, dtype=jnp.int32)

            def materialize(vals, target, step, elapsed, dur, i):
                # absolute ramp progress: elapsed-at-block-start + local t
                # (a set event wrote elapsed = -frame, so its progress is
                # t - frame) — anchor + step * progress in ONE rounding
                ln = elapsed[i][:, None] + t_idx[None, :]
                ramp_done = ln >= dur[i][:, None]
                return jnp.where(
                    ramp_done,
                    target[i][:, None],
                    vals[i][:, None] + step[i][:, None] * ln.astype(dtype),
                )

            voice_params = {}
            for i, name in enumerate(self._float_names):
                if fframe is None:  # no events: trajectories coincide
                    voice_params[name] = materialize(
                        fvals, ftarget, fstep, felapsed, fdur, i
                    )
                    continue
                new = materialize(fvals, ftarget, fstep, felapsed, fdur, i)
                # pre-set trajectory = block-start state WITH any same-block
                # smoothing-config freeze applied (old_fstate), so a cfg
                # event stops an in-flight ramp at its frame even before a
                # later set
                old = materialize(*old_fstate, i)
                voice_params[name] = jnp.where(
                    t_idx[None, :] >= fframe[i][:, None], new, old
                )
            for i, name in enumerate(self._int_names):
                new_row = jnp.broadcast_to(ivals[i][:, None], (V, B))
                if iframe is None:
                    voice_params[name] = new_row
                else:
                    # int sets apply at their exact frame (engine parity)
                    old_row = jnp.broadcast_to(
                        state["ivals"][i][:, None], (V, B)
                    )
                    voice_params[name] = jnp.where(
                        t_idx[None, :] >= iframe[i][:, None], new_row, old_row
                    )
                if getattr(int_specs[i], "retrigger", False):
                    voice_params[name + "_set"] = (
                        iset[i] if iset is not None
                        else jnp.zeros((V, B), dtype=bool)
                    )
            for i, name in enumerate(self._trig_names):
                voice_params[name] = trig[i]

        zero_in = jnp.zeros((V, 0, B), dtype=dtype)

        def one_voice(vstate, vin, vparams):
            return normalize_process_result(
                self.voice.process(ctx, vstate, vin, vparams), ctx
            )

        # voices may declare state keys whose value is identical across the
        # bank (shared_state_keys, e.g. PluckedVoice's ring tile pointer):
        # those leaves stay UNBATCHED through the vmap, so in-voice dynamic
        # slicing on them keeps a scalar start index — on TPU that is a
        # single dynamic_update_slice instead of a V-row scatter (60x at
        # 64k voices) or a full-buffer select
        shared = set(getattr(self.voice, "shared_state_keys", ()) or ())
        if shared and isinstance(state["voices"], dict):
            st_axes = {
                k: (None if k in shared else 0) for k in state["voices"]
            }
            vmapped = jax.vmap(one_voice, in_axes=(st_axes, 0, 0),
                               out_axes=(st_axes, 0, 0))
        else:
            vmapped = jax.vmap(one_voice)

        new_vstate, outs, dones = vmapped(
            state["voices"], zero_in, voice_params
        )
        if self.track_idle:
            # latch per-voice done edges for VoicePool auto-release
            idle = idle | jnp.any(dones, axis=1)
        # outs: [V, out_ch, B]
        outs = jnp.where(active[:, None, None], outs, jnp.zeros_like(outs))
        if self.mix == "sum":
            out = jnp.sum(outs, axis=0)
        else:
            out = outs.reshape(V * self.voice.outputs, B)
        done = jnp.zeros((B,), dtype=bool)  # banks never free themselves
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B
        )
        new_state = {
            "voices": new_vstate,
            "fvals": fvals,
            "ftarget": ftarget,
            "fstep": fstep,
            "felapsed": felapsed,
            "fdur": fdur,
            "fsdur": fsdur,
            "ivals": ivals,
            "active": active,
            "idle": idle,
        }
        return new_state, out, done
