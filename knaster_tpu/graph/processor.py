"""AudioProcessor: the block runner and non-realtime render loop.

TPU-native analog of knaster_graph/src/processor.rs (AudioProcessor). In the
reference this object is moved to the audio thread and ``run()`` is called
from the device callback; here the **non-realtime path is primary**
(processor.rs:3-5 documents the same run-in-a-loop usage for offline
rendering): each ``run`` executes the compiled XLA block program once and
advances the frame clock. ``render()`` is the fast bounce path — it pre-stages
all scheduled events into stacked tensors and scans over blocks entirely
on-device.

Graph edits are picked up between blocks: if the graph revision changed, the
graph is recompiled and node state is carried over by node id (the functional
equivalent of swapping TaskData over the ring buffer and ``TakeFromTask``,
graph_gen.rs:93-109 / task.rs:101-131).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compile import (CompiledGraph, compile_graph, get_evchunk_fn,
                      get_full_super_fn, get_full_super_scan_fn,
                      get_super_fn, get_super_scan_fn)
from .graph import Done, Graph
from .param_engine import events_from_lists
from .scheduling import ScheduledEvent


@dataclass
class AudioProcessorOptions:
    """reference processor.rs:23-45 AudioProcessorOptions."""

    block_size: int = 64
    sample_rate: int = 48000
    # max scheduled events applied per block (ring_buffer_size analog)
    event_capacity: int = 64
    log_channel_capacity: int = 100
    # compiler: vmap same-kind nodes at equal depth into one call
    auto_batch: bool = True
    # pre-compile the reverse state-carry (undo direction) on a worker
    # thread after every program swap, so recurring push/free cycles hit a
    # warm carry on their FIRST cycle (the reference's TaskData swap is µs
    # always, graph.rs:1707-1726; our equivalent one-time cost is this jit)
    prewarm_undo_carry: bool = True
    # bounce path: blocks per on-device scan call (fixed so the scan is
    # compiled once; remainders run block-by-block)
    render_chunk_blocks: int = 128



_copy_state_jit = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))


def copy_state(state):
    """Sharding-preserving deep copy of a state pytree in ONE jitted
    dispatch. Eager per-leaf copies both cost a tunnel round-trip per leaf
    and (for mesh-sharded leaves) trip an XLA replicated-vs-NamedSharding
    assertion in eager mode; under jit the input shardings propagate. The
    jitted copy lives at module scope so repeated swaps/warms with the
    same state structure hit the jit cache instead of re-tracing."""
    return _copy_state_jit(state)


class AudioProcessor:
    """Runs a Graph one block at a time; also the offline bounce engine."""

    def __init__(self, graph: Graph, options: Optional[AudioProcessorOptions] = None):
        self.graph = graph.root()
        self.options = options or AudioProcessorOptions()
        self.compiled: Optional[CompiledGraph] = None
        self.state = None
        self._last_out = None
        self.freed = False
        # leftover samples from a render() that wasn't block-aligned; the
        # next render() consumes them first so bounces are sample-continuous
        self._pending: Optional[np.ndarray] = None

    # ------------------------------------------------------------- factory
    @staticmethod
    def new(
        inputs: int = 0,
        outputs: int = 2,
        options: Optional[AudioProcessorOptions] = None,
        dtype=None,
    ) -> Tuple[Graph, "AudioProcessor"]:
        """Create a top-level Graph + processor (processor.rs:69-116)."""
        options = options or AudioProcessorOptions()
        g = Graph(
            inputs=inputs,
            outputs=outputs,
            sample_rate=options.sample_rate,
            block_size=options.block_size,
            dtype=dtype,
        )
        return g, AudioProcessor(g, options)

    # ------------------------------------------------------------ internals
    def _ensure_compiled(self) -> None:
        if self.compiled is not None and self.compiled.revision == self.graph.revision:
            return
        if self._async_recompile and self.compiled is not None:
            # glitch-free live edits (the reference's TaskData swap over the
            # ring, graph_gen.rs:93-109): keep rendering the old program
            # while a worker compiles the new one; swap between blocks
            self._kick_async_compile()
            return
        prev_compiled = self.compiled
        prev_state = self.state
        self.compiled = compile_graph(
            self.graph, self.options.event_capacity, self.options.auto_batch
        )
        if (
            self.options.prewarm_undo_carry
            and prev_compiled is not None
            and prev_compiled.cache_entry is not None
            and self.compiled.signature is not None
        ):
            # DEFER the undo-carry prewarm until after the first block of
            # the new program is dispatched (see run()): the worker thread
            # is pure-Python jit tracing, and on a single-core host its
            # GIL time landed inside the edit->audible window — the
            # round-5 edit_latency_probe measured the same cycle at 14 ms
            # phase-split vs 77 ms with the thread kicked here.
            self._pending_prewarm = (prev_compiled, self.compiled)
        self.state = self.compiled.init_state(prev_state, prev_compiled)

    # undo-carry prewarm deferred out of the edit->audible window (run())
    _pending_prewarm = None
    _prewarm_thread = None

    def join_background(self, timeout: float = 120.0) -> None:
        """Wait for background compile/prewarm workers to finish.

        A daemon worker caught mid-XLA-compile at interpreter exit
        terminates the process from C++ ("terminate called ... exception
        not rethrown"); StreamBackend.stop() calls this so a live-edited
        stream shuts down cleanly."""
        for t in (self._compile_thread, self._prewarm_thread):
            if t is not None and t.is_alive():
                t.join(timeout=timeout)

    # -- async recompile (used by the streaming backend) -------------------
    _async_recompile = False
    _compile_thread = None
    _compiled_next = None
    # scan lengths (blocks) the runner will execute; the async-compile worker
    # pre-warms these on the NEW program so the post-swap chunk render does
    # not stall the producer on a jit trace (the ring only holds ~100s of ms)
    _warm_scan_lengths: Tuple[int, ...] = ()
    # the stream's chunk length (blocks) — the one-dispatch eventful-chunk
    # program is warmed for the length render() will request, not a guess
    _warm_chunk_len: int = 0

    def enable_async_recompile(self, enabled: bool = True) -> None:
        """Compile graph edits on a worker thread and swap between blocks,
        so a running stream keeps playing the old program during the (long)
        XLA compile instead of stalling."""
        self._async_recompile = bool(enabled)

    def _warm_programs(self, cg: CompiledGraph, base_state) -> None:
        """Execute every program + scan length the runner can hit, on COPIES
        of ``base_state`` (the scan fns donate their state argument)."""
        ev = cg.empty_events()
        inp = jnp.zeros((self.graph.inputs, self.graph.block_size), self.graph.dtype)
        cp = copy_state
        out = cg.render_fast(cp(base_state), inp)
        jax.block_until_ready(out[1])
        out = cg.render(cp(base_state), ev, inp)
        jax.block_until_ready(out[1])
        if not self._warm_scan_lengths:
            return
        ev_np = jax.tree_util.tree_map(np.asarray, ev)
        from .compile import get_super_fn as _gsf

        for sub in self._warm_scan_lengths:
            shape = (sub, self.graph.inputs, self.graph.block_size)
            in_stack = jnp.zeros(shape, self.graph.dtype)
            super_fn = _gsf(cg, sub)
            if super_fn is not None:
                out = super_fn(
                    cp(base_state),
                    jnp.zeros(
                        (self.graph.inputs, sub * self.graph.block_size),
                        self.graph.dtype,
                    ),
                )
                jax.block_until_ready(out[1])
            elif sub >= 16:
                out = _get_scan_fn(cg)(cp(base_state), in_stack)
                jax.block_until_ready(out[1])
            if sub >= 16:  # eventful runs below this render block-by-block
                ev_stack = jax.tree_util.tree_map(
                    lambda x: np.broadcast_to(x, (sub,) + x.shape).copy(),
                    ev_np,
                )
                out = _get_full_scan_fn(cg)(cp(base_state), ev_stack, in_stack)
                jax.block_until_ready(out[1])
                cg.full_scan_warm.add(sub)
        # the one-dispatch eventful-chunk program, at the chunk length
        # render() will actually request (mirrors its clamps: the
        # render_chunk_blocks cap and the check_done_every=16 default when
        # the graph has done actions), plus its exact-length remainder
        from .compile import get_evchunk_fn as _gec

        n_chunk = self._warm_chunk_len or max(self._warm_scan_lengths)
        n_chunk = min(n_chunk, self.options.render_chunk_blocks)
        if cg.has_done_actions:
            n_chunk = min(n_chunk, 16)
        if n_chunk - 1 >= 2:
            # the evchunk's tail length, also used standalone when an asap
            # batch misses the fused path — EXECUTE it (creating the jit
            # alone leaves the call cache cold)
            tail_fn = _gsf(cg, n_chunk - 1)
            if tail_fn is not None:
                out = tail_fn(
                    cp(base_state),
                    jnp.zeros(
                        (self.graph.inputs,
                         (n_chunk - 1) * self.graph.block_size),
                        self.graph.dtype,
                    ),
                )
                jax.block_until_ready(out[1])
        evfn = _gec(cg, n_chunk)
        if evfn is not None:
            B = self.graph.block_size
            out = evfn(
                cp(base_state), cg.empty_events(),
                jnp.zeros((self.graph.inputs, B), self.graph.dtype),
                jnp.zeros((self.graph.inputs, (n_chunk - 1) * B),
                          self.graph.dtype),
            )
            jax.block_until_ready(out[1])
        # float-event programs (collapsed chains only): trigger-free
        # control batches stay on the chain kernel (get_float_fn)
        from .compile import get_float_evchunk_fn as _gfe
        from .compile import get_float_fn as _gff

        ffn = _gff(cg)
        if ffn is not None:
            B = self.graph.block_size
            out = ffn(
                cp(base_state), cg.empty_events(),
                jnp.zeros((self.graph.inputs, B), self.graph.dtype),
            )
            jax.block_until_ready(out[1])
            fev = _gfe(cg, n_chunk)
            if fev is not None:
                out = fev(
                    cp(base_state), cg.empty_events(),
                    jnp.zeros((self.graph.inputs, B), self.graph.dtype),
                    jnp.zeros((self.graph.inputs, (n_chunk - 1) * B),
                              self.graph.dtype),
                )
                jax.block_until_ready(out[1])
        # the general eventful-superblock chunk program (events anywhere in
        # the chunk = one dispatch) — superblock-eligible graphs only
        B = self.graph.block_size
        fsfn = get_full_super_fn(cg, n_chunk)
        if fsfn is not None:
            out = fsfn(
                cp(base_state), cg.empty_events(),
                jnp.zeros((self.graph.inputs, n_chunk * B),
                          self.graph.dtype),
            )
            jax.block_until_ready(out[1])
        else:
            # capped graphs: the eventful k-superblock scan at the chunk
            # length (one dispatch for an eventful chunk at the capped
            # superblock throughput)
            kc = self._super_scan_k(n_chunk, cg)
            ssfn = (get_full_super_scan_fn(cg, kc) if kc >= 2 else None)
            if ssfn is not None:
                reps = n_chunk // kc
                ev1 = jax.tree_util.tree_map(np.asarray, cg.empty_events())
                ev_stack = jax.tree_util.tree_map(
                    lambda x: np.broadcast_to(
                        x, (reps,) + x.shape
                    ).copy(),
                    ev1,
                )
                out = ssfn(
                    cp(base_state), ev_stack,
                    jnp.zeros((reps, self.graph.inputs, kc * B),
                              self.graph.dtype),
                )
                jax.block_until_ready(out[1])
            elif n_chunk >= 2:
                # superblock-ineligible (feedback edges): warm the whole-
                # chunk full-program scan and record the length so the
                # runner may take it for eventful chunks
                in_stack = jnp.zeros(
                    (n_chunk, self.graph.inputs, B), self.graph.dtype
                )
                ev1 = jax.tree_util.tree_map(np.asarray, cg.empty_events())
                ev_stack = jax.tree_util.tree_map(
                    lambda x: np.broadcast_to(
                        x, (n_chunk,) + x.shape
                    ).copy(),
                    ev1,
                )
                out = _get_full_scan_fn(cg)(
                    cp(base_state), ev_stack, in_stack
                )
                jax.block_until_ready(out[1])
                cg.full_scan_warm.add(n_chunk)

    def _kick_async_compile(self) -> None:
        import threading

        ready = self._compiled_next
        if ready is not None and ready.revision == self.graph.revision:
            # worker finished: swap program + carry state (TakeFromTask)
            self.state = ready.init_state(self.state, self.compiled)
            self.compiled = ready
            self._compiled_next = None
            return
        if self._compile_thread is not None and self._compile_thread.is_alive():
            return  # still compiling (possibly an older revision; re-kicked after)
        if ready is not None and ready.revision != self.graph.revision:
            self._compiled_next = None  # stale result; recompile

        revision = self.graph.revision

        # SNAPSHOT the live state: the producer keeps rendering while the
        # worker compiles, and the render/scan programs donate their state
        # argument — the buffers behind ``self.state`` get deleted under the
        # worker, so warming from a live reference raises "Array has been
        # deleted" mid-warm (and an unwarmed program would stall the stream
        # with a jit trace at swap time)
        live_state = copy_state(self.state)
        live_compiled = self.compiled

        def worker():
            cg = compile_graph(
                self.graph, self.options.event_capacity, self.options.auto_batch
            )
            # pre-warm everything the swap will execute: the state carry-over
            # (many tiny eager ops compile on first use), both single-block
            # programs, AND every scan length the runner uses — the post-swap
            # chunk render must not pay a jit trace while a stream's ring
            # drains. All warmup renders run on COPIES (the scan fns donate
            # state; the live stream's buffers must survive).
            try:
                st = cg.init_state(live_state, live_compiled)
                self._warm_programs(cg, st)
            except Exception:
                import warnings

                warnings.warn(
                    "async-recompile warmup failed; the program swap may "
                    "stall on a jit compile", RuntimeWarning, stacklevel=1
                )
            self._compiled_next = cg

        self._compile_thread = threading.Thread(target=worker, daemon=True)
        self._compile_thread.start()

    def _collect_due_events(self, horizon_blocks: int = 1):
        """Pop events due within the next ``horizon_blocks`` blocks and
        convert them to per-block event lists (slot-resolved).

        Overflow is graceful (the reference's ring holds 1000 events and
        simply drains what fits per callback, processor.rs:36-44): when a
        block's events exceed the engine capacity, the *tail* of that block's
        bucket spills into the following block — floats/ints clamp to frame 0
        of the next block, triggers keep their intra-block frame — and past
        the horizon it is re-queued for the next collection. Spilling whole
        tails (never individual events) preserves per-slot ordering.
        """
        B = self.graph.block_size
        clock = self.graph.clock.frames
        end = clock + B * horizon_blocks
        # atomic drain: swap the queue out under the graph's event lock.
        # With StreamBackend the control thread appends via _queue_event /
        # token activate while the producer thread runs this; both sides
        # hold event_lock so an extend can never straddle the swap and land
        # on the abandoned list.
        with self.graph.event_lock:
            pending = self.graph.event_queue
            self.graph.event_queue = []
        due, keep = [], []
        for ev in pending:
            if ev.due_frame < end:
                due.append(ev)
            else:
                keep.append(ev)
        if keep:
            with self.graph.event_lock:
                self.graph.event_queue.extend(keep)

        per_block: List[Tuple[list, list, list, dict]] = [
            ([], [], [], {}) for _ in range(horizon_blocks)
        ]
        cap = self.compiled.event_capacity
        layout = self.compiled.layout

        def requeue(ev, due_frame):
            self.graph.event_queue.append(
                ScheduledEvent(
                    due_frame, ev.node_id, ev.param_idx, ev.payload, order=ev.order
                )
            )

        def place(ev, bi, frame, which, item, capacity, keep_frame):
            """Append ``item`` to bucket ``bi``; cascade to later blocks when
            full; re-queue past the horizon."""
            while bi < horizon_blocks:
                bucket = per_block[bi]
                lst = (
                    bucket[which]
                    if which < 3
                    else bucket[3].setdefault(ev.node_id, [])
                )
                if len(lst) < capacity:
                    lst.append(item)
                    return
                bi += 1
                if not keep_frame:
                    frame = 0
                item = (frame,) + item[1:]
            # spilled past the horizon: apply at the first uncollected block
            requeue(ev, end + (frame if keep_frame else 0))

        for ev in sorted(due, key=lambda e: (max(e.due_frame, clock), e.order)):
            frame_abs = max(ev.due_frame, clock)
            bi = (frame_abs - clock) // B
            frame = frame_abs - clock - bi * B
            p = ev.payload
            if p[0].startswith("voice_"):
                # per-node event channel (e.g. VoiceBank per-voice control)
                entry = self.compiled.entries.get(ev.node_id)
                if entry is None:
                    continue  # node freed: expire silently
                vcap = entry.ugen.event_capacity
                if p[0] == "voice_float":
                    item = (frame, p[1], p[2], 0, p[3])
                elif p[0] == "voice_trig":
                    item = (frame, p[1], p[2], 1, 0.0)
                elif p[0] == "voice_int":
                    item = (frame, p[1], p[2], 2, float(p[3]))
                elif p[0] == "voice_active":
                    item = (frame, p[1], 0, 3, 1.0 if p[2] else 0.0)
                elif p[0] == "voice_smooth":
                    item = (frame, p[1], p[2], 4, float(p[3]))
                elif p[0] == "voice_idle_clear":
                    item = (frame, p[1], 0, 5, 0.0)
                else:
                    continue
                place(ev, bi, frame, 3, item, vcap,
                      keep_frame=p[0] == "voice_trig")
                continue
            key = None
            # resolve slot; events for freed nodes expire silently
            # (reference graph_gen.rs:122-126)
            for pidx_key in ((ev.node_id, ev.param_idx),):
                if pidx_key in layout.slots:
                    key = layout.slots[pidx_key]
            if key is None:
                # during an async recompile the running layout may not know
                # freshly-pushed nodes yet: keep their events queued so they
                # apply (asap) after the program swap
                if self._async_recompile:
                    try:
                        self.graph._node(ev.node_id)
                        self.graph.event_queue.append(ev)
                    except Exception:
                        pass
                continue
            typ, slot = key
            if p[0] == "set_float" and typ == "float":
                place(ev, bi, frame, 0, (frame, slot, p[1], 0, 0, 0, 0), cap,
                      keep_frame=False)
            elif p[0] == "smooth_cfg" and typ == "float":
                place(ev, bi, frame, 0, (frame, slot, 0.0, 1, p[1], p[2], p[3]),
                      cap, keep_frame=False)
            elif p[0] == "trig" and typ == "trigger":
                place(ev, bi, frame, 1, (frame, slot), cap, keep_frame=True)
            elif p[0] == "set_int" and typ == "int":
                place(ev, bi, frame, 2, (frame, slot, p[1]), cap,
                      keep_frame=False)
        return per_block

    def _empty_events_np(self):
        """Host (numpy) copy of the all-padding event tensors, cached."""
        cached = getattr(self, "_empty_ev_np", None)
        if cached is not None and cached[0] is self.compiled:
            return cached[1]
        ev = jax.tree_util.tree_map(np.asarray, self.compiled.empty_events())
        self._empty_ev_np = (self.compiled, ev)
        return ev

    def _events_tensor(self, lists):
        fl, tl, il, nd = lists
        if not (fl or tl or il or nd):
            cached = getattr(self, "_empty_ev_dev", None)
            if cached is not None and cached[0] is self.compiled:
                return cached[1]
            ev = self.compiled.empty_events()
            self._empty_ev_dev = (self.compiled, ev)
            return ev
        ev = events_from_lists(
            self.compiled.event_capacity, fl, tl, il, dtype=self.graph.dtype
        )
        for nid in self.compiled.order:
            ugen = self.compiled.entries[nid].ugen
            if ugen.event_capacity > 0:
                ev[self.compiled.event_key(nid)] = ugen.node_events_from_lists(
                    nd.get(nid, []), dtype=self.graph.dtype
                )
        return ev

    def _events_stack(self, per_block_lists):
        """Stack per-block event tensors into [n, ...] arrays for the
        full-program scan (numpy throughout: one host→device upload when the
        scan consumes the stack)."""
        empty = self._empty_events_np()
        blocks = [
            self._events_tensor(lists) if any(lists) else empty
            for lists in per_block_lists
        ]
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks
        )

    def _merged_events_lists(self, per_block):
        """Combine per-block event lists into ONE set of lists with frames
        offset to be relative to the first block's start (the eventful
        superblock programs' frame base), or None when any merged list
        exceeds its capacity (the caller falls back; `place()` already
        capped each block at the capacity, but a superblock holds the union
        of its blocks)."""
        B = self.graph.block_size
        cap = self.compiled.event_capacity
        fl, tl, il = [], [], []
        nd: Dict[int, list] = {}
        for bi, (f, t, i, n) in enumerate(per_block):
            off = bi * B
            fl.extend((e[0] + off,) + e[1:] for e in f)
            tl.extend((e[0] + off, e[1]) for e in t)
            il.extend((e[0] + off,) + e[1:] for e in i)
            for nid, evs in n.items():
                nd.setdefault(nid, []).extend(
                    (e[0] + off,) + e[1:] for e in evs
                )
        if len(fl) > cap or len(tl) > cap or len(il) > cap:
            return None
        for nid, evs in nd.items():
            entry = self.compiled.entries.get(nid)
            if entry is None or len(evs) > entry.ugen.event_capacity:
                return None
        return fl, tl, il, nd

    def _merged_events_tensor(self, per_block):
        lists = self._merged_events_lists(per_block)
        return None if lists is None else self._events_tensor(lists)

    def _zero_inputs(self, frames: Optional[int] = None):
        """Cached zero input buffers: creating a fresh jnp.zeros is one
        eager device op — an RTT-priced RPC over this tunnel, per chunk, in
        the streaming hot loop. The buffers are read-only (never donated),
        so one per length is safe to reuse."""
        n = frames if frames is not None else self.graph.block_size
        cache = getattr(self, "_zero_in_cache", None)
        if cache is None:
            cache = self._zero_in_cache = {}
        buf = cache.get(n)
        if buf is None:
            buf = cache[n] = jnp.zeros(
                (self.graph.inputs, n), dtype=self.graph.dtype
            )
        return buf

    def _super_scan_k(self, sub: int, cg: Optional[CompiledGraph] = None) -> int:
        """Largest power-of-two superblock multiple k (>= 2) that divides
        ``sub`` and fits the graph's superblock cap, or 0."""
        from .compile import superblock_eligible

        if cg is None:
            cg = self.compiled
        if not superblock_eligible(cg):
            return 0
        B = self.graph.block_size
        k = 1
        while (
            k * 2 <= sub
            and (k * 2) * B <= cg.superblock_max
            and sub % (k * 2) == 0
        ):
            k *= 2
        return k if k >= 2 else 0

    # ------------------------------------------------------------------ run
    def run(self, inputs=None):
        """Process exactly one block (processor.rs:119-179 run)."""
        if self.freed:
            self._last_out = np.zeros(
                (self.graph.outputs, self.graph.block_size), dtype=self.graph.dtype
            )
            self.graph.clock.frames += self.graph.block_size
            return
        self._ensure_compiled()
        (lists,) = self._collect_due_events(1)
        if inputs is None:
            inputs = self._zero_inputs()
        else:
            inputs = jnp.asarray(inputs, dtype=self.graph.dtype)
        fl, tl, il, nd = lists
        if fl or tl or il or nd:
            events = self._events_tensor(lists)
            ffn = None
            if not tl:
                # trigger-free batch: the float-event program keeps
                # collapsed chains on the Pallas kernel (float/int sets
                # and smoothing reach the stage bodies through the
                # materialized per-sample params — exact). Only used when
                # already warm: a mid-stream jit trace would stall.
                from .compile import get_float_fn

                ffn = get_float_fn(self.compiled, existing_only=True)
            if ffn is not None:
                self.state, out, done = ffn(self.state, events, inputs)
            else:
                self.state, out, done = self.compiled.render(
                    self.state, events, inputs
                )
        else:
            # the cheap steady-state program (no event machinery traced in)
            self.state, out, done = self.compiled.render_fast(self.state, inputs)
        self._last_out = out
        self.graph.clock.frames += self.graph.block_size
        if self._pending_prewarm is not None:
            # deferred from _ensure_compiled: warm the undo carry
            # (prev <- new) now that this edit's first block is dispatched
            import threading

            old_cg, new_cg = self._pending_prewarm
            self._pending_prewarm = None
            t = threading.Thread(
                target=old_cg.prewarm_carry, args=(new_cg,), daemon=True
            )
            self._prewarm_thread = t
            t.start()
        if self.compiled.has_done_actions:
            self._apply_done_flags(np.asarray(done))

    def run_without_inputs(self):
        self.run(None)

    def output_block(self) -> np.ndarray:
        """The last rendered block as a numpy array [channels, block_size]."""
        if self._last_out is None:
            return np.zeros(
                (self.graph.outputs, self.graph.block_size), dtype=self.graph.dtype
            )
        return np.asarray(self._last_out)

    # ---------------------------------------------------------- done/free
    def _apply_done_flags(self, done_vec: np.ndarray) -> None:
        if self.compiled is None or not done_vec.any():
            return
        freed_any = False
        for i, nid in enumerate(self.compiled.done_order):
            if not done_vec[i]:
                continue
            entry = self.compiled.entries.get(nid)
            if entry is None:
                continue
            action = entry.done_action
            if action == Done.NONE:
                continue
            target = nid
            if action == Done.FREE_PARENT:
                chain = self.compiled.enclosing.get(nid, [])
                if chain:
                    target = chain[0]  # innermost enclosing subgraph node
                else:
                    # freeing the top-level graph: output silence from now on
                    self.freed = True
                    self.graph.freed = True
                    continue
            try:
                self.graph.free_node(target)
                freed_any = True
            except Exception:
                pass
        if freed_any:
            self.graph.commit()

    # ---------------------------------------------------------------- logs
    def probe_log(self, retries: int = 3):
        """Latest LogProbe captures (reference ArLogReceiver drain analog).

        Safe to call from a control thread while a stream renders: if the
        producer donates the state buffers mid-fetch, the read retries
        against the fresh state (all probe leaves come back in one
        device_get — see core.log.collect_probes)."""
        from ..core.log import collect_probes

        for _ in range(max(retries, 1)):
            compiled, state = self.compiled, self.state
            if compiled is None or state is None:
                return []
            try:
                return collect_probes(compiled, state)
            except RuntimeError:
                continue  # donated under us by a concurrent render
        return []

    # ------------------------------------------------------------- bounce
    def render(
        self,
        seconds: Optional[float] = None,
        frames: Optional[int] = None,
        inputs: Optional[np.ndarray] = None,
        check_done_every: Optional[int] = None,
        fetch: bool = True,
    ) -> np.ndarray:
        """Offline bounce: render ``seconds`` (or ``frames``) of audio.

        Pre-stages all due events into stacked tensors and runs a
        ``lax.scan`` over blocks fully on device — the performance-primary
        path (BASELINE.json: non-realtime rendering is the TPU build's main
        workload). Returns ``[channels, frames]``.

        Note: done-action frees are applied only *after* the scan — every
        ``check_done_every`` blocks, which defaults to 16 when the graph has
        any done actions (pass an explicit value to tune; smaller = frees
        land sooner, larger = fewer host round-trips). A node that frees the
        top-level graph zeroes the output from its done frame in-program.

        With external ``inputs``, render in block-aligned increments: a
        trailing partial block is rendered with the missing input samples
        zero-padded (outputs past ``frames`` can't be computed causally
        without future input), so an unaligned incremental feed diverges
        from a single-call render at those boundaries.

        ``fetch=False`` returns a DEVICE array instead of numpy — no
        device→host transfer. The streaming producer uses it to overlap the
        previous chunk's ~RTT-priced fetch with the next chunk's compute.
        Requires block-aligned ``frames`` and no pending remainder.
        """
        B = self.graph.block_size
        if frames is None:
            if seconds is None:
                raise ValueError("give seconds or frames")
            frames = int(round(seconds * self.graph.sample_rate))

        prefix = None
        if self._pending is not None:
            take = min(frames, self._pending.shape[1])
            prefix = self._pending[:, :take]
            self._pending = (
                self._pending[:, take:] if take < self._pending.shape[1] else None
            )
            if take == frames:
                return prefix
            frames_needed = frames - take
        else:
            frames_needed = frames

        n_blocks = (frames_needed + B - 1) // B
        self._ensure_compiled()
        chunk = self.options.render_chunk_blocks
        if check_done_every is None and self.compiled.has_done_actions:
            # sane default so done-action frees land within ~16 blocks of
            # the flag instead of up to a full render chunk later
            check_done_every = 16
        if check_done_every:
            chunk = min(chunk, check_done_every)

        def block_inputs(bi):
            if inputs is None:
                return self._zero_inputs()  # cached device buffer
            i0 = bi * B
            seg = np.zeros((self.graph.inputs, B), self.graph.dtype)
            avail = np.asarray(inputs)[:, i0 : i0 + B]
            seg[:, : avail.shape[1]] = avail
            return jnp.asarray(seg)

        def in_stack_for(start_block, n):
            if inputs is None:
                cache = getattr(self, "_zero_in_cache", None)
                if cache is None:
                    cache = self._zero_in_cache = {}
                buf = cache.get(("stack", n))
                if buf is None:
                    buf = cache[("stack", n)] = jnp.zeros(
                        (n, self.graph.inputs, B), dtype=self.graph.dtype
                    )
                return buf
            i0 = start_block * B
            avail = np.asarray(inputs)[:, i0 : i0 + n * B]
            pad = n * B - avail.shape[1]
            if pad > 0:
                avail = np.pad(avail, ((0, 0), (0, pad)))
            seg = np.moveaxis(avail.reshape(self.graph.inputs, n, B), 1, 0)
            return jnp.asarray(seg, dtype=self.graph.dtype)

        def in_super_stack_for(start_block, sub, k):
            """[sub//k, inputs, k*B] stack for the scan-of-superblocks."""
            n = sub // k
            if inputs is None:
                cache = getattr(self, "_zero_in_cache", None)
                if cache is None:
                    cache = self._zero_in_cache = {}
                key = ("sstack", n, k)
                buf = cache.get(key)
                if buf is None:
                    buf = cache[key] = jnp.zeros(
                        (n, self.graph.inputs, k * B), dtype=self.graph.dtype
                    )
                return buf
            i0 = start_block * B
            avail = np.asarray(inputs)[:, i0 : i0 + sub * B]
            pad = sub * B - avail.shape[1]
            if pad > 0:
                avail = np.pad(avail, ((0, 0), (0, pad)))
            seg = np.moveaxis(
                avail.reshape(self.graph.inputs, n, k * B), 1, 0
            )
            return jnp.asarray(seg, dtype=self.graph.dtype)

        def in_super_for(start_block, n):
            """[inputs, n*B] flat segment for the superblock program."""
            if inputs is None:
                return self._zero_inputs(n * B)  # cached device buffer
            i0 = start_block * B
            avail = np.asarray(inputs)[:, i0 : i0 + n * B]
            pad = n * B - avail.shape[1]
            if pad > 0:
                avail = np.pad(avail, ((0, 0), (0, pad)))
            return jnp.asarray(avail, dtype=self.graph.dtype)

        # host-dispatch over the tunnel costs ~ms per call: event-free runs
        # are covered by descending power-of-two scans (a bounded set of
        # compiled scan lengths, each traced once), with single blocks only
        # below this floor
        MIN_SCAN = 16

        outs = []
        rendered = 0
        while rendered < n_blocks and not self.freed:
            n = min(chunk, n_blocks - rendered)
            self._ensure_compiled()
            per_block = self._collect_due_events(n)
            eventful = [bool(any(pb)) for pb in per_block]
            # Cover the chunk run-by-run: maximal EVENTFUL runs pay the full
            # program only for their own blocks (a single live control batch
            # must not drag a whole chunk through the event machinery —
            # that's what under-ran the realtime soak), maximal event-free
            # runs ride superblocks / fast scans in descending power-of-two
            # lengths, with single-block calls below MIN_SCAN.
            # one-dispatch fast path for the dominant live pattern: events
            # only in the chunk's first block (asap control batches) — the
            # fused [eventful block + (n-1)-superblock] program, pre-warmed
            # by the streaming backend
            if n >= 2 and eventful[0] and not any(eventful[1:]):
                evfn = None
                if not per_block[0][1]:  # no trigger events in the batch
                    # float-event variant: block 0 stays on the chain
                    # kernel (see compile.get_float_evchunk_fn)
                    from .compile import get_float_evchunk_fn

                    evfn = get_float_evchunk_fn(
                        self.compiled, n, existing_only=True
                    )
                if evfn is None:
                    evfn = get_evchunk_fn(
                        self.compiled, n, existing_only=True
                    )
                if evfn is not None:
                    ev = self._events_tensor(per_block[0])
                    self.state, out_flat, done_vec = evfn(
                        self.state, ev, block_inputs(rendered),
                        in_super_for(rendered + 1, n - 1),
                    )
                    outs.append(out_flat)  # already [ch, n*B]
                    if self.compiled.has_done_actions:
                        self._apply_done_flags(np.asarray(done_vec))
                    self.graph.clock.frames += n * B
                    rendered += n
                    continue
            # general one-dispatch eventful chunk: events ANYWHERE inside
            # the chunk ride the eventful superblock program (frames offset
            # to the chunk start) — mid-chunk live events used to fragment
            # a chunk into [superblock, eventful block, superblock] = 3+
            # RTT-priced dispatches, which under-ran the realtime soak.
            # existing_only: the streaming backend pre-warms this length;
            # an unwarmed render falls through to the per-run path rather
            # than paying a jit trace mid-stream.
            if n >= 2 and any(eventful):
                fsfn = get_full_super_fn(self.compiled, n, existing_only=True)
                if fsfn is not None:
                    ev = self._merged_events_tensor(per_block)
                    if ev is not None:
                        self.state, out_flat, done_vec = fsfn(
                            self.state, ev, in_super_for(rendered, n)
                        )
                        outs.append(out_flat)  # already [ch, n*B]
                        if self.compiled.has_done_actions:
                            self._apply_done_flags(np.asarray(done_vec))
                        self.graph.clock.frames += n * B
                        rendered += n
                        continue
                # capped graphs (Pallas banks' kernel ceiling, blockwise
                # nodes' shortest delay): scan of k-superblock FULL programs
                # — still one dispatch, events anywhere, at the capped
                # superblock throughput
                kc = self._super_scan_k(n)
                if kc >= 2:
                    ssfn = get_full_super_scan_fn(
                        self.compiled, kc, existing_only=True
                    )
                    if ssfn is not None:
                        groups = [
                            self._merged_events_lists(per_block[i : i + kc])
                            for i in range(0, n, kc)
                        ]
                        if all(g is not None for g in groups):
                            empty = self._empty_events_np()
                            tens = [
                                self._events_tensor(g)
                                if any(g[:3]) or g[3]
                                else empty
                                for g in groups
                            ]
                            ev_stack = jax.tree_util.tree_map(
                                lambda *xs: np.stack(
                                    [np.asarray(x) for x in xs]
                                ),
                                *tens,
                            )
                            self.state, out_stack, done_stack = ssfn(
                                self.state, ev_stack,
                                in_super_stack_for(rendered, n, kc),
                            )
                            outs.append(
                                jnp.moveaxis(out_stack, 0, 1).reshape(
                                    self.graph.outputs, -1
                                )
                            )
                            if self.compiled.has_done_actions:
                                self._apply_done_flags(
                                    np.asarray(done_stack).any(axis=0)
                                )
                            self.graph.clock.frames += n * B
                            rendered += n
                            continue
                # superblock-ineligible graphs (feedback edges): the whole
                # eventful chunk as ONE full-program scan dispatch — at
                # per-block rate, but over this tunnel one dispatch beats
                # the 5-10 the run-splitting below would pay. Warmed lengths
                # only (jit re-traces per n).
                if n in self.compiled.full_scan_warm:
                    ev_stack = self._events_stack(per_block)
                    scan_fn = _get_full_scan_fn(self.compiled)
                    self.state, out_stack, done_stack = scan_fn(
                        self.state, ev_stack, in_stack_for(rendered, n)
                    )
                    outs.append(
                        jnp.moveaxis(out_stack, 0, 1).reshape(
                            self.graph.outputs, -1
                        )
                    )
                    if self.compiled.has_done_actions:
                        self._apply_done_flags(
                            np.asarray(done_stack).any(axis=0)
                        )
                    self.graph.clock.frames += n * B
                    rendered += n
                    continue

            bi = 0
            while bi < n:
                run = 1
                flag = eventful[bi]
                while bi + run < n and eventful[bi + run] == flag:
                    run += 1
                if not flag and run >= 2:
                    # an already-compiled exact-length superblock covers the
                    # whole event-free run in ONE dispatch (the streaming
                    # backend pre-warms chunk-1 for the asap-event pattern)
                    exact = get_super_fn(self.compiled, run,
                                         existing_only=True)
                    if exact is not None:
                        self.state, out_flat, done_vec = exact(
                            self.state, in_super_for(rendered, run)
                        )
                        outs.append(out_flat)  # already [ch, run*B]
                        if self.compiled.has_done_actions:
                            self._apply_done_flags(np.asarray(done_vec))
                        self.graph.clock.frames += run * B
                        rendered += run
                        bi += run
                        continue
                while run:
                    sub = chunk
                    while sub > run:
                        sub //= 2
                    done_any = done_stack = None
                    if sub >= MIN_SCAN:
                        if flag:
                            ev_stack = self._events_stack(
                                per_block[bi : bi + sub]
                            )
                            scan_fn = _get_full_scan_fn(self.compiled)
                            self.state, out_stack, done_stack = scan_fn(
                                self.state, ev_stack,
                                in_stack_for(rendered, sub),
                            )
                            out_stack = jnp.moveaxis(
                                out_stack, 0, 1
                            ).reshape(self.graph.outputs, -1)
                        else:
                            super_fn = get_super_fn(self.compiled, sub)
                            if super_fn is not None:
                                # superblock: the whole event-free run in
                                # ONE dispatch at block sub*B
                                self.state, out_flat, done_vec = super_fn(
                                    self.state, in_super_for(rendered, sub)
                                )
                                out_stack = out_flat  # already [ch, sub*B]
                                done_any = done_vec
                            elif (kc := self._super_scan_k(sub)) and (
                                ss_fn := get_super_scan_fn(
                                    self.compiled, kc
                                )
                            ) is not None:
                                # sub*B exceeds the graph's superblock cap
                                # (blockwise nodes): scan OF the capped
                                # superblock — still one dispatch, at
                                # superblock throughput
                                self.state, out_stack, done_stack = ss_fn(
                                    self.state,
                                    in_super_stack_for(rendered, sub, kc),
                                )
                                out_stack = jnp.moveaxis(
                                    out_stack, 0, 1
                                ).reshape(self.graph.outputs, -1)
                            else:
                                scan_fn = _get_scan_fn(self.compiled)
                                self.state, out_stack, done_stack = scan_fn(
                                    self.state, in_stack_for(rendered, sub)
                                )
                                out_stack = jnp.moveaxis(
                                    out_stack, 0, 1
                                ).reshape(self.graph.outputs, -1)
                        outs.append(out_stack)
                        if self.compiled.has_done_actions:
                            if done_any is None:
                                done_any = np.asarray(done_stack).any(axis=0)
                            else:
                                done_any = np.asarray(done_any)
                            self._apply_done_flags(done_any)
                    elif (not flag and sub >= 2
                          and (super_fn := get_super_fn(self.compiled, sub))
                          is not None):
                        # short event-free tails: still ONE dispatch via a
                        # small superblock — per-dispatch host overhead is
                        # ~ms over this tunnel, so covering a 15-block tail
                        # block-by-block starves a realtime producer
                        self.state, out_flat, done_vec = super_fn(
                            self.state, in_super_for(rendered, sub)
                        )
                        outs.append(out_flat)  # already [ch, sub*B]
                        if self.compiled.has_done_actions:
                            self._apply_done_flags(np.asarray(done_vec))
                    else:
                        sub = 1
                        if flag:
                            ev = self._events_tensor(per_block[bi])
                            self.state, out, done = self.compiled.render(
                                self.state, ev, block_inputs(rendered)
                            )
                        else:
                            self.state, out, done = self.compiled.render_fast(
                                self.state, block_inputs(rendered)
                            )
                        outs.append(out)
                        if self.compiled.has_done_actions:
                            self._apply_done_flags(np.asarray(done))
                    self.graph.clock.frames += sub * B
                    rendered += sub
                    run -= sub
                    bi += sub

        if not fetch:
            if prefix is not None or frames_needed % B:
                raise ValueError(
                    "fetch=False requires block-aligned frames and no "
                    "pending remainder"
                )
            if not outs:
                return jnp.zeros(
                    (self.graph.outputs, frames_needed), self.graph.dtype
                )
            audio_dev = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)
            if audio_dev.shape[1] < frames_needed:  # freed mid-render
                audio_dev = jnp.concatenate(
                    [audio_dev,
                     jnp.zeros((self.graph.outputs,
                                frames_needed - audio_dev.shape[1]),
                               audio_dev.dtype)], axis=1,
                )
            return audio_dev

        if outs:
            outs = jax.device_get(outs)  # ONE host fetch for all audio
            audio = np.concatenate(outs, axis=1)  # flat [ch, len] pieces
        else:
            audio = np.zeros((self.graph.outputs, 0), dtype=self.graph.dtype)
        if audio.shape[1] > frames_needed:
            self._pending = audio[:, frames_needed:]
            audio = audio[:, :frames_needed]
        elif audio.shape[1] < frames_needed:
            # a FREE_PARENT done action freed the top-level graph mid-render:
            # pad with silence so callers always get [channels, frames]
            pad = frames_needed - audio.shape[1]
            audio = np.concatenate(
                [audio, np.zeros((self.graph.outputs, pad), dtype=audio.dtype)],
                axis=1,
            )
        if prefix is not None:
            audio = np.concatenate([prefix, audio], axis=1)
        return audio


def _get_full_scan_fn(compiled: CompiledGraph):
    """Jitted scan of the FULL (eventful) program over stacked per-block
    event tensors — one device dispatch per eventful sub-chunk instead of
    per-block eager calls.

    Cached on the CompiledGraph itself so superseded compiles (live-edit /
    streaming sessions that recompile per structural commit) are actually
    collectable — a module-global cache would pin every program forever."""
    fn = compiled.full_scan_fn
    if fn is None:

        def scan_fn(state, ev_stack, in_stack):
            def body(st, x):
                ev, inp = x
                st, out, done = compiled.render_raw(st, ev, inp)
                return st, (out, done)

            state, (outs, dones) = jax.lax.scan(
                body, state, (ev_stack, in_stack)
            )
            return state, outs, dones

        fn = jax.jit(scan_fn, donate_argnums=(0,))
        compiled.full_scan_fn = fn
        if compiled.cache_entry is not None:
            compiled.cache_entry["full_scan_fn"] = fn
    return fn


def _get_scan_fn(compiled: CompiledGraph):
    """Jitted scan of the fast (no-events) program over a fixed chunk."""
    fn = compiled.scan_fn
    if fn is None:

        def scan_fn(state, in_stack):
            def body(st, inp):
                st, out, done = compiled.render_fast_raw(st, inp)
                return st, (out, done)

            state, (outs, dones) = jax.lax.scan(body, state, in_stack)
            return state, outs, dones

        fn = jax.jit(scan_fn, donate_argnums=(0,))
        compiled.scan_fn = fn
        if compiled.cache_entry is not None:
            compiled.cache_entry["scan_fn"] = fn
    return fn


# ----------------------------------------------------------- checkpointing
def save_state(processor: AudioProcessor, path: str) -> None:
    """Checkpoint a running processor's complete DSP state to disk.

    The reference has no checkpoint/resume (SURVEY §5.4); in the functional
    design it falls out for free — the state pytree plus the frame clock IS
    the engine state. Restore into a processor whose graph has the same
    topology (same node ids)."""
    import pickle

    processor._ensure_compiled()
    leaves, treedef = jax.tree_util.tree_flatten(processor.state)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "leaves": [np.asarray(x) for x in leaves],
                "treedef": treedef,
                "clock": processor.graph.clock.frames,
                "revision": processor.graph.revision,
                # sub-block remainder so non-block-aligned bounces resume
                # sample-exactly
                "pending": processor._pending,
            },
            f,
        )


def load_state(processor: AudioProcessor, path: str) -> None:
    """Restore a checkpoint written by :func:`save_state`.

    Each leaf is placed with the sharding the processor's freshly-built
    state uses — so checkpoints of mesh-sharded graphs (MeshVoiceBank)
    restore sharded instead of silently replicated."""
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    processor._ensure_compiled()
    state = jax.tree_util.tree_unflatten(
        blob["treedef"], blob["leaves"]
    )

    def place(x, ref):
        sh = getattr(ref, "sharding", None)
        if sh is not None and len(sh.device_set) > 1:
            return jax.device_put(np.asarray(x), sh)
        return jnp.asarray(x)  # uncommitted: composes with any sharding

    try:
        state = jax.tree_util.tree_map(place, state, processor.state)
    except ValueError:
        # structure changed since the checkpoint: best-effort plain restore
        state = jax.tree_util.tree_map(jnp.asarray, state)
    processor.state = state
    processor.graph.clock.frames = blob["clock"]
    processor._pending = blob.get("pending")


AudioProcessor.save_state = lambda self, path: save_state(self, path)
AudioProcessor.load_state = lambda self, path: load_state(self, path)
