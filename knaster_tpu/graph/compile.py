"""Graph compiler: DAG -> one fused, jitted block-render function.

TPU-native replacement for the reference's task compilation pipeline
(knaster_graph/src/graph.rs commit_changes:1707-1726 → calculate_node_order →
allocate_node_buffers → generate_task_data, and the audio-thread executor
graph_gen.rs:77-238). Where the reference produces a ``Box<[Task]>`` of raw
pointers run sequentially on the audio thread, we trace every node's pure
``process`` in topological order into a single XLA program; buffer allocation
(buffer_allocator.rs) disappears — XLA's fusion/buffer assignment owns it.

* Additive connects: summed at trace time (XLA fuses the adds).
* Feedback edges: read previous-block outputs carried in the state pytree
  (one-block delay, matching FeedbackSink/Source semantics and the
  feedback_nodes tests in knaster_graph/src/tests/graph_tests.rs:186-254).
* Subgraphs are inlined — GraphGen-as-UGen recursion becomes function calls.
* Node state survives recompiles: ``carry_state`` re-keys the state pytree by
  stable node ids (UGenEnum::TakeFromTask parity, node.rs:132-150).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from ..core.ugen import AudioCtx, normalize_process_result
from . import chain_kernel
from .graph import Done, Graph, GraphError, NodeEntry
from .handles import K_GRAPH_IN
from .param_engine import ParamLayout, PEngine, empty_events, init_state as pe_init_state


# ---------------------------------------------------------------------------
# Chain collapse (the deep-isomorphic-chain compiler pass)
# ---------------------------------------------------------------------------
# A graph like the reference's 256-stage FM cascade
# (knaster_benchmarks/benches/graph_dsp_performance.rs:38-80) is a K-deep
# chain of small isomorphic units: stage k's nodes feed only stage k+1.
# Inlining K stages serializes the TPU on K dependent op groups AND blows up
# the program (K copies of the unit body). This pass detects maximal runs of
# isomorphic units in the topological order and executes each run as ONE
# ``lax.scan`` over the *stage* axis with stacked per-stage states and
# parameters — the generic-graph equivalent of what models.FMCascade
# hand-fuses. Sequential depth is unchanged (it is inherent to the sound),
# but the program contains one traced unit body instead of K.
MIN_CHAIN_STAGES = int(os.environ.get("KNASTER_CHAIN_MIN_STAGES", "8"))
MAX_CHAIN_PERIOD = int(os.environ.get("KNASTER_CHAIN_MAX_PERIOD", "16"))
CHAIN_UNROLL = int(os.environ.get("KNASTER_CHAIN_UNROLL", "8"))
_CHAIN_COLLAPSE_ON = os.environ.get("KNASTER_CHAIN_COLLAPSE", "1") != "0"


class _PendingCarry:
    """Placeholder in a cache entry's carry_fns while a pre-warm worker
    compiles that carry (see CompiledGraph.prewarm_carry)."""

    def __init__(self):
        self.event = threading.Event()


@dataclass
class ChainPlan:
    """One collapsed chain: K stages of p nodes each.

    ``in_pattern[j]``   — per input channel of unit node j, a tuple of source
                          descriptors: ``('rel', r, ch)`` with ``-p <= r < p``
                          (r >= 0: node at offset r in the SAME stage; r < 0:
                          node at offset p+r in the PREVIOUS stage) or
                          ``('abs', kind, src_nid, ch)`` (the same external
                          source for every stage).
    ``pe_pattern[j]``    — param-edge descriptors per param index, same forms
                          (abs form: ``('abs', 'node', src_nid, ch)``).
    ``carry_keys``       — sorted ``(prev_offset_j, ch)`` pairs the scan body
                          reads from the previous stage (the scan carry).
    ``carry_init``       — for stage 0, the external source feeding each
                          carry key: ``(kind, src_nid, ch)``.
    """

    stages: List[List[int]]
    period: int
    in_pattern: List[Tuple]
    pe_pattern: List[Tuple]
    carry_keys: List[Tuple[int, int]]
    carry_init: Dict[Tuple[int, int], Tuple[str, Optional[int], int]]


@dataclass
class CompiledGraph:
    graph: Graph
    ctx: AudioCtx
    layout: ParamLayout
    engine: PEngine
    order: List[int]
    entries: Dict[int, NodeEntry]
    resolved_in: Dict[int, List[List[Tuple[str, Optional[int], int]]]]
    resolved_out: List[List[Tuple[str, Optional[int], int]]]
    resolved_param_edges: Dict[Tuple[int, int], Tuple[int, int]]
    fb_sources: List[Tuple[int, int]]
    event_capacity: int
    # host-side free bookkeeping: flattened nid -> chain of enclosing
    # subgraph node ids (innermost first), for Done.FREE_PARENT routing
    enclosing: Dict[int, List[int]]
    render: Any = None  # jitted fn(state, events, inputs) -> (state, out, done)
    render_raw: Any = None  # the untraced fn, for embedding in outer scans
    plan: Any = None  # execution plan: ('single', nid) | ('batch', [nids])
    done_order: Any = None  # node ids in done_vec order (plan order)
    render_fast: Any = None  # jitted no-events program (state, inputs)
    render_fast_raw: Any = None
    revision: int = -1
    # lazily-built chunked scan programs (see processor._get_scan_fn); held
    # on the instance so superseded compiles are garbage-collectable
    scan_fn: Any = None
    full_scan_fn: Any = None
    # chunk lengths (blocks) the full-program scan was pre-warmed at: the
    # runner may cover a whole eventful chunk with one full-scan dispatch
    # (superblock-ineligible graphs) only at lengths that won't jit-trace
    # mid-stream
    full_scan_warm: Any = field(default_factory=set)
    # lazily-built superblock fast programs keyed by block multiple, and the
    # cached eligibility verdict (None = not yet checked)
    super_fns: Dict[int, Any] = field(default_factory=dict)
    superblock_ok: Optional[bool] = None
    # largest superblock length (samples) the graph supports — min over
    # blockwise nodes' superblock_cap; set by superblock_eligible
    superblock_max: float = float("inf")
    # one-dispatch eventful-chunk programs (block-0 events + superblock rest)
    evchunk_fns: Dict[int, Any] = field(default_factory=dict)
    # lazily-built float-event full programs (chain kernel + event
    # machinery; key 1 = per-block, "ev{n}" = float-event evchunk)
    float_fns: Dict[Any, Any] = field(default_factory=dict)
    # canonical node labels (position in topo order): state/event pytree keys
    # use these, NOT node ids, so topologically identical graphs share both
    # program and state structure (the program cache)
    canon: Dict[int, int] = field(default_factory=dict)
    signature: Any = None
    cache_hit: bool = False
    cache_entry: Any = None

    # ----------------------------------------------------- canonical keys
    def state_key(self, nid: int) -> str:
        return str(self.canon[nid])

    def group_key(self, nids: List[int]) -> str:
        return f"b{self.canon[nids[0]]}"

    def event_key(self, nid: int) -> str:
        return f"n{self.canon[nid]}"

    def fb_key(self, nid: int, ch: int) -> str:
        return f"{self.canon[nid]}:{ch}"

    def chain_key(self, cp: "ChainPlan") -> str:
        return f"c{self.canon[cp.stages[0][0]]}"

    # ------------------------------------------------------------------
    def _node_loc(self, nid: int):
        """('single', state_key) | ('batch', group_key, index) |
        ('chain', chain_key, stage_k, offset_j) | None."""
        cache = getattr(self, "_loc_cache", None)
        if cache is None:
            cache = {}
            for kind, item in self.plan:
                if kind == "single":
                    cache[item] = ("single", self.state_key(item))
                elif kind == "batch":
                    gk = self.group_key(item)
                    for i, n in enumerate(item):
                        cache[n] = ("batch", gk, i)
                else:  # chain
                    ck = self.chain_key(item)
                    for k, stage in enumerate(item.stages):
                        for j, n in enumerate(stage):
                            cache[n] = ("chain", ck, k, j)
            self._loc_cache = cache
        return cache.get(nid)

    def _extract_node_state(self, state: dict, nid: int):
        """Pull one node's state out of this compile's (possibly batched or
        chain-stacked) state layout; None if absent."""
        loc = self._node_loc(nid)
        if loc is None:
            return None
        if loc[0] == "single":
            return state["nodes"].get(loc[1])
        if loc[0] == "chain":
            chain = state["nodes"].get(loc[1])
            if chain is None:
                return None
            stacked = chain.get(f"j{loc[3]}")
            if stacked is None:
                return None
            return jax.tree_util.tree_map(lambda x: x[loc[2]], stacked)
        stacked = state["nodes"].get(loc[1])
        if stacked is None:
            return None
        return jax.tree_util.tree_map(lambda x: x[loc[2]], stacked)

    def init_state(self, prev: Optional[dict] = None,
                   prev_compiled: Optional["CompiledGraph"] = None) -> dict:
        """Build the state pytree, carrying state over from a previous commit
        (TakeFromTask parity: same node id => same state).

        The carry-over runs as ONE jitted program per (previous-topology,
        this-topology) pair, cached alongside the compiled programs — eager
        per-leaf ops each cost a host↔device roundtrip (live-edit latency).

        Batched groups store their members' states stacked on a leading axis
        — that keeps the scan carry small and lets the render read/write
        group state without per-block restacking."""
        if prev is None or prev_compiled is None:
            return self._build_state(prev, prev_compiled)
        key = self._carry_key(prev_compiled)
        if self.cache_entry is not None and key is not None:
            fns = self.cache_entry.setdefault("carry_fns", {})
            fn = fns.get(key)
            if isinstance(fn, _PendingCarry):
                # a pre-warm worker (prewarm_carry) is compiling this very
                # carry: waiting out its remainder beats recompiling
                fn.event.wait(timeout=300)
                fn = fns.get(key)
                if isinstance(fn, _PendingCarry):
                    fn = None
            # the fresh default-init state is DATA into the carry, never a
            # trace constant: carry programs are shared across graphs that
            # differ only in param defaults / init-derived state values
            # (the program cache ignores pdefaults, core/signature.py).
            # Only what the carry can't take from prev is built: the pe
            # default arrays + init states of NEW nodes — not the whole
            # graph's init pytree (a cache-hit edit on a graph holding a
            # 100k-voice bank must not re-init the bank per edit).
            fresh = self._build_fresh(prev_compiled)
            if fn is None:
                pc = prev_compiled

                def carry(p, f):
                    return self._build_state(p, pc, fresh=f)

                fn = jax.jit(carry)
                fns[key] = fn
                # the closures capture whole CompiledGraph pairs; bound the
                # per-entry set so superseded compiles stay collectable
                while len(fns) > 8:
                    fns.pop(next(iter(fns)))
            try:
                return fn(prev, fresh)
            except Exception:
                # a prewarmed carry is AOT-compiled from default-init
                # shapes (prewarm_carry); a live state whose shardings
                # differ (e.g. mesh-sharded bank leaves) won't match its
                # baked-in layout — fall back to a retracing jit
                pc = prev_compiled

                def carry(p, f):
                    return self._build_state(p, pc, fresh=f)

                fn = jax.jit(carry)
                fns[key] = fn
                return fn(prev, fresh)
        return self._build_state(prev, prev_compiled)

    def prewarm_carry(self, from_compiled: "CompiledGraph") -> bool:
        """AOT-compile the state-carry program INTO this topology FROM
        ``from_compiled``'s, without touching any live buffers (shape-only
        lowering) — so a worker thread can hide the first-cycle carry
        compile of a recurring edit (push/free/push) behind the audible
        part of the previous edit. Returns True if a compile happened."""
        if self.cache_entry is None:
            return False
        key = self._carry_key(from_compiled)
        if key is None:
            return False
        fns = self.cache_entry.setdefault("carry_fns", {})
        if key in fns:
            return False
        pending = _PendingCarry()
        fns[key] = pending
        try:
            fc = from_compiled

            def carry(p, f):
                return self._build_state(p, fc, fresh=f)

            shapes = jax.eval_shape(lambda: fc._build_state(None, None))
            fresh_shapes = jax.eval_shape(lambda: self._build_fresh(fc))
            fn = jax.jit(carry)
            fns[key] = fn.lower(shapes, fresh_shapes).compile()
            while len(fns) > 8:
                fns.pop(next(iter(fns)))
            return True
        except Exception:
            fns.pop(key, None)
            return False
        finally:
            pending.event.set()

    def _carry_key(self, prev_compiled: "CompiledGraph"):
        """Cache key for the jitted carry program: everything the traced
        prev->new mapping depends on. The previous topology's SIGNATURE is
        not enough — two same-signature commits can pair surviving node ids
        with different slots (free A + push C vs free B + push D), and a
        carry traced for one correspondence would assign states to the
        wrong nodes."""
        if prev_compiled.signature is None:
            return None
        node_map = tuple(
            (self.canon[nid], prev_compiled._node_loc(nid))
            for nid in self.order
        )
        pe_map = tuple(
            sorted(
                (typ, slot, prev_compiled.layout.slots.get((nid, pidx)))
                for (nid, pidx), (typ, slot) in self.layout.slots.items()
            )
        )
        fb_map = tuple(
            (
                self.fb_key(nid, ch),
                prev_compiled.fb_key(nid, ch)
                if nid in prev_compiled.canon else None,
            )
            for (nid, ch) in self.fb_sources
        )
        return (prev_compiled.signature, node_map, pe_map, fb_map)

    def _build_fresh(self, prev_compiled: "CompiledGraph") -> dict:
        """The default-init data a carry FROM ``prev_compiled`` needs: the
        param-engine default arrays plus init states of nodes the previous
        topology cannot supply (its ``_node_loc`` is None). Passed into the
        jitted carry as runtime DATA so node-init values and param defaults
        never become trace constants (they'd otherwise pin cached carries
        to one set of defaults)."""
        ctx = self.ctx
        return {
            "pe": pe_init_state(self.layout, dtype=ctx.dtype),
            "nodes": {
                self.state_key(nid): self.entries[nid].ugen.init(ctx)
                for nid in self.order
                if prev_compiled._node_loc(nid) is None
            },
        }

    def _build_state(self, prev: Optional[dict],
                     prev_compiled: Optional["CompiledGraph"],
                     fresh: Optional[dict] = None) -> dict:
        """``fresh``, when given, is the runtime-data pytree from
        ``_build_fresh`` — the jitted carry programs read defaults and
        new-node init values from it instead of baking them in as trace
        constants."""
        ctx = self.ctx

        def fresh_node(nid):
            if fresh is not None:
                return fresh["nodes"][self.state_key(nid)]
            return self.entries[nid].ugen.init(ctx)

        def node_state(nid):
            if prev is not None and prev_compiled is not None:
                old = prev_compiled._extract_node_state(prev, nid)
                if old is not None:
                    return old
            return fresh_node(nid)

        def _prev_stack_source(loc):
            """(stacked_pytree, row_index) the previous compile stored this
            node's state in, or None (single/absent)."""
            if loc is None or loc[0] == "single":
                return None
            if loc[0] == "batch":
                stack = prev["nodes"].get(loc[1])
                return None if stack is None else (id(stack), stack, loc[2])
            chain = prev["nodes"].get(loc[1])  # 'chain'
            if chain is None:
                return None
            stack = chain.get(f"j{loc[3]}")
            return None if stack is None else (id(stack), stack, loc[2])

        def stacked_state(nids):
            """Stacked state for a batch group or one chain offset. When
            every carried member lives in ONE previous stacked group, the
            carry is a single gather per leaf (+ one scatter for
            freshly-initialized members) — the per-node extract/restack path
            issues thousands of eager device ops for big groups (live-edit
            latency)."""
            if prev is not None and prev_compiled is not None:
                srcs = [
                    _prev_stack_source(prev_compiled._node_loc(n))
                    for n in nids
                ]
                stack_ids = {s[0] for s in srcs if s is not None}
                if len(stack_ids) == 1 and any(s is not None for s in srcs):
                    prev_stack = next(s[1] for s in srcs if s is not None)
                    idx = jnp.asarray(
                        [s[2] if s is not None else 0 for s in srcs],
                        jnp.int32,
                    )
                    carried = jax.tree_util.tree_map(
                        lambda x: x[idx], prev_stack
                    )
                    # members not in that stack: carry their individual
                    # previous state ('single' plan slots — node_state
                    # extracts it) or fresh-init, then scatter the rows
                    others = [k for k, s in enumerate(srcs) if s is None]
                    if others:
                        fill = jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs),
                            *[node_state(nids[k]) for k in others],
                        )
                        oi = jnp.asarray(others, jnp.int32)
                        carried = jax.tree_util.tree_map(
                            lambda c, f: c.at[oi].set(f), carried, fill
                        )
                    return carried
            return jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[node_state(n) for n in nids]
            )

        nodes = {}
        for kind, item in self.plan:
            if kind == "single":
                nodes[self.state_key(item)] = node_state(item)
            elif kind == "batch":
                nodes[self.group_key(item)] = stacked_state(item)
            else:  # chain: per unit offset, states stacked over the stage axis
                nodes[self.chain_key(item)] = {
                    f"j{j}": stacked_state([s[j] for s in item.stages])
                    for j in range(item.period)
                }
        pe = (
            dict(fresh["pe"])
            if fresh is not None
            else pe_init_state(self.layout, dtype=ctx.dtype)
        )
        if prev is not None and prev_compiled is not None:
            pe = dict(pe)
            old = prev.get("pe", {})
            old_layout = prev_compiled.layout
            # carry per-slot float/int values across the re-layout with ONE
            # gather+scatter per array (a per-slot .at[].set() chain is
            # thousands of eager device ops on big graphs — live-edit cost)
            f_new, f_old, i_new, i_old = [], [], [], []
            for (nid, pidx), (typ, slot) in self.layout.slots.items():
                o = old_layout.slots.get((nid, pidx))
                if o is None or o[0] != typ:
                    continue
                if typ == "float":
                    f_new.append(slot)
                    f_old.append(o[1])
                elif typ == "int":
                    i_new.append(slot)
                    i_old.append(o[1])
            if f_new:
                ni = jnp.asarray(f_new, jnp.int32)
                oi = jnp.asarray(f_old, jnp.int32)
                for k in ("value", "target", "step", "elapsed", "dur",
                          "smode", "sdur", "srate"):
                    pe[k] = pe[k].at[ni].set(old[k][oi])
            if i_new:
                ni = jnp.asarray(i_new, jnp.int32)
                oi = jnp.asarray(i_old, jnp.int32)
                pe["int_value"] = pe["int_value"].at[ni].set(
                    old["int_value"][oi]
                )
        fb = {}
        prev_fb = (prev or {}).get("fb", {})
        for (nid, ch) in self.fb_sources:
            key = self.fb_key(nid, ch)
            # carry feedback buffers by *node id* across recompiles (the
            # canonical key can shift when topology changes)
            old_key = (
                prev_compiled.fb_key(nid, ch)
                if prev_compiled is not None and nid in prev_compiled.canon
                else None
            )
            fb[key] = (
                prev_fb[old_key]
                if old_key is not None and old_key in prev_fb
                else jnp.zeros((ctx.block_size,), dtype=ctx.dtype)
            )
        return {"nodes": nodes, "pe": pe, "fb": fb}

    def empty_events(self):
        ev = empty_events(self.event_capacity, dtype=self.ctx.dtype)
        for nid in self.order:
            ugen = self.entries[nid].ugen
            if ugen.event_capacity > 0:
                ev[self.event_key(nid)] = ugen.empty_node_events(dtype=self.ctx.dtype)
        return ev

    @property
    def node_index(self) -> Dict[int, int]:
        return {nid: i for i, nid in enumerate(self.order)}

    @property
    def has_done_actions(self) -> bool:
        """True if any node reacts to done flags — only then does the host
        need to read them back each block (a device→host sync)."""
        return any(e.done_action != Done.NONE for e in self.entries.values())


def compile_graph(
    graph: Graph, event_capacity: int = 64, auto_batch: bool = True
) -> CompiledGraph:
    root = graph.root()
    ctx = AudioCtx(root.sample_rate, root.block_size, root.dtype)

    entries_all = root.all_entries()
    # flattened processable nodes (subgraph container nodes are inlined away)
    proc_entries = {nid: e for nid, e in entries_all.items() if e.subgraph is None}

    # ------------------------------------------------------------ resolution
    def resolve_edge(g: Graph, edge, *, as_feedback=False, depth=0):
        """Resolve one Edge into concrete sources: ('node'|'feedback', nid, ch)
        or ('graph_in', None, root input ch)."""
        if depth > 64:
            raise GraphError("subgraph boundary resolution too deep (cycle?)")
        out = []
        fb = as_feedback or edge.kind == "feedback"
        if edge.kind == K_GRAPH_IN:
            if g.parent is None:
                out.append(("graph_in", None, edge.ch))
            else:
                parent = g.parent
                container_nid = g.node_id_in_parent
                for e2 in parent.in_edges[container_nid][edge.ch]:
                    out.extend(resolve_edge(parent, e2, as_feedback=fb, depth=depth + 1))
        else:  # node or feedback
            src_entry = entries_all[edge.src]
            if src_entry.subgraph is not None:
                child = src_entry.subgraph
                for e2 in child.out_edges[edge.ch]:
                    out.extend(resolve_edge(child, e2, as_feedback=fb, depth=depth + 1))
            else:
                out.append(("feedback" if fb else "node", edge.src, edge.ch))
        return out

    def owning(nid: int) -> Graph:
        return root._owning_graph(nid)

    resolved_in: Dict[int, List[List[Tuple[str, Optional[int], int]]]] = {}
    for nid, e in proc_entries.items():
        g = owning(nid)
        per_ch = []
        for ch in range(e.inputs):
            srcs = []
            for edge in g.in_edges[nid][ch]:
                srcs.extend(resolve_edge(g, edge))
            per_ch.append(srcs)
        resolved_in[nid] = per_ch

    resolved_out: List[List[Tuple[str, Optional[int], int]]] = []
    for ch in range(root.outputs):
        srcs = []
        for edge in root.out_edges[ch]:
            srcs.extend(resolve_edge(root, edge))
        resolved_out.append(srcs)

    # audio-rate param edges (resolve subgraph boundary on the source side)
    resolved_param_edges: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def collect_param_edges(g: Graph):
        for (dst_nid, pidx), edge in g.param_edges.items():
            srcs = resolve_edge(g, edge)
            if len(srcs) != 1 or srcs[0][0] != "node":
                raise GraphError(
                    "audio-rate param edges must resolve to exactly one "
                    "same-block node output"
                )
            resolved_param_edges[(dst_nid, pidx)] = (srcs[0][1], srcs[0][2])
        for e in g.nodes.values():
            if e.subgraph is not None:
                collect_param_edges(e.subgraph)

    collect_param_edges(root)

    # ------------------------------------------------------------ topo order
    deps: Dict[int, set] = {nid: set() for nid in proc_entries}
    for nid, per_ch in resolved_in.items():
        for srcs in per_ch:
            for kind, s, _c in srcs:
                if kind == "node":
                    deps[nid].add(s)
    for (dst, _pidx), (src, _ch) in resolved_param_edges.items():
        deps[dst].add(src)

    order: List[int] = []
    temp, perm = set(), set()

    def visit(n):
        if n in perm:
            return
        if n in temp:
            raise GraphError("cycle detected at compile time")
        temp.add(n)
        for d in sorted(deps[n]):
            visit(d)
        temp.discard(n)
        perm.add(n)
        order.append(n)

    for n in sorted(proc_entries):
        visit(n)

    # feedback buffers
    fb_set = set()
    for per_ch in resolved_in.values():
        for srcs in per_ch:
            for kind, s, c in srcs:
                if kind == "feedback":
                    fb_set.add((s, c))
    for srcs in resolved_out:
        for kind, s, c in srcs:
            if kind == "feedback":
                fb_set.add((s, c))
    fb_sources = sorted(fb_set)

    # enclosing subgraph-node chains for FREE_PARENT routing
    enclosing: Dict[int, List[int]] = {}
    for nid in order:
        chain = []
        g = owning(nid)
        while g.parent is not None:
            chain.append(g.node_id_in_parent)
            g = g.parent
        enclosing[nid] = chain

    cg = CompiledGraph(
        graph=root,
        ctx=ctx,
        layout=None,  # assigned after planning (slot order follows the plan)
        engine=None,
        order=order,
        entries=proc_entries,
        resolved_in=resolved_in,
        resolved_out=resolved_out,
        resolved_param_edges=resolved_param_edges,
        fb_sources=fb_sources,
        event_capacity=event_capacity,
        enclosing=enclosing,
        revision=root.revision,
        canon={nid: i for i, nid in enumerate(order)},
    )
    # the plan pass (chain detection especially) is pure host Python and
    # was the dominant share of a CACHE-HIT compile (~6 ms of ~10 ms at
    # 256 nodes — round-5 edit_latency_probe breakdown; ~20 blocks of
    # audio at block 16). The plan is a pure function of the structural
    # signature in canonical position space (_plan_batches docstring), so
    # it is cached like the programs and translated back to node ids.
    cg.signature = _structural_signature(cg, auto_batch)
    cached_plan = _plan_cache_get(cg.signature)
    if cached_plan is not None:
        cg.plan = _plan_from_pos(order, cached_plan)
    else:
        cg.plan = (_plan_batches(cg) if auto_batch
                   else [("single", nid) for nid in order])
        _plan_cache_put(cg.signature, _plan_to_pos(cg))

    # ------------------------------------------------------------ param slots
    # Slot order follows the PLAN: a batch group's members get CONTIGUOUS
    # slots per parameter, so the batch's engine reads are static slices —
    # gathers (+ their bounds-check custom-calls and index transposes) were
    # a dominant share of the block program's op count on TPU.
    layout = ParamLayout()
    for kind, item in cg.plan:
        if kind == "single":
            ugen = proc_entries[item].ugen
            for pidx, spec in enumerate(ugen.params):
                layout.add(item, pidx, spec.ptype,
                           _instance_default(ugen, pidx))
        elif kind == "batch":
            rep = proc_entries[item[0]].ugen
            for pidx, spec in enumerate(rep.params):
                for nid in item:
                    ugen = proc_entries[nid].ugen
                    layout.add(nid, pidx, spec.ptype,
                               _instance_default(ugen, pidx))
        else:  # chain: contiguous slots per (offset, param) over the stages
            for j in range(item.period):
                rep = proc_entries[item.stages[0][j]].ugen
                for pidx, spec in enumerate(rep.params):
                    for stage in item.stages:
                        ugen = proc_entries[stage[j]].ugen
                        layout.add(stage[j], pidx, spec.ptype,
                                   _instance_default(ugen, pidx))
    cg.layout = layout
    cg.engine = PEngine(layout, ctx.block_size, dtype=ctx.dtype)

    # done-flag output order: per plan entry; chains stage-major
    done_order: List[int] = []
    for kind, item in cg.plan:
        if kind == "single":
            done_order.append(item)
        elif kind == "batch":
            done_order.extend(item)
        else:
            for stage in item.stages:
                done_order.extend(stage)
    cg.done_order = done_order

    # ------------------------------------------------- program cache lookup
    # A structural commit whose canonical shape matches a previously compiled
    # graph reuses both jitted programs outright — only the state carry is
    # rebuilt. This is the reference's microsecond TaskData swap
    # (graph.rs:1707-1726) for recurring live-edit shapes. (signature was
    # computed above for the plan cache.)
    hit = _program_cache_get(cg.signature)
    if hit is not None:
        cg.render = hit["render"]
        cg.render_raw = hit["render_raw"]
        cg.render_fast = hit["render_fast"]
        cg.render_fast_raw = hit["render_fast_raw"]
        cg.scan_fn = hit.get("scan_fn")
        cg.full_scan_fn = hit.get("full_scan_fn")
        cg.super_fns = hit.setdefault("super_fns", {})
        cg.evchunk_fns = hit.setdefault("evchunk_fns", {})
        cg.float_fns = hit.setdefault("float_fns", {})
        cg.superblock_ok = hit.get("superblock_ok")
        cg.superblock_max = hit.get("superblock_max", float("inf"))
        cg.cache_entry = hit
        cg.cache_hit = True
        return cg

    cg.render_raw = _build_render(cg)
    cg.render = jax.jit(cg.render_raw, donate_argnums=(0,))
    cg.render_fast_raw = _build_render(cg, fast=True)
    cg.render_fast = jax.jit(cg.render_fast_raw, donate_argnums=(0,))
    if cg.signature is not None:
        entry = {
            "render": cg.render,
            "render_raw": cg.render_raw,
            "render_fast": cg.render_fast,
            "render_fast_raw": cg.render_fast_raw,
            "super_fns": cg.super_fns,  # shared dict: lazily-built multiples
            "evchunk_fns": cg.evchunk_fns,
            "float_fns": cg.float_fns,
        }
        _program_cache_put(cg.signature, entry)
        cg.cache_entry = entry
    return cg


# ----------------------------------------------------------- superblocks
def superblock_eligible(cg: CompiledGraph) -> bool:
    """True when the graph can run the event-free fast program at block
    k*B in one dispatch (the interactive/bounce fast path): no feedback
    edges (their one-block delay is a semantic boundary), every node is
    block-length invariant, and no node's state shapes depend on the block
    size (the k*B program must consume the same state pytree).

    Blockwise nodes that declare ``superblock_cap`` (a max block length in
    samples, set during ``init`` — e.g. the Galactic reverb's shortest
    delay line, long delays' buffer length) participate up to that cap:
    ``cg.superblock_max`` is the min over caps and ``get_super_fn`` refuses
    multiples beyond it. Within the cap their documented delay-length
    clamp (>= one block) coarsens with the block; at default parameters
    (every delay longer than the superblock) output is bit-identical."""
    if cg.superblock_ok is not None:
        return cg.superblock_ok
    ok = not cg.fb_sources
    max_len = float("inf")
    if ok:
        for e in cg.entries.values():
            cap = getattr(e.ugen, "superblock_cap", None)
            if not getattr(e.ugen, "block_invariant", True):
                if cap is None:
                    # attribute may be assigned in init(); probe it
                    try:
                        jax.eval_shape(lambda u=e.ugen: u.init(cg.ctx))
                    except Exception:
                        ok = False
                        break
                    cap = getattr(e.ugen, "superblock_cap", None)
                if cap is None:
                    ok = False
                    break
            # block-invariant nodes may still cap the program length (e.g.
            # the Pallas banks' MAX_BLOCK kernel ceiling)
            if cap is not None:
                if cap < 2 * cg.ctx.block_size:
                    ok = False
                    break
                max_len = min(max_len, int(cap))
    if ok:
        ctx2 = AudioCtx(cg.ctx.sample_rate, cg.ctx.block_size * 2, cg.ctx.dtype)
        for e in cg.entries.values():
            try:
                a = jax.eval_shape(lambda u=e.ugen: u.init(cg.ctx))
                b = jax.eval_shape(lambda u=e.ugen: u.init(ctx2))
            except Exception:
                ok = False
                break
            sa = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), a)
            sb = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), b)
            if sa != sb:
                ok = False
                break
    cg.superblock_ok = ok
    cg.superblock_max = max_len if ok else 0
    if cg.cache_entry is not None:
        cg.cache_entry["superblock_ok"] = ok
        cg.cache_entry["superblock_max"] = cg.superblock_max
    return ok


def get_super_fn(cg: CompiledGraph, m: int, existing_only: bool = False):
    """The jitted superblock fast program fn(state, inputs[in, m*B]) ->
    (state, out[ch, m*B], done_vec), or None if the graph is ineligible.
    Built lazily per multiple and shared through the program cache.

    ``existing_only`` returns the fn only when ``m`` was already compiled —
    the runner uses it to cover an arbitrary-length event-free run in ONE
    dispatch when a matching program is warm (e.g. the streaming backend
    pre-warms chunk-1, the run an asap control batch leaves behind) without
    tracing unbounded new lengths mid-render."""
    if m <= 1 or not superblock_eligible(cg):
        return None
    if m * cg.ctx.block_size > cg.superblock_max:
        return None
    fn = cg.super_fns.get(m)
    if fn is None:
        if existing_only:
            return None
        raw = _build_render(cg, fast=True, block_multiple=m)
        fn = jax.jit(raw, donate_argnums=(0,))
        cg.super_fns[m] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("super_fns", {})[m] = fn
    return fn


def get_super_scan_fn(cg: CompiledGraph, k: int):
    """Jitted scan OF the k-superblock program: one dispatch covers any
    multiple of k blocks at superblock throughput. This is how bounce
    chunks larger than a graph's superblock_cap still render at the capped
    superblock rate instead of the per-block program rate.

    fn(state, in_stack[n, inputs, k*B]) -> (state, outs[n, ch, k*B],
    dones[n, ...]); jit re-traces per distinct n."""
    if (
        k <= 1
        or not superblock_eligible(cg)
        or k * cg.ctx.block_size > cg.superblock_max
    ):
        return None
    cache = cg.super_fns
    key = ("scan", k)
    fn = cache.get(key)
    if fn is None:
        raw = _build_render(cg, fast=True, block_multiple=k)

        def scan_fn(state, in_stack):
            def body(st, inp):
                st, out, done = raw(st, inp)
                return st, (out, done)

            state, (outs, dones) = jax.lax.scan(body, state, in_stack)
            return state, outs, dones

        fn = jax.jit(scan_fn, donate_argnums=(0,))
        cache[key] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("super_fns", {})[key] = fn
    return fn


def get_full_super_fn(cg: CompiledGraph, m: int, existing_only: bool = False):
    """The jitted EVENTFUL superblock program fn(state, events,
    inputs[in, m*B]) -> (state, out[ch, m*B], done_vec), or None if the
    graph is superblock-ineligible or ``m`` exceeds its cap.

    This is the full per-block program built at block m*B: event frames are
    relative to the superblock start, the param engine stairs block-rate
    ramps at native-block boundaries, and node event tensors span the whole
    superblock. A streaming chunk with live events ANYWHERE inside it
    renders in ONE tunnel dispatch — the general case the first-block-only
    ``get_evchunk_fn`` can't cover (mid-chunk events used to fragment a
    chunk into 3+ RTT-priced dispatches, which under-ran the realtime soak
    on event-heavy scenarios)."""
    if m <= 1 or not superblock_eligible(cg):
        return None
    if m * cg.ctx.block_size > cg.superblock_max:
        return None
    key = ("full", m)
    fn = cg.super_fns.get(key)
    if fn is None:
        if existing_only:
            return None
        raw = _build_render(cg, fast=False, block_multiple=m)
        fn = jax.jit(raw, donate_argnums=(0,))
        cg.super_fns[key] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("super_fns", {})[key] = fn
    return fn


def get_full_super_scan_fn(cg: CompiledGraph, k: int,
                           existing_only: bool = False):
    """Jitted scan OF the k-superblock FULL (eventful) program: one dispatch
    covers any multiple of k blocks with events anywhere, at superblock
    throughput — the eventful analog of ``get_super_scan_fn`` for graphs
    whose ``superblock_cap`` (Pallas banks' kernel ceiling, blockwise nodes'
    shortest delay) is below the streaming chunk length.

    fn(state, ev_stack, in_stack[n, in, k*B]) -> (state, outs[n, ch, k*B],
    dones[n, ...]); ev_stack leaves are [n, ...] stacked event tensors with
    frames relative to each k-superblock's start. jit re-traces per distinct
    n (the stream warms its own chunk length)."""
    if (
        k <= 1
        or not superblock_eligible(cg)
        or k * cg.ctx.block_size > cg.superblock_max
    ):
        return None
    key = ("full_scan", k)
    fn = cg.super_fns.get(key)
    if fn is None:
        if existing_only:
            return None
        raw = _build_render(cg, fast=False, block_multiple=k)

        def scan_fn(state, ev_stack, in_stack):
            def body(st, x):
                ev, inp = x
                st, out, done = raw(st, ev, inp)
                return st, (out, done)

            state, (outs, dones) = jax.lax.scan(
                body, state, (ev_stack, in_stack)
            )
            return state, outs, dones

        fn = jax.jit(scan_fn, donate_argnums=(0,))
        cg.super_fns[key] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("super_fns", {})[key] = fn
    return fn


def chain_in_plan(cg: CompiledGraph) -> bool:
    return any(kind == "chain" for kind, _ in cg.plan)


def get_float_fn(cg: CompiledGraph, existing_only: bool = False):
    """The jitted FLOAT-EVENT full program (see _build_render): full event
    machinery with collapsed chains still on the Pallas kernel — exact for
    blocks whose event batch carries float/int sets and smoothing but NO
    trigger events (the kernel skips trigger planes). None when the graph
    has no collapsed chain or the kernel is off. Lazily built, shared
    through the program cache."""
    if not chain_kernel.enabled() or not chain_in_plan(cg):
        return None
    fn = cg.float_fns.get(1)
    if fn is None:
        if existing_only:
            return None
        raw = _build_render(cg, float_events=True)
        fn = jax.jit(raw, donate_argnums=(0,))
        cg.float_fns[1] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("float_fns", {})[1] = fn
    return fn


def get_float_evchunk_fn(cg: CompiledGraph, n: int,
                         existing_only: bool = False):
    """get_evchunk_fn's float-event sibling: block 0 runs the FLOAT-EVENT
    full program (chain kernel + event machinery), the rest the fast
    superblock — so a trigger-free control batch costs a kernel-speed
    chunk instead of demoting block 0 to the scan executor."""
    if n < 2 or not chain_kernel.enabled() or not chain_in_plan(cg):
        return None
    key = f"ev{n}"
    fn = cg.float_fns.get(key)
    if fn is None:
        if existing_only:
            return None
        B = cg.ctx.block_size
        n_in = cg.graph.inputs
        if not (superblock_eligible(cg) and (n - 1) * B <= cg.superblock_max):
            return None
        first_raw = _build_render(cg, float_events=True)
        rest_raw = _build_render(cg, fast=True, block_multiple=n - 1)

        def evchunk(state, events, in_first, in_rest):
            st, out0, done0 = first_raw(state, events, in_first)
            st, out_rest, done1 = rest_raw(st, in_rest)
            out = (jnp.concatenate([out0, out_rest], axis=1)
                   if out0.size else out0)
            return st, out, done0 | done1

        fn = jax.jit(evchunk, donate_argnums=(0,))
        cg.float_fns[key] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("float_fns", {})[key] = fn
    return fn


def get_evchunk_fn(cg: CompiledGraph, n: int, existing_only: bool = False):
    """ONE-dispatch program for the dominant live-streaming chunk shape:
    events in block 0 only (asap control batches land at the next block
    start). fn(state, events, in_first[in, B], in_rest[in, (n-1)*B]) ->
    (state, out[ch, n*B], done_vec): the full per-block program renders
    block 0 with its event tensors, then the (n-1)-superblock renders the
    event-free remainder — fused into one jit so a control batch costs one
    tunnel dispatch instead of several (each is ~10-20 ms here)."""
    if n < 2:
        return None
    fn = cg.evchunk_fns.get(n)
    if fn is None:
        if existing_only:
            return None
        B = cg.ctx.block_size
        n_in = cg.graph.inputs
        if superblock_eligible(cg) and (n - 1) * B <= cg.superblock_max:
            rest_raw = _build_render(cg, fast=True, block_multiple=n - 1)

            def rest(st, in_rest):
                return rest_raw(st, in_rest)
        else:
            # superblock-ineligible graphs (feedback edges, blockwise or
            # block-capped nodes like the Pallas banks): the tail is an
            # in-program lax.scan of the fast block program — still ONE
            # dispatch for the whole chunk
            def rest(st, in_rest):
                stack = jnp.moveaxis(
                    in_rest.reshape(n_in, n - 1, B), 1, 0
                )

                def body(c, inp):
                    c2, out, done = cg.render_fast_raw(c, inp)
                    return c2, (out, done)

                st, (outs, dones) = jax.lax.scan(body, st, stack)
                out_rest = jnp.moveaxis(outs, 0, 1).reshape(
                    cg.graph.outputs, (n - 1) * B
                )
                return st, out_rest, jnp.any(dones, axis=0)

        def evchunk(state, events, in_first, in_rest):
            st, out0, done0 = cg.render_raw(state, events, in_first)
            st, out_rest, done1 = rest(st, in_rest)
            out = (jnp.concatenate([out0, out_rest], axis=1)
                   if out0.size else out0)
            return st, out, done0 | done1

        fn = jax.jit(evchunk, donate_argnums=(0,))
        cg.evchunk_fns[n] = fn
        if cg.cache_entry is not None:
            cg.cache_entry.setdefault("evchunk_fns", {})[n] = fn
    return fn


# -------------------------------------------------------- program cache
_PROGRAM_CACHE: "OrderedDict[Any, dict]" = OrderedDict()
_PROGRAM_CACHE_CAP = 64
_PROGRAM_CACHE_LOCK = threading.Lock()


def _program_cache_get(sig):
    if sig is None:
        return None
    with _PROGRAM_CACHE_LOCK:
        hit = _PROGRAM_CACHE.get(sig)
        if hit is not None:
            _PROGRAM_CACHE.move_to_end(sig)
        return hit


def _program_cache_put(sig, entry):
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE[sig] = entry
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_CAP:
            _PROGRAM_CACHE.popitem(last=False)


def clear_program_cache() -> None:
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE.clear()
        _PLAN_CACHE.clear()


# ---------------------------------------------------------------- plan cache
# cached batching/chain plans keyed by the structural signature, stored in
# CANONICAL (topo-position) space so they replay onto any graph with the
# same structure regardless of node-id numbering (see compile_graph).
_PLAN_CACHE: "OrderedDict[Any, Any]" = OrderedDict()
_PLAN_CACHE_CAP = 256


def _plan_cache_get(sig):
    if sig is None:
        return None
    with _PROGRAM_CACHE_LOCK:
        hit = _PLAN_CACHE.get(sig)
        if hit is not None:
            _PLAN_CACHE.move_to_end(sig)
        return hit


def _plan_cache_put(sig, plan_pos) -> None:
    if sig is None:
        return
    with _PROGRAM_CACHE_LOCK:
        _PLAN_CACHE[sig] = plan_pos
        while len(_PLAN_CACHE) > _PLAN_CACHE_CAP:
            _PLAN_CACHE.popitem(last=False)


def _desc_to_pos(canon, d):
    """('abs', kind, src_nid, ch) -> position form; 'rel' descs unchanged."""
    if d[0] == "abs":
        _a, kind, s, c = d
        return ("abs", kind, None if s is None else canon[s], c)
    return d


def _desc_to_nid(order, d):
    if d[0] == "abs":
        _a, kind, s, c = d
        return ("abs", kind, None if s is None else order[s], c)
    return d


def _chain_to_pos(canon, cp):
    return (
        tuple(tuple(canon[n] for n in st) for st in cp.stages),
        cp.period,
        tuple(tuple(tuple(_desc_to_pos(canon, d) for d in row)
                    for row in rows) for rows in cp.in_pattern),
        tuple(tuple((pi, _desc_to_pos(canon, d)) for pi, d in pes)
              for pes in cp.pe_pattern),
        tuple(tuple(k) for k in cp.carry_keys),
        tuple(sorted(
            (tuple(k), (kind, None if s is None else canon[s], c))
            for k, (kind, s, c) in cp.carry_init.items()
        )),
    )


def _chain_from_pos(order, t):
    stages_p, period, inp, pep, ckeys, cinit = t
    return ChainPlan(
        stages=[[order[p] for p in st] for st in stages_p],
        period=period,
        in_pattern=[tuple(tuple(_desc_to_nid(order, d) for d in row)
                          for row in rows) for rows in inp],
        pe_pattern=[tuple((pi, _desc_to_nid(order, d)) for pi, d in pes)
                    for pes in pep],
        carry_keys=[tuple(k) for k in ckeys],
        carry_init={tuple(k): (kind, None if s is None else order[s], c)
                    for k, (kind, s, c) in cinit},
    )


def _plan_to_pos(cg):
    canon = cg.canon
    out = []
    for kind, item in cg.plan:
        if kind == "single":
            out.append(("single", canon[item]))
        elif kind == "batch":
            out.append(("batch", tuple(canon[n] for n in item)))
        else:
            out.append(("chain", _chain_to_pos(canon, item)))
    return tuple(out)


def _plan_from_pos(order, plan):
    out = []
    for kind, item in plan:
        if kind == "single":
            out.append(("single", order[item]))
        elif kind == "batch":
            out.append(("batch", [order[p] for p in item]))
        else:
            out.append(("chain", _chain_from_pos(order, item)))
    return out


def _structural_signature(cg: CompiledGraph, auto_batch: bool):
    """Hashable signature of everything that shapes the traced programs,
    with nodes labeled canonically (topo position). None = uncacheable
    (some node's UGen config couldn't be frozen at push time)."""
    canon = cg.canon

    def src_key(kind, s, c):
        return (kind, -1 if s is None else canon[s], c)

    node_rows = []
    for nid in cg.order:
        e = cg.entries[nid]
        if e.sig is None:
            return None
        node_rows.append(
            (
                e.sig,
                e.done_action.value,
                bool(cg.enclosing[nid]),
                tuple(
                    tuple(src_key(*s) for s in per) for per in cg.resolved_in[nid]
                ),
            )
        )
    pe_rows = tuple(
        sorted(
            (canon[dst], pidx, canon[src], ch)
            for (dst, pidx), (src, ch) in cg.resolved_param_edges.items()
        )
    )
    out_rows = tuple(
        tuple(src_key(*s) for s in per) for per in cg.resolved_out
    )
    fb_rows = tuple((canon[s], c) for (s, c) in cg.fb_sources)
    return (
        cg.ctx.sample_rate,
        cg.ctx.block_size,
        str(cg.ctx.dtype),
        cg.graph.inputs,
        cg.graph.outputs,
        cg.event_capacity,
        auto_batch,
        # chain-collapse config is part of the plan, so of the programs —
        # including the Pallas-executor mode (consulted at trace time)
        (_CHAIN_COLLAPSE_ON, MIN_CHAIN_STAGES, MAX_CHAIN_PERIOD,
         CHAIN_UNROLL, chain_kernel._mode(), chain_kernel._unroll()),
        tuple(node_rows),
        pe_rows,
        out_rows,
        fb_rows,
    )


def _node_depths(cg: CompiledGraph) -> Dict[int, int]:
    depth: Dict[int, int] = {}
    pe_deps: Dict[int, List[int]] = {}
    for (dst, _p), (src, _ch) in cg.resolved_param_edges.items():
        pe_deps.setdefault(dst, []).append(src)
    for nid in cg.order:
        deps = [
            s
            for per in cg.resolved_in[nid]
            for (k, s, _c) in per
            if k == "node"
        ]
        deps += pe_deps.get(nid, [])
        depth[nid] = 1 + max((depth[d] for d in deps), default=-1)
    return depth


def _find_chains(cg: CompiledGraph, depth: Dict[int, int]) -> List[ChainPlan]:
    """Detect maximal runs of isomorphic units along the topological order.

    Units are matched by structure: same UGen batch_key (the existing
    'identical traced process' contract), same done action, and identical
    wiring where every source is either intra-unit (offset r >= 0),
    previous-unit (r < 0 — the scan carry), or the SAME external node /
    graph input / feedback buffer for every unit. A run only collapses when
    it has at least one previous-unit source (a real serial chain; parallel
    repetition is the auto-batch pass's job) and K >= MIN_CHAIN_STAGES."""
    order = cg.order
    n = len(order)
    if not _CHAIN_COLLAPSE_ON or n < MIN_CHAIN_STAGES:
        return []

    labels: List[Any] = []
    for nid in order:
        e = cg.entries[nid]
        u = e.ugen
        bk = None if u.event_capacity > 0 else u.batch_key()
        if bk is None:
            labels.append(None)
        else:
            labels.append(
                (
                    type(u).__qualname__,
                    bk,
                    e.done_action.value,
                    tuple(cg.enclosing[nid]),
                    u.inputs,
                    u.outputs,
                    tuple((nid, pidx) in cg.resolved_param_edges
                          for pidx in range(len(u.params))),
                )
            )

    def classify(pos: int, a: int, k: int, p: int, first: bool = False):
        """Source descriptors of the node at topo position ``pos`` viewed as
        offset node of unit ``k`` in a window starting at ``a`` with period
        ``p``; None when a source points more than one unit back inside the
        window (not expressible as a scan carry). ``first`` classifies the
        window's stage 0: anything before ``a`` is external."""
        nid = order[pos]
        lo = a if first else a + (k - 1) * p
        rows = []
        for ch_srcs in cg.resolved_in[nid]:
            descs = []
            for (kind, s, c) in ch_srcs:
                if kind == "node":
                    sp = cg.canon[s]
                    if sp >= lo:
                        descs.append(("rel", sp - (a + k * p), c))
                    elif sp < a:
                        descs.append(("abs", "node", s, c))
                    else:
                        return None
                else:
                    descs.append(("abs", kind, s, c))
            rows.append(tuple(descs))
        pes = []
        for pidx in range(len(cg.entries[nid].ugen.params)):
            key = (nid, pidx)
            if key in cg.resolved_param_edges:
                s, c = cg.resolved_param_edges[key]
                sp = cg.canon[s]
                if sp >= lo:
                    pes.append((pidx, ("rel", sp - (a + k * p), c)))
                elif sp < a:
                    pes.append((pidx, ("abs", "node", s, c)))
                else:
                    return None
        return (tuple(rows), tuple(pes))

    def unit_descs(a: int, k: int, p: int):
        descs = []
        for j in range(p):
            d = classify(a + k * p + j, a, k, p)
            if d is None:
                return None
            descs.append(d)
        return descs

    def first_unit_check(a: int, p: int, pattern):
        """Stage 0 may read arbitrary already-computed external sources
        where the pattern has previous-unit (r < 0) refs — those become the
        scan carry's initial values. Everything else must match the pattern
        exactly. Returns carry_init or None."""
        carry_init: Dict[Tuple[int, int], Tuple] = {}

        def match_desc(pat, act):
            if pat[0] == "rel" and pat[1] < 0:
                if act[0] == "rel":
                    return False  # stage 0 has nothing before it in-window
                key = (p + pat[1], pat[2])
                src = (act[1], act[2], act[3])
                if key in carry_init and carry_init[key] != src:
                    return False
                carry_init[key] = src
                return True
            return pat == act

        for j in range(p):
            act = classify(a + j, a, 0, p, first=True)
            if act is None:
                return None
            pat_rows, pat_pes = pattern[j]
            act_rows, act_pes = act
            if len(pat_rows) != len(act_rows):
                return None
            for pr, ar in zip(pat_rows, act_rows):
                if len(pr) != len(ar):
                    return None
                for pd, ad in zip(pr, ar):
                    if not match_desc(pd, ad):
                        return None
            if len(pat_pes) != len(act_pes):
                return None
            for (ppi, pd), (api, ad) in zip(pat_pes, act_pes):
                if ppi != api or not match_desc(pd, ad):
                    return None
        return carry_init

    chains: List[ChainPlan] = []
    used = set()

    for p in range(1, MAX_CHAIN_PERIOD + 1):
        if n < MIN_CHAIN_STAGES * p:
            continue
        i = 0
        while i + p < n:
            if (
                labels[i] is None
                or i in used
                or labels[i] != labels[i + p]
            ):
                i += 1
                continue
            # maximal label-periodic run starting at i
            e = i
            while (
                e + p < n
                and labels[e] is not None
                and labels[e] == labels[e + p]
                and (e + p) not in used
            ):
                e += 1
            K = (e - i) // p + 1
            a = i
            accepted = None
            flat_depth = False
            while K >= MIN_CHAIN_STAGES:
                # pattern from unit 1; verify units 1..K-1 match it
                pattern = unit_descs(a, 1, p)
                if pattern is None:
                    break
                k = 2
                while k < K:
                    d = unit_descs(a, k, p)
                    if d != pattern:
                        break
                    k += 1
                K = k
                if K < MIN_CHAIN_STAGES:
                    break
                # A real serial chain gets DEEPER every stage (that is what
                # makes inlining it pathological); parallel repetition that
                # merely alternates in topo order (e.g. 256 independent
                # sine*const voices) has flat per-unit depth — leave it to
                # the auto-batching vmap. Strictly increasing max-depth also
                # implies at least one previous-unit ref exists.
                unit_depth = [
                    max(depth[order[a + k2 * p + j]] for j in range(p))
                    for k2 in range(K)
                ]
                if any(
                    unit_depth[k2 + 1] <= unit_depth[k2]
                    for k2 in range(K - 1)
                ):
                    flat_depth = True
                    break  # not depth-serial: leave to auto-batching
                carry_init = first_unit_check(a, p, pattern)
                if carry_init is None:
                    # drop the first unit (e.g. a differently-wired chain
                    # head) and retry with the next as stage 0
                    a += p
                    K -= 1
                    continue
                accepted = (a, K, pattern, carry_init)
                break
            if accepted is None:
                # flat depth is alignment-invariant: skip the whole run
                i = e if flat_depth else i + 1
                continue
            a, K, pattern, carry_init = accepted
            stages = [
                [order[a + k * p + j] for j in range(p)] for k in range(K)
            ]
            member_pos = set(range(a, a + K * p))
            # plan-order validation (see _plan_batches): every external
            # node source must sort strictly before the chain entry and
            # every external reader strictly after it
            chain_sort = (depth[order[a]], a)
            ext_srcs = [
                d[2]
                for rows, pes in pattern
                for seq in (list(rows) + [tuple(pd for _i, pd in pes)])
                for d in seq
                if d[0] == "abs" and d[1] == "node"
            ] + [
                s for (kind_i, s, _c) in carry_init.values()
                if kind_i == "node"
            ]
            ok = all(
                (depth[s], cg.canon[s]) < chain_sort for s in ext_srcs
            )
            for pos in range(n):
                if pos in member_pos or not ok:
                    continue
                nid = order[pos]
                reads = [
                    s
                    for per in cg.resolved_in[nid]
                    for (kk, s, _c) in per
                    if kk == "node" and cg.canon[s] in member_pos
                ]
                reads += [
                    src
                    for (dst, _pi), (src, _ch) in
                    cg.resolved_param_edges.items()
                    if dst == nid and cg.canon[src] in member_pos
                ]
                if reads and (depth[nid], cg.canon[nid]) <= chain_sort:
                    ok = False
            if not ok:
                i += 1
                continue
            carry_keys = sorted(carry_init)
            chains.append(
                ChainPlan(
                    stages=stages,
                    period=p,
                    in_pattern=[rows for rows, _pes in pattern],
                    pe_pattern=[pes for _rows, pes in pattern],
                    carry_keys=carry_keys,
                    carry_init=carry_init,
                )
            )
            used |= member_pos
            i = a + K * p
    return chains


def _plan_batches(cg: CompiledGraph):
    """The auto-batching + chain-collapse pass.

    Auto-batching groups same-kind nodes at equal dataflow depth into one
    vmapped execution — 256 parallel SinWt nodes become a single [256]-wide
    call (the reference's 256-sines benchmark shape). Chain collapse (see
    _find_chains) turns K-deep runs of isomorphic units into one lax.scan
    over the stage axis. Depth-layered execution is a valid topological
    order because same-block dependencies always have strictly smaller
    depth; chains are ordered by their first member (every external source
    of a chain feeds its stage 0, so it sorts strictly earlier, and
    _find_chains rejects chains whose external readers would not sort
    strictly later)."""
    depth = _node_depths(cg)
    chains = _find_chains(cg, depth)
    in_chain = {
        nid for cp in chains for stage in cp.stages for nid in stage
    }

    # order members and groups by (depth, canonical position): canonical
    # ordering is structure-deterministic, so two graphs with the same
    # structural signature get identical plans — a requirement for the
    # program cache to reuse compiled programs across commits
    groups: Dict[Any, List[int]] = {}
    for nid in sorted(cg.order, key=lambda n: (depth[n], cg.canon[n])):
        if nid in in_chain:
            continue
        ugen = cg.entries[nid].ugen
        key = None if ugen.event_capacity > 0 else ugen.batch_key()
        gk = (depth[nid], key) if key is not None else ("single", nid)
        groups.setdefault(gk, []).append(nid)

    entries: List[Tuple[Tuple[int, int], Tuple[str, Any]]] = []
    for gk, nids in groups.items():
        sort_key = (depth[nids[0]], cg.canon[nids[0]])
        if len(nids) == 1:
            entries.append((sort_key, ("single", nids[0])))
        else:
            entries.append((sort_key, ("batch", nids)))
    for cp in chains:
        first = cp.stages[0][0]
        entries.append(((depth[first], cg.canon[first]), ("chain", cp)))
    return [e for _k, e in sorted(entries, key=lambda x: x[0])]


def _instance_default(ugen, pidx: int):
    spec = ugen.params[pidx]
    inst = getattr(ugen, "pdefaults", None)
    if inst and spec.name in inst:
        v = inst[spec.name]
        if hasattr(v, "value"):
            v = v.value
        return v
    return spec.default_value()


def _build_render(cg: CompiledGraph, fast: bool = False,
                  block_multiple: int = 1, float_events: bool = False):
    """Trace the block program. ``fast=True`` builds the no-events variant
    (base ramps only; node event channels get all-padding constants) — the
    steady-state program the bounce scan uses.

    ``float_events=True`` builds the FLOAT-EVENT full program: identical to
    the full program (event tensors, per-sample materialized params) except
    collapsed chains still run the Pallas chain kernel — exact for
    float/int set and smoothing events, whose values reach the stage
    bodies through the materialized per-sample param planes (the universal
    param interface), while TRIGGER events would be dropped (the kernel
    skips bool planes). The host dispatches it only for blocks whose event
    batch carries no trigger events (processor.run); the live-chunk tier
    uses it so a control batch no longer demotes the whole chunk to the
    scan executor (block-16 eventful chunk measured 0.9x rt vs 9.0x
    event-free — VERDICT round-5 #7's remaining gap).

    ``block_multiple`` = k > 1 builds the SUPERBLOCK fast program: the whole
    graph evaluated over one k*B-sample block in a single device dispatch —
    k× fewer sequential scan steps, and every cumsum/scan inside the nodes
    vectorizes over k× more samples. Only valid when the graph passes
    ``superblock_eligible`` (no feedback edges, block-invariant nodes, state
    shapes independent of the block size)."""
    m = int(block_multiple)
    if m > 1:
        # fast=True: the event-free superblock (bounce/stream steady state).
        # fast=False: the EVENTFUL superblock — the full per-block program
        # at block m*B, with event frames relative to the superblock start;
        # the param engine stairs block-rate ramps at native_block
        # boundaries so the output bit-matches m sequential native blocks.
        # One live-events chunk = ONE tunnel dispatch (get_full_super_fn).
        ctx = AudioCtx(cg.ctx.sample_rate, cg.ctx.block_size * m, cg.ctx.dtype,
                       no_events=fast)
        engine = PEngine(cg.layout, ctx.block_size, dtype=ctx.dtype,
                         native_block=cg.ctx.block_size)
    else:
        # the fast program statically knows every trigger is False — nodes
        # may skip trigger machinery (AudioCtx.no_events)
        ctx = (AudioCtx(cg.ctx.sample_rate, cg.ctx.block_size, cg.ctx.dtype,
                        no_events=True) if fast else cg.ctx)
        engine = cg.engine
    B = ctx.block_size
    dtype = ctx.dtype
    n_nodes = len(cg.order)

    # nodes whose done frees the TOP-LEVEL graph: the reference zeroes the
    # graph output from the done frame within the same block
    # (graph_gen.rs:227-238 remove_graph) — trace that into the program
    top_free_parent = {
        nid
        for nid in cg.order
        if cg.entries[nid].done_action == Done.FREE_PARENT
        and not cg.enclosing[nid]
    }

    def render(state, events, graph_inputs):
        # Parameter access. The eventful program materializes the full
        # [slots, B] planes (the event fold needs them); the fast program
        # reads LAZILY — per node/batch, gather the tiny [n] ramp vectors
        # and materialize [n, B] in place. The lazy path eliminates the
        # [n, B]-sized row gathers that dominated generic-graph blocks
        # (TPU gathers run ~1e9 elem/s; everything else here is VPU-wide).
        def _idx(slots):
            """Static slice when the slot list is contiguous (the layout
            orders batch members contiguously, so this is the common case
            — slices fuse; gathers don't), index array otherwise."""
            s0 = slots[0]
            if list(slots) == list(range(s0, s0 + len(slots))):
                return slice(s0, s0 + len(slots))
            return jnp.asarray(slots, jnp.int32)

        if fast:
            pe = state["pe"]
            pe_state = engine.advance_fast(pe)

            def pf_rows(slots):
                return engine.materialize_rows_fast(pe, _idx(slots))

            def pf_row(slot):
                return pf_rows([slot])[0]

            def pt_row(slot):
                return jnp.zeros((B,), bool)

            def pt_rows(slots):
                return jnp.zeros((len(slots), B), bool)

            def pi_row(slot):
                return jnp.broadcast_to(pe["int_value"][slot], (B,))

            def pi_rows(slots):
                return jnp.broadcast_to(
                    pe["int_value"][_idx(slots)][:, None],
                    (len(slots), B),
                )

            def pset_row(slot):
                return jnp.zeros((B,), bool)

            def pset_rows(slots):
                return jnp.zeros((len(slots), B), bool)
        else:
            pf, pt, pi, pset, pe_state = engine.materialize(state["pe"], events)

            def pf_rows(slots):
                return pf[_idx(slots)]

            def pf_row(slot):
                return pf[slot]

            def pt_rows(slots):
                return pt[_idx(slots)]

            def pt_row(slot):
                return pt[slot]

            def pi_rows(slots):
                return pi[_idx(slots)]

            def pi_row(slot):
                return pi[slot]

            def pset_rows(slots):
                return pset[_idx(slots)]

            def pset_row(slot):
                return pset[slot]

        outs: Dict[int, jnp.ndarray] = {}
        # batched groups: nid -> (group_key, index); group outputs [N, ch, B]
        node_loc: Dict[int, Tuple[str, int]] = {}
        group_out: Dict[str, jnp.ndarray] = {}
        # chain members: nid -> (chain_key, stage_k, offset_j);
        # chain outputs [chain_key][offset_j] = [K, ch, B] (scan-stacked)
        chain_loc: Dict[int, Tuple[str, int, int]] = {}
        chain_out: Dict[str, Dict[int, jnp.ndarray]] = {}
        new_nodes: Dict[str, Any] = {}

        def read_source(kind, s, c):
            if kind == "node":
                if s in node_loc:
                    gk, k = node_loc[s]
                    return group_out[gk][k, c]
                if s in chain_loc:
                    ck, k, j = chain_loc[s]
                    return chain_out[ck][j][k, c]
                return outs[s][c]
            if kind == "feedback":
                return state["fb"][cg.fb_key(s, c)]
            if kind == "graph_in":
                return graph_inputs[c]
            raise AssertionError(kind)

        def sum_sources(srcs):
            if not srcs:
                return jnp.zeros((B,), dtype=dtype)
            if len(srcs) <= 2:
                acc = read_source(*srcs[0])
                for sp in srcs[1:]:
                    acc = acc + read_source(*sp)
                return acc
            # many additive sources (big mix busses): one stacked reduction
            return jnp.sum(gather_rows(srcs), axis=0)

        def gather_rows(srcs):
            """[len(srcs), B] rows; one fused gather when every source is a
            single 'node' output living in the same batched group — and a
            plain SLICE (free under XLA) when the indices are the identity,
            the dominant mix-bus shape (member i of a batch, channel c)."""
            if len(srcs) > 1 and all(
                k == "node" and s in node_loc for (k, s, _c) in srcs
            ):
                gks = {node_loc[s][0] for (_k, s, _c) in srcs}
                if len(gks) == 1:
                    gk = gks.pop()
                    ks = [node_loc[s][1] for (_k, s, _c) in srcs]
                    cs = [c for (_k, _s, c) in srcs]
                    if ks == list(range(group_out[gk].shape[0])) and (
                        len(set(cs)) == 1
                    ):
                        return group_out[gk][:, cs[0]]
                    return group_out[gk][jnp.asarray(ks), jnp.asarray(cs)]
            return jnp.stack([read_source(*sp) for sp in srcs])

        def node_inputs(nid):
            entry = cg.entries[nid]
            rows = [
                sum_sources(cg.resolved_in[nid][ch]) for ch in range(entry.inputs)
            ]
            return jnp.stack(rows) if rows else jnp.zeros((0, B), dtype=dtype)

        def node_params(nid):
            ugen = cg.entries[nid].ugen
            params = {}
            for pidx, spec in enumerate(ugen.params):
                if (nid, pidx) in cg.resolved_param_edges:
                    src, ch = cg.resolved_param_edges[(nid, pidx)]
                    params[spec.name] = read_source("node", src, ch)
                    continue
                typ, slot = cg.layout.lookup(nid, pidx)
                if typ == "float":
                    params[spec.name] = pf_row(slot)
                elif typ == "trigger":
                    params[spec.name] = pt_row(slot)
                else:
                    params[spec.name] = pi_row(slot)
                    if getattr(spec, "retrigger", False):
                        params[spec.name + "_set"] = pset_row(slot)
            return params

        def batch_params(nids):
            """Per-sample parameter arrays for a batch, [N, B] per name.

            When every member reads the same engine-slot type for a param,
            this is ONE gather (of [N] ramp vectors in the fast program, of
            [N, B] rows in the eventful one)."""
            rep = cg.entries[nids[0]].ugen
            out_params = {}
            for pidx, spec in enumerate(rep.params):
                slots = []
                uniform = True
                for n in nids:
                    if (n, pidx) in cg.resolved_param_edges:
                        uniform = False
                        break
                    slots.append(cg.layout.lookup(n, pidx)[1])
                if uniform:
                    typ = cg.layout.lookup(nids[0], pidx)[0]
                    rows = {"float": pf_rows, "trigger": pt_rows,
                            "int": pi_rows}[typ]
                    out_params[spec.name] = rows(slots)
                    if typ == "int" and getattr(spec, "retrigger", False):
                        out_params[spec.name + "_set"] = pset_rows(slots)
                else:
                    rows = [node_params(n)[spec.name] for n in nids]
                    out_params[spec.name] = jnp.stack(rows)
                    if getattr(spec, "retrigger", False):
                        rows_s = [node_params(n).get(spec.name + "_set") for n in nids]
                        if all(r is not None for r in rows_s):
                            out_params[spec.name + "_set"] = jnp.stack(rows_s)
            return out_params

        def batch_inputs(nids, rep):
            """[N, in_ch, B] inputs for a batch; per input channel, one fused
            gather when all members read a single same-group node output
            (the dominant case: e.g. 256 Mul nodes reading 256 sines on ch0
            and 256 Constants on ch1)."""
            N = len(nids)
            if rep.inputs == 0:
                return jnp.zeros((N, 0, B), dtype=dtype)
            ch_arrays = []
            for ch in range(rep.inputs):
                per_node = [cg.resolved_in[n][ch] for n in nids]
                if all(
                    len(s) == 1 and s[0][0] == "node" and s[0][1] in node_loc
                    for s in per_node
                ):
                    gks = {node_loc[s[0][1]][0] for s in per_node}
                    if len(gks) == 1:
                        gk = gks.pop()
                        ks = [node_loc[s[0][1]][1] for s in per_node]
                        cs = [s[0][2] for s in per_node]
                        if ks == list(range(group_out[gk].shape[0])) and (
                            len(set(cs)) == 1
                        ):
                            # identity wiring: member i reads member i — a
                            # slice, not a gather
                            ch_arrays.append(group_out[gk][:, cs[0]])
                        else:
                            ch_arrays.append(
                                group_out[gk][jnp.asarray(ks), jnp.asarray(cs)]
                            )
                        continue
                ch_arrays.append(
                    jnp.stack([sum_sources(cg.resolved_in[n][ch]) for n in nids])
                )
            return jnp.stack(ch_arrays, axis=1)

        done_parts: List[jnp.ndarray] = []
        free_frames: List[jnp.ndarray] = []  # graph-freeing done frames

        def first_done_frame(done_row):
            return jnp.where(
                jnp.any(done_row), jnp.argmax(done_row).astype(jnp.int32), B
            )

        for kind, item in cg.plan:
            if kind == "single":
                nid = item
                ugen = cg.entries[nid].ugen
                if ugen.event_capacity > 0:
                    # fast program: events=None lets nodes (voice banks)
                    # skip their event scatters entirely
                    result = ugen.process(
                        ctx, state["nodes"][cg.state_key(nid)], node_inputs(nid),
                        node_params(nid),
                        events=None if fast else events[cg.event_key(nid)],
                    )
                else:
                    result = ugen.process(
                        ctx, state["nodes"][cg.state_key(nid)], node_inputs(nid),
                        node_params(nid),
                    )
                st, out, done = normalize_process_result(result, ctx)
                outs[nid] = out
                new_nodes[cg.state_key(nid)] = st
                done_parts.append(jnp.any(done)[None])
                if nid in top_free_parent:
                    free_frames.append(first_done_frame(done))
            elif kind == "batch":  # vmapped same-kind nodes (auto-batching)
                nids = item
                rep = cg.entries[nids[0]].ugen
                inp_stack = batch_inputs(nids, rep)
                params_stack = batch_params(nids)
                gkey = cg.group_key(nids)
                states = state["nodes"][gkey]

                def one(s, i, p):
                    return normalize_process_result(rep.process(ctx, s, i, p), ctx)

                st, out, done = jax.vmap(one)(states, inp_stack, params_stack)
                new_nodes[gkey] = st
                group_out[gkey] = out
                for k, n in enumerate(nids):
                    node_loc[n] = (gkey, k)
                    if n in top_free_parent:
                        free_frames.append(first_done_frame(done[k]))
                done_parts.append(jnp.any(done, axis=1))
            else:  # chain: one lax.scan over the stage axis (chain collapse)
                cp = item
                K, p = len(cp.stages), cp.period
                ckey = cg.chain_key(cp)
                reps = [cg.entries[cp.stages[0][j]].ugen for j in range(p)]

                # stacked per-stage params: [K, B] per (offset, param). The
                # layout orders chain slots stage-contiguously, so each
                # gather is a static slice.
                par = {}
                for j, rep in enumerate(reps):
                    pe_pat = dict(cp.pe_pattern[j])
                    pj = {}
                    for pidx, spec in enumerate(rep.params):
                        if pidx in pe_pat:
                            continue  # audio-rate edge, resolved in body
                        slots = [
                            cg.layout.lookup(stage[j], pidx)[1]
                            for stage in cp.stages
                        ]
                        typ = cg.layout.lookup(cp.stages[0][j], pidx)[0]
                        rows = {"float": pf_rows, "trigger": pt_rows,
                                "int": pi_rows}[typ]
                        pj[spec.name] = rows(slots)
                        if typ == "int" and getattr(spec, "retrigger", False):
                            pj[spec.name + "_set"] = pset_rows(slots)
                    par[f"j{j}"] = pj

                # external (per-chain-constant) sources are traced here and
                # close over the scan body as loop constants
                carry0 = {
                    f"{dj}_{c}": read_source(*cp.carry_init[(dj, c)])
                    for (dj, c) in cp.carry_keys
                }
                xs = {"st": state["nodes"][ckey], "par": par}

                # event-free fast program (or the float-event full
                # program): try the single-kernel Pallas executor (stage
                # loop in VMEM) before the lax.scan one
                pallas_res = None
                if (fast or float_events) and chain_kernel.enabled():
                    ext = {
                        d: read_source(d[1], d[2], d[3])
                        for d in chain_kernel.ext_descs(cp)
                    }
                    pallas_res = chain_kernel.run(
                        cp, reps, ctx, xs["st"], par, carry0, ext,
                        needed=chain_kernel.needed_outputs(cg, cp),
                    )
                if pallas_res is not None:
                    st_stack, outs_stack, chain_dones = pallas_res
                    new_nodes[ckey] = st_stack
                    chain_out[ckey] = {
                        j: outs_stack[j] for j in range(p)
                    }
                    for k, stage in enumerate(cp.stages):
                        for j, n in enumerate(stage):
                            chain_loc[n] = (ckey, k, j)
                            if n in top_free_parent:
                                dj = chain_dones.get(j)
                                free_frames.append(
                                    first_done_frame(dj[k])
                                    if dj is not None
                                    else jnp.asarray(B, jnp.int32)
                                )
                    # same [K*p] layout as the scan executor's
                    # jnp.any(done_stack, axis=2).reshape(-1)
                    if any(d is not None for d in chain_dones.values()):
                        cols = [
                            jnp.any(chain_dones[j], axis=1)
                            if chain_dones.get(j) is not None
                            else jnp.zeros((K,), bool)
                            for j in range(p)
                        ]
                        done_parts.append(
                            jnp.stack(cols, axis=1).reshape(-1)
                        )
                    else:
                        done_parts.append(jnp.zeros((K * p,), bool))
                    continue

                def chain_body(carry, x):
                    outs_local: Dict[int, jnp.ndarray] = {}
                    new_states: Dict[str, Any] = {}
                    dones = []

                    def resolve(d):
                        if d[0] == "rel":
                            _t, r, c = d
                            if r >= 0:
                                return outs_local[r][c]
                            return carry[f"{p + r}_{c}"]
                        _t, kind2, s, c = d
                        return read_source(kind2, s, c)

                    for j, rep in enumerate(reps):
                        rows = []
                        for ch_descs in cp.in_pattern[j]:
                            if not ch_descs:
                                rows.append(jnp.zeros((B,), dtype=dtype))
                                continue
                            acc = resolve(ch_descs[0])
                            for d in ch_descs[1:]:
                                acc = acc + resolve(d)
                            rows.append(acc)
                        inp = (
                            jnp.stack(rows)
                            if rows
                            else jnp.zeros((0, B), dtype=dtype)
                        )
                        pr = dict(x["par"][f"j{j}"])
                        for pidx, d in cp.pe_pattern[j]:
                            pr[rep.params[pidx].name] = resolve(d)
                        st_j, out, done = normalize_process_result(
                            rep.process(ctx, x["st"][f"j{j}"], inp, pr), ctx
                        )
                        outs_local[j] = out
                        new_states[f"j{j}"] = st_j
                        dones.append(done)
                    new_carry = {
                        f"{dj}_{c}": outs_local[dj][c]
                        for (dj, c) in cp.carry_keys
                    }
                    # outputs stacked for external readers (XLA dead-code
                    # eliminates unread offsets), dones as [p, B]
                    ys = (new_states, dict(enumerate(
                        outs_local[j] for j in range(p)
                    )), jnp.stack(dones))
                    return new_carry, ys

                _last, (st_stack, outs_stack, done_stack) = jax.lax.scan(
                    chain_body, carry0, xs,
                    unroll=min(CHAIN_UNROLL, K),
                )
                new_nodes[ckey] = st_stack
                chain_out[ckey] = outs_stack
                for k, stage in enumerate(cp.stages):
                    for j, n in enumerate(stage):
                        chain_loc[n] = (ckey, k, j)
                        if n in top_free_parent:
                            free_frames.append(
                                first_done_frame(done_stack[k, j])
                            )
                done_parts.append(
                    jnp.any(done_stack, axis=2).reshape(-1)
                )

        new_fb = {
            cg.fb_key(s, c): read_source("node", s, c) for (s, c) in cg.fb_sources
        }

        out_rows = [sum_sources(cg.resolved_out[ch]) for ch in range(cg.graph.outputs)]
        out_block = (
            jnp.stack(out_rows)
            if out_rows
            else jnp.zeros((0, B), dtype=dtype)
        )
        if free_frames:
            # zero the graph output from the earliest graph-freeing done
            # frame (graph_gen.rs:227-238); frame == B when nothing flagged
            fmin = free_frames[0]
            for f in free_frames[1:]:
                fmin = jnp.minimum(fmin, f)
            keep = jnp.arange(B, dtype=jnp.int32)[None, :] < fmin
            out_block = jnp.where(keep, out_block, jnp.zeros((), dtype))
        done_vec = (
            jnp.concatenate(done_parts)
            if done_parts
            else jnp.zeros((0,), dtype=bool)
        )
        new_state = {"nodes": new_nodes, "pe": pe_state, "fb": new_fb}
        return new_state, out_block, done_vec

    if fast:
        const_events = cg.empty_events()  # trace-time constants

        def render_fast(state, graph_inputs):
            return render(state, const_events, graph_inputs)

        return render_fast
    return render
