"""Pallas executor for collapsed chains: the whole stage loop in ONE kernel.

The chain-collapse pass (compile._find_chains) runs K isomorphic units as a
``lax.scan`` over the stage axis. That already collapses program size, but at
small block sizes (the live-latency regime, B=16-64) each scan iteration
still pays per-op dispatch inside the compiled TPU loop: a 256-deep FM
cascade is bound by ~2 us/op x ~8 ops x 256 stages of overhead, not by
compute (the per-stage work is a handful of [B]-wide VPU ops). This module
executes the SAME ChainPlan as one ``pallas_call``: the carried block rows
live in VMEM/vector registers across the in-kernel ``fori_loop`` over
stages, per-stage params are dynamic row slices of the stacked [K, B]
planes, and per-stage state (e.g. SinWt's u32 phase) is read and written by
dynamic row index.

UGens opt in via ``UGen.mosaic_stage`` (core/ugen.py), a Mosaic-traceable
body bit-equivalent to ``process`` under the fast program's guarantees.
Only the event-free fast program uses this path — eventful blocks keep the
lax.scan executor, so trigger/event machinery never enters the kernel. The
reference runs the equivalent cascade as a plain sequential node walk
(knaster_graph/src/graph_gen.rs task run loop); this is its TPU shape.

Selection: KNASTER_CHAIN_PALLAS = "auto" (the default: on for real
accelerators, off on CPU where the interpreter would be slower than the
scan executor), "1" (always, interpret-mode on CPU — what the parity
tests use), "0" (off). The v5e A/B (benchmarks/RESULTS.md) measured the
kernel at 4.0-4.4x the scan executor on the generic 256-stage FM cascade
— block 16 goes 0.7x -> 2.9x realtime, block 64 2.3x -> 9.2x — which is
what made "auto" the default. The Mosaic-validation valve (below) keeps
default-on safe: structures the backend rejects fall back to the scan
executor instead of failing the graph compile.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# when not None, overrides the env var (tests monkeypatch this); the env
# vars themselves are read per call, not at import — setting them after
# `import knaster_tpu` works (the JAX_PLATFORMS-after-import trap doesn't
# apply here)
_MODE: Optional[str] = None
_UNROLL: Optional[int] = None
# tests force False to exercise the Mosaic-validation valve on CPU
_INTERPRET: Optional[bool] = None


def _mode() -> str:
    if _MODE is not None:
        return _MODE
    return os.environ.get("KNASTER_CHAIN_PALLAS", "auto")


def _unroll() -> int:
    if _UNROLL is not None:
        return _UNROLL
    return int(os.environ.get("KNASTER_CHAIN_PALLAS_UNROLL", "8"))
# whole-kernel operand budget: stacked params + states + per-stage outputs
# must fit VMEM comfortably (16M on v5e; leave headroom for Mosaic's stack)
_VMEM_BUDGET = 10 * 1024 * 1024


def enabled() -> bool:
    mode = _mode()
    if mode == "0":
        return False
    if mode == "auto":
        return jax.devices()[0].platform != "cpu"
    return True


def ext_descs(cp) -> List[Tuple]:
    """The distinct external ('abs') source descriptors a plan reads, in
    first-use order — the caller resolves each via its read_source closure
    and passes the rows to run()."""
    seen: Dict[Tuple, None] = {}
    for j in range(cp.period):
        for ch_descs in cp.in_pattern[j]:
            for d in ch_descs:
                if d[0] == "abs":
                    seen.setdefault(d)
        for _pidx, d in cp.pe_pattern[j]:
            if d[0] == "abs":
                seen.setdefault(d)
    return list(seen)


def needed_outputs(cg, cp) -> set:
    """The (stage-offset j, channel c) pairs of a chain plan that anything
    OUTSIDE the chain reads — graph outputs, feedback taps, param edges, or
    other nodes' inputs. The scan executor stacks every stage output and
    lets XLA dead-code-eliminate the unread ones; a pallas_call's outputs
    are opaque to XLA, so the kernel only materializes these planes (the
    rest never leave VMEM registers and don't count against the budget)."""
    members = {
        n: j for stage in cp.stages for j, n in enumerate(stage)
    }
    needed = set()
    for nid, per_ch in cg.resolved_in.items():
        if nid in members:
            continue  # intra-chain reads are rel/carry, never planes
        for ch_srcs in per_ch:
            for (kind, s, c) in ch_srcs:
                if kind == "node" and s in members:
                    needed.add((members[s], c))
    for (dst, _pidx), (src, ch) in cg.resolved_param_edges.items():
        if dst not in members and src in members:
            needed.add((members[src], ch))
    for (s, c) in cg.fb_sources:
        if s in members:
            needed.add((members[s], c))
    for srcs in cg.resolved_out:
        for (kind, s, c) in srcs:
            if kind == "node" and s in members:
                needed.add((members[s], c))
    return needed


# Mosaic-validation verdicts per kernel structure: mosaic_stage bodies are
# restricted to a documented op subset, but whether a given composition
# lowers on the current backend is only knowable by compiling it — a
# lowering failure inside the GRAPH program would kill the whole compile,
# so the kernel is compiled STANDALONE once per structure and the chain
# falls back to the scan executor if Mosaic rejects it. This is what makes
# an eventual default-on safe.
_VALIDATED: Dict[Tuple, bool] = {}


def _validated(kernel_call, reps, operands, out_shapes, B) -> bool:
    key = (
        tuple(type(r).__qualname__ for r in reps),
        tuple((tuple(x.shape), str(x.dtype)) for x in operands),
        tuple((tuple(s.shape), str(s.dtype)) for s in out_shapes),
        B,
        _unroll(),
    )
    ok = _VALIDATED.get(key)
    if ok is None:
        try:
            shapes = [
                jax.ShapeDtypeStruct(x.shape, x.dtype) for x in operands
            ]
            jax.jit(kernel_call).lower(*shapes).compile()
            ok = True
        except Exception:
            ok = False
        _VALIDATED[key] = ok
    return ok


def run(cp, reps, ctx, state_stack, par, carry0, ext_rows, needed=None):
    """Execute the chain plan as one Pallas kernel.

    state_stack: {"j{j}": leaf pytree stacked [K, ...]}; par: {"j{j}":
    {name: [K, B] plane}} (bool planes are the fast program's all-false
    trigger/set rows and are skipped); carry0: {"{dj}_{c}": [B] row};
    ext_rows: {abs-desc: [B] row}. Returns (new_state_stack, outs, dones)
    with outs[j] = [K, out_ch, B] and dones[j] = [K, B] bool for offsets
    whose unit ``may_set_done`` (None for the rest), or None when the plan
    is not kernel-eligible (caller falls back to the lax.scan executor).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ctx.dtype != np.float32:
        return None
    K, p, B = len(cp.stages), cp.period, ctx.block_size
    fns = []
    # offsets whose unit can raise done flags: their mosaic_stage body
    # returns (new_state, out, done_row) with done_row a [1, B] 0/1 mask
    # in ctx.dtype, materialized as a [K, B] plane (bool outputs don't
    # lower; the caller re-masks with > 0.5)
    done_capable = [bool(getattr(rep, "may_set_done", False)) for rep in reps]
    for rep in reps:
        fn = rep.mosaic_stage(ctx)
        if fn is None:
            return None
        fns.append(fn)

    operands: List[jnp.ndarray] = []

    def add(x) -> int:
        operands.append(x)
        return len(operands) - 1

    # --- stacked non-trigger param planes, [K, B] each ---------------------
    param_entries: List[List[Tuple[str, int]]] = []
    for j in range(p):
        entries = []
        for name, plane in sorted(par[f"j{j}"].items()):
            if plane.dtype == jnp.bool_:
                continue  # fast-program trigger/_set rows: all false
            entries.append((name, add(plane)))
        param_entries.append(entries)

    # --- stacked state leaves, 2D-ified to [K, n] ---------------------------
    state_entries = []  # per j: (treedef, [(idx, orig_shape, dtype)])
    for j in range(p):
        leaves, treedef = jax.tree_util.tree_flatten(state_stack[f"j{j}"])
        items = []
        for leaf in leaves:
            if leaf.ndim == 0 or leaf.shape[0] != K or leaf.ndim > 2:
                return None  # per-node state bigger than a vector row
            items.append(
                (add(leaf.reshape(K, -1)), leaf.shape, leaf.dtype)
            )
        state_entries.append((treedef, items))

    # --- external rows and carry-in rows, [1, B] each ----------------------
    ext_idx = {d: add(row.reshape(1, B)) for d, row in ext_rows.items()}
    carry_idx = [
        add(carry0[f"{dj}_{c}"].reshape(1, B)) for (dj, c) in cp.carry_keys
    ]

    # --- outputs: per-stage channel planes, then new state leaves ----------
    out_shapes: List[jax.ShapeDtypeStruct] = []

    def add_out(shape, dtype) -> int:
        out_shapes.append(jax.ShapeDtypeStruct(shape, dtype))
        return len(out_shapes) - 1

    # out planes only for externally-read channels (None ⇒ nothing outside
    # the chain reads it: skip the store, return zeros — XLA folds them)
    out_entries = [
        [
            add_out((K, B), ctx.dtype)
            if needed is None or (j, c) in needed
            else None
            for c in range(reps[j].outputs)
        ]
        for j in range(p)
    ]
    state_out_entries = [
        [add_out((K, int(np.prod(shape[1:], dtype=int)) or 1), dtype)
         for (_i, shape, dtype) in items]
        for (_td, items) in state_entries
    ]
    # done planes: [K, B] 0/1 rows per done-capable offset (always
    # materialized — done flags feed the host's free/mortality machinery)
    done_entries = [
        add_out((K, B), ctx.dtype) if done_capable[j] else None
        for j in range(p)
    ]

    nbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in operands)
    nbytes += sum(
        int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize for s in out_shapes
    )
    if nbytes > _VMEM_BUDGET:
        return None

    n_in = len(operands)
    carry_keys = list(cp.carry_keys)
    in_pattern, pe_pattern = cp.in_pattern, cp.pe_pattern
    interpret = (
        _INTERPRET
        if _INTERPRET is not None
        else jax.devices()[0].platform == "cpu"
    )

    def kernel(*refs):
        in_refs, out_refs = refs[:n_in], refs[n_in:]
        ext_vals = {d: in_refs[i][:] for d, i in ext_idx.items()}

        def body(k, carry):
            outs_local: Dict[int, Any] = {}

            def resolve(d):
                if d[0] == "rel":
                    _t, r, c = d
                    if r >= 0:
                        return outs_local[r][c : c + 1, :]
                    return carry[carry_keys.index((p + r, c))]
                return ext_vals[d]

            for j in range(p):
                rows = []
                for ch_descs in in_pattern[j]:
                    if not ch_descs:
                        rows.append(jnp.zeros((1, B), ctx.dtype))
                        continue
                    acc = resolve(ch_descs[0])
                    for d in ch_descs[1:]:
                        acc = acc + resolve(d)
                    rows.append(acc)
                inp = (
                    jnp.concatenate(rows, axis=0)
                    if rows
                    else jnp.zeros((0, B), ctx.dtype)
                )
                prm = {
                    name: in_refs[i][pl.ds(k, 1), :]
                    for name, i in param_entries[j]
                }
                for pidx, d in pe_pattern[j]:
                    prm[reps[j].params[pidx].name] = resolve(d)
                treedef, items = state_entries[j]
                st = jax.tree_util.tree_unflatten(
                    treedef,
                    [in_refs[i][pl.ds(k, 1), :] for (i, _s, _d) in items],
                )
                if done_capable[j]:
                    new_st, out, done_row = fns[j](inp, st, prm)
                    out_refs[done_entries[j]][pl.ds(k, 1), :] = done_row
                else:
                    new_st, out = fns[j](inp, st, prm)
                outs_local[j] = out
                for c, oi in enumerate(out_entries[j]):
                    if oi is not None:
                        out_refs[oi][pl.ds(k, 1), :] = out[c : c + 1, :]
                for (oi, leaf) in zip(
                    state_out_entries[j], jax.tree_util.tree_leaves(new_st)
                ):
                    out_refs[oi][pl.ds(k, 1), :] = leaf.reshape(1, -1)
            return tuple(
                outs_local[dj][c : c + 1, :] for (dj, c) in carry_keys
            )

        carry0_vals = tuple(refs[i][:] for i in carry_idx)
        # Mosaic's for-loop lowering accepts only unroll=1 or a full
        # unroll (unroll == num_steps); partial unrolls are rejected at
        # compile time, so round the requested factor down to legal
        u = _unroll()
        jax.lax.fori_loop(
            0, K, body, carry0_vals, unroll=K if u >= K else 1
        )

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel_call = pl.pallas_call(
        kernel,
        in_specs=[vmem() for _ in operands],
        out_specs=[vmem() for _ in out_shapes],
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )
    if not interpret and not _validated(
        kernel_call, reps, operands, out_shapes, B
    ):
        return None  # Mosaic rejected this kernel: scan executor instead
    results = kernel_call(*operands)

    zero_plane = None
    outs = {}
    for j in range(p):
        planes = []
        for oi in out_entries[j]:
            if oi is None:
                if zero_plane is None:
                    zero_plane = jnp.zeros((K, B), ctx.dtype)
                planes.append(zero_plane)
            else:
                planes.append(results[oi])
        outs[j] = (
            jnp.stack(planes, axis=1)
            if planes
            else jnp.zeros((K, 0, B), ctx.dtype)
        )
    new_state_stack = {}
    for j, (treedef, items) in enumerate(state_entries):
        leaves = [
            results[oi].reshape(shape)
            for oi, (_i, shape, _d) in zip(state_out_entries[j], items)
        ]
        new_state_stack[f"j{j}"] = jax.tree_util.tree_unflatten(
            treedef, leaves
        )
    dones = {
        j: (results[di] > 0.5) if di is not None else None
        for j, di in enumerate(done_entries)
    }
    return new_state_stack, outs, dones
