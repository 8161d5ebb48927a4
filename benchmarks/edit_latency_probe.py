"""Breakdown of the cache-hit live-edit -> audible latency (VERDICT round-5
task 1: the 77 ms edit_latency row had no accounting of where the time
goes — state-carry jit? host compile_graph work? dispatch? fetch?).

Reproduces bench_edit_latency's recurring free/push cycle at 256 nodes,
block 16, but times each phase of the swap separately:

  graph_edit     g.edit() — pure graph mutation (no compile)
  compile_graph  compile_graph() on a program-cache HIT (host Python:
                 topo walk, batching plan, signature, cache lookup)
  init_state     state carry prev->new (re-key by node id + carry program)
  first_block    run_without_inputs() — one block dispatch + host fetch
  steady_block   the same call in steady state (no edit) — the floor any
                 block pays on this tunnel

Usage: python benchmarks/edit_latency_probe.py [n_nodes] [block_size]
Prints per-phase ms over the cycle repeats and a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    block_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from knaster_tpu import AudioProcessor, AudioProcessorOptions, SinWt
    from knaster_tpu.graph.compile import clear_program_cache, compile_graph

    clear_program_cache()
    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=block_size)
    )

    handles = []

    def add_sine(gg):
        s = gg.push(SinWt(440.0))
        (s * 0.001).to_graph_out()
        return s

    g.edit(lambda gg: [handles.append(add_sine(gg)) for _ in range(n_nodes)])
    proc.run_without_inputs()

    # warm both topologies (n and n+1 nodes) exactly like the bench
    g.edit(lambda gg: handles.append(add_sine(gg)))
    proc.run_without_inputs()
    for _ in range(2):
        g.edit(lambda gg: handles.pop().free())
        proc.run_without_inputs()
        g.edit(lambda gg: handles.append(add_sine(gg)))
        proc.run_without_inputs()

    def one_cycle(mutate):
        t0 = time.time()
        g.edit(mutate)
        t1 = time.time()
        # phase-split what _ensure_compiled does
        prev_compiled, prev_state = proc.compiled, proc.state
        proc.compiled = compile_graph(
            proc.graph, proc.options.event_capacity, proc.options.auto_batch
        )
        t2 = time.time()
        proc.state = proc.compiled.init_state(prev_state, prev_compiled)
        t3 = time.time()
        proc.run_without_inputs()
        t4 = time.time()
        return {
            "graph_edit": t1 - t0,
            "compile_graph": t2 - t1,
            "init_state": t3 - t2,
            "first_block": t4 - t3,
        }

    rows = []
    for _ in range(4):
        rows.append(one_cycle(lambda gg: handles.pop().free()))
        rows.append(one_cycle(lambda gg: handles.append(add_sine(gg))))

    # end-to-end through the processor API (what bench_edit_latency times:
    # g.edit + run_without_inputs via _ensure_compiled, incl. the deferred
    # undo-carry prewarm kick)
    e2e = []
    for _ in range(4):
        for mut in (lambda gg: handles.pop().free(),
                    lambda gg: handles.append(add_sine(gg))):
            t0 = time.time()
            g.edit(mut)
            proc.run_without_inputs()
            e2e.append(time.time() - t0)

    # steady-state block floor (no edit)
    steady = []
    for _ in range(8):
        t0 = time.time()
        proc.run_without_inputs()
        steady.append(time.time() - t0)

    def ms(x):
        return round(x * 1e3, 2)

    last = rows[-2:]  # the recurring (fully warm) free+push cycle
    summary = {"probe": "edit_latency_breakdown",
               "config": f"{n_nodes}nodes_block{block_size}"}
    for k in ("graph_edit", "compile_graph", "init_state", "first_block"):
        vals = [r[k] for r in rows]
        print(f"{k:14s} all cycles: {[ms(v) for v in vals]}")
        summary[k + "_ms"] = ms(min(r[k] for r in last))
    summary["steady_block_ms"] = ms(min(steady))
    summary["end_to_end_ms"] = ms(min(e2e[2:]))
    print(f"end_to_end     {[ms(v) for v in e2e]}")
    summary["total_ms"] = round(
        sum(summary[k + "_ms"] for k in
            ("graph_edit", "compile_graph", "init_state", "first_block")), 2
    )
    print(f"steady_block   {[ms(v) for v in steady]}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
