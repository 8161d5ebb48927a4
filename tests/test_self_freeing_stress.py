"""Self-freeing voice stress — the reference ships this as a standalone
stress example (knaster_graph/examples/self_freeing_stress_test.rs:25-105):
a control loop keeps pushing enveloped subgraph voices whose EnvAsr
carries Done.FREE_PARENT, triggers the previous voice's release each
cycle, and the engine renders throughout. Here: audio stays finite through
every push/free cycle, the graph returns to its baseline node count once
all envelopes have released, and the program cache serves the recurring
topologies instead of growing per cycle."""

import numpy as np

import knaster_tpu.graph.compile as C
from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Done,
    EnvAsr,
    SinNumeric,
)


def test_self_freeing_voice_stress():
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    baseline_nodes = len(g.nodes)
    state = {"release": None}
    n_cycles = 10

    for i in range(n_cycles):

        def build(gg, i=i):
            if state["release"] is not None:
                state["release"].trig()
            child, ch = gg.subgraph(inputs=0, outputs=1, name=f"voice{i}")
            osc = child.push(SinNumeric(50.0 * (i + 1)))
            asr = child.push_with_done_action(
                EnvAsr(0.001, 0.002), Done.FREE_PARENT
            )
            asr.param("t_restart").trig()
            (osc * asr * 0.05).to_graph_out()
            ch.to_graph_out()
            state["release"] = asr.param("t_release")

        g.edit(build)
        out = np.asarray(proc.render(frames=64))
        assert np.all(np.isfinite(out)), f"non-finite audio in cycle {i}"

    # release the last voice and drain: every FREE_PARENT envelope has
    # finished (release = 0.002 s = 96 samples) well within this render
    state["release"].trig()
    out = np.asarray(proc.render(frames=960))
    assert np.all(np.isfinite(out))
    for _ in range(8):  # frees apply at block boundaries after done flags
        if len(g.nodes) == baseline_nodes:
            break
        proc.render(frames=64)
    assert len(g.nodes) == baseline_nodes, (
        f"{len(g.nodes) - baseline_nodes} nodes leaked after all voices "
        "released"
    )
    # the push/free cycle revisits a bounded set of topologies: the cache
    # must not have one entry per cycle
    assert len(C._PROGRAM_CACHE) < n_cycles
    # and the engine still renders cleanly at baseline
    tail = np.asarray(proc.render(frames=64))
    assert np.all(np.isfinite(tail)) and np.abs(tail).max() == 0.0
