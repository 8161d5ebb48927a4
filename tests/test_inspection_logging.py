"""Inspection, dot export, and probe-logging tests."""

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Constant,
    LogProbe,
    SinWt,
)
from knaster_tpu.graph.inspection import inspect, to_dot

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


def _patch():
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def build(gg):
        s = gg.push(SinWt(440.0), name="sine")
        a = gg.push(Constant(0.5), name="amp")
        sig = s * a
        sig.out([0, 0]).to_graph_out()
        probe = gg.push(LogProbe("mix", samples_between_logs=8), name="probe")
        sig.to(probe)

    g.edit(build)
    return g, proc


def test_inspect_structure():
    g, proc = _patch()
    gi = inspect(g)
    names = {n.name for n in gi.nodes}
    assert {"sine", "amp", "probe"} <= names
    # operator sugar created an auto Math node
    assert any(n.auto for n in gi.nodes)
    kinds = {e.kind for e in gi.edges}
    assert "graph_out" in kinds and "node" in kinds
    assert gi.frame_clock == 0
    # params carried through
    sine = next(n for n in gi.nodes if n.name == "sine")
    assert ("freq", "float") in [(n, t) for n, t, _ in sine.params]


def test_dot_export():
    g, proc = _patch()
    dot = to_dot(g)
    assert dot.startswith("digraph")
    assert "sine" in dot and "gout" in dot
    # feedback edges are marked
    from tests.utils import TestInPlusParamUGen

    def fb(gg):
        a = gg.push(TestInPlusParamUGen())
        b = gg.push(TestInPlusParamUGen())
        a.to(b)
        b.to_feedback(a)
        b.to_graph_out_channels(0)

    g.edit(fb)
    assert "color=red" in to_dot(g)


def test_probe_log_drain():
    g, proc = _patch()
    proc.run_without_inputs()
    probes = proc.probe_log()
    assert len(probes) == 1
    p = probes[0]
    assert p.name == "mix"
    assert p.fired  # period 8 < block 16, so it fired this block
    assert np.isfinite(p.value)


def test_rt_log_inside_jit(capfd):
    """rt_log must work under jit (debug.print host callback)."""
    import jax
    import jax.numpy as jnp

    from knaster_tpu.core.log import rt_log

    @jax.jit
    def f(x):
        rt_log("peak {p}", p=jnp.abs(x).max())
        return x * 2

    f(jnp.asarray([1.0, -3.0])).block_until_ready()
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "peak 3.0" in out.out or "peak 3.0" in out.err


def test_arlog_ring_semantics():
    """ArLogSender/Receiver: typed chains, capacity backpressure (full ring
    DROPS the chain, never blocks), complete-chain-only delivery, and traced
    values delivered through the jit host callback (log.rs:118-271)."""
    import jax
    import jax.numpy as jnp

    from knaster_tpu import ArLogReceiver, rt_log

    rec = ArLogReceiver()
    logger = rec.sender(capacity=8)
    assert rec.channels() == 1

    # host-side chains
    rt_log(logger, "peak ", 0.5, 3)
    got = []
    assert rec.recv(got.append) == 1
    assert got == [("peak ", 0.5, 3)]

    # capacity: an oversized batch drops whole chains instead of blocking
    for _ in range(10):
        rt_log(logger, "x", 1.0)  # 3 slots each incl. END; cap 8 -> 2 fit
    assert logger.dropped == 8
    got = []
    assert rec.recv(got.append) == 2

    # traced values arrive via the debug callback from inside jit
    @jax.jit
    def f(x):
        rt_log(logger, "jit peak ", jnp.abs(x).max())
        return x * 2

    _ = f(jnp.asarray([1.0, -3.0]))
    jax.effects_barrier()
    got = []
    rec.recv(got.append)
    assert got and got[0][0] == "jit peak " and abs(got[0][1] - 3.0) < 1e-6

    # a partial chain (send without End) stays queued until terminated
    logger.send("partial")
    got = []
    assert rec.recv(got.append) == 0
    rt_log(logger)  # empty log() = bare End terminator
    assert rec.recv(got.append) == 1
    assert got == [("partial",)]


def test_node_handles_from_inspection():
    """inspection.rs:49 node_handles parity: rebuild live handles from an
    inspection snapshot; auto math-sugar nodes are excluded."""
    from knaster_tpu.graph.inspection import inspect, node_handles

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        s = gg.push(SinWt(440.0))
        (s * 0.1).to_graph_out()
        return s

    s = g.edit(build)
    gi = inspect(g)
    hs = node_handles(g, gi)
    assert s.node_id in hs
    assert all(not n.auto or nid not in hs
               for n in gi.nodes for nid in [n.nid])
    # the rebuilt handle controls the same node
    hs[s.node_id].param("freq").set(220.0)
    proc.render(frames=64)
    zc = np.asarray(proc.render(frames=48000)[0])
    rate = np.sum((zc[:-1] < 0) & (zc[1:] >= 0))
    assert abs(rate - 220.0) < 4


def test_collect_probes_single_fetch(monkeypatch):
    """collect_probes makes exactly ONE device_get regardless of probe
    count (per-probe float()/bool() casts were a round-trip each)."""
    import jax

    from knaster_tpu import LogProbe

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        for i in range(5):
            s = gg.push(SinWt(100.0 * (i + 1)))
            s.to(gg.push(LogProbe(f"p{i}")))
            (s * 0.01).to_graph_out()

    g.edit(build)
    proc.render(frames=64)
    calls = []
    orig = jax.device_get
    monkeypatch.setattr(jax, "device_get", lambda x: (calls.append(1), orig(x))[1])
    probes = proc.probe_log()
    assert len(probes) == 5
    assert len(calls) == 1
