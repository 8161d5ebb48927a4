"""Seeded graph-edit fuzz: random push/connect/free/param churn against a
live AudioProcessor, rendering between batches.

The reference's safety posture is "the audio thread never crashes, no
matter what the control thread does" (SURVEY §5.3: abandoned channels,
expiry, mortality). The TPU engine's equivalent surface is the edit→
recompile→carry→render cycle under arbitrary interleavings — exactly what
a seeded fuzzer covers and example-driven tests don't. Invariants: only
documented error types escape (GraphError family), every render is finite,
and the engine keeps rendering after any survivable sequence."""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Constant,
    EnvAsr,
    GraphError,
    OnePoleLpf,
    Pan2,
    SinWt,
    SvfFilter,
    WhiteNoise,
)

UGENS = [
    lambda rng: SinWt(float(rng.uniform(50, 2000))),
    lambda rng: OnePoleLpf(float(rng.uniform(100, 8000))),
    lambda rng: Constant(float(rng.uniform(-1, 1))),
    lambda rng: EnvAsr(float(rng.uniform(0, 0.01)), float(rng.uniform(0, 0.05))),
    lambda rng: Pan2(float(rng.uniform(-1, 1))),
    lambda rng: WhiteNoise(seed=int(rng.integers(0, 2**31))),
    lambda rng: SvfFilter(cutoff_freq=float(rng.uniform(100, 8000))),
]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_edit_churn_never_breaks_the_engine(seed):
    rng = np.random.default_rng(seed)
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=16))
    handles = []

    def op_push(gg):
        h = gg.push(UGENS[int(rng.integers(len(UGENS)))](rng))
        handles.append(h)
        if rng.random() < 0.5:
            (h.out([0, 0]) if h.n_channels == 1 else h).to_graph_out()

    def op_connect(gg):
        if len(handles) < 2:
            return
        a, b = (handles[int(rng.integers(len(handles)))] for _ in range(2))
        a.to(b)

    def op_feedback(gg):
        if len(handles) < 2:
            return
        a, b = (handles[int(rng.integers(len(handles)))] for _ in range(2))
        a.to_feedback(b)

    def op_free(gg):
        if not handles:
            return
        h = handles.pop(int(rng.integers(len(handles))))
        gg.free_node(h)

    def op_param(gg):
        if not handles:
            return
        h = handles[int(rng.integers(len(handles)))]
        try:
            params = gg._node(h.id).ugen.params
        except GraphError:
            return
        if not params:
            return
        spec = params[int(rng.integers(len(params)))]
        p = h.param(spec.name)
        if spec.ptype == "trigger":
            p.trig()
        elif spec.ptype in ("integer", "bool"):
            p.set(int(rng.integers(0, 2)))
        else:
            v = float(rng.uniform(0, 100))
            if rng.random() < 0.5:
                p.set(v)
            else:
                p.set_at(v, float(rng.uniform(0, 0.02)))

    OPS = [op_push, op_push, op_connect, op_feedback, op_free, op_param,
           op_param]
    for step in range(25):
        op = OPS[int(rng.integers(len(OPS)))]
        try:
            g.edit(op)
        except GraphError:
            pass  # documented control-side errors (cycle, mismatch, freed)
        if step % 5 == 4:
            out = np.asarray(proc.render(frames=48))
            assert np.all(np.isfinite(out)), f"non-finite at step {step}"

    out = np.asarray(proc.render(frames=96))
    assert out.shape == (2, 96)
    assert np.all(np.isfinite(out))
