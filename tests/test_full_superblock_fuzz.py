"""Seeded fuzz for the eventful-superblock tiers: random event schedules
(float sets, smoothed sets, smoothing-config changes, triggers, int sets at
random frames across a 16-block chunk) rendered through the one-dispatch
chunk programs must match the strict per-block path exactly.

Three graph variants steer the fuzz through each tier:
- "eligible": plain block-invariant chain -> whole-chunk eventful
  superblock (get_full_super_fn)
- "capped":   a superblock_cap node -> scan of capped eventful superblocks
  (get_full_super_scan_fn)
- "feedback": a feedback edge -> whole-chunk full-program scan
"""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    Constant,
    EnvAsr,
    Seconds,
    SinWt,
    Smoothing,
    SvfFilter,
    UGen,
    pinteger,
)
from knaster_tpu.graph.compile import (
    get_full_super_fn,
    get_full_super_scan_fn,
)
from knaster_tpu.graph.processor import _get_full_scan_fn

SR = 48000
B = 16
N_CHUNK = 16
OPTS = AudioProcessorOptions(block_size=B, sample_rate=SR)


def _samples(n):
    return Seconds.from_samples(n, SR)


class _CappedSel(UGen):
    __test__ = False
    inputs = 0
    outputs = 1
    params = (pinteger("sel", 0),)
    superblock_cap = 4 * B

    def process(self, ctx, state, inputs, params):
        return state, params["sel"].astype(ctx.dtype)[None, :]


def _build(variant):
    def build(gg):
        s = gg.push(SinWt(220.0))
        f = gg.push(SvfFilter(cutoff_freq=2500.0))
        c = gg.push(Constant(0.3))
        e = gg.push(EnvAsr(attack_time=0.002, release_time=0.004))
        s.to(f)
        sig = f * c.out([0])
        sig.to_graph_out()
        e.to_graph_out()
        extras = []
        if variant == "capped":
            n = gg.push(_CappedSel())
            n.to_graph_out()
            extras.append(("int", n.param("sel"), (0, 9)))
        if variant == "feedback":
            f2 = gg.push(SvfFilter(cutoff_freq=900.0))
            f.to(f2)
            f2.to_feedback(f)
            f2.to_graph_out()
            extras.append(("float", f2.param("cutoff_freq"), (300.0, 4000.0)))
        params = [
            ("float", s.param("freq"), (80.0, 2000.0)),
            ("float", f.param("cutoff_freq"), (200.0, 8000.0)),
            ("float", c.param("value"), (-1.0, 1.0)),
            ("trig", e.param("t_restart"), None),
            ("trig", e.param("t_release"), None),
        ] + extras
        return params

    return build


def _schedule(rng, params, n_events):
    """One random schedule: list of (param_index, action, value, frame)."""
    sched = []
    for _ in range(n_events):
        i = int(rng.integers(len(params)))
        kind, _p, rng_range = params[i]
        frame = int(rng.integers(0, N_CHUNK * B))
        if kind == "trig":
            sched.append((i, "trig", None, frame))
        elif kind == "int":
            sched.append((i, "set", int(rng.integers(*rng_range)), frame))
        else:
            r = rng.random()
            if r < 0.2:
                # smoothing-config change mid-stream
                dur = float(rng.uniform(0.0, 0.01))
                sched.append((i, "cfg", dur, frame))
            else:
                sched.append(
                    (i, "set", float(rng.uniform(*rng_range)), frame)
                )
    return sched


def _apply(sched, params):
    for i, action, value, frame in sched:
        _kind, p, _r = params[i]
        if action == "trig":
            p.trig_at(_samples(frame))
        elif action == "cfg":
            p.smooth_at(
                Smoothing.linear(value) if value > 0 else Smoothing.none(),
                _samples(frame),
            )
        else:
            p.set_at(value, _samples(frame))


@pytest.mark.parametrize("variant", ["eligible", "capped", "feedback"])
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_eventful_chunk_tiers_match_per_block(variant, seed):
    import zlib

    rng = np.random.default_rng(
        zlib.crc32(f"{variant}:{seed}".encode()) & 0xFFFFFFFF
    )

    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)
    prm1 = g1.edit(_build(variant))
    prm2 = g2.edit(_build(variant))

    p1._ensure_compiled()
    calls = []
    if variant == "eligible":
        fn = get_full_super_fn(p1.compiled, N_CHUNK)
        assert fn is not None

        def spy(*a):
            calls.append(1)
            return fn(*a)

        p1.compiled.super_fns[("full", N_CHUNK)] = spy
    elif variant == "capped":
        assert get_full_super_fn(p1.compiled, N_CHUNK) is None
        fn = get_full_super_scan_fn(p1.compiled, 4)
        assert fn is not None

        def spy(*a):
            calls.append(1)
            return fn(*a)

        p1.compiled.super_fns[("full_scan", 4)] = spy
    else:
        assert get_full_super_fn(p1.compiled, N_CHUNK) is None
        fn = _get_full_scan_fn(p1.compiled)

        def spy(*a):
            calls.append(1)
            return fn(*a)

        p1.compiled.full_scan_fn = spy
        p1.compiled.full_scan_warm.add(N_CHUNK)

    outs1, outs2 = [], []
    for round_i in range(3):  # 3 chunks: state carries across dispatches
        sched = _schedule(rng, prm1, n_events=int(rng.integers(2, 9)))
        off = round_i * N_CHUNK * B
        sched = [(i, a, v, f + off) for (i, a, v, f) in sched]
        _apply(sched, prm1)
        _apply(sched, prm2)
        outs1.append(p1.render(frames=N_CHUNK * B))
        outs2.append(p2.render(frames=N_CHUNK * B, check_done_every=1))
    assert calls, f"{variant}: one-dispatch tier never engaged"
    a = np.concatenate(outs1, axis=1)
    b = np.concatenate(outs2, axis=1)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=3e-5)
