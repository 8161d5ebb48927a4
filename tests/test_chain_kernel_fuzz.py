"""Seeded fuzz for the Pallas chain executor vs the lax.scan executor.

The chain kernel is on by default on accelerators (KNASTER_CHAIN_PALLAS
= auto), so randomized graphs — family, stage count, block size, param
values, mid-render scheduled events, a live edit — must match the scan
executor everywhere the kernel engages. Interpret mode on the CPU mesh;
the hardware sweep lives in benchmarks/tpu_kernel_check.py.
"""

import numpy as np
import pytest

import knaster_tpu.graph.chain_kernel as ck
import knaster_tpu.graph.compile as C
from knaster_tpu import AudioProcessor, AudioProcessorOptions, Seconds


@pytest.fixture(autouse=True)
def _fresh():
    C.clear_program_cache()
    yield
    C.clear_program_cache()


def _build_sine_fm(gg, rng, n, hs, osc_cls):
    prev = None
    for i in range(n):
        s = gg.push(osc_cls(float(rng.uniform(80, 400))))
        if prev is not None:
            mod = (prev * float(rng.uniform(20, 120))) + float(
                rng.uniform(100, 300)
            )
            gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
        prev = s
        hs.append(s)
    (prev * 0.1).to_graph_out()


def _build_svf_stack(gg, rng, n, hs):
    from knaster_tpu import SinWt, SvfFilter
    from knaster_tpu.ugens.filters import SvfFilterType

    node = gg.push(SinWt(float(rng.uniform(100, 500))))
    for i in range(n):
        f = gg.push(
            SvfFilter(
                SvfFilterType.Bell,
                float(rng.uniform(200, 4000)),
                q=float(rng.uniform(0.5, 2.0)),
                gain_db=float(rng.uniform(-4, 4)),
            )
        )
        node.to(f)
        node = f
        hs.append(f)
    node.to_graph_out()


def _build_onepole_ladder(gg, rng, n, hs):
    from knaster_tpu import OnePoleLpf, WhiteNoise

    node = gg.push(WhiteNoise(seed=int(rng.integers(1, 1000))))
    for i in range(n):
        f = gg.push(OnePoleLpf(float(rng.uniform(500, 8000))))
        node.to(f)
        node = f
        hs.append(f)
    node.to_graph_out()


def _render(mode, seed, want_engaged):
    from knaster_tpu import Phasor, SinNumeric, SinWt

    rng = np.random.default_rng(seed)
    family = ["sine_fm", "numeric_fm", "phasor", "svf", "onepole"][
        seed % 5
    ]
    n = int(rng.integers(10, 19))
    bs = int(rng.choice([16, 32]))
    frames = bs * int(rng.integers(4, 7))

    ck._MODE = mode
    try:
        C.clear_program_cache()
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=bs)
        )
        hs = []
        rng_b = np.random.default_rng(seed)  # same graph in both modes

        def build(gg):
            if family == "sine_fm":
                _build_sine_fm(gg, rng_b, n, hs, SinWt)
            elif family == "numeric_fm":
                _build_sine_fm(gg, rng_b, n, hs, SinNumeric)
            elif family == "phasor":
                _build_sine_fm(gg, rng_b, n, hs, Phasor)
            elif family == "svf":
                _build_svf_stack(gg, rng_b, n, hs)
            else:
                _build_onepole_ladder(gg, rng_b, n, hs)

        g.edit(build)
        if want_engaged:
            proc._ensure_compiled()
            entries = [k for k, _ in proc.compiled.plan if k == "chain"]
            assert entries, f"seed {seed} ({family}): no chain collapsed"
        out = [np.asarray(proc.render(frames=frames))]

        # mid-render scheduled event on a mid-chain node: eventful blocks
        # take the scan/full program, event-free blocks stay on the kernel
        sr = g.sample_rate
        mid = hs[len(hs) // 2]
        target = {
            "sine_fm": "freq", "numeric_fm": "freq", "phasor": "freq",
            "svf": "cutoff_freq", "onepole": "cutoff_freq",
        }[family]
        mid.param(target).set_after(
            float(rng.uniform(300, 900)),
            Seconds.from_samples(bs + 3, sr),
        )
        out.append(np.asarray(proc.render(frames=frames)))

        # live edit: free the tail node, re-route, render on (state carry)
        tail = hs[-1]
        def edit(gg):
            tail.free()
            if family in ("svf", "onepole"):
                hs[-2].to_graph_out()
            else:
                (hs[-2] * 0.1).to_graph_out()
        g.edit(edit)
        out.append(np.asarray(proc.render(frames=frames)))
        return np.concatenate(out, axis=1)
    finally:
        ck._MODE = None
        C.clear_program_cache()


@pytest.mark.parametrize("seed", range(5))
def test_chain_kernel_fuzz_parity(seed):
    a = _render("1", seed, want_engaged=True)
    b = _render("0", seed, want_engaged=False)
    assert np.abs(b).max() > 1e-5
    # SvfFilter's two scan lowerings differ at the ULP (see
    # test_period1_svf_chain_kernel); everything else is bit-exact
    np.testing.assert_allclose(a, b, atol=2e-6)
