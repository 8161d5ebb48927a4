"""Pallas chain executor (graph/chain_kernel.py): the collapsed chain's
stage loop as ONE kernel, bit-parity with the lax.scan executor.

These run the kernel in interpret mode on the CPU mesh (KNASTER_CHAIN_PALLAS
forced to "1"); the TPU A/B numbers live in benchmarks/RESULTS.md.
"""

import numpy as np
import pytest

import knaster_tpu.graph.chain_kernel as ck
import knaster_tpu.graph.compile as C
from knaster_tpu import AudioProcessor, AudioProcessorOptions, SinWt

from test_chain_collapse import build_cascade


@pytest.fixture(autouse=True)
def _fresh(monkeypatch):
    C.clear_program_cache()
    yield
    C.clear_program_cache()


def _spy(monkeypatch):
    calls = {"run": 0, "ok": 0}
    real = ck.run

    def spy(*a, **k):
        calls["run"] += 1
        r = real(*a, **k)
        if r is not None:
            calls["ok"] += 1
        return r

    monkeypatch.setattr(ck, "run", spy)
    return calls


def _render(mode, builder, frames, monkeypatch, edits=None, bs=16):
    monkeypatch.setattr(ck, "_MODE", mode)
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=bs))
    hs = []
    g.edit(lambda gg: builder(gg, hs))
    outs = [np.asarray(proc.render(frames=frames))]
    if edits:
        edits(hs)
        outs.append(np.asarray(proc.render(frames=frames)))
    return np.concatenate(outs, axis=1), proc


def test_fm_cascade_kernel_engages_and_is_bit_exact(monkeypatch):
    calls = _spy(monkeypatch)

    def builder(gg, hs):
        build_cascade(gg, 16, hs)

    a, proc = _render("1", builder, 128, monkeypatch)
    assert calls["ok"] >= 1, "pallas chain executor never engaged"
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    b, _ = _render("0", builder, 128, monkeypatch)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_array_equal(a, b)  # bit-exact: u32 adds + same op order


def test_kernel_state_carries_across_blocks(monkeypatch):
    """Phase continuity: many short renders equal one long one (the kernel
    writes per-stage u32 phases back by dynamic row)."""

    def builder(gg, hs):
        build_cascade(gg, 12, hs)

    monkeypatch.setattr(ck, "_MODE", "1")
    C.clear_program_cache()
    g1, p1 = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    g2, p2 = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    g1.edit(lambda gg: builder(gg, []))
    g2.edit(lambda gg: builder(gg, []))
    whole = np.asarray(p1.render(frames=160))
    parts = np.concatenate(
        [np.asarray(p2.render(frames=32)) for _ in range(5)], axis=1
    )
    np.testing.assert_array_equal(whole, parts)


def test_mid_chain_tap_reads_kernel_outputs(monkeypatch):
    """An external reader of a mid-chain stage output (the stacked-outputs
    path) sees exactly what the scan executor produces."""
    calls = _spy(monkeypatch)

    def builder(gg, hs):
        build_cascade(gg, 14, hs)
        (hs[7] * 0.05).to_graph_out()

    a, _ = _render("1", builder, 96, monkeypatch)
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch)
    np.testing.assert_array_equal(a, b)


def test_eventful_blocks_keep_scan_path_and_match(monkeypatch):
    """Events force the full program (lax.scan executor); fast blocks around
    them still use the kernel. The mixed run matches an all-scan run."""

    def builder(gg, hs):
        build_cascade(gg, 12, hs)

    def edits(hs):
        hs[7].param("phase_offset").set(0.3)
        hs[3].param("phase_offset").smooth(0.25, 0.005)

    a, _ = _render("1", builder, 96, monkeypatch, edits=edits)
    b, _ = _render("0", builder, 96, monkeypatch, edits=edits)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_unsupported_stage_falls_back_silently(monkeypatch):
    """A chain whose unit has no mosaic_stage (table-lookup SinWt) renders
    through the scan executor: run() is never asked, output is correct."""
    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = None
        for i in range(10):
            s = gg.push(SinWt(100.0 + i, lookup=True))
            if prev is not None:
                mod = (prev * 100.0) + 200.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
            hs.append(s)
        (prev * 0.1).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] == 0  # lookup oscillator: kernel ineligible
    b, _ = _render("0", builder, 96, monkeypatch)
    np.testing.assert_array_equal(a, b)


def test_period1_onepole_chain_kernel(monkeypatch):
    """Alternating Lpf/Hpf filter chains (noise -> 16 one-poles, 8 units
    of period 2 — MIN_CHAIN_STAGES) run in the kernel, exercising BOTH
    one-pole mosaic bodies (OnePoleHpf's x - y post). Same associative-
    scan structure -> same arithmetic -> exact."""
    from knaster_tpu import OnePoleHpf, OnePoleLpf, WhiteNoise

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        node = gg.push(WhiteNoise(seed=7))
        for i in range(16):
            f = gg.push(
                OnePoleLpf(8000.0 + 100.0 * i)
                if i % 2 == 0
                else OnePoleHpf(40.0 + 5.0 * i)
            )
            node.to(f)
            node = f
            hs.append(f)
        hp = gg.push(OnePoleHpf(50.0))
        node.to(hp)
        hp.to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch, bs=32)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch, bs=32)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_period1_svf_chain_kernel(monkeypatch):
    """Serial EQ stacks (noise -> 10 Bell SvfFilters) run in the kernel:
    the 2x2 state-space scan traces in-kernel via affine_scan_2x2_rows —
    same tree and multiply-add order as affine_scan_2d, but XLA's FMA
    fusion choices differ between the two lowerings (ULP-level, measured
    1.2e-7 on the raw scans), so parity is allclose not array_equal."""
    from knaster_tpu import SvfFilter, WhiteNoise
    from knaster_tpu.ugens.filters import SvfFilterType

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        node = gg.push(WhiteNoise(seed=11))
        for i in range(10):
            f = gg.push(
                SvfFilter(
                    SvfFilterType.Bell,
                    400.0 * (i + 1),
                    q=1.2,
                    gain_db=3.0 if i % 2 == 0 else -2.0,
                )
            )
            node.to(f)
            node = f
            hs.append(f)
        node.to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch, bs=32)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch, bs=32)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_phasor_cascade_kernel(monkeypatch):
    """A Phasor LFO cascade (each phasor's output scales the next one's
    freq) collapses and runs in the kernel — same lax.cumsum, bit-exact."""
    from knaster_tpu import Phasor

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = None
        for i in range(12):
            ph = gg.push(Phasor(0.5 + 0.25 * i))
            if prev is not None:
                mod = (prev * 40.0) + 60.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, ph, "freq")
            prev = ph
            hs.append(ph)
        (prev * 0.2).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_array_equal(a, b)


def test_sin_numeric_cascade_kernel(monkeypatch):
    """A SinNumeric FM cascade runs in the kernel (the fast program's
    no-resets plain-cumsum path, traced in-kernel) — bit-exact."""
    from knaster_tpu import SinNumeric

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = None
        for i in range(12):
            s = gg.push(SinNumeric(100.0 + 7.0 * i))
            if prev is not None:
                mod = (prev * 50.0) + 150.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
            hs.append(s)
        (prev * 0.1).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_array_equal(a, b)


def _cascade16(gg, hs):
    build_cascade(gg, 16, hs)


def test_done_capable_unit_refused(monkeypatch):
    """may_set_done structurally bars a unit from the kernel even when it
    provides a mosaic_stage (the kernel hard-codes done=all-false)."""
    from knaster_tpu.ugens.osc import SinWt as _S

    calls = _spy(monkeypatch)
    monkeypatch.setattr(_S, "may_set_done", True, raising=False)
    a, proc = _render("1", _cascade16, 64, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["run"] >= 1 and calls["ok"] == 0  # refused -> scan executor
    assert np.all(np.isfinite(a)) and np.abs(a).max() > 1e-4


def test_mosaic_rejection_falls_back_via_validation_valve(monkeypatch):
    """The kernel is compiled STANDALONE once per structure before being
    embedded; if Mosaic rejects it, the chain silently keeps the scan
    executor instead of killing the whole graph compile (what makes a
    default-on flip safe). Forcing interpret=False on the CPU backend
    makes the TPU lowering fail, exercising the real valve path."""
    calls = _spy(monkeypatch)
    monkeypatch.setattr(ck, "_INTERPRET", False)
    monkeypatch.setattr(ck, "_VALIDATED", {})
    a, proc = _render("1", _cascade16, 64, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["run"] >= 1 and calls["ok"] == 0  # rejected -> scan
    assert ck._VALIDATED and not any(ck._VALIDATED.values())
    monkeypatch.setattr(ck, "_INTERPRET", None)
    b, _ = _render("0", _cascade16, 64, monkeypatch)
    np.testing.assert_array_equal(a, b)


def test_vmem_budget_overflow_falls_back(monkeypatch):
    """Plans whose operands exceed the VMEM budget fall back to the scan
    executor with identical output."""
    calls = _spy(monkeypatch)
    monkeypatch.setattr(ck, "_VMEM_BUDGET", 1024)
    a, proc = _render("1", _cascade16, 64, monkeypatch)
    assert calls["run"] >= 1 and calls["ok"] == 0
    monkeypatch.setattr(ck, "_VMEM_BUDGET", 10 * 1024 * 1024)
    b, _ = _render("0", _cascade16, 64, monkeypatch)
    np.testing.assert_array_equal(a, b)


def test_superblock_program_uses_kernel_at_multi_block(monkeypatch):
    """The k-block superblock program traces the chain at k*B: the kernel
    builds there too (B is a trace-time constant) and matches per-block."""
    import jax
    import jax.numpy as jnp

    calls = _spy(monkeypatch)
    monkeypatch.setattr(ck, "_MODE", "1")
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    g.edit(lambda gg: build_cascade(gg, 10))
    proc._ensure_compiled()
    cg = proc.compiled
    fn = C.get_super_fn(cg, 4)
    st0 = jax.tree_util.tree_map(jnp.array, proc.state)
    _st, out_s, _ = fn(st0, jnp.zeros((0, 64), cg.ctx.dtype))
    assert calls["ok"] >= 1  # the 4-block program built the kernel at 4*B

    st = jax.tree_util.tree_map(jnp.array, proc.state)
    blocks = []
    for _ in range(4):
        st, out, _ = cg.render_fast(st, jnp.zeros((0, 16), cg.ctx.dtype))
        blocks.append(np.asarray(out))
    assert calls["ok"] >= 2  # ... and the lazily-traced per-block program
    np.testing.assert_array_equal(
        np.asarray(out_s), np.concatenate(blocks, axis=1)
    )
