"""Pallas chain executor (graph/chain_kernel.py): the collapsed chain's
stage loop as ONE kernel, bit-parity with the lax.scan executor.

These run the kernel in interpret mode on the CPU mesh (KNASTER_CHAIN_PALLAS
forced to "1"); the TPU A/B numbers live in benchmarks/RESULTS.md.
"""

import jax.numpy as jnp
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


def build_env_chain(gg, n, hs, attack=None, release=None):
    """n EnvAsr units mixed serially (env_i + previous sum): a period-2
    (EnvAsr, Math-add) chain with strictly increasing depth — the shape
    that puts done-capable units inside a collapsed chain."""
    from knaster_tpu import EnvAsr

    prev = None
    for i in range(n):
        # off-grid times: stage crossings land mid-step with margin, so
        # the kernel's Hillis-Steele cumsum and the scan path's
        # jnp.cumsum agree on every transition frame
        atk = attack if attack is not None else (50.3 + 7.1 * i) / 48000.0
        rel = release if release is not None else 95.5 / 48000.0
        e = gg.push(EnvAsr(attack_time=atk, release_time=rel))
        hs.append(e)
        prev = e if prev is None else prev + e
    (prev * 0.05).to_graph_out()


def test_env_chain_runs_in_kernel_with_done(monkeypatch):
    """A chain containing done-capable EnvAsr units runs in the Pallas
    executor: attack->sustain spontaneous transitions and the
    release->stopped done frames match the scan executor."""
    calls = _spy(monkeypatch)

    def builder(gg, hs):
        build_env_chain(gg, 10, hs)

    def run(mode):
        monkeypatch.setattr(ck, "_MODE", mode)
        C.clear_program_cache()
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=16)
        )
        hs = []
        g.edit(lambda gg: builder(gg, hs))
        for h in hs:
            h.param("t_restart").trig()
        a1 = np.asarray(proc.render(frames=160))  # attack -> sustain
        for h in hs:
            h.param("t_release").trig()
        a2 = np.asarray(proc.render(frames=160))  # release -> done
        return np.concatenate([a1, a2], axis=1), proc

    a, proc = run("1")
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1, "done-capable chain never entered the kernel"
    b, _ = run("0")
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-6)
    # the release tail actually went silent (envelopes reached STOPPED)
    assert np.abs(a[:, -16:]).max() == 0.0


def test_env_chain_done_vec_matches_scan(monkeypatch):
    """The done vector the kernel materializes equals the scan executor's,
    frame-placement included (drives the host's free machinery)."""
    import jax
    import jax.numpy as jnp

    def prep(mode):
        monkeypatch.setattr(ck, "_MODE", mode)
        C.clear_program_cache()
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=16)
        )
        hs = []
        g.edit(lambda gg: build_env_chain(gg, 10, hs))
        for h in hs:
            h.param("t_restart").trig()
        proc.render(frames=160)
        for h in hs:
            h.param("t_release").trig()
        proc.render(frames=80)  # mid-release
        cg = proc.compiled
        st = jax.tree_util.tree_map(jnp.array, proc.state)
        dones = []
        for _ in range(8):  # fast blocks across the done boundary
            st, _out, done = cg.render_fast(
                st, jnp.zeros((0, 16), cg.ctx.dtype)
            )
            dones.append(np.asarray(done))
        return np.stack(dones)

    d1 = prep("1")
    d0 = prep("0")
    assert d1.any(), "no done flags fired across the release end"
    np.testing.assert_array_equal(d1, d0)


def test_env_chain_free_parent_zeroes_output(monkeypatch):
    """A FREE_PARENT env inside the chain zeroes the graph output from its
    in-kernel done frame — same boundary as the scan executor."""
    from knaster_tpu import EnvAsr
    from knaster_tpu.graph.graph import Done

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = None
        for i in range(10):
            e = gg.push_with_done_action(
                EnvAsr(attack_time=30.3 / 48000.0,
                       release_time=(95.5 + 3.0 * i) / 48000.0),
                Done.FREE_PARENT,
            )
            hs.append(e)
            prev = e if prev is None else prev + e
        (prev * 0.05).to_graph_out()

    def run(mode):
        monkeypatch.setattr(ck, "_MODE", mode)
        C.clear_program_cache()
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=16)
        )
        hs = []
        g.edit(lambda gg: builder(gg, hs))
        for h in hs:
            h.param("t_restart").trig()
        proc.render(frames=64)
        for h in hs:
            h.param("t_release").trig()
        return np.asarray(proc.render(frames=160))

    a = run("1")
    assert calls["ok"] >= 1
    b = run("0")
    za = np.flatnonzero(np.abs(a[0]) > 0)
    zb = np.flatnonzero(np.abs(b[0]) > 0)
    assert za.size and za[-1] < a.shape[1] - 1  # output was zeroed mid-run
    assert za[-1] == zb[-1]  # identical free frame
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_polyblep_cascade_kernel(monkeypatch):
    """A PolyBlep FM cascade (mixed waveforms incl. pulse-width users)
    runs in the kernel: elementwise waveform math + in-kernel lax.switch
    on the block-rate waveform select. Float-cumsum phase reassociates
    (Hillis-Steele vs jnp.cumsum), so allclose."""
    from knaster_tpu import PolyBlep
    from knaster_tpu.ugens.polyblep import Waveform

    calls = _spy(monkeypatch)
    waves = [Waveform.Sawtooth, Waveform.Sine, Waveform.Rectangle,
             Waveform.Triangle, Waveform.Square]

    def builder(gg, hs):
        prev = None
        for i in range(10):
            s = gg.push(PolyBlep(waves[i % len(waves)], 80.0 + 11.0 * i))
            if prev is not None:
                mod = (prev * 30.0) + 110.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
            hs.append(s)
        (prev * 0.1).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pan2_chain_kernel(monkeypatch):
    """Serial Pan2 stages (stereo collapsed back to mono between units)
    run in the kernel — pure elementwise pan law, bit-exact on CPU."""
    from knaster_tpu import Pan2, WhiteNoise

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = gg.push(WhiteNoise(seed=3))
        for i in range(10):
            p = gg.push(Pan2(-0.4 + 0.08 * i))
            prev.to(p)
            prev = p.out([0]) + p.out([1])
            hs.append(p)
        (prev * 0.1).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_array_equal(a, b)


def test_sample_delay_chain_kernel(monkeypatch):
    """An echo cascade of SampleDelays runs in the kernel: barrel-rolled
    ring state + one-hot window reads, bit-exact vs the per-sample scan —
    including per-sample delay times mid-smooth (the ramp persists into
    event-free blocks)."""
    from knaster_tpu import SampleDelay, WhiteNoise

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = gg.push(WhiteNoise(seed=9))
        for i in range(10):
            d = gg.push(SampleDelay(32.0 / 48000.0))
            prev.to(d)
            prev = d * 0.8
            hs.append(d)
        (prev * 0.5).to_graph_out()

    def edits(hs):
        for i, h in enumerate(hs):
            h.param("delay_time").set((3.0 + 2.0 * i) / 48000.0)
        hs[4].param("delay_time").smooth(20.0 / 48000.0, 0.004)

    a, proc = _render("1", builder, 192, monkeypatch, edits=edits)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 192, monkeypatch, edits=edits)
    assert np.abs(b).max() > 1e-3
    np.testing.assert_array_equal(a, b)


def test_env_chain_state_carry_partitions(monkeypatch):
    """Kernel-executed envelope chains carry stage/t/release_scale state:
    short renders equal one long render (closed forms are documented
    reassociation-sensitive, so allclose)."""
    monkeypatch.setattr(ck, "_MODE", "1")
    C.clear_program_cache()

    def mk():
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=16)
        )
        hs = []
        g.edit(lambda gg: build_env_chain(gg, 10, hs))
        for h in hs:
            h.param("t_restart").trig()
        return proc

    p1, p2 = mk(), mk()
    whole = np.asarray(p1.render(frames=160))
    parts = np.concatenate(
        [np.asarray(p2.render(frames=32)) for _ in range(5)], axis=1
    )
    np.testing.assert_allclose(whole, parts, atol=1e-6)


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


def test_noise_chain_kernel(monkeypatch):
    """Noise-per-unit chains run in the kernel: the (seed, frame)-keyed
    stream is computed by an in-kernel Threefry2x32 restatement of
    jax.random's algorithm — bit-identical to the XLA path."""
    from knaster_tpu import OnePoleLpf, WhiteNoise

    calls = _spy(monkeypatch)

    def builder(gg, hs):
        prev = None
        for i in range(12):
            n = gg.push(WhiteNoise(seed=100 + i))
            lp = gg.push(OnePoleLpf(2000.0 + 100.0 * i))
            src = n if prev is None else prev + n
            src.to(lp)
            prev = lp
            hs.append(lp)
        (prev * 0.2).to_graph_out()

    a, proc = _render("1", builder, 96, monkeypatch, bs=32)
    assert [k for k, _ in proc.compiled.plan if k == "chain"]
    assert calls["ok"] >= 1
    b, _ = _render("0", builder, 96, monkeypatch, bs=32)
    assert np.abs(b).max() > 1e-3
    # the threefry stream is bit-exact; the one-pole stage runs the
    # Mosaic-safe lanes scan (core/dsp.affine_scan_1d_lanes), which
    # reassociates vs associative_scan at the ULP level
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_float_event_program_matches_full(monkeypatch):
    """The FLOAT-EVENT full program (compile.get_float_fn): a trigger-free
    control batch runs the collapsed chain on the Pallas kernel with the
    event machinery around it. A mid-block float set through the cascade
    must match the scan-executor full program (the set reaches the stage
    bodies through the SAME materialized per-sample params), and the
    kernel must actually engage for the eventful block."""
    from knaster_tpu import Seconds
    from knaster_tpu.graph.compile import get_float_fn
    from knaster_tpu.graph.processor import copy_state

    calls = _spy(monkeypatch)
    monkeypatch.setattr(ck, "_MODE", "1")
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=64))
    hs = []
    g.edit(lambda gg: build_cascade(gg, 16, hs))
    proc.render(frames=128)  # warm + advance past the transient
    proc._ensure_compiled()
    cg = proc.compiled

    # a mid-block float set on a mid-chain node's freq
    hs[7].param("freq").set_at(
        333.0, Seconds.from_samples(proc.graph.clock.frames + 17, 48000)
    )
    (lists,) = proc._collect_due_events(1)
    fl, tl, il, nd = lists
    assert fl and not tl, "fixture: expected a float-only batch"
    ev = proc._events_tensor(lists)
    inp = np.zeros((0, 64), np.float32)

    import jax
    ev = jax.tree_util.tree_map(jnp.asarray, ev)
    st0 = copy_state(proc.state)
    _, out_full, done_full = cg.render(copy_state(st0), ev, inp)
    before_ok = calls["ok"]
    ffn = get_float_fn(cg)
    assert ffn is not None
    _, out_float, done_float = ffn(copy_state(st0), ev, inp)
    assert calls["ok"] > before_ok, "chain kernel never engaged in float program"
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_float), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(done_full), np.asarray(done_float))


def test_float_event_program_absent_without_chain(monkeypatch):
    """Graphs with no collapsed chain never build a float-event program."""
    from knaster_tpu.graph.compile import get_float_fn

    monkeypatch.setattr(ck, "_MODE", "1")
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        s = gg.push(SinWt(440.0))
        (s * 0.1).to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    assert get_float_fn(proc.compiled) is None
