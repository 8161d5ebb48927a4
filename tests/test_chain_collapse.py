"""Chain-collapse compiler pass: deep isomorphic node chains run as ONE
lax.scan over the stage axis (compile._find_chains / the 'chain' plan kind).

The reference's 256-stage FM cascade
(knaster_benchmarks/benches/graph_dsp_performance.rs:38-80) is the target
shape: stage k's output FM-modulates stage k+1 through math nodes and an
audio-rate param edge. Every test here asserts bit-parity between the
collapsed and the node-by-node program.
"""

import numpy as np
import pytest

import knaster_tpu.graph.compile as C
from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    OnePoleLpf,
    SinWt,
    WhiteNoise,
)


@pytest.fixture(autouse=True)
def _fresh_cache():
    C.clear_program_cache()
    yield
    C._CHAIN_COLLAPSE_ON = True
    C.clear_program_cache()


def build_cascade(gg, n, handles=None):
    prev = None
    for i in range(n):
        s = gg.push(SinWt(100.0 + i))
        if prev is not None:
            mod = (prev * 100.0) + 200.0
            gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
        prev = s
        if handles is not None:
            handles.append(s)
    (prev * 0.1).to_graph_out()


def _chain_entries(proc):
    proc._ensure_compiled()
    return [it for k, it in proc.compiled.plan if k == "chain"]


def test_cascade_detected_and_bit_exact():
    def render(collapse):
        C._CHAIN_COLLAPSE_ON = collapse
        C.clear_program_cache()
        g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
        g.edit(lambda gg: build_cascade(gg, 16))
        if collapse:
            chains = _chain_entries(proc)
            assert len(chains) == 1
            assert chains[0].period == 5  # [c, mul, c, add, sin]
            assert len(chains[0].stages) == 15
        return np.asarray(proc.render(seconds=0.02))

    a = render(True)
    b = render(False)
    np.testing.assert_array_equal(a, b)


def test_period1_filter_chain():
    """A homogeneous serial chain (noise -> 12 one-pole filters) collapses
    with period 1."""

    def render(collapse):
        C._CHAIN_COLLAPSE_ON = collapse
        C.clear_program_cache()
        g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=32))

        def build(gg):
            node = gg.push(WhiteNoise(seed=7))
            for i in range(12):
                f = gg.push(OnePoleLpf(2000.0 + 100.0 * i))
                node.to(f)
                node = f
            node.to_graph_out()

        g.edit(build)
        if collapse:
            chains = _chain_entries(proc)
            assert len(chains) == 1
            assert chains[0].period == 1
            assert len(chains[0].stages) == 12
        return np.asarray(proc.render(seconds=0.02))

    np.testing.assert_array_equal(render(True), render(False))


def test_parallel_voices_not_collapsed():
    """Parallel repetition (the 256-sines shape) must stay vmapped: its
    per-unit depth is flat, so chain collapse leaves it to auto-batching."""
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))

    def build(gg):
        rng = np.random.default_rng(1)
        for _ in range(24):
            s = gg.push(SinWt(float(rng.uniform(100, 1000))))
            (s * 0.001).to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    kinds = {k for k, _ in proc.compiled.plan}
    assert "chain" not in kinds
    assert "batch" in kinds


def test_events_and_live_edit_parity():
    """Sample-accurate param events landing on mid-chain nodes, plus a
    structural edit (extend the chain) with state carry — parity with the
    uncollapsed program throughout."""

    def run(collapse):
        C._CHAIN_COLLAPSE_ON = collapse
        C.clear_program_cache()
        g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
        hs = []
        g.edit(lambda gg: build_cascade(gg, 12, hs))
        out = [proc.render(seconds=0.01)]
        hs[7].param("phase_offset").set(0.3)
        hs[3].param("phase_offset").smooth(0.25, 0.005)
        out.append(proc.render(seconds=0.01))

        def extend(gg):
            s = gg.push(SinWt(999.0))
            mod = (hs[-1] * 100.0) + 200.0
            gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")

        g.edit(extend)
        out.append(proc.render(seconds=0.01))
        return np.concatenate([np.asarray(o) for o in out], axis=1)

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_superblock_parity():
    """The collapsed chain's k-block superblock program matches k per-block
    calls (the chain body is traced at k*B via the same machinery)."""
    import jax.numpy as jnp

    C._CHAIN_COLLAPSE_ON = True
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    g.edit(lambda gg: build_cascade(gg, 10))
    proc._ensure_compiled()
    cg = proc.compiled
    assert _chain_entries(proc)
    assert C.superblock_eligible(cg)
    import jax

    fn = C.get_super_fn(cg, 4)
    # both programs donate their state argument: give each its own copy
    st0 = jax.tree_util.tree_map(jnp.array, proc.state)
    inputs = jnp.zeros((0, 64), cg.ctx.dtype)
    st_s, out_s, _ = fn(st0, inputs)

    st = jax.tree_util.tree_map(jnp.array, proc.state)
    blocks = []
    for _ in range(4):
        st, out, _ = cg.render_fast(st, jnp.zeros((0, 16), cg.ctx.dtype))
        blocks.append(np.asarray(out))
    np.testing.assert_allclose(
        np.asarray(out_s), np.concatenate(blocks, axis=1), atol=1e-6
    )


def test_state_carry_chain_to_chain():
    """Freeing the chain tail and re-extending keeps per-stage state (the
    TakeFromTask contract, node.rs:132-150) through chain-shaped plans."""
    C._CHAIN_COLLAPSE_ON = True
    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    hs = []
    g.edit(lambda gg: build_cascade(gg, 12, hs))
    a1 = np.asarray(proc.render(seconds=0.01))

    # parity run: same graph, no collapse, same edits
    C._CHAIN_COLLAPSE_ON = False
    C.clear_program_cache()
    g2, proc2 = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=16))
    hs2 = []
    g2.edit(lambda gg: build_cascade(gg, 12, hs2))
    b1 = np.asarray(proc2.render(seconds=0.01))
    np.testing.assert_array_equal(a1, b1)

    C._CHAIN_COLLAPSE_ON = True
    hs[5].param("phase_offset").set(0.1)
    hs2[5].param("phase_offset").set(0.1)
    a2 = np.asarray(proc.render(seconds=0.01))
    C._CHAIN_COLLAPSE_ON = False
    b2 = np.asarray(proc2.render(seconds=0.01))
    np.testing.assert_allclose(a2, b2, atol=1e-6)


def test_chain_variants_bit_exact():
    """More chain shapes: homogeneous filter chain with an external
    mid-chain tap (the stacked-outputs ys path), and two back-to-back
    heterogeneous chains in one graph — all bit-exact vs uncollapsed."""
    from knaster_tpu import OnePoleLpf, SvfFilter, WhiteNoise

    def build_tap(gg):
        node = gg.push(WhiteNoise(seed=1))
        tap = None
        for i in range(12):
            f = gg.push(OnePoleLpf(1500.0 + 90.0 * i))
            node.to(f)
            node = f
            if i == 6:
                tap = f
        node.to_graph_out()
        (tap * 0.2).to_graph_out()

    def build_two(gg):
        node = gg.push(WhiteNoise(seed=2))
        for i in range(10):
            f = gg.push(OnePoleLpf(2000.0 + 50.0 * i))
            node.to(f)
            node = f
        for i in range(10):
            f = gg.push(SvfFilter(cutoff_freq=3000.0 - 40.0 * i))
            node.to(f)
            node = f
        node.to_graph_out()

    for builder, want_chains in ((build_tap, 1), (build_two, 2)):
        outs = {}
        for collapse in (True, False):
            C._CHAIN_COLLAPSE_ON = collapse
            C.clear_program_cache()
            g, proc = AudioProcessor.new(
                0, 1, AudioProcessorOptions(block_size=32)
            )
            g.edit(builder)
            outs[collapse] = np.asarray(proc.render(frames=160))
            if collapse:
                n = sum(1 for k, _ in proc.compiled.plan if k == "chain")
                assert n == want_chains
        np.testing.assert_array_equal(outs[True], outs[False])
