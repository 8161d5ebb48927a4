"""Capped superblocks: blockwise nodes (Galactic, long delays) participate
in the multi-block fast path up to their declared ``superblock_cap``, and
the frame-keyed noise streams make the whole chain block-size invariant.

This is what lets the galactic_chain workload (pink → allpass echo →
Galactic) ride k-block superblocks instead of opting out entirely
(round-2 weak #2)."""

import jax
import jax.numpy as jnp
import numpy as np

from knaster_tpu import (
    AllpassFeedbackDelay,
    AudioCtx,
    AudioProcessor,
    AudioProcessorOptions,
    BrownNoise,
    PinkNoise,
    WhiteNoise,
)
from knaster_tpu.airwindows import Galactic
from knaster_tpu.graph.compile import get_super_fn, superblock_eligible


def _build_chain(gg):
    src = gg.push(PinkNoise(seed=11))
    echo = gg.push(
        AllpassFeedbackDelay(0.25, feedback=0.5, long=True, min_delay_time=0.25)
    )
    verb = gg.push(Galactic(seed=4, wet=0.5))
    src.to(echo)
    echo.out([0, 0]).to(verb)
    verb.to_graph_out()


def test_galactic_chain_superblock_parity():
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))
    g.edit(_build_chain)
    proc._ensure_compiled()
    cg = proc.compiled
    assert superblock_eligible(cg)
    # the cap is the shortest Galactic delay line (680 * sr/44100)
    assert cg.superblock_max == int(680 * 48000 / 44100)
    fn = get_super_fn(cg, 8)
    assert fn is not None
    assert get_super_fn(cg, 16) is None  # 1024 samples > cap

    st_a = jax.tree_util.tree_map(jnp.array, proc.state)
    st_b = jax.tree_util.tree_map(jnp.array, proc.state)
    st_a, out_s, _ = fn(st_a, jnp.zeros((0, 512), np.float32))
    blocks = []
    for _ in range(8):
        st_b, o, _ = cg.render_fast(st_b, jnp.zeros((0, 64), np.float32))
        blocks.append(np.asarray(o))
    ref = np.concatenate(blocks, axis=1)
    assert np.abs(ref).max() > 0.01
    # 1e-7: the lowpass associative scan reassociates at different lengths
    np.testing.assert_allclose(np.asarray(out_s), ref, atol=1e-7)
    # carried states agree: the NEXT per-block renders match too
    st_a, oa, _ = cg.render_fast(st_a, jnp.zeros((0, 64), np.float32))
    st_b, ob, _ = cg.render_fast(st_b, jnp.zeros((0, 64), np.float32))
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-7)


def test_long_delay_without_min_declared_blocks_superblocks():
    """A long-mode delay whose runtime delay_time carries no declared lower
    bound must keep the graph out of superblocking: the >=block clamp floor
    grows with the program's block span, so a k-block program would stretch
    short runtime delays and diverge from per-block rendering."""
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))

    def build(gg):
        src = gg.push(WhiteNoise(seed=7))
        echo = gg.push(AllpassFeedbackDelay(0.25, feedback=0.5, long=True))
        src.to(echo)
        echo.out([0, 0]).to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    assert not superblock_eligible(proc.compiled)


def test_long_delay_min_delay_caps_superblocks():
    """min_delay_time declares the runtime floor; superblocks run up to it
    and the k-block program bit-matches per-block rendering even when the
    delay sits AT the declared minimum (well below the buffer length)."""
    min_d = 1024 / 48000  # 1024 samples, buffer holds 12000
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))

    def build(gg):
        src = gg.push(WhiteNoise(seed=7))
        echo = gg.push(
            AllpassFeedbackDelay(
                0.25, feedback=0.5, long=True, min_delay_time=min_d
            )
        )
        src.to(echo)
        echo.param("delay_time").set(min_d)
        echo.out([0, 0]).to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    cg = proc.compiled
    assert superblock_eligible(cg)
    assert cg.superblock_max == 1024  # the declared minimum, not the buffer
    assert get_super_fn(cg, 32) is None  # 2048 samples > declared floor
    fn = get_super_fn(cg, 8)
    proc.render(frames=64)  # flush the pending set event
    st_a = jax.tree_util.tree_map(jnp.array, proc.state)
    st_b = jax.tree_util.tree_map(jnp.array, proc.state)
    st_a, out_s, _ = fn(st_a, jnp.zeros((0, 512), np.float32))
    blocks = []
    for _ in range(8):
        st_b, o, _ = cg.render_fast(st_b, jnp.zeros((0, 64), np.float32))
        blocks.append(np.asarray(o))
    ref = np.concatenate(blocks, axis=1)
    assert np.abs(ref).max() > 0.01
    np.testing.assert_allclose(np.asarray(out_s), ref, atol=1e-7)


def test_noise_streams_block_size_invariant():
    """Noise is a pure function of (seed, absolute frame): one 512-sample
    block bit-matches eight 64-sample blocks (counter-mode threefry)."""
    for cls in (WhiteNoise, PinkNoise, BrownNoise):
        n = cls(seed=3)
        big = AudioCtx(48000, 512, np.float32)
        small = AudioCtx(48000, 64, np.float32)
        stb = n.init(big)
        sts = n.init(small)
        _, out_big = n.process(big, stb, jnp.zeros((0, 512)), {})[:2]
        outs = []
        for _ in range(8):
            sts, o = n.process(small, sts, jnp.zeros((0, 64)), {})[:2]
            outs.append(np.asarray(o))
        ref = np.concatenate(outs, axis=1)
        tol = 0.0 if cls is WhiteNoise else 3e-6  # pink/brown carry sums
        np.testing.assert_allclose(
            np.asarray(out_big), ref, atol=tol, err_msg=cls.__name__
        )


def test_render_uses_capped_superblocks():
    """The bounce path's event-free runs go through the capped superblock
    (one dispatch per run) and stay sample-continuous."""
    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))
    g.edit(_build_chain)
    a = proc.render(frames=2048)

    g2, proc2 = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=64))
    g2.edit(_build_chain)
    chunks = [proc2.render(frames=n) for n in (512, 64, 960, 512)]
    b = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(a, b, atol=1e-6)
