"""Convolver: uniform partitioned FFT convolution vs direct np.convolve.

Beyond-reference capability (the Rust reference has no convolution
engine); exactness contract: the partitioned overlap-save FDL computes
the exact linear convolution, so a multi-block render must equal
np.convolve to float tolerance, with state carrying across blocks and
render calls.
"""

import numpy as np
import pytest

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    BufferReader,
    Convolver,
)
from knaster_tpu.core.ugen import AudioCtx
from knaster_tpu.ugens.buffer import Buffer

SR = 48000


def _direct(x, h):
    return np.convolve(x, h)[: len(x)]


def _run_node(conv, x_rows, B):
    """Drive Convolver.process directly over consecutive blocks."""
    ctx = AudioCtx(SR, B, np.float32)
    st = conv.init(ctx)
    outs = []
    n = x_rows.shape[1] // B
    for b in range(n):
        blk = x_rows[:, b * B:(b + 1) * B]
        st, out = conv.process(
            ctx, st, blk, {"dry_wet": np.ones(B, np.float32)}
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


def test_mono_exact_vs_direct():
    rng = np.random.default_rng(0)
    B = 64
    h = rng.standard_normal(300).astype(np.float32) * 0.1  # K=5 partitions
    x = rng.standard_normal(B * 8).astype(np.float32)
    out = _run_node(Convolver(h), x[None, :], B)
    np.testing.assert_allclose(out[0], _direct(x, h), atol=2e-4)


def test_ir_shorter_than_block_and_exact_multiple():
    rng = np.random.default_rng(1)
    B = 64
    for L in (1, 7, 64, 128):
        h = rng.standard_normal(L).astype(np.float32) * 0.2
        x = rng.standard_normal(B * 5).astype(np.float32)
        out = _run_node(Convolver(h), x[None, :], B)
        np.testing.assert_allclose(
            out[0], _direct(x, h), atol=2e-4, err_msg=f"L={L}"
        )


def test_stereo_ir_mono_input():
    rng = np.random.default_rng(2)
    B = 32
    h = rng.standard_normal((2, 150)).astype(np.float32) * 0.1
    x = rng.standard_normal(B * 6).astype(np.float32)
    out = _run_node(Convolver(h), x[None, :], B)
    for c in range(2):
        np.testing.assert_allclose(out[c], _direct(x, h[c]), atol=2e-4)


def test_per_channel_convolution():
    rng = np.random.default_rng(3)
    B = 32
    h = rng.standard_normal((2, 100)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, B * 6)).astype(np.float32)
    out = _run_node(Convolver(h, inputs=2), x, B)
    for c in range(2):
        np.testing.assert_allclose(out[c], _direct(x[c], h[c]), atol=2e-4)


def test_dry_wet_mix():
    rng = np.random.default_rng(4)
    B = 64
    h = rng.standard_normal(80).astype(np.float32) * 0.1
    x = rng.standard_normal(B * 4).astype(np.float32)
    conv = Convolver(h, dry_wet=0.25)
    ctx = AudioCtx(SR, B, np.float32)
    st = conv.init(ctx)
    outs = []
    for b in range(4):
        blk = x[None, b * B:(b + 1) * B]
        st, out = conv.process(
            ctx, st, blk, {"dry_wet": np.full(B, 0.25, np.float32)}
        )
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)[0]
    want = 0.25 * _direct(x, h) + 0.75 * x
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_in_graph_render_and_param():
    """End-to-end: BufferReader -> Convolver in a graph; dry_wet scheduled
    mid-render applies sample-accurately."""
    rng = np.random.default_rng(5)
    B = 64
    frames = B * 6
    sig = rng.standard_normal(frames).astype(np.float32) * 0.3
    h = np.zeros(96, np.float32)
    h[0], h[40], h[90] = 1.0, 0.5, 0.25  # sparse echo IR
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=B))
    buf = Buffer(sig[None, :], SR)

    def build(gg):
        rd = gg.push(BufferReader(buf))
        cv = gg.push(Convolver(h))
        rd.to(cv)
        cv.to_graph_out()
        return cv

    cv = g.edit(build)
    out = np.asarray(proc.render(frames=frames))[0]
    np.testing.assert_allclose(out, _direct(sig, h), atol=2e-4)

    # scheduled dry_wet: 0 from an exact mid-block frame
    from knaster_tpu import Seconds

    cv.param("dry_wet").set_after(0.0, Seconds.from_samples(B + 10, SR))
    out2 = np.asarray(proc.render(frames=2 * B))[0]
    # frames continue the buffer playback past its end: reader outputs 0,
    # but the IR tail still rings; after the set, output == dry == 0
    assert np.abs(out2[B + 10:]).max() == 0.0
    assert np.abs(out2[: B + 10]).max() > 0.0


def test_superblock_program_parity():
    """The FDL partitions at the graph's base block size, so a k-block
    super program (process traced at k*B with base-block state) computes
    the same rounds as k sequential base blocks — equal up to XLA's
    matmul-reduction scheduling inside lax.scan (~1e-6 relative)."""
    rng = np.random.default_rng(7)
    B, k = 64, 4
    h = rng.standard_normal(300).astype(np.float32) * 0.1
    x = rng.standard_normal(B * k * 2).astype(np.float32)
    conv = Convolver(h)
    ctx = AudioCtx(SR, B, np.float32)
    ctx_super = AudioCtx(SR, B * k, np.float32)
    st_a = conv.init(ctx)
    st_b = conv.init(ctx)
    outs_a = []
    for b in range(2 * k):
        blk = x[None, b * B:(b + 1) * B]
        st_a, o = conv.process(
            ctx, st_a, blk, {"dry_wet": np.ones(B, np.float32)}
        )
        outs_a.append(np.asarray(o))
    a = np.concatenate(outs_a, axis=1)
    outs_b = []
    for s in range(2):
        blk = x[None, s * B * k:(s + 1) * B * k]
        st_b, o = conv.process(
            ctx_super, st_b, blk,
            {"dry_wet": np.ones(B * k, np.float32)},
        )
        outs_b.append(np.asarray(o))
    b_out = np.concatenate(outs_b, axis=1)
    np.testing.assert_allclose(a, b_out, atol=1e-5)
    np.testing.assert_allclose(a[0], _direct(x, h), atol=2e-4)
    np.testing.assert_allclose(b_out[0], _direct(x, h), atol=2e-4)


def test_superblock_eligibility_in_graph():
    """A graph containing a Convolver stays superblock-eligible (state
    shapes are block-length invariant)."""
    from knaster_tpu import WhiteNoise
    from knaster_tpu.graph import compile as C

    rng = np.random.default_rng(8)
    h = rng.standard_normal(200).astype(np.float32) * 0.1
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=64))

    def build(gg):
        n = gg.push(WhiteNoise(seed=3))
        cv = gg.push(Convolver(h))
        n.to(cv)
        cv.to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    assert C.superblock_eligible(proc.compiled)


def test_from_sound_file_ir(tmp_path):
    """Convolver.from_sound_file loads an IR through the codec layer."""
    from knaster_tpu.utils.wav import write_wav

    rng = np.random.default_rng(9)
    h = (rng.standard_normal((2, 120)) * 0.1).astype(np.float32)
    path = str(tmp_path / "ir.wav")
    write_wav(path, h, SR)
    conv = Convolver.from_sound_file(path)
    assert conv.outputs == 2 and conv.ir_length == 120
    x = rng.standard_normal(64 * 4).astype(np.float32)
    out = _run_node(conv, x[None, :], 64)
    for c in range(2):
        np.testing.assert_allclose(out[c], _direct(x, h[c]), atol=2e-4)


def test_live_ir_swap_is_cache_hit():
    """Two Convolvers with different IR content but the same length and
    channel layout share one cached program (IR spectra live in state)."""
    import knaster_tpu.graph.compile as C

    rng = np.random.default_rng(6)
    B = 64
    h1 = rng.standard_normal(200).astype(np.float32) * 0.1
    h2 = rng.standard_normal(200).astype(np.float32) * 0.1  # same length

    def build(h):
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=B)
        )
        from knaster_tpu import WhiteNoise

        def b(gg):
            n = gg.push(WhiteNoise(seed=9))
            cv = gg.push(Convolver(h))
            n.to(cv)
            cv.to_graph_out()

        g.edit(b)
        proc._ensure_compiled()
        return proc.compiled.signature

    C.clear_program_cache()
    s1 = build(h1)
    s2 = build(h2)
    assert s1 is not None and s1 == s2
