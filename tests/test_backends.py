"""Native ring buffer + backend tests (the rtrb/audio-callback analog)."""

import threading
import time

import numpy as np
import pytest

from knaster_tpu import AudioProcessor, AudioProcessorOptions, Constant, SinWt
from knaster_tpu.backends import OfflineBackend, StreamBackend
from knaster_tpu.backends.native import NativeRing


def test_native_ring_basic():
    r = NativeRing(256, 2)
    assert r.capacity >= 256
    blk = np.arange(2 * 64, dtype=np.float32).reshape(2, 64)
    assert r.write(blk) == 64
    assert r.available_read() == 64
    out = r.read(64)
    np.testing.assert_array_equal(out, blk)
    assert r.underruns == 0


def test_native_ring_underrun_zero_fill():
    r = NativeRing(128, 1)
    r.write(np.ones((1, 10), np.float32))
    out = r.read(20)
    np.testing.assert_array_equal(out[0, :10], 1.0)
    np.testing.assert_array_equal(out[0, 10:], 0.0)
    assert r.underruns == 1


def test_native_ring_wraparound_and_overrun():
    r = NativeRing(64, 1)
    cap = r.capacity
    # fill completely, then one more write overruns
    assert r.write(np.zeros((1, cap), np.float32)) == cap
    assert r.write(np.ones((1, 8), np.float32)) == 0
    assert r.overruns == 1
    r.read(cap)
    # wraparound correctness: sequence survives crossing the boundary
    seq = np.arange(cap // 2, dtype=np.float32)[None, :]
    r.write(seq)
    np.testing.assert_array_equal(r.read(cap // 2), seq)


def test_native_ring_threaded_spsc():
    """Stream 100 blocks through producer/consumer threads losslessly."""
    r = NativeRing(1024, 1)
    n_blocks, B = 100, 64
    src = np.arange(n_blocks * B, dtype=np.float32)
    got = []

    def producer():
        for i in range(n_blocks):
            blk = src[i * B : (i + 1) * B][None, :]
            while r.write(blk) < B:
                time.sleep(0.0001)

    def consumer():
        read = 0
        while read < n_blocks * B:
            avail = r.available_read()
            if avail:
                n = min(avail, B)
                got.append(r.read(n)[0])
                read += n
            else:
                time.sleep(0.0001)

    tp, tc = threading.Thread(target=producer), threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(timeout=10); tc.join(timeout=10)
    np.testing.assert_array_equal(np.concatenate(got), src)
    assert r.underruns == 0
    # overruns may be counted by the producer's busy-retry when the ring is
    # momentarily full — that's the counter working, not data loss


def test_offline_backend_wav(tmp_path):
    opts = AudioProcessorOptions(block_size=64)
    g, proc = AudioProcessor.new(0, 2, opts)
    g.edit(lambda gg: (gg.push(SinWt(440.0)) * 0.2).out([0, 0]).to_graph_out())
    be = OfflineBackend(48000, 64)
    be.start_processing(proc)
    path = str(tmp_path / "out.wav")
    audio = be.render_to_wav(path, seconds=0.25)
    assert audio.shape == (2, 12000)
    from knaster_tpu.utils.wav import read_wav

    back, sr = read_wav(path)
    np.testing.assert_allclose(back, audio, atol=0)


def test_stream_backend_live_edit():
    """The control thread edits the graph while the stream runs."""
    opts = AudioProcessorOptions(block_size=64)
    g, proc = AudioProcessor.new(0, 1, opts)
    amp = g.edit(lambda gg: (lambda c: (c.to_graph_out(), c.param("value"))[1])(
        gg.push(Constant(0.25))))
    proc.run_without_inputs()  # warm up the jit compile before going live
    captured = []
    be = StreamBackend(48000, 64, lookahead_blocks=4,
                       consumer=lambda blk: captured.append(blk.copy()))
    be.start_processing(proc)
    time.sleep(0.25)
    amp.set(0.75)  # live parameter change from the control thread
    time.sleep(0.25)
    be.stop()
    data = np.concatenate(captured, axis=1)[0]
    vals = set(np.round(np.unique(data), 3).tolist())
    assert 0.25 in vals and 0.75 in vals
    # realtime pacing: ~0.5s walltime -> roughly that much audio (not a bounce)
    assert 0.2 * 48000 < data.shape[0] < 1.5 * 48000


def test_stream_backend_structural_edit_glitch_free():
    """A structural edit while streaming must not stall the stream: the old
    program keeps rendering during the background compile, then the new node
    fades in (TaskData-swap parity)."""
    opts = AudioProcessorOptions(block_size=64)
    g, proc = AudioProcessor.new(0, 1, opts)
    g.edit(lambda gg: (gg.push(Constant(0.25))).to_graph_out())
    proc.run_without_inputs()  # warm
    captured = []
    # glitch-free swaps need the ring to cover background-compile CPU
    # contention: ~0.5 s lookahead, like a live rig would use
    be = StreamBackend(48000, 64, lookahead_blocks=200,
                       consumer=lambda blk: captured.append(blk.copy()))
    be.start_processing(proc)
    time.sleep(0.8)  # let the producer fill the ring
    underruns_before_edit = be.underruns
    # structural edit from the control thread: add another constant
    g.edit(lambda gg: (gg.push(Constant(0.5))).to_graph_out())
    # background compile + warmup + swap: poll up to 30 s (the worker warms
    # every program the producer can hit, which is slow on starved CI hosts;
    # the loop exits as soon as the swap lands)
    for _ in range(300):
        time.sleep(0.1)
        if captured and np.any(np.round(captured[-1], 3) == 0.75):
            break
    time.sleep(0.2)
    be.stop()
    data = np.concatenate(captured, axis=1)[0]
    vals = set(np.round(np.unique(data), 3).tolist())
    assert 0.25 in vals        # old program kept playing
    assert 0.75 in vals        # new program swapped in (0.25 + 0.5)
    # once the stream is running, it never goes silent — zeros may only be
    # startup underruns before the producer first fills the ring
    first_nz = int(np.argmax(np.abs(data) > 0))
    running = data[first_nz:]
    assert running.size > 0
    assert np.all(np.abs(running) > 0.2), "dropout during the program swap"


def test_stream_backend_duplex_input():
    """Duplex streaming (audio_backend/jack.rs parity): live capture input
    pushed through ``push_input`` reaches the graph in order, and the
    consumer's output equals an offline render over the same effective
    input timeline ([one prefill chunk of zeros] ++ pushed input),
    sample-exact — through a STATEFUL node so chunk-boundary state carry
    is covered too."""
    from knaster_tpu import OnePoleLpf

    B, CB = 64, 4
    opts = AudioProcessorOptions(block_size=B)
    g, proc = AudioProcessor.new(1, 1, opts)

    def build(gg):
        n = gg.push(OnePoleLpf(2000.0))
        gg.from_inputs(0).to(n)
        n.to_graph_out()

    g.edit(build)
    proc.run_without_inputs()  # warm the single-block path

    rng = np.random.default_rng(42)
    src = (rng.standard_normal((1, 48 * B)) * 0.5).astype(np.float32)

    captured = []
    gate = threading.Event()

    def consumer(blk):
        # hold the consumer until all input is fed and rendered, so the
        # paced drain can never zero-fill mid-stream (the ring is sized to
        # hold the whole test render)
        gate.wait()
        captured.append(blk.copy())

    be = StreamBackend(48000, B, lookahead_blocks=1000, chunk_blocks=CB,
                       consumer=consumer)
    be.start_processing(proc)
    assert be.in_ring is not None and be.in_ring.channels == 1
    assert be.push_input(src) == src.shape[1]

    total = CB * B + src.shape[1]  # prefill chunk + 12 pushed chunks
    deadline = time.time() + 60
    while be.ring.frames_written < total and time.time() < deadline:
        time.sleep(0.005)
    assert be.ring.frames_written >= total, "producer never consumed the input"
    assert be.input_underruns == 0
    gate.set()
    while be.ring.frames_read < total and time.time() < deadline:
        time.sleep(0.005)
    be.stop()

    got = np.concatenate(captured, axis=1)
    g2, proc2 = AudioProcessor.new(1, 1, opts)
    g2.edit(build)
    # render the reference in the SAME chunk increments the producer used:
    # associative-scan filters re-associate under different partitionings
    # (documented ≤1-ULP effect), so bit-exactness requires matching chunks
    eff = np.concatenate([np.zeros((1, CB * B), np.float32), src], axis=1)
    ref = np.concatenate(
        [np.asarray(proc2.render(frames=CB * B,
                                 inputs=eff[:, i : i + CB * B]))
         for i in range(0, total, CB * B)],
        axis=1,
    )
    assert got.shape[1] >= total
    np.testing.assert_allclose(got[:, :total], ref, atol=0)


def test_stream_backend_duplex_no_wait_zero_fills():
    """input_wait=False: a dry capture source zero-fills instead of stalling
    the stream, and the shortfall is counted."""
    B, CB = 64, 4
    opts = AudioProcessorOptions(block_size=B)
    g, proc = AudioProcessor.new(1, 1, opts)
    g.edit(lambda gg: gg.from_inputs(0).to_graph_out())
    proc.run_without_inputs()
    be = StreamBackend(48000, B, lookahead_blocks=16, chunk_blocks=CB,
                       input_wait=False, consumer=lambda blk: None)
    be.start_processing(proc)
    time.sleep(0.3)
    be.stop()
    # stream kept producing with no input at all
    assert be.ring.frames_written >= 2 * CB * B
    assert be.input_underruns > 0


def test_async_recompile_worker_warms_new_program():
    """The async-compile worker must publish a *warmed* program: every scan
    length the producer uses has to be in the new program's jit cache before
    the swap, or the post-swap chunk render stalls on a trace while the
    stream's ring drains. Regression: the worker used to warm from a live
    reference to the producer's state — the scan programs donate state, so
    the buffers were deleted under the worker mid-warm and the failure was
    swallowed, silently publishing an unwarmed program."""
    import jax
    import warnings

    opts = AudioProcessorOptions(block_size=64)
    g, proc = AudioProcessor.new(0, 1, opts)
    g.edit(lambda gg: (gg.push(Constant(0.25))).to_graph_out())
    proc._ensure_compiled()
    proc._warm_scan_lengths = (16,)
    proc.enable_async_recompile()
    # simulate the producer's donation: render a chunk, which donates the
    # old state buffers the worker would have warmed from
    proc.render(frames=64 * 16)
    g.edit(lambda gg: (gg.push(Constant(0.5))).to_graph_out())
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # warm failure warns -> test fails
        proc._kick_async_compile()
        # keep rendering (and donating state) with the OLD program while the
        # worker runs, so its snapshot-vs-live distinction actually matters.
        # NOTE: render() would itself swap in a finished program, so render
        # only while the worker is alive, then join and inspect the result.
        while proc._compile_thread.is_alive():
            proc.render(frames=64 * 16)
        proc._compile_thread.join(timeout=120)
    # a render racing the worker's finish may already have swapped the new
    # program in — either way it must exist and be warm
    ready = proc._compiled_next
    if ready is None:
        ready = proc.compiled
        assert ready.revision == g.root().revision
    assert ready is not None
    # the event-free path is warmed either as superblock programs (eligible
    # graphs) or as the per-block scan fallback
    if ready.super_fns:
        assert all(f._cache_size() >= 1 for f in ready.super_fns.values())
    else:
        assert ready.scan_fn is not None and ready.scan_fn._cache_size() >= 1
    assert ready.full_scan_fn is not None and ready.full_scan_fn._cache_size() >= 1
