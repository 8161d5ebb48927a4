"""Audio backends: the runner side of the framework.

Parity with knaster_graph/src/audio_backend.rs (AudioBackend trait + CPAL/
JACK backends). The TPU inversion: the device renders blocks *ahead* of the
consumer through the native SPSC ring (backends/native.py), so compile
hiccups or host jitter don't glitch the stream as long as the ring holds
enough lookahead — the same role CPAL's device buffer plays in the reference.

* :class:`OfflineBackend` — the primary path (non-realtime bounce to array/
  WAV), mirroring processor.rs's run-in-a-loop usage.
* :class:`StreamBackend` — two-thread realtime-ish streaming: a producer
  thread runs the AudioProcessor (graph edits stay live from the control
  thread, exactly like the reference's control/audio split) and a consumer
  pulls at the audio rate. The consumer is pluggable: a callback (stand-in
  for a device callback — this container has no audio hardware) or a WAV
  sink.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np

from ..graph.processor import AudioProcessor


class AudioBackend:
    """Backend trait (audio_backend.rs:23-42)."""

    def sample_rate(self) -> int:
        raise NotImplementedError

    def block_size(self) -> Optional[int]:
        raise NotImplementedError

    def start_processing(self, processor: AudioProcessor) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        pass


class OfflineBackend(AudioBackend):
    """Non-realtime rendering backend — the TPU build's primary path."""

    def __init__(self, sample_rate: int = 48000, block_size: int = 64):
        self._sr = sample_rate
        self._block = block_size
        self.processor: Optional[AudioProcessor] = None

    def sample_rate(self) -> int:
        return self._sr

    def block_size(self) -> Optional[int]:
        return self._block

    def start_processing(self, processor: AudioProcessor) -> None:
        self.processor = processor

    def render(self, seconds=None, frames=None, inputs=None) -> np.ndarray:
        return self.processor.render(seconds=seconds, frames=frames, inputs=inputs)

    def render_to_wav(self, path: str, seconds=None, frames=None,
                      subtype: str = "float32") -> np.ndarray:
        from ..utils.wav import write_wav

        audio = self.render(seconds=seconds, frames=frames)
        write_wav(path, audio, self._sr, subtype)
        return audio


class StreamBackend(AudioBackend):
    """Streaming backend over the native lock-free ring.

    consumer: callable(block [channels, frames]) invoked at the audio rate
    from the consumer thread (the 'device callback'). Defaults to a pacing
    null sink. ``lookahead_blocks`` is the ring capacity — the maximum the
    producer renders ahead of the consumer, and therefore the worst-case
    latency from an asap control change to audible output (the
    latency/robustness tradeoff).

    ``chunk_blocks``: how many blocks the producer renders per device round
    trip. Device dispatch + fetch has fixed latency (tens of ms over this
    environment's tunnel), so sustained realtime requires amortizing it:
    each producer iteration renders one chunk via the on-device scan path
    and fetches it with a single transfer. Scheduled events stay
    sample-accurate (the render path splits eventful blocks); the tradeoff
    is control latency of up to one chunk, like a device buffer.

    **Duplex** (audio_backend/jack.rs:25-250 parity — the reference's JACK
    backend registers input ports and copies them into the graph every
    callback): when the processor's graph has input channels, the backend
    opens a second lock-free ring for input. The input side (the "device
    capture callback") feeds it with :meth:`push_input`; the producer
    consumes exactly ``chunk_frames`` per rendered chunk, in order, so the
    input→graph sample mapping is deterministic. ``input_wait=True``
    (default) paces the producer on input availability — live sources feed
    in real time and input→output latency is the prefill chunk plus ring
    depth, knaster's device-buffer latency writ large. ``input_wait=False``
    zero-fills missing input (and counts ``input_underruns``) so a stream
    never stalls on a silent capture source. The prefill chunk always
    renders with zero input: it is produced before any input can exist —
    the duplex round-trip latency, same as a real device's buffer."""

    def __init__(
        self,
        sample_rate: int = 48000,
        block_size: int = 64,
        lookahead_blocks: int = 192,
        consumer: Optional[Callable[[np.ndarray], None]] = None,
        chunk_blocks: int = 32,
        input_wait: bool = True,
    ):
        self._sr = sample_rate
        self._block = block_size
        # at least three chunks: one draining, one in flight, one margin
        self.lookahead = max(int(lookahead_blocks), 3 * int(chunk_blocks))
        self.chunk_blocks = int(chunk_blocks)
        self.consumer = consumer
        self.input_wait = bool(input_wait)
        self.processor: Optional[AudioProcessor] = None
        self.ring = None
        self.in_ring = None
        self._threads = []
        self._running = threading.Event()

    def sample_rate(self) -> int:
        return self._sr

    def block_size(self) -> Optional[int]:
        return self._block

    # -- the two-thread engine -------------------------------------------
    def start_processing(self, processor: AudioProcessor) -> None:
        import jax

        from .native import NativeRing

        self.processor = processor
        channels = processor.graph.outputs
        # ring capacity IS the lookahead: the producer can never buffer more
        # audio than the knob says, so tuning lookahead_blocks actually
        # bounds control latency (it used to be sized 2x, silently doubling
        # the documented render-ahead)
        self.ring = NativeRing(self._block * max(self.lookahead, 4), channels)
        # duplex: a second SPSC ring carries capture input to the producer.
        # Its writer is whoever owns the input source (push_input); its
        # reader is the producer thread — one producer, one consumer, like
        # the task/scheduling rings in the reference.
        if processor.graph.inputs > 0:
            self.in_ring = NativeRing(
                self._block * max(self.lookahead, 4), processor.graph.inputs
            )

        # pre-warm BOTH block programs (fast + eventful) AND every
        # power-of-two scan length the producer can hit — live events segment
        # a chunk into arbitrary event-free run lengths, so any of them may
        # be needed mid-stream. EXECUTE on copied state (lower().compile()
        # does not populate the jit-call cache). The same lengths are
        # recorded on the processor so the async-recompile worker re-warms
        # them on each NEW program before the swap — the post-swap chunk
        # render must not pay a jit trace while the ring drains.
        processor._ensure_compiled()
        cap = min(self.chunk_blocks, processor.options.render_chunk_blocks)
        # every power of two up to the chunk: live events segment a chunk
        # into event-free runs of any length, each covered by one superblock
        # dispatch (short tails included — per-dispatch overhead is ~ms).
        # _warm_chunk_len tells the warmup the chunk length render() will
        # actually request, so the fused eventful-chunk program (and its
        # chunk-1 tail) compile for the right n.
        lengths, sub = [], 2
        while sub <= cap:
            lengths.append(sub)
            sub *= 2
        processor._warm_scan_lengths = tuple(lengths)
        processor._warm_chunk_len = cap
        # structural edits while live compile on a worker and swap between
        # blocks (the reference's TaskData swap semantics)
        processor.enable_async_recompile()
        processor._warm_programs(processor.compiled, processor.state)

        self._running.set()

        chunk_frames = self._block * self.chunk_blocks
        # prefill: one chunk of lookahead in the ring before the consumer
        # starts draining (the role of a device buffer's initial latency)
        self.ring.write(processor.render(frames=chunk_frames))

        # producer/fetcher split: over a remote-device tunnel BOTH the
        # dispatch and the device→host fetch are RTT-priced (tens of ms
        # each); on one thread they serialize and a chunk budget of ~85 ms
        # is marginal. The producer thread only dispatches (render with
        # fetch=False returns device-resident audio); the fetcher thread
        # pulls completed chunks to host and feeds the ring — the two RTTs
        # overlap.
        import queue as _queue

        inflight: "_queue.Queue" = _queue.Queue(maxsize=2)
        # chunks the fetcher has popped but not finished writing — they
        # occupy neither inflight.qsize() nor the ring yet, and the
        # producer's space gate must count them or it dispatches one chunk
        # too many and the ring write comes up short
        held = [0]

        def chunk_inputs():
            """Next chunk of capture input, consumed in order.

            With input_wait the caller has already gated on availability;
            without it, NativeRing.read zero-fills the shortfall and counts
            an input underrun (capture-callback semantics)."""
            if self.in_ring is None:
                return None
            return self.in_ring.read(chunk_frames)

        def producer():
            while self._running.is_set():
                input_ready = (
                    self.in_ring is None
                    or not self.input_wait
                    or self.in_ring.available_read() >= chunk_frames
                )
                if (input_ready
                        and self.ring.available_write()
                        >= chunk_frames * (1 + inflight.qsize() + held[0])
                        and not inflight.full()):
                    inflight.put(
                        processor.render(frames=chunk_frames, fetch=False,
                                         inputs=chunk_inputs())
                    )
                else:
                    time.sleep(self._block / self._sr / 4)

        def fetcher():
            while self._running.is_set() or not inflight.empty():
                try:
                    dev = inflight.get(timeout=0.05)
                except _queue.Empty:
                    continue
                held[0] = 1
                arr = np.asarray(dev)
                # never drop frames on a full ring: write what fits, then
                # wait for the consumer to drain (backpressure, not loss —
                # a silent drop would desync every later scheduled event
                # from the audible stream)
                written = self.ring.write(arr)
                while written < arr.shape[1] and self._running.is_set():
                    time.sleep(self._block / self._sr / 4)
                    written += self.ring.write(arr[:, written:])
                held[0] = 0

        def consume():
            period = self._block / self._sr
            next_t = time.monotonic()
            while self._running.is_set():
                block = self.ring.read(self._block)
                if self.consumer is not None:
                    self.consumer(block)
                next_t += period
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
                else:
                    next_t = time.monotonic()  # fell behind; resync

        self._threads = [
            threading.Thread(target=producer, daemon=True, name="knaster-producer"),
            threading.Thread(target=fetcher, daemon=True, name="knaster-fetcher"),
            threading.Thread(target=consume, daemon=True, name="knaster-consumer"),
        ]
        for t in self._threads:
            t.start()

    def stop(self) -> None:
        self._running.clear()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []
        if self.processor is not None:
            # a daemon compile/prewarm worker caught mid-XLA-compile at
            # interpreter exit aborts from C++ — drain it before returning
            self.processor.join_background()

    # -- duplex input ------------------------------------------------------
    def push_input(self, block) -> int:
        """Feed capture input (the "device input callback" side).

        ``block``: [input_channels, frames]. Returns frames accepted (0 when
        the input ring is full — the producer is behind; with input_wait the
        source should retry, a lossy source may drop). Call from ONE thread
        (SPSC ring)."""
        if self.in_ring is None:
            raise RuntimeError(
                "graph has no input channels (push_input needs "
                "AudioProcessor.new(inputs=n, ...))"
            )
        block = np.asarray(block, dtype=np.float32)
        if block.ndim != 2 or block.shape[0] != self.in_ring.channels:
            raise ValueError(
                f"expected [{self.in_ring.channels}, frames] input block, "
                f"got {block.shape}"
            )
        return self.in_ring.write(block)

    def input_space(self) -> int:
        """Frames the input ring can accept right now."""
        return self.in_ring.available_write() if self.in_ring else 0

    @property
    def input_underruns(self) -> int:
        """Chunks rendered with zero-filled missing input (input_wait=False)."""
        return self.in_ring.underruns if self.in_ring else 0

    @property
    def underruns(self) -> int:
        return self.ring.underruns if self.ring else 0
