"""Device-side logging for UGens: ArLog rings + probes.

The reference streams allocation-free log chains from the audio thread over
bounded SPSC rings (knaster_core/src/log.rs ArLogSender/Receiver + rt_log!).
TPU-native equivalents, same surface and semantics:

* :class:`ArLogReceiver` / :class:`ArLogSender` — bounded per-channel rings
  with the reference's capacity/backpressure contract: a chain that does not
  fit is DROPPED (rtrb's failed push), never blocking the render;
  ``receiver.recv(handler)`` drains complete chains (those terminated by the
  END sentinel), leaving partial chains for the next drain.
* :func:`rt_log` — log from *inside* a traced/compiled UGen.
  ``rt_log(logger, "peak ", x)`` pushes a typed message chain into the
  logger's ring; traced values are delivered at RUN time via
  ``jax.debug.callback`` (the XLA runtime owns the device→host transport —
  the role rtrb plays for the reference's audio thread). The legacy
  ``rt_log("fmt {x}", x=...)`` form delegates to ``jax.debug.print``.
* :class:`ProbeCapture` / :func:`collect_probes` — host-side drain of
  LogProbe UGens from the carried state (see AudioProcessor.probe_log).
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass
from typing import Any, Callable, List, Sequence, Tuple

import jax

END = "\x00END"  # chain terminator sentinel (ArLogMessage::End)


class ArLogSender:
    """Sender half of one bounded log channel (log.rs:243-271 ArLogSender).

    ``send`` pushes one message, ``log(*parts)`` pushes a full chain (the
    ``rt_log!`` macro's behavior: parts + End). When the ring lacks room for
    the whole chain it is dropped and ``dropped`` increments — logging never
    blocks or reallocates. A sender created with :meth:`non_rt` forwards to
    Python's ``logging`` instead of a ring (log.rs non_rt fallback)."""

    def __init__(self, ring: deque, capacity: int, lock: threading.Lock):
        self._ring = ring
        self._capacity = int(capacity)
        self._lock = lock
        self.dropped = 0

    @staticmethod
    def non_rt() -> "ArLogSender":
        s = ArLogSender(deque(), 0, threading.Lock())
        s._non_rt = True
        return s

    def send(self, message) -> None:
        """Push a single message (prefer :meth:`log` / :func:`rt_log`)."""
        self._push_chain((message,), terminate=False)

    def log(self, *parts) -> None:
        """Push one full chain. Traced parts (jax tracers/arrays) are
        resolved at run time through a host callback; everything else lands
        immediately."""
        dynamic = [
            (i, p) for i, p in enumerate(parts)
            if isinstance(p, jax.core.Tracer) or hasattr(p, "aval")
        ]
        if not dynamic:
            self._push_chain(tuple(parts))
            return
        static = list(parts)
        dyn_idx = [i for i, _ in dynamic]

        def cb(*vals):
            chain = list(static)
            for i, v in zip(dyn_idx, vals):
                import numpy as _np

                a = _np.asarray(v)
                chain[i] = a.item() if a.ndim == 0 else a
            self._push_chain(tuple(chain))

        jax.debug.callback(cb, *[p for _, p in dynamic])

    # -- internals --------------------------------------------------------
    def _push_chain(self, parts: Tuple, terminate: bool = True) -> None:
        if getattr(self, "_non_rt", False):
            import logging

            logging.getLogger("knaster_tpu").warning(
                " ".join(str(p) for p in parts)
            )
            return
        n = len(parts) + (1 if terminate else 0)
        with self._lock:
            if len(self._ring) + n > self._capacity:
                self.dropped += 1  # rtrb push failure: drop, never block
                return
            self._ring.extend(parts)
            if terminate:
                self._ring.append(END)


class ArLogReceiver:
    """Receiver for any number of bounded log channels (log.rs:118-240).

    ``sender(capacity)`` adds a channel and returns its sender (unlike the
    reference's consuming type-level builder, the receiver mutates — Python
    has no typenum); ``recv(handler)`` drains every channel, invoking
    ``handler(chain_tuple)`` once per COMPLETE chain and leaving incomplete
    tails in the ring."""

    def __init__(self):
        self._channels: List[Tuple[deque, threading.Lock]] = []

    def sender(self, capacity: int = 1024) -> ArLogSender:
        ring: deque = deque()
        lock = threading.Lock()
        self._channels.append((ring, lock))
        return ArLogSender(ring, capacity, lock)

    def channels(self) -> int:
        return len(self._channels)

    def recv(self, handler: Callable[[Sequence], None]) -> int:
        """Drain complete chains; returns the number delivered."""
        delivered = 0
        for ring, lock in self._channels:
            with lock:
                items = list(ring)
                # keep any trailing partial chain in the ring
                last_end = -1
                for i in range(len(items) - 1, -1, -1):
                    if items[i] is END or items[i] == END:
                        last_end = i
                        break
                if last_end < 0:
                    continue
                for _ in range(last_end + 1):
                    ring.popleft()
            chain: List = []
            for m in items[: last_end + 1]:
                if m is END or m == END:
                    handler(tuple(chain))
                    delivered += 1
                    chain = []
                else:
                    chain.append(m)
        return delivered


def rt_log(*args, **kwargs) -> None:
    """Log from inside a UGen's process (reference rt_log!, log.rs:271).

    Two forms::

        rt_log(logger, "peak ", peak_val)        # ArLog chain into a ring
        rt_log("peak {p}", p=jnp.abs(x).max())   # direct jax.debug.print
    """
    if args and isinstance(args[0], ArLogSender):
        logger, *parts = args
        logger.log(*parts)
        return
    jax.debug.print(args[0], *args[1:], **kwargs)


@dataclass
class ProbeCapture:
    name: str
    value: float
    fired: bool


def collect_probes(compiled, state) -> List[ProbeCapture]:
    """Read the latest LogProbe captures out of a graph state pytree.

    All probe leaves come back in ONE ``jax.device_get`` — per-leaf
    ``float()``/``bool()`` casts each cost a device→host round-trip
    (~tens of ms over a remote-TPU tunnel), which made per-chunk probing
    unusable in streaming sessions."""
    from ..ugens.util import LogProbe

    names, leaves = [], []
    for nid in compiled.order:
        entry = compiled.entries[nid]
        if isinstance(entry.ugen, LogProbe):
            st = state["nodes"][compiled.state_key(nid)]
            names.append(entry.ugen.probe_name)
            leaves.append((st["last_value"], st["fired"]))
    if not leaves:
        return []
    fetched = jax.device_get(leaves)  # one host round-trip for all probes
    return [
        ProbeCapture(name=n, value=float(v), fired=bool(f))
        for n, (v, f) in zip(names, fetched)
    ]
