"""Device-side logging for UGens.

The reference streams allocation-free log chains from the audio thread over
SPSC rings (knaster_core/src/log.rs ArLogSender/Receiver + rt_log!). The
TPU-native equivalents:

* :func:`rt_log` — log from *inside* a traced/compiled UGen. Wraps
  ``jax.debug.print``, whose host callback plays the role of the ring buffer
  drain (the XLA runtime owns the device→host transport; no allocation on
  the compute path). Works under jit and scan; messages arrive on the host
  asynchronously, exactly like the reference's log-poller thread.
* :class:`ProbeLog` — host-side drain of LogProbe UGens: the processor
  exposes the most recent probe captures from the carried state
  (see AudioProcessor.probe_log).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax


def rt_log(fmt: str, *args, **kwargs) -> None:
    """Log from inside a UGen's process (reference rt_log!, log.rs:271).

    Example::

        def process(self, ctx, state, inputs, params):
            rt_log("peak {p}", p=jnp.abs(inputs).max())
            ...
    """
    jax.debug.print(fmt, *args, **kwargs)


@dataclass
class ProbeCapture:
    name: str
    value: float
    fired: bool


def collect_probes(compiled, state) -> List[ProbeCapture]:
    """Read the latest LogProbe captures out of a graph state pytree."""
    from ..ugens.util import LogProbe

    out: List[ProbeCapture] = []
    for nid in compiled.order:
        entry = compiled.entries[nid]
        if isinstance(entry.ugen, LogProbe):
            st = state["nodes"][compiled.state_key(nid)]
            out.append(
                ProbeCapture(
                    name=entry.ugen.probe_name,
                    value=float(st["last_value"]),
                    fired=bool(st["fired"]),
                )
            )
    return out
