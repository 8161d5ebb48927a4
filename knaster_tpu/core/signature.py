"""Structural signatures for the topology-keyed program cache.

The reference swaps precompiled TaskData in microseconds on ``commit_changes``
(knaster_graph/src/graph.rs:1707-1726); our equivalent cost is an XLA
recompile. To get back to microsecond-scale commits for *recurring* graph
shapes (the live-coding edit loop: push/free/push the same voice structure),
compiled programs are cached by a structural signature of the graph
(compile.py). This module freezes one UGen's trace-relevant config into a
hashable value.

Freezing happens AT PUSH TIME: a fresh UGen's ``vars()`` is pure constructor
config. (Many UGens lazily attach derived constants during ``init(ctx)`` —
``Envelope._segs``, ``OscWt._tables`` — which would make the same config hash
differently before/after first use.)

A UGen whose config cannot be frozen (closures, device arrays) gets signature
``None``, which makes any graph containing it uncacheable — correct, just
slower to commit.
"""

from __future__ import annotations

import enum
import hashlib
from typing import Any, Optional

import numpy as np


class _Unfreezable(Exception):
    pass


_SCALARS = (bool, int, float, str, bytes, type(None))
_MAX_DEPTH = 12

# the one source of truth for which instance attributes are runtime data by
# default; UGen.signature_exclude references this (core/ugen.py) and
# subclasses extend it (VoiceBank adds voice_defaults)
DEFAULT_SIGNATURE_EXCLUDE = ("pdefaults",)


def _freeze(v: Any, depth: int = 0) -> Any:
    if depth > _MAX_DEPTH:
        raise _Unfreezable("nesting too deep")
    if isinstance(v, _SCALARS):
        return v
    if isinstance(v, enum.Enum):
        return ("enum", type(v).__qualname__, v.value)
    if isinstance(v, np.ndarray):
        data = np.ascontiguousarray(v)
        return (
            "nd",
            tuple(data.shape),
            str(data.dtype),
            hashlib.sha1(data.tobytes()).hexdigest(),
        )
    if isinstance(v, np.generic):
        return ("npscalar", str(v.dtype), v.item())
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_freeze(x, depth + 1) for x in v))
    if isinstance(v, frozenset):
        return ("set", tuple(sorted(_freeze(x, depth + 1) for x in v)))
    if isinstance(v, dict):
        return (
            "map",
            tuple(
                (str(k), _freeze(x, depth + 1)) for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
            ),
        )
    if isinstance(v, type):
        return ("type", v.__module__, v.__qualname__)
    if callable(v):
        raise _Unfreezable(f"callable {v!r}")
    # jax arrays: hashing would force a device->host fetch (~75 ms over a
    # remote-TPU tunnel) — treat as unfreezable instead
    if type(v).__module__.startswith("jax"):
        raise _Unfreezable(f"jax value {type(v)!r}")
    d = getattr(v, "__dict__", None)
    if d is not None:
        return (
            "obj",
            type(v).__module__,
            type(v).__qualname__,
            _freeze(d, depth + 1),
        )
    raise _Unfreezable(f"{type(v)!r}")


def ugen_signature(ugen: Any) -> Optional[Any]:
    """Hashable trace-config signature of a freshly constructed UGen, or
    None when the config can't be frozen (graph becomes uncacheable)."""
    custom = getattr(ugen, "program_key", None)
    if callable(custom):
        try:
            key = custom()
        except Exception:
            return None
        if key is None:
            return None
        try:
            return ("custom", type(ugen).__module__, type(ugen).__qualname__, _freeze(key))
        except _Unfreezable:
            return None
    try:
        attrs = dict(vars(ugen))
        # A pushed node's own runtime-data attributes are excluded
        # (UGen.signature_exclude, default: pdefaults): param defaults seed
        # ParamLayout → param-engine init_state, and every declared param
        # reaches process() as engine rows, so two graphs differing only in
        # them share one program — "push the same voice shape at a new
        # freq" becomes a program-cache hit. Nested UGen attributes keep
        # their pdefaults frozen — composites (e.g. SineVoice's inner
        # EnvAsr) may read inner defaults at trace time.
        for k in getattr(ugen, "signature_exclude", DEFAULT_SIGNATURE_EXCLUDE):
            attrs.pop(k, None)
        return (
            type(ugen).__module__,
            type(ugen).__qualname__,
            _freeze(attrs),
        )
    except _Unfreezable:
        return None
