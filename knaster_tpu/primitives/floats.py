"""Float policy: f32/f64 genericity for the TPU build.

The reference is generic over ``F: Float`` (knaster_primitives/src/float.rs:11).
Here the same genericity is a dtype carried by the Graph/AudioProcessor and
threaded through every UGen's state/arrays. f32 is the default (TPU-native);
f64 is available by enabling JAX x64 (``knaster_tpu.enable_f64()``).

Denormals: TPUs flush denormals to zero in hardware, which matches the intent
of the reference's ANTI_DENORMAL DC-offset mitigation
(knaster_primitives/src/float.rs:39-43); no offset is needed on TPU. The
constant is kept for CPU-backed test runs of recursive filters.
"""

from __future__ import annotations

import numpy as np

# Matches reference float.rs ANTI_DENORMAL = 1e-20 (unused on TPU; see module doc).
ANTI_DENORMAL: float = 1e-20

_DEFAULT_DTYPE = np.float32


def default_dtype():
    """The engine-wide sample dtype (float32 unless ``enable_f64()``) —
    the reference's ``F: Float`` genericity as a global config."""
    return _DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    global _DEFAULT_DTYPE
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise ValueError("knaster_tpu supports float32 and float64 sample types")
    if dtype == np.dtype(np.float64):
        import jax

        jax.config.update("jax_enable_x64", True)
    _DEFAULT_DTYPE = dtype.type


def enable_f64() -> None:
    """Switch the default sample dtype to float64 (enables JAX x64)."""
    set_default_dtype(np.float64)


def tau(dtype=None) -> float:
    return 2.0 * np.pi
