"""L0 primitives: float policy, block conventions, exact time, parameter types.

TPU-native counterpart of the reference's ``knaster_primitives`` crate.
Blocks are plain JAX arrays of shape ``[channels, block_size]`` (channel-major,
like the reference's planar Block trait, knaster_primitives/src/block.rs:33);
no bespoke block storage types are needed because XLA owns all buffers.
"""

from .floats import ANTI_DENORMAL, default_dtype, enable_f64, set_default_dtype
from .params import (
    NYQUIST,
    FloatHint,
    IntegerHint,
    Nyquist,
    Param,
    ParameterKind,
    Smoothing,
    pbool,
    pfloat,
    pinteger,
    ptrigger,
)
from .time import (
    SUBBEAT_TESIMALS_PER_BEAT,
    SUBSECOND_TESIMALS_PER_SECOND,
    Beats,
    Seconds,
)

__all__ = [
    "ANTI_DENORMAL",
    "default_dtype",
    "enable_f64",
    "set_default_dtype",
    "NYQUIST",
    "FloatHint",
    "IntegerHint",
    "Nyquist",
    "Param",
    "ParameterKind",
    "Smoothing",
    "pbool",
    "pfloat",
    "pinteger",
    "ptrigger",
    "Beats",
    "Seconds",
    "SUBBEAT_TESIMALS_PER_BEAT",
    "SUBSECOND_TESIMALS_PER_SECOND",
]
