"""ctypes bindings to the native realtime support library (native/knaster_rt.cpp).

Builds the shared library on first use (g++ via the Makefile) and caches it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libknaster_rt.so")
_lib = None
_lock = threading.Lock()


def load_native():
    """Build (if needed) and load libknaster_rt. Raises with the compiler
    output if the toolchain is unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # always run make: its dependency tracking rebuilds when a source
        # file is newer than the .so (a bare existence check silently loads
        # a stale library after source edits) and is a fast no-op otherwise
        proc = subprocess.run(
            ["make", "-C", _NATIVE_DIR], capture_output=True, text=True
        )
        if proc.returncode != 0 and not os.path.exists(_LIB_PATH):
            raise RuntimeError(
                f"failed to build native/knaster_rt.cpp:\n{proc.stdout}\n{proc.stderr}"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        u32, u64, fp = ctypes.c_uint32, ctypes.c_uint64, ctypes.c_void_p
        lib.kn_ring_new.restype = fp
        lib.kn_ring_new.argtypes = [u32, u32]
        lib.kn_ring_destroy.argtypes = [fp]
        for name in ("kn_ring_capacity", "kn_ring_channels",
                     "kn_ring_available_read", "kn_ring_available_write"):
            getattr(lib, name).restype = u32
            getattr(lib, name).argtypes = [fp]
        lib.kn_ring_write.restype = u32
        lib.kn_ring_write.argtypes = [fp, ctypes.POINTER(ctypes.c_float), u32]
        lib.kn_ring_read.restype = u32
        lib.kn_ring_read.argtypes = [fp, ctypes.POINTER(ctypes.c_float), u32]
        for name in ("kn_ring_underruns", "kn_ring_overruns",
                     "kn_ring_frames_written", "kn_ring_frames_read"):
            getattr(lib, name).restype = u64
            getattr(lib, name).argtypes = [fp]
        _lib = lib
        return lib


class NativeRing:
    """SPSC audio ring buffer (the reference's rtrb analog), interleaved f32.

    Producer (`write`) and consumer (`read`) may live on different threads;
    both sides are wait-free. Reads always fill the requested frames,
    zero-padding and counting an underrun when the ring runs dry — realtime
    callback semantics."""

    def __init__(self, capacity_frames: int, channels: int):
        self._lib = load_native()
        self._ptr = self._lib.kn_ring_new(int(capacity_frames), int(channels))
        if not self._ptr:
            raise MemoryError("kn_ring_new failed")
        self.channels = int(channels)

    def __del__(self):
        try:
            if getattr(self, "_ptr", None):
                self._lib.kn_ring_destroy(self._ptr)
                self._ptr = None
        except Exception:
            pass

    @property
    def capacity(self) -> int:
        return self._lib.kn_ring_capacity(self._ptr)

    def available_read(self) -> int:
        return self._lib.kn_ring_available_read(self._ptr)

    def available_write(self) -> int:
        return self._lib.kn_ring_available_write(self._ptr)

    def write(self, block: np.ndarray) -> int:
        """block: [channels, frames] (planar, like graph outputs); returns
        frames written."""
        block = np.ascontiguousarray(
            np.asarray(block, dtype=np.float32).T  # interleave
        )
        frames = block.shape[0]
        ptr = block.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return self._lib.kn_ring_write(self._ptr, ptr, frames)

    def read(self, frames: int) -> np.ndarray:
        """Read `frames`, zero-filled on underrun; returns [channels, frames]."""
        out = np.empty((frames, self.channels), np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.kn_ring_read(self._ptr, ptr, frames)
        return out.T.copy()

    @property
    def underruns(self) -> int:
        return self._lib.kn_ring_underruns(self._ptr)

    @property
    def overruns(self) -> int:
        return self._lib.kn_ring_overruns(self._ptr)

    @property
    def frames_written(self) -> int:
        return self._lib.kn_ring_frames_written(self._ptr)

    @property
    def frames_read(self) -> int:
        return self._lib.kn_ring_frames_read(self._ptr)
