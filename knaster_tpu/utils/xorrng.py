"""XOrShift32 — tiny repeatable PRNG for host-side table building.

Exact port of knaster_core_dsp/src/dsp/xorrng.rs (public-domain algorithm).
Device-side noise uses counter-based Threefry instead (see ugens/noise.py) —
stateless-per-sample RNG is the TPU-native choice because it vectorizes and
shards without sequence coupling.
"""

from __future__ import annotations


class XOrShift32Rng:
    def __init__(self, seed: int = 17):
        seed = int(seed) & 0xFFFFFFFF
        self.fpd = seed if seed != 0 else 17

    def gen_u32(self) -> int:
        x = self.fpd
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        self.fpd = x & 0xFFFFFFFF
        return self.fpd

    def gen_f32(self) -> float:
        import numpy as np

        return float(
            np.float32(self.gen_u32()) / np.float32(0xFFFFFFFF)
        )

    def gen_f64(self) -> float:
        return self.gen_u32() / 0xFFFFFFFF
