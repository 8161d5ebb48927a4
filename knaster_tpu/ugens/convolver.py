"""Impulse-response convolution: uniform partitioned spectral convolution.

Beyond-reference capability (the Rust reference has no convolution engine;
its only reverb is the algorithmic Galactic port). Convolution reverb is
the production standard for "place this sound in that room", and the
frequency-domain formulation is exactly what the TPU is good at: batched
transforms and elementwise multiply-accumulates instead of an O(L) FIR
loop per sample.

Algorithm: uniform partitioned overlap-save with a frequency-domain delay
line (FDL). The impulse response is split into K partitions of one block
each; partition k's spectrum is the real-input DFT of ``[h_k, 0..]``
(2B points). Per block the engine transforms the last 2B input samples,
pushes the spectrum into the FDL ring, forms ``Y = sum_k X_{t-k} * H_k``
and takes the last B samples of the inverse transform — exact linear
convolution with zero added latency and no per-sample loop at all.

TPU twist: the transform is a **matmul DFT**, not an FFT. This backend
implements neither complex dtypes nor the FFT custom call, and at audio
block sizes (2B = 32..2048 points) an O(N^2) DFT as two real [2B, B+1]
matmuls runs on the MXU — the unit with all the FLOPs — where an FFT
would be a long scalar-flow dependency chain on the VPU. The DFT
matrices are trace-time constants (XLA hoists and dedupes them across
Convolver instances at the same block size); all spectra are (real,
imag) float pairs.

The IR spectra and the FDL live in STATE (the OscWt wavetable-in-state
pattern): graphs differing only in IR content (same length and channel
layout) share cached programs, so a live IR swap is a cache-hit
push/free, not a recompile. The IR length and channel layout are
structural (they shape the FDL).
"""

from __future__ import annotations

import numpy as np
import jax.lax as lax
import jax.numpy as jnp

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat


def _dft_mats(B: int, dtype):
    """Real-input DFT / inverse matrices for 2B-point transforms.

    Forward ([2B, F], F = B+1 rfft bins): Xr = seg @ cos, Xi = seg @ msin.
    Inverse ([F, 2B], conj-symmetry weights baked in): y = Yr @ icos +
    Yi @ isin. Float64 angle generation keeps the f32 matrices exact to
    rounding."""
    F = B + 1
    n = np.arange(2 * B, dtype=np.float64)
    k = np.arange(F, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / (2.0 * B)  # [2B, F]
    fwd_cos = np.cos(ang).astype(dtype)
    fwd_msin = (-np.sin(ang)).astype(dtype)
    w = np.full(F, 2.0, np.float64)
    w[0] = 1.0
    w[F - 1] = 1.0
    icos = ((w[:, None] * np.cos(ang.T)) / (2.0 * B)).astype(dtype)
    # Re(Y e^{+i ang}) = Yr cos - Yi sin: the minus lives in the matrix
    isin = (-(w[:, None] * np.sin(ang.T)) / (2.0 * B)).astype(dtype)
    return fwd_cos, fwd_msin, icos, isin


class Convolver(UGen):
    """Convolve the input with an impulse response (spectral, partitioned).

    ir:      np.ndarray [L] (mono) or [C, L] (C output channels).
    inputs:  1 (default) or C. With 1 input and a [C, L] IR the mono
             input feeds every IR channel (mono-to-stereo room). With
             ``inputs == C`` each channel convolves its own IR row.
    dry_wet: 0 = dry passthrough, 1 = fully wet (parameter, smoothable,
             sample-accurate like any engine float param).

    No reference counterpart — the reference's knaster_core_dsp has no
    convolution (closest: StaticSampleDelay chains, delay.rs:308).

    Superblocks: the FDL partition size is the largest divisor of the
    base block size <= 64 (``_partition``) — a property of the GRAPH's
    block size, not of the program being traced — so state shapes are
    block-length invariant and ``process`` covers a k-block program by
    scanning k sub-blocks through the same FDL. Output is chunking-
    independent up to XLA's matmul-reduction scheduling (~1e-6
    relative), so the node is fully superblock-eligible."""

    may_set_done = False
    params = (pfloat("dry_wet", 1.0, range=(0.0, 1.0)),)
    # the IR array is runtime data (state), not trace config; its derived
    # structure (length, channels) is kept in the signature
    signature_exclude = ("pdefaults", "ir")

    def __init__(self, ir, inputs: int = 1, dry_wet: float = 1.0):
        ir = np.asarray(ir, dtype=np.float32)
        if ir.ndim == 1:
            ir = ir[None, :]
        if ir.ndim != 2 or ir.shape[1] < 1:
            raise ValueError("ir must be [L] or [channels, L]")
        self.ir = ir
        self.outputs = int(ir.shape[0])
        if inputs not in (1, self.outputs):
            raise ValueError(
                f"inputs must be 1 or {self.outputs} (the IR's channels)"
            )
        self.inputs = int(inputs)
        self.ir_length = int(ir.shape[1])
        self.pdefaults = {"dry_wet": float(dry_wet)}

    @classmethod
    def from_sound_file(cls, path: str, inputs: int = 1, dry_wet: float = 1.0):
        """Build a convolver from an IR file (wav/ogg/flac/mp3)."""
        from .buffer import Buffer

        buf = Buffer.from_sound_file(path)
        return cls(buf.data, inputs=inputs, dry_wet=dry_wet)

    def name(self) -> str:
        return f"Convolver[{self.outputs}ch x {self.ir_length}]"

    @staticmethod
    def _partition(block_size: int) -> int:
        """Largest divisor of the base block size <= 64 — fixed per
        graph, so state shapes don't depend on the traced block length."""
        return block_size // -(-block_size // 64)

    def init(self, ctx: AudioCtx):
        P = self._partition(ctx.block_size)
        K = max(1, -(-self.ir_length // P))
        C = self.outputs
        Cin = self.inputs
        F = P + 1
        pad = K * P - self.ir_length
        h = np.pad(self.ir, ((0, 0), (0, pad)))  # [C, K*P]
        parts = h.reshape(C, K, P).transpose(1, 0, 2)  # [K, C, P]
        spec = np.fft.rfft(
            np.concatenate([parts, np.zeros_like(parts)], axis=-1), axis=-1
        )  # [K, C, F] — host-side; device state stays real
        return {
            "Hr": jnp.asarray(spec.real, dtype=ctx.dtype),
            "Hi": jnp.asarray(spec.imag, dtype=ctx.dtype),
            "fdl_r": jnp.zeros((K, Cin, F), dtype=ctx.dtype),
            "fdl_i": jnp.zeros((K, Cin, F), dtype=ctx.dtype),
            "prev": jnp.zeros((Cin, P), dtype=ctx.dtype),
        }

    def _round(self, Hr, Hi, fdl_r, fdl_i, prev, x, dw, mats, dtype):
        """One P-sample FDL round: transform, push, spectral MAC, invert."""
        C = self.outputs
        P = prev.shape[-1]
        fwd_cos, fwd_msin, icos, isin = mats
        seg = jnp.concatenate([prev, x], axis=-1)  # [Cin, 2P]
        # HIGHEST precision: DEFAULT dispatches bf16 MXU passes on TPU,
        # which quantizes the audio to an 8-bit mantissa (~4e-3 relative)
        # — the documented <=2e-4 exactness bound only held on CPU before
        # round 5. The convolver is HBM-bound at ~35% of stream ceiling
        # (RESULTS.md roofline), so the extra MXU passes are not the
        # bottleneck.
        Xr = jnp.matmul(seg, fwd_cos, precision=lax.Precision.HIGHEST)
        Xi = jnp.matmul(seg, fwd_msin, precision=lax.Precision.HIGHEST)
        fdl_r = jnp.concatenate([Xr[None], fdl_r[:-1]], axis=0)
        fdl_i = jnp.concatenate([Xi[None], fdl_i[:-1]], axis=0)
        if self.inputs == C:
            sr, si = fdl_r, fdl_i
        else:  # mono input feeds every IR channel
            shape = fdl_r.shape[:1] + (C, fdl_r.shape[2])
            sr = jnp.broadcast_to(fdl_r[:, :1, :], shape)
            si = jnp.broadcast_to(fdl_i[:, :1, :], shape)
        # complex multiply-accumulate over partitions, in real pairs
        Yr = jnp.sum(sr * Hr - si * Hi, axis=0)  # [C, F]
        Yi = jnp.sum(sr * Hi + si * Hr, axis=0)
        y = jnp.matmul(Yr, icos, precision=lax.Precision.HIGHEST) + jnp.matmul(
            Yi, isin, precision=lax.Precision.HIGHEST
        )  # [C, 2P]  (MXU)
        wet = y[:, P:].astype(dtype)  # overlap-save valid half
        dry = x if self.inputs == C else jnp.broadcast_to(x[:1], (C, P))
        out = dw * wet + (1.0 - dw) * dry
        return fdl_r, fdl_i, out

    def process(self, ctx: AudioCtx, state, inputs, params):
        import jax

        B = ctx.block_size
        P = int(state["prev"].shape[-1])
        mats = tuple(jnp.asarray(m) for m in _dft_mats(P, ctx.dtype))
        dw = jnp.asarray(params["dry_wet"]).reshape(-1)  # [B] engine row
        if dw.shape[0] != B:
            dw = jnp.broadcast_to(dw[:1], (B,))  # scalar/legacy callers
        Hr, Hi = state["Hr"], state["Hi"]
        if B == P:
            fdl_r, fdl_i, out = self._round(
                Hr, Hi, state["fdl_r"], state["fdl_i"], state["prev"],
                inputs, dw, mats, ctx.dtype,
            )
            return {"Hr": Hr, "Hi": Hi, "fdl_r": fdl_r, "fdl_i": fdl_i,
                    "prev": inputs}, out
        # superblocked program: k sub-blocks through the same FDL
        k = B // P
        xs = (
            jnp.moveaxis(inputs.reshape(inputs.shape[0], k, P), 1, 0),
            dw.reshape(k, P),
        )

        def step(carry, x):
            fdl_r, fdl_i, prev = carry
            blk, dwk = x
            fdl_r, fdl_i, out = self._round(
                Hr, Hi, fdl_r, fdl_i, prev, blk, dwk, mats, ctx.dtype
            )
            return (fdl_r, fdl_i, blk), out

        (fdl_r, fdl_i, prev), outs = jax.lax.scan(
            step, (state["fdl_r"], state["fdl_i"], state["prev"]), xs
        )
        out = jnp.moveaxis(outs, 0, 1).reshape(self.outputs, B)
        return {"Hr": Hr, "Hi": Hi, "fdl_r": fdl_r, "fdl_i": fdl_i,
                "prev": prev}, out
