"""Delay UGens (reference: knaster_core_dsp/src/ugens/delay.rs).

Ring buffers live in the state pytree; the per-sample read/modify/write loop
runs in ``lax.scan`` with dynamic indexing. When the delay is guaranteed
longer than one block, :class:`StaticSampleDelay` takes a fully vectorized
block path (whole-block gather + scatter), mirroring the reference's
runtime block/sample path choice (delay.rs StaticSampleDelay::process) —
that's the path the reverb/FDN effects use, and it's fast on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import ParameterKind, pfloat
from ..primitives.time import Seconds


def _as_seconds(x) -> Seconds:
    return x if isinstance(x, Seconds) else Seconds.from_secs_f64(float(x))


class SampleDelay(UGen):
    """Integer-sample delay, no interpolation (delay.rs:14-50 SampleDelay).

    Good for triggers. Delay time in seconds, truncated to whole samples.
    A delay of 0 passes the input through (write happens before read)."""

    inputs = 1
    outputs = 1
    params = (pfloat("delay_time", 0.0, kind=ParameterKind.SECONDS),)

    def __init__(self, max_delay_length):
        self.max_delay_length = _as_seconds(max_delay_length)

    def batch_key(self):
        # equal max length => equal ring/state shapes: eligible for
        # auto-batching and chain collapse
        return (type(self), self.max_delay_length.to_secs_f64())

    def init(self, ctx: AudioCtx):
        n = max(1, int(self.max_delay_length.to_secs_f64() * ctx.sample_rate))
        self._length = n
        return {
            "buf": jnp.zeros((n,), ctx.dtype),
            "pos": jnp.zeros((), jnp.int32),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        L = self._length
        d = jnp.clip(
            (params["delay_time"] * ctx.sample_rate).astype(jnp.int32), 0, L - 1
        )

        def step(carry, x):
            buf, pos = carry
            buf = buf.at[pos].set(x["in"])
            out = buf[(pos + L - x["d"]) % L]
            return (buf, (pos + 1) % L), out

        (buf, pos), out = jax.lax.scan(
            step, (state["buf"], state["pos"]), {"in": inputs[0], "d": d}
        )
        return {"buf": buf, "pos": pos}, out[None, :]

    def mosaic_stage(self, ctx: AudioCtx):
        """Chain-kernel body (see UGen.mosaic_stage): the per-sample ring
        scan, vectorized. The ring is re-ordered oldest-first by a barrel
        roll (log2(L) static rolls selected by the bits of ``pos``), the
        per-sample read ``hist[L + i - d_i]`` becomes a one-hot select
        over the [buf | input] row (sum of one nonzero — exact), and the
        new ring content is rolled back to the scan's pos-anchored layout
        so state stays interchangeable with the scan executor mid-render.
        Exact for per-sample (audio-rate / mid-ramp) delay times."""
        import math

        from jax.experimental.pallas import tpu as pltpu

        B = ctx.block_size
        sr = float(ctx.sample_rate)
        L = max(1, int(self.max_delay_length.to_secs_f64() * sr))
        nbits = max(1, math.ceil(math.log2(L))) if L > 1 else 1
        W = L + B

        def droll(x, s, left):
            """Cyclic roll of a [1, n] row by traced scalar ``s`` (left or
            right): static power-of-two rolls selected by s's bits."""
            n = x.shape[1]
            for k in range(nbits):
                amt = (1 << k) % n
                if left:
                    amt = (n - amt) % n
                if amt == 0:
                    continue
                bit = ((s >> k) & 1) == 1
                x = jnp.where(bit, pltpu.roll(x, amt, axis=1), x)
            return x

        def fn(inputs, state, params):
            buf = state["buf"]              # [1, L] ring
            pos = state["pos"][0, 0]        # scalar i32
            d = jnp.clip(
                (params["delay_time"] * sr).astype(jnp.int32), 0, L - 1
            )                                # [1, B]
            ordered = droll(buf, pos, left=True)   # oldest-first
            hist = jnp.concatenate([ordered, inputs[0:1, :]], axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
            idx = L + lane - d               # in [1, L+B-1]
            wlane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            onehot = (idx.reshape(B, 1) == wlane).astype(hist.dtype)
            out = jnp.sum(onehot * hist, axis=1).reshape(1, B)
            tail = hist[:, B:]               # last L samples, oldest-first
            new_pos = pos + (B % L)          # pos < L, so one subtract wraps
            new_pos = jnp.where(new_pos >= L, new_pos - L, new_pos)
            new_buf = droll(tail, new_pos, left=False)
            return (
                {"buf": new_buf, "pos": new_pos.reshape(1, 1)},
                out,
            )

        return fn


class AllpassDelay(UGen):
    """Fractional delay with Schroeder allpass interpolation
    (delay.rs:53-205 AllpassDelay + AllpassInterpolator).

    The read head is re-anchored from the per-sample delay time, which is
    equivalent to the reference's set_delay_in_frames on parameter change.

    ``long=True`` declares the delay time will stay >= one block (echoes,
    reverb lines): reads then never alias in-block writes, the ring ops
    vectorize over the whole block and the interpolator becomes an affine
    scan — much faster on TPU. The effective delay is clamped to the block
    size in that mode. Leave ``long=False`` for flanger/chorus-length
    delays.

    ``min_delay_time`` (long mode only) additionally declares a lower
    bound the runtime delay will never cross; that bound becomes the
    node's ``superblock_cap`` so event-free stretches can run multi-block
    programs without the >=block clamp ever engaging. Without it a
    long-mode delay keeps the graph out of superblocking entirely — the
    clamp floor would otherwise grow with the program's block span and
    superblocked audio would diverge from per-block audio."""

    inputs = 1
    outputs = 1
    params = (pfloat("delay_time", 0.0, kind=ParameterKind.SECONDS),)

    def __init__(self, max_delay_time, long: bool = False, min_delay_time=None):
        self.max_delay_time = _as_seconds(max_delay_time)
        self.long = bool(long)
        # the long fast path clamps delays to >= one block: block-dependent
        self.block_invariant = not self.long
        self.min_delay_time = (
            None if min_delay_time is None else _as_seconds(min_delay_time)
        )

    def init(self, ctx: AudioCtx):
        n = max(2, int(self.max_delay_time.to_samples(ctx.sample_rate)))
        self._length = n
        if self.long and self.min_delay_time is not None:
            # superblocks are safe up to the declared minimum delay: the
            # >=block clamp never engages below it, so k-block programs
            # bit-match per-block rendering
            self.superblock_cap = min(
                n, int(self.min_delay_time.to_samples(ctx.sample_rate))
            )
        return {
            "buf": jnp.zeros((n,), ctx.dtype),
            "wp": jnp.zeros((), jnp.int32),
            # allpass interpolator state; reference inits prevs to 1.0
            "ap_in": jnp.ones((), ctx.dtype),
            "ap_out": jnp.ones((), ctx.dtype),
        }

    @staticmethod
    def _delay_geometry(delay_frames, L, dtype):
        """num_frames + allpass delta with the 0.5-frame trick
        (delay.rs set_delay_in_frames:160-178)."""
        nf_f = jnp.floor(delay_frames)
        delta = delay_frames - nf_f
        adjust = (delay_frames > 0.5) & (delta < 0.5)
        delta = jnp.where(adjust, delta + 1.0, delta)
        nf = nf_f.astype(jnp.int32) - adjust.astype(jnp.int32)
        nf = jnp.clip(nf, 0, L - 1)
        coeff = (1.0 - delta) / (1.0 + delta)
        return nf, coeff.astype(dtype)

    @staticmethod
    def _blockwise_read(state, nf, coeff, L, B, dtype):
        """Blockwise ring read + allpass interpolation (requires nf >= B).

        Returns (delayed [B], write_slots [B], ap_in', ap_out' fn) — the
        interpolator out[t] = coeff·raw[t] − coeff·out[t−1] + raw[t−1] is a
        1-pole affine recurrence, evaluated via associative scan."""
        from ..core.dsp import affine_scan_1d

        t = jnp.arange(B, dtype=jnp.int32)
        wp = state["wp"]
        rp = (wp + t + L - nf) % L
        raw = state["buf"][rp]
        raw_prev = jnp.concatenate([state["ap_in"][None], raw[:-1]])
        a = -coeff
        b = coeff * raw + raw_prev
        out_pre, _ = affine_scan_1d(a, b, state["ap_out"])
        delayed = a * out_pre + b
        return raw, delayed, (wp + t) % L

    def process(self, ctx: AudioCtx, state, inputs, params):
        L = self._length
        B = ctx.block_size
        df = jnp.clip(params["delay_time"] * ctx.sample_rate, 0.0, float(L))
        nf, coeff = self._delay_geometry(df, L, ctx.dtype)

        if self.long and L >= B:
            nf = jnp.maximum(nf, B)
            raw, delayed, wslots = self._blockwise_read(
                state, nf, coeff, L, B, ctx.dtype
            )
            buf = state["buf"].at[wslots].set(inputs[0])
            return {
                "buf": buf,
                "wp": (state["wp"] + B) % L,
                "ap_in": raw[-1],
                "ap_out": delayed[-1],
            }, delayed[None, :]

        def step(carry, x):
            buf, wp, ap_in, ap_out = carry
            rp = (wp + L - x["nf"]) % L
            raw = buf[rp]
            out = x["coeff"] * (raw - ap_out) + ap_in
            ap_out, ap_in = out, raw
            buf = buf.at[wp].set(x["in"])
            return (buf, (wp + 1) % L, ap_in, ap_out), out

        carry0 = (state["buf"], state["wp"], state["ap_in"], state["ap_out"])
        (buf, wp, ap_in, ap_out), out = jax.lax.scan(
            step, carry0, {"in": inputs[0], "nf": nf, "coeff": coeff}
        )
        return {"buf": buf, "wp": wp, "ap_in": ap_in, "ap_out": ap_out}, out[None, :]


class AllpassFeedbackDelay(UGen):
    """Schroeder allpass with feedback (delay.rs:210-305 AllpassFeedbackDelay):
        delayed = read(); write(delayed*fb + x); out = delayed - fb*written."""

    inputs = 1
    outputs = 1
    params = (
        pfloat("feedback", 0.0),
        pfloat("delay_time", 0.0, kind=ParameterKind.SECONDS),
    )

    def __init__(self, max_delay_time, feedback: float = 0.0,
                 long: bool = False, min_delay_time=None):
        self.max_delay_time = _as_seconds(max_delay_time)
        self.long = bool(long)  # see AllpassDelay.long / min_delay_time
        self.block_invariant = not self.long
        self.min_delay_time = (
            None if min_delay_time is None else _as_seconds(min_delay_time)
        )
        self.pdefaults = {
            "feedback": float(feedback),
            # default delay = max (reference previous_delay_time init)
            "delay_time": self.max_delay_time.to_secs_f64(),
        }

    def init(self, ctx: AudioCtx):
        n = max(2, int(self.max_delay_time.to_samples(ctx.sample_rate)))
        self._length = n
        if self.long and self.min_delay_time is not None:
            # superblocks are safe up to the declared minimum delay: the
            # >=block clamp never engages below it, so k-block programs
            # bit-match per-block rendering
            self.superblock_cap = min(
                n, int(self.min_delay_time.to_samples(ctx.sample_rate))
            )
        return {
            "buf": jnp.zeros((n,), ctx.dtype),
            "wp": jnp.zeros((), jnp.int32),
            # allpass interpolator state; reference inits prevs to 1.0
            "ap_in": jnp.ones((), ctx.dtype),
            "ap_out": jnp.ones((), ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        L = self._length
        B = ctx.block_size
        df = jnp.clip(params["delay_time"] * ctx.sample_rate, 0.0, float(L))
        nf, coeff = AllpassDelay._delay_geometry(df, L, ctx.dtype)
        fb = params["feedback"]

        if self.long and L >= B:
            nf = jnp.maximum(nf, B)
            raw, delayed, wslots = AllpassDelay._blockwise_read(
                state, nf, coeff, L, B, ctx.dtype
            )
            write = delayed * fb + inputs[0]
            buf = state["buf"].at[wslots].set(write)
            out = delayed - fb * write
            return {
                "buf": buf,
                "wp": (state["wp"] + B) % L,
                "ap_in": raw[-1],
                "ap_out": delayed[-1],
            }, out[None, :]

        def step(carry, x):
            buf, wp, ap_in, ap_out = carry
            rp = (wp + L - x["nf"]) % L
            raw = buf[rp]
            delayed = x["coeff"] * (raw - ap_out) + ap_in
            ap_out, ap_in = delayed, raw
            write = delayed * x["fb"] + x["in"]
            buf = buf.at[wp].set(write)
            out = delayed - x["fb"] * write
            return (buf, (wp + 1) % L, ap_in, ap_out), out

        carry0 = (state["buf"], state["wp"], state["ap_in"], state["ap_out"])
        (buf, wp, ap_in, ap_out), out = jax.lax.scan(
            step, carry0, {"in": inputs[0], "nf": nf, "coeff": coeff, "fb": fb}
        )
        return {"buf": buf, "wp": wp, "ap_in": ap_in, "ap_out": ap_out}, out[None, :]


# ---------------------------------------------------------------------------
# StaticSampleDelay: fixed-length delay building block (not a UGen)
# ---------------------------------------------------------------------------
class StaticSampleDelay:
    """Fixed-length sample delay, functional state (delay.rs:308-416).

    Used as a building block by reverbs/FDNs (e.g. airwindows Galactic).
    When ``length > block_size`` the whole block is processed with one
    gather + one scatter (the vectorized fast path)."""

    def __init__(self, delay_length_in_samples: int):
        if delay_length_in_samples <= 0:
            raise ValueError("delay_length_in_samples must be > 0")
        self.length = int(delay_length_in_samples)

    def make_state(self, dtype=np.float32):
        return {
            "buf": jnp.zeros((self.length,), dtype),
            "pos": jnp.zeros((), jnp.int32),
        }

    def process_block(self, state, x):
        """Delay a whole block: returns (state', delayed_block).

        Equivalent to per-sample read-then-write with a ring buffer."""
        B = x.shape[-1]
        L = self.length
        buf, pos = state["buf"], state["pos"]
        if L > B:
            idx = (pos + jnp.arange(B, dtype=jnp.int32)) % L
            out = buf[idx]
            buf = buf.at[idx].set(x)
            pos = (pos + B) % L
            return {"buf": buf, "pos": pos}, out

        def step(carry, xi):
            buf, pos = carry
            out = buf[pos]
            buf = buf.at[pos].set(xi)
            return (buf, (pos + 1) % L), out

        (buf, pos), out = jax.lax.scan(step, (buf, pos), x)
        return {"buf": buf, "pos": pos}, out

    def read_at_lin(self, state, index):
        """Linear-interpolated read at a (possibly traced) fractional index."""
        L = self.length
        buf = state["buf"]
        low = jnp.floor(index).astype(jnp.int32) % L
        high = (low + 1) % L
        frac = index - jnp.floor(index)
        return buf[low] + (buf[high] - buf[low]) * frac
