"""Sample buffers and buffer playback (reference: dsp/buffer.rs + ugens/buffer.rs)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pbool, pfloat, ptrigger
from ..primitives.time import Seconds


class Buffer:
    """Multichannel sample storage (dsp/buffer.rs:38-332 Buffer).

    Host-side numpy data ``[channels, frames]``; uploaded as a trace-time
    constant by UGens that read it."""

    def __init__(self, data: np.ndarray, sample_rate: int):
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 1:
            data = data[None, :]
        self.data = data
        self.sample_rate = int(sample_rate)

    @property
    def channels(self) -> int:
        return self.data.shape[0]

    @property
    def frames(self) -> int:
        return self.data.shape[1]

    def length_seconds(self) -> float:
        return self.frames / self.sample_rate

    def buf_rate_scale(self, server_sample_rate: int) -> float:
        """Playback step per output sample for rate 1.0 (buffer.rs semantics):
        buffer_sr / server_sr so the buffer plays at natural speed."""
        return self.sample_rate / float(server_sample_rate)

    def remove_dc(self) -> None:
        self.data = self.data - self.data.mean(axis=1, keepdims=True)

    @staticmethod
    def from_sound_file(path: str) -> "Buffer":
        """Load wav/ogg/mp3 (dsp/buffer.rs:154 from_sound_file parity; the
        compressed formats decode through the system codec libraries — see
        utils/codec.py. FLAC is absent from this image and raises)."""
        from ..utils.codec import read_sound_file

        data, sr = read_sound_file(path)
        return Buffer(data, sr)

    def save_to_disk(self, path: str, subtype: str = "float32") -> None:
        from ..utils.wav import write_wav

        write_wav(path, self.data, self.sample_rate, subtype)


class BufferReader(UGen):
    """Plays a Buffer with variable rate, looping, start/duration windows and
    a restart trigger; flags done at the end (ugens/buffer.rs:21-190).

    The read pointer is kept as integer frame + fractional part so long
    buffers don't lose precision in f32 (the reference uses an f64 pointer).
    """

    may_set_done = True

    params = (
        pfloat("rate", 1.0),
        pbool("looping", False),
        pfloat("start_s", 0.0),
        pfloat("duration_s", -1.0),
        pfloat("end_s", -1.0),
        ptrigger("t_restart"),
    )

    def __init__(
        self,
        buffer: Buffer,
        rate: float = 1.0,
        looping: bool = False,
        start_at: Optional[Seconds] = None,
    ):
        self.buffer = buffer
        self.inputs = 0
        self.outputs = buffer.channels
        start = start_at.to_secs_f64() if start_at is not None else 0.0
        self.pdefaults = {
            "rate": float(rate),
            "looping": bool(looping),
            "start_s": start,
            "duration_s": buffer.length_seconds() - start,
        }

    def init(self, ctx: AudioCtx):
        start_frame = self.pdefaults["start_s"] * self.buffer.sample_rate
        return {
            "ptr_int": jnp.asarray(int(start_frame), jnp.int32),
            "ptr_frac": jnp.asarray(start_frame - int(start_frame), ctx.dtype),
            "finished": jnp.zeros((), bool),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        B = ctx.block_size
        dtype = ctx.dtype
        buf = jnp.asarray(self.buffer.data.astype(dtype))  # [ch, frames] const
        n_frames = self.buffer.frames
        bsr = float(self.buffer.sample_rate)
        base_rate = self.buffer.buf_rate_scale(ctx.sample_rate)

        step = params["rate"].astype(dtype) * jnp.asarray(base_rate, dtype)

        def snap(x):
            # seconds->frames through the f32 param bus quantizes frame
            # boundaries (f32(0.0005)*48000 = 24.000002 — one sample LATE
            # past a 24-frame buffer): snap to the nearest frame inside
            # the f32 ulp band, mirroring the reference's exact f64
            # tesimal conversion (buffer.rs:110-120 init / start_s /
            # duration_s setters). Genuinely fractional ends sit far
            # outside the band.
            r = jnp.round(x)
            return jnp.where(jnp.abs(x - r) <= 5e-7 * jnp.abs(x), r, x)

        start_f = snap(params["start_s"] * bsr)
        dur = params["duration_s"]
        end_from_dur = start_f + jnp.where(
            dur < 0, float(n_frames), snap(dur * bsr)
        )
        end_s = params["end_s"]
        end_f = jnp.where(end_s < 0, end_from_dur, snap(end_s * bsr))

        def step_fn(carry, x):
            pi, pf, finished = carry
            restart = x["t_restart"]
            s_int = jnp.floor(x["start"]).astype(jnp.int32)
            pi = jnp.where(restart, s_int, pi)
            pf = jnp.where(restart, x["start"] - s_int.astype(dtype), pf)
            finished = finished & ~restart

            idx = jnp.clip(pi, 0, n_frames - 1)
            idx1 = jnp.clip(pi + 1, 0, n_frames - 1)
            frame = buf[:, idx] + (buf[:, idx1] - buf[:, idx]) * pf
            out = jnp.where(finished, jnp.zeros_like(frame), frame)

            pf = pf + x["step"]
            adv = jnp.floor(pf).astype(jnp.int32)
            pi = pi + adv
            pf = pf - adv.astype(dtype)

            pos = pi.astype(dtype) + pf
            past_end = pos >= x["end"]
            hit = past_end & ~finished
            do_loop = hit & x["looping"]
            pi = jnp.where(do_loop, s_int, pi)
            pf = jnp.where(do_loop, x["start"] - s_int.astype(dtype), pf)
            done = hit & ~x["looping"]
            finished = jnp.where(done, True, finished)
            return (pi, pf, finished), (out, done)

        xs = {
            "t_restart": params["t_restart"],
            "step": step,
            "start": start_f,
            "end": end_f,
            "looping": params["looping"] > 0,
        }
        carry0 = (state["ptr_int"], state["ptr_frac"], state["finished"])
        (pi, pf, finished), (out, done) = jax.lax.scan(step_fn, carry0, xs)
        new_state = {"ptr_int": pi, "ptr_frac": pf, "finished": finished}
        return new_state, jnp.swapaxes(out, 0, 1), done
