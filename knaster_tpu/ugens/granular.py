"""Granular synthesis (beyond reference — knaster has no granular engine;
its closest primitive is BufferReader, ugens/buffer.rs:21-190, whose
pointer/rate semantics the per-grain readers follow).

``GrainPlayer`` renders a cloud of short windowed buffer excerpts
("grains") from a shared source :class:`~knaster_tpu.ugens.buffer.Buffer`.
A deterministic scheduler spawns grains at ``density`` Hz into a
fixed pool of ``grains`` slots (round-robin reuse); every per-grain
random quantity (position/rate jitter, stereo spread) comes from a
counter-keyed Threefry hash, so renders are reproducible for a given
``seed`` and independent of block size — the same determinism contract
as the noise UGens (see ugens/noise.py).

TPU mapping: only the spawn *scheduler* is a serial recurrence (a
two-scalar ``lax.scan``: countdown + spawn counter). Everything else is
reconstructed closed-form as fully parallel ``[B, G]`` compute: spawn j
in the block lands in slot ``(counter0 + j) mod G`` (round-robin), so
the last spawn governing slot g at sample i has the closed-form index
``offs + G * floor((n_i - 1 - offs) / G)`` with ``offs = (g - g0) mod G``
and ``n_i`` the scheduler's applied-spawn count — the six per-slot event
tables route through ONE one-hot matmul on the MXU (bit-exact at HIGHEST
precision; gathers above a size cap) instead of a one-hot select per
sample, grain randomness is a batched Threefry table instead of one hash
per sample on the scan's critical path, and the two interpolation reads
are one ``[B, G]`` gather pair instead of B serial G-lane gathers.
Measured on the v5e this is the difference between 2.0x and 11.2x
realtime at 64 grain slots (benchmarks/_gran_probe.py, suite.py
granular); ``_process_scan`` keeps the original
per-sample recurrence and a test pins parity between the two (carried
state bit-identical; outputs to ULP scale — the window cos evaluates
at different SIMD widths between the paths).
Spawns are sample-accurate: the countdown scheduler fires between any
two samples, and the ``t_spawn`` trigger forces a grain at its exact
frame (and re-anchors the scheduler), so sequenced granular lines ride
the engine's event machinery like any other trigger.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat, pinteger, ptrigger
from .buffer import Buffer

_WINDOWS = ("hann", "triangle", "rect")

# Size cap (elements) on the one-hot event-routing matrix [B*G, B]: below
# it the event tables route through one MXU matmul (bit-exact at HIGHEST
# precision, ~2.6x the gather path); above it — superblocked programs with
# large trace-time B — fall back to gathers instead of materializing a
# quadratic matrix. 2^24 f32 = 67 MB (B=512 at G=64).
_EVMM_MAX_ONEHOT = 1 << 24


class GrainPlayer(UGen):
    """Granular cloud over a shared source buffer (stereo out).

    Parameters (all block-rate-smoothable, sampled at the spawn frame for
    per-grain frozen quantities):

    - ``density``: grains per second (scheduler rate). Capped at the
      sample rate (at most one spawn per frame).
    - ``grain_dur``: grain length in seconds.
    - ``rate``: playback rate inside each grain (1.0 = natural speed,
      scaled by buffer/server sample-rate ratio like BufferReader).
    - ``pos``: source position in seconds where grains start.
    - ``pos_jitter``: uniform ± spread (seconds) added to ``pos``.
    - ``rate_jitter``: per-grain pitch spread in octaves: the frozen rate
      is ``rate * 2**(u * rate_jitter)`` with u uniform in [-1, 1].
    - ``pan_spread``: per-grain equal-power pan position spread (0 = all
      grains center, 1 = full stereo field).
    - ``amp``: live output gain (applied per sample, not frozen).
    - ``t_spawn``: trigger — force-spawn a grain at this exact frame and
      re-anchor the scheduler's countdown.

    ``loop=True`` wraps source reads around the buffer end; otherwise
    out-of-range reads are silent. Reads use channel ``channel`` of the
    source (a granular cloud is a mono->stereo texture; feed per-channel
    players for true stereo sources).
    """

    params = (
        pfloat("density", 10.0, range=(0.01, 48000.0), logarithmic=True),
        pfloat("grain_dur", 0.1, range=(0.0005, 10.0), logarithmic=True),
        pfloat("rate", 1.0, range=(-8.0, 8.0)),
        pfloat("pos", 0.0),
        pfloat("pos_jitter", 0.0),
        pfloat("rate_jitter", 0.0, range=(0.0, 4.0)),
        pfloat("pan_spread", 1.0, range=(0.0, 1.0)),
        pfloat("amp", 1.0),
        ptrigger("t_spawn"),
    )

    def __init__(
        self,
        buffer: Buffer,
        grains: int = 32,
        seed: int = 0,
        window: str = "hann",
        loop: bool = True,
        channel: int = 0,
        max_rate: float | None = None,
        **defaults,
    ):
        if window not in _WINDOWS:
            raise ValueError(f"window must be one of {_WINDOWS}")
        if not 1 <= grains <= 1024:
            raise ValueError("grains must be in [1, 1024]")
        if not 0 <= channel < buffer.channels:
            raise ValueError(f"channel {channel} out of range for "
                             f"{buffer.channels}-channel buffer")
        if max_rate is not None and not 0 < float(max_rate) <= 8.0:
            raise ValueError("max_rate must be in (0, 8]")
        self.buffer = buffer
        self.grains = int(grains)
        self.seed = int(seed)
        self.window = window
        self.loop = bool(loop)
        self.channel = int(channel)
        # max_rate: declare a bound on the per-grain playback step
        # (|rate * 2^(u*rate_jitter)| is CLAMPED to it) and the source
        # reads switch from per-element gathers to contiguous tile
        # windows + one-hot matmuls — the sampler's bounded-rate recipe
        # (DESIGN_NOTES "Windowed resampling") at grain-cloud scale.
        # Exact: for B <= G the round-robin spawner can't hit one slot
        # twice in a block, so a [continuing | fresh] double window per
        # (chunk, slot) covers every tap; larger B (superblocks) falls
        # back to the gather read, which is bit-identical.
        self.max_rate = None if max_rate is None else float(max_rate)
        self.inputs = 0
        self.outputs = 2
        self.pdefaults = dict(defaults)
        self._gr_cache: dict = {}

    def batch_key(self):
        # the seed lives in STATE (not closed over), so same-config
        # players over the same Buffer object auto-batch into one vmapped
        # call — "a texture of 64 grain clouds" runs at VPU/MXU width.
        # The buffer is identified by object identity: its data is a
        # trace-time constant, so only nodes sharing the same Buffer may
        # share a traced process.
        return (type(self), self.grains, self.window, self.loop,
                self.channel, self.max_rate, id(self.buffer))

    def init(self, ctx: AudioCtx):
        G = self.grains
        dtype = ctx.dtype
        return {
            # per-node randomness seed (state, so batched nodes differ)
            "seed": jnp.asarray(self.seed, jnp.uint32),
            # scheduler: samples until the next natural spawn
            "countdown": jnp.zeros((), dtype),
            # grains spawned so far (Threefry key + round-robin slot)
            "counter": jnp.zeros((), jnp.uint32),
            # per-slot grain state; dur == 0 marks a free slot
            "age": jnp.zeros((G,), jnp.int32),
            "dur": jnp.zeros((G,), dtype),
            "src0": jnp.zeros((G,), dtype),
            "step": jnp.zeros((G,), dtype),
            "gl": jnp.zeros((G,), dtype),
            "gr": jnp.zeros((G,), dtype),
        }

    def _window(self, ph, dtype):
        if self.window == "hann":
            return (np.float32(0.5)
                    - np.float32(0.5) * jnp.cos(np.float32(2 * np.pi) * ph)
                    ).astype(dtype)
        if self.window == "triangle":
            return (np.float32(1.0)
                    - jnp.abs(np.float32(2.0) * ph - np.float32(1.0))
                    ).astype(dtype)
        return jnp.ones_like(ph)

    def _spawn_quantities(self, ctx: AudioCtx, params):
        """Per-sample spawn-time quantities (vectorized over the block);
        spawns read sample i's row."""
        dtype = ctx.dtype
        sr = float(ctx.sample_rate)
        bsr = float(self.buffer.sample_rate)
        base_step = self.buffer.buf_rate_scale(ctx.sample_rate)
        period = sr / jnp.clip(params["density"].astype(dtype), 0.01, sr)
        dur_smp = jnp.maximum(params["grain_dur"].astype(dtype) * sr, 1.0)
        pos_f = params["pos"].astype(dtype) * bsr
        posj_f = params["pos_jitter"].astype(dtype) * bsr
        rate_p = params["rate"].astype(dtype) * np.float32(base_step)
        ratej = params["rate_jitter"].astype(dtype)
        spread = params["pan_spread"].astype(dtype)
        return period, dur_smp, pos_f, posj_f, rate_p, ratej, spread

    # ------------------------------------------------- windowed source read

    # samples per window chunk. Window length is W = C * (1 +
    # ceil((max_step*(C-1) + 2) / C)); round-5 sweep on the v5e: C=16 ->
    # 112 rt players, C=8 -> 103, C=4 -> 61 — the narrower tile rows cost
    # more than the smaller per-sample window saves, so the sampler's
    # C=16 stands. Env-tunable for future hardware.
    _GR_CHUNK = int(_os.environ.get("KNASTER_GRAN_CHUNK", "16"))

    def _max_step(self, ctx):
        """The clamp bound on a grain's per-sample source step:
        ``max_rate`` in natural-speed units times the buffer/server rate
        scale (exactly how ``rate`` maps to steps)."""
        return self.max_rate * self.buffer.buf_rate_scale(ctx.sample_rate)

    def _gr_nT(self, ctx):
        """Tiles per half-window: covers one chunk's position span at the
        clamped step bound, plus the +1 tap and base-alignment slack."""
        import numpy as np

        C = self._GR_CHUNK
        span = abs(self._max_step(ctx)) * (C - 1)
        return 1 + int(np.ceil((span + 2.0) / C))

    def _gr_tiles(self, ctx, dtype):
        """Extended source reshaped [rows, C] (trace-time, cached):
        loop-periodic so window reads reproduce mod-L taps; one-shot
        appends zeros (out-of-range lanes are masked by ``valid``)."""
        import numpy as np

        C = self._GR_CHUNK
        nT = self._gr_nT(ctx)
        key = (C, nT)
        if key not in self._gr_cache:
            src = self.buffer.data[self.channel].astype(np.float32)
            L = self.buffer.frames
            W = nT * C
            rows = -(-(L + W + C) // C) + nT + 1
            if self.loop:
                ext = np.resize(src, rows * C)
            else:
                ext = np.concatenate(
                    [src, np.zeros(rows * C - L, np.float32)]
                )
            self._gr_cache[key] = ext.reshape(rows, C)
        return jnp.asarray(self._gr_cache[key], dtype)

    def _read_windowed(self, ctx, pc, pf, has, src, active, dtype):
        """Tap extraction via contiguous tile windows + one-hot matmuls
        (bit-exact vs :meth:`_read_source`): per (chunk, slot), a window
        anchored at the CONTINUING grain trajectory and one at the FRESH
        (this-block-spawned) trajectory; each sample selects its half.
        ``pc``/``pf`` are those two arithmetic position planes and ``src``
        the per-sample selected positions ([B, G]); exact because B <= G
        means at most one spawn per slot per block."""
        import numpy as np
        from jax import lax

        B, G = src.shape
        C = self._GR_CHUNK
        nc = B // C
        nT = self._gr_nT(ctx)
        W = nT * C
        L = self.buffer.frames
        tiles = self._gr_tiles(ctx, dtype)
        rows = tiles.shape[0]

        fsrc = jnp.floor(src)
        frac = src - fsrc
        idx = fsrc.astype(jnp.int32)
        if self.loop:
            valid = active
        else:
            valid = active & (idx >= 0) & (idx < L - 1)

        def base_of(x):
            """Window base per (chunk, slot) from the chunk's endpoint
            minimum (trajectories are affine within a chunk — the clamp
            kink in pf only flattens one end, so endpoints still bound).
            Returns (q tile row [nc, G], shift [nc, G] float multiple of
            L to subtract from positions; 0 outside loop mode)."""
            xc = x.reshape(nc, C, G)
            ends = jnp.minimum(xc[:, 0, :], xc[:, C - 1, :])
            f = jnp.floor(ends)
            if self.loop:
                b = jnp.mod(f.astype(jnp.int32), L)
                shift = f - b.astype(dtype)
                q = b // C
            else:
                b = jnp.clip(f.astype(jnp.int32), 0, rows * C - W)
                q = b // C
                shift = jnp.zeros_like(f)
            return jnp.minimum(q, rows - nT), shift

        q_c, sh_c = base_of(pc)
        q_f, sh_f = base_of(pf)

        def win_of(q):
            parts = [tiles[q + k] for k in range(nT)]  # [nc, G, C] each
            return jnp.concatenate(parts, axis=-1)     # [nc, G, W]

        win = jnp.concatenate([win_of(q_c), win_of(q_f)], axis=-1)

        def w_of(x, q, sh):
            xc = x.reshape(nc, C, G)
            return (
                jnp.floor(xc - sh[:, None, :]).astype(jnp.int32)
                - (q * C)[:, None, :]
            )

        w_c = w_of(pc, q_c, sh_c)
        w_f = w_of(pf, q_f, sh_f) + W
        wsel = jnp.where(has.reshape(nc, C, G), w_f, w_c)
        fr = frac.reshape(nc, C, G)

        j = jnp.arange(2 * W)
        m0 = (wsel[..., None] == j).astype(dtype)
        m1 = ((wsel + 1)[..., None] == j).astype(dtype)
        if _os.environ.get("KNASTER_GRAN_W", "ew") == "ew":
            # elementwise multiply + lane reduce: XLA fuses the one-hot
            # producer into the reduction (no materialized [.., 2W]
            # weight operand); measured ~2x the einsum form at the suite
            # shapes on the v5e (benchmarks/granular_probe.py). Same
            # float ops per output as the einsum at HIGHEST (0/1 weights,
            # two nonzero products), so bit-parity with the gather path
            # holds identically.
            s0 = jnp.sum(m0 * win[:, None], axis=-1)
            s1 = jnp.sum(m1 * win[:, None], axis=-1)
        else:
            s0 = jnp.einsum("ncgw,ngw->ncg", m0, win,
                            precision=lax.Precision.HIGHEST)
            s1 = jnp.einsum("ncgw,ngw->ncg", m1, win,
                            precision=lax.Precision.HIGHEST)
        # the gather path's exact lerp form (_read_source):
        # s0*(1-frac) + s1*frac
        s = (s0 * (np.float32(1.0) - fr) + s1 * fr).reshape(B, G)
        return s, valid

    def _read_source(self, src, active, dtype):
        """Linear-interpolated source read with loop/clip semantics; `src`
        and `active` are any matching shape. The returned sample is only
        meaningful where ``valid`` is set (callers mask with it).

        Two plain gathers, deliberately: fusing both interpolation taps
        into one ``lax.gather`` with ``slice_sizes=(2,)`` is bit-exact but
        measured perf-NEUTRAL on the v5e — TPU gather cost scales with
        total elements fetched, not gather-op count (DESIGN_NOTES
        "Gathers bill per element"), so keep the simpler form."""
        n_frames = self.buffer.frames
        buf0 = jnp.asarray(self.buffer.data[self.channel].astype(dtype))
        idx = jnp.floor(src)
        frac = src - idx
        idx = idx.astype(jnp.int32)
        if self.loop:
            i0 = jnp.mod(idx, n_frames)
            i1 = jnp.mod(idx + 1, n_frames)
            valid = active
        else:
            i0 = jnp.clip(idx, 0, n_frames - 1)
            i1 = jnp.clip(idx + 1, 0, n_frames - 1)
            valid = active & (idx >= 0) & (idx < n_frames - 1)
        s = buf0[i0] * (np.float32(1.0) - frac) + buf0[i1] * frac
        return s, valid

    def process(self, ctx: AudioCtx, state, inputs, params):
        """Closed-form vectorized path (see module docstring); carries
        bit-identical state vs :meth:`_process_scan` (the per-sample
        recurrence), outputs equal to ULP scale."""
        G = self.grains
        dtype = ctx.dtype
        key = jax.random.key(state["seed"])
        half_pi = np.float32(np.pi / 2)
        half = np.float32(0.5)
        (period, dur_smp, pos_f, posj_f, rate_p, ratej,
         spread) = self._spawn_quantities(ctx, params)
        B = period.shape[0]
        i_ar = jnp.arange(B, dtype=jnp.int32)

        # phase 1 — the only true recurrence: the countdown scheduler.
        # Two scalar carries; emits each sample's due flag and the
        # pre-increment spawn counter (the Threefry key and slot of a
        # spawn at that sample).
        def sched(carry, x):
            countdown, counter = carry
            countdown = countdown - np.float32(1.0)
            due = (countdown <= 0.0) | x["t"]
            countdown = jnp.where(
                due,
                jnp.where(x["t"], x["p"], countdown + x["p"]),
                countdown,
            )
            return ((countdown, counter + due.astype(jnp.uint32)),
                    (due, counter))

        # Unrolling the two-scalar scheduler removes the per-iteration
        # loop overhead that dominates a body this small: 8.8x -> 11.4x rt
        # on the v5e through the full graph program (probe "unroll",
        # benchmarks/_gran_probe.py). TPU-only: the 64 unrolled body copies
        # multiply CPU compile time ~20x (283 s vs 13 s per test program)
        # for no CPU benefit, so the virtual-mesh test/gate programs keep
        # the rolled loop. Capped so superblocked programs (large
        # trace-time B) don't grow without bound.
        unroll = min(B, 64) if jax.default_backend() not in ("cpu",) else 1
        (countdown_end, counter_end), (due, ctr_pre) = jax.lax.scan(
            sched, (state["countdown"], state["counter"]),
            {"t": params["t_spawn"], "p": period}, unroll=unroll)

        # phase 2 — everything else is parallel. Event j (the j-th spawn in
        # this block) happens at sample s_of_e[j] and lands in slot
        # (counter0 + j) mod G.
        ctr0 = state["counter"]
        e_local = (ctr_pre - ctr0).astype(jnp.int32)   # spawns before i
        n_applied = e_local + due.astype(jnp.int32)    # spawns applied at i
        s_of_e = jnp.zeros(B, jnp.int32).at[
            jnp.where(due, e_local, B)].set(i_ar, mode="drop")

        # per-event randomness: a batched Threefry table, same values as
        # fold_in(key, counter) at each spawn
        ev_ctr = ctr0 + jnp.arange(B, dtype=jnp.uint32)
        u = jax.vmap(
            lambda c: jax.random.uniform(jax.random.fold_in(key, c), (3,),
                                         minval=-1.0, maxval=1.0)
        )(ev_ctr).astype(dtype)                        # [B, 3]
        ev_dur = dur_smp[s_of_e]
        ev_src0 = pos_f[s_of_e] + posj_f[s_of_e] * u[:, 0]
        ev_step = rate_p[s_of_e] * jnp.exp2(u[:, 1] * ratej[s_of_e])
        if self.max_rate is not None:
            ms = np.float32(abs(self._max_step(ctx)))
            ev_step = jnp.clip(ev_step, -ms, ms)
        pan = u[:, 2] * spread[s_of_e]
        angle = (pan * half + half) * half_pi
        ev_gl = jnp.cos(angle)
        ev_gr = jnp.sin(angle)

        # round-5 A/B on the v5e (suite granular_bank, 64x64): event
        # reconstruction via the one-hot matmul measured 112 rt players vs
        # 104 for the [G]-lane scan replay below — both exact selections
        # of the same event quantities; the scan stays selectable (and is
        # the closer mirror of _process_scan's semantics).
        ev_mode = _os.environ.get("KNASTER_GRAN_EV", "matmul")
        if ev_mode == "scan":
            # sequential replay of the block's spawns: a [G]-lane scan
            # over the block (the _process_scan event semantics, but ONLY
            # for the event tables — everything downstream stays
            # closed-form). Replaces the [B*G, B] one-hot event matmul,
            # whose materialized one-hot cost ~1 MB per player per block
            # (64 MB/block at the suite's 64 players). Values are
            # identical: both paths are exact selections of the same
            # per-event quantities; the per-sample attribute expressions
            # index the same elements the ev_* tables gather.
            e_local_c = jnp.clip(e_local, 0, B - 1)
            u_s = u[e_local_c]                          # [B, 3]
            step_s = rate_p * jnp.exp2(u_s[:, 1] * ratej)
            if self.max_rate is not None:
                ms = np.float32(abs(self._max_step(ctx)))
                step_s = jnp.clip(step_s, -ms, ms)
            ang_s = (u_s[:, 2] * spread * half + half) * half_pi
            g_iota = jnp.arange(G, dtype=jnp.int32)
            xs_ev = {
                "due": due,
                "slot": (ctr_pre % np.uint32(G)).astype(jnp.int32),
                "dur": dur_smp,
                "src0": pos_f + posj_f * u_s[:, 0],
                "step": step_s,
                "gl": jnp.cos(ang_s),
                "gr": jnp.sin(ang_s),
                "i": i_ar,
            }
            carry0 = (state["dur"], state["src0"], state["step"],
                      state["gl"], state["gr"],
                      jnp.zeros((G,), jnp.int32),
                      jnp.zeros((G,), bool))

            def ev_body(c, x):
                cdur, csrc, cstep, cgl, cgr, csfe, chas = c
                upd = x["due"] & (g_iota == x["slot"])
                c2 = (jnp.where(upd, x["dur"], cdur),
                      jnp.where(upd, x["src0"], csrc),
                      jnp.where(upd, x["step"], cstep),
                      jnp.where(upd, x["gl"], cgl),
                      jnp.where(upd, x["gr"], cgr),
                      jnp.where(upd, x["i"], csfe),
                      chas | upd)
                return c2, c2

            unroll_ev = (min(B, 64)
                         if jax.default_backend() not in ("cpu",) else 1)
            _, ys = jax.lax.scan(ev_body, carry0, xs_ev, unroll=unroll_ev)
            dur, src0, step, gl, gr, sfe_y, has = ys
            age = jnp.where(has, i_ar[:, None] - sfe_y,
                            state["age"][None, :] + (i_ar[:, None] + 1))
            fresh_src0, fresh_step = src0[B - 1], step[B - 1]
            fresh_sfe = sfe_y[B - 1]
        else:
            # last event governing slot g at sample i, closed form: events
            # hitting slot g are j = offs, offs+G, offs+2G, ... with
            # offs = (g - counter0) mod G; the latest with j < n_applied[i]
            # is offs + G * floor((n-1-offs)/G) (valid iff n > offs).
            g0 = (ctr0 % np.uint32(G)).astype(jnp.int32)
            offs = jnp.mod(jnp.arange(G, dtype=jnp.int32) - g0, G)[None, :]
            n_bg = n_applied[:, None]
            has = n_bg > offs                              # [B, G]
            j = jnp.clip(offs + G * ((n_bg - 1 - offs) // G), 0, B - 1)

            # Gathering the six event tables at [B, G] indices serializes
            # on TPU: route them through ONE one-hot matmul on the MXU —
            # onehot(j) [B*G, B] @ stacked tables [B, 6] at HIGHEST
            # precision — bit-exact vs the gathers (exact 0/1 rows,
            # full-f32 passes), measured 4.3x -> 11.2x realtime at G=64,
            # B=64 on the v5e (round 3). The one-hot is [B*G, B], so for
            # superblocked programs (large trace-time B) fall back to
            # gathers above a size cap rather than materialize a
            # quadratic matrix.
            if B * G * B <= _EVMM_MAX_ONEHOT:
                tab = jnp.stack([ev_dur, ev_src0, ev_step, ev_gl, ev_gr,
                                 s_of_e.astype(dtype)], axis=1)  # [B, 6]
                onehot = (j.reshape(-1, 1) ==
                          jnp.arange(B, dtype=jnp.int32)[None, :]
                          ).astype(dtype)
                vals = jnp.matmul(
                    onehot, tab,
                    precision=jax.lax.Precision.HIGHEST).reshape(B, G, 6)
                ev_dur_j, ev_src0_j, ev_step_j = (vals[..., 0], vals[..., 1],
                                                  vals[..., 2])
                ev_gl_j, ev_gr_j = vals[..., 3], vals[..., 4]
                s_of_e_j = vals[..., 5].astype(jnp.int32)
            else:
                ev_dur_j, ev_src0_j, ev_step_j = (ev_dur[j], ev_src0[j],
                                                  ev_step[j])
                ev_gl_j, ev_gr_j, s_of_e_j = ev_gl[j], ev_gr[j], s_of_e[j]

            dur = jnp.where(has, ev_dur_j, state["dur"][None, :])
            src0 = jnp.where(has, ev_src0_j, state["src0"][None, :])
            step = jnp.where(has, ev_step_j, state["step"][None, :])
            gl = jnp.where(has, ev_gl_j, state["gl"][None, :])
            gr = jnp.where(has, ev_gr_j, state["gr"][None, :])
            age = jnp.where(has, i_ar[:, None] - s_of_e_j,
                            state["age"][None, :] + (i_ar[:, None] + 1))
            fresh_src0, fresh_step = ev_src0_j[B - 1], ev_step_j[B - 1]
            fresh_sfe = s_of_e_j[B - 1]

        # identical per-(sample, slot) formulas as the scan body
        a = age.astype(dtype)
        active = a < dur
        ph = a / dur
        w = jnp.where(active, self._window(ph, dtype), 0.0)
        src = src0 + a * step
        if (self.max_rate is not None and B <= G
                and B % self._GR_CHUNK == 0):
            # bounded-rate windowed read (see __init__): continuing and
            # fresh trajectories as separate affine planes — identical
            # values to ``src`` on the samples each governs
            pc = (state["src0"][None, :]
                  + (state["age"][None, :] + (i_ar[:, None] + 1)
                     ).astype(dtype) * state["step"][None, :])
            ev_src0_g = fresh_src0
            ev_step_g = fresh_step
            s_of_e_g = fresh_sfe
            af = jnp.maximum(i_ar[:, None] - s_of_e_g[None, :], 0
                             ).astype(dtype)
            pf = ev_src0_g[None, :] + af * ev_step_g[None, :]
            s, valid = self._read_windowed(
                ctx, pc, pf, has, src, active, dtype
            )
        else:
            s, valid = self._read_source(src, active, dtype)
        sig = jnp.where(valid, w * s, 0.0)
        amp = params["amp"].astype(dtype)
        outl = jnp.sum(sig * gl, axis=1) * amp
        outr = jnp.sum(sig * gr, axis=1) * amp

        new_state = {
            "seed": state["seed"],
            "countdown": countdown_end, "counter": counter_end,
            "age": age[-1], "dur": dur[-1], "src0": src0[-1],
            "step": step[-1], "gl": gl[-1], "gr": gr[-1],
        }
        return new_state, jnp.stack([outl, outr])

    def _process_scan(self, ctx: AudioCtx, state, inputs, params):
        """The original per-sample recurrence (one ``lax.scan`` over the
        block, ``[G]``-lane carry, one-hot slot updates). Kept as the
        executable specification: tests assert the vectorized ``process``
        is bit-identical to this path."""
        G = self.grains
        dtype = ctx.dtype
        n_frames = self.buffer.frames
        buf0 = jnp.asarray(self.buffer.data[self.channel].astype(dtype))
        lanes = jnp.arange(G, dtype=jnp.uint32)
        key = jax.random.key(state["seed"])
        half_pi = np.float32(np.pi / 2)

        (period, dur_smp, pos_f, posj_f, rate_p, ratej,
         spread) = self._spawn_quantities(ctx, params)

        def step_fn(carry, x):
            countdown, counter, age, dur, src0, step, gl, gr = carry

            countdown = countdown - np.float32(1.0)
            due = (countdown <= 0.0) | x["t_spawn"]
            # re-anchor on trigger; accumulate the fractional phase on
            # natural spawns so mean density is exact
            countdown = jnp.where(
                due,
                jnp.where(x["t_spawn"], x["period"], countdown + x["period"]),
                countdown,
            )

            # deterministic per-grain randomness keyed by the spawn counter
            u = jax.random.uniform(
                jax.random.fold_in(key, counter), (3,),
                minval=-1.0, maxval=1.0
            ).astype(dtype)
            slot_hit = (lanes == counter % np.uint32(G)) & due

            new_src0 = x["pos"] + x["posj"] * u[0]
            new_step = x["rate"] * jnp.exp2(u[1] * x["ratej"])
            if self.max_rate is not None:
                ms = np.float32(abs(self._max_step(ctx)))
                new_step = jnp.clip(new_step, -ms, ms)
            pan = u[2] * x["spread"]
            angle = (pan * np.float32(0.5) + np.float32(0.5)) * half_pi

            age = jnp.where(slot_hit, 0, age + 1)
            dur = jnp.where(slot_hit, x["dur"], dur)
            src0 = jnp.where(slot_hit, new_src0, src0)
            step = jnp.where(slot_hit, new_step, step)
            gl = jnp.where(slot_hit, jnp.cos(angle), gl)
            gr = jnp.where(slot_hit, jnp.sin(angle), gr)
            counter = counter + due.astype(jnp.uint32)

            a = age.astype(dtype)
            active = a < dur
            ph = a / dur
            w = jnp.where(active, self._window(ph, dtype), 0.0)
            src = src0 + a * step
            idx = jnp.floor(src)
            frac = src - idx
            idx = idx.astype(jnp.int32)
            if self.loop:
                i0 = jnp.mod(idx, n_frames)
                i1 = jnp.mod(idx + 1, n_frames)
                valid = active
            else:
                i0 = jnp.clip(idx, 0, n_frames - 1)
                i1 = jnp.clip(idx + 1, 0, n_frames - 1)
                valid = active & (idx >= 0) & (idx < n_frames - 1)
            s = buf0[i0] * (np.float32(1.0) - frac) + buf0[i1] * frac
            sig = jnp.where(valid, w * s, 0.0)
            outl = jnp.sum(sig * gl) * x["amp"]
            outr = jnp.sum(sig * gr) * x["amp"]
            carry = (countdown, counter, age, dur, src0, step, gl, gr)
            return carry, (outl, outr)

        xs = {
            "t_spawn": params["t_spawn"],
            "period": period,
            "dur": dur_smp,
            "pos": pos_f,
            "posj": posj_f,
            "rate": rate_p,
            "ratej": ratej,
            "spread": spread,
            "amp": params["amp"].astype(dtype),
        }
        carry0 = (state["countdown"], state["counter"], state["age"],
                  state["dur"], state["src0"], state["step"],
                  state["gl"], state["gr"])
        carry, (outl, outr) = jax.lax.scan(step_fn, carry0, xs)
        (countdown, counter, age, dur, src0, step, gl, gr) = carry
        new_state = {
            "seed": state["seed"],
            "countdown": countdown, "counter": counter, "age": age,
            "dur": dur, "src0": src0, "step": step, "gl": gl, "gr": gr,
        }
        return new_state, jnp.stack([outl, outr])
