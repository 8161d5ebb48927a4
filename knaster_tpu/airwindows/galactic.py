"""Galactic stereo reverb — port of the airwindows Galactic plugin.

Reference: knaster_airwindows/src/galactic.rs (itself MIT-licensed airwindows
code). Demonstrates the plugin tier: third-party UGen packages only need the
core UGen protocol (the reference's knaster_airwindows depends only on
knaster_core + core_dsp).

Structure per channel: input → 256-sample vibrato (detune) delay read with a
drifting sine offset → pre lowpass → three cascaded banks of 4 delay lines
mixed with a Householder-like matrix (2·b[i] − Σb) → feedback to the opposite
channel's first bank → post lowpass → wet/dry.

TPU mapping: the 12 delay lines per channel live in one padded ``[12, Lmax]``
buffer; each scan step does 12-lane vector reads/writes. The per-sample loop
is a ``lax.scan`` (the feedback matrix makes it genuinely sequential); block
rate parameters are computed vectorized outside the scan.

The reference's floating-point dither adds ~1e-17-scale noise (inaudible and
below f32 resolution at signal level); we keep the xorshift state because the
vibrato drift reseeds from it, and apply the dither in the same formula.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ugen import AudioCtx, UGen
from ..primitives.params import pfloat
from ..ugens.noise import next_randomness_seed

GALACTIC_DELAY_TIMES = np.array(
    [6480, 3660, 1720, 680, 9700, 6000, 2320, 940, 15220, 8460, 4540, 3200],
    dtype=np.int64,
)


def _xorshift(x):
    x = x ^ (x << 13)
    x = x ^ (x >> 17)
    x = x ^ (x << 5)
    return x


class Galactic(UGen):
    """Stereo 'galactic' reverb (galactic.rs:15-400).

    Params (galactic.rs order): replace, detune, brightness, bigness, wet —
    all 0..1."""

    inputs = 2
    outputs = 2
    params = (
        pfloat("replace", 0.5),
        pfloat("detune", 0.5),
        pfloat("brightness", 0.5),
        pfloat("bigness", 1.0),
        pfloat("wet", 1.0),
    )

    def __init__(self, replace=0.5, detune=0.5, brightness=0.5, bigness=1.0,
                 wet=1.0, seed: int | None = None, blockwise: bool = True):
        self.pdefaults = {
            "replace": float(replace),
            "detune": float(detune),
            "brightness": float(brightness),
            "bigness": float(bigness),
            "wet": float(wet),
        }
        self.seed = next_randomness_seed() if seed is None else int(seed)
        # blockwise: vectorized whole-block evaluation (every delay line is
        # longer than a block, so reads never alias in-block writes). ~50×
        # faster on TPU than the per-sample scan; effective delay lengths are
        # clamped to >= block_size and `bigness` is sampled at block rate.
        # blockwise=False forces the exact per-sample scan.
        self.blockwise = bool(blockwise)
        # blockwise mode reads the previous block's buffer: semantics depend
        # on the block length, so it opts out of superblocked fast programs
        self.block_invariant = not self.blockwise

    def init(self, ctx: AudioCtx):
        sr = ctx.sample_rate
        base_lens = ((GALACTIC_DELAY_TIMES / 44100.0) * sr).astype(np.int64)
        base_lens = np.maximum(base_lens, 1)
        self._base_lens = base_lens
        # blockwise mode participates in superblocks up to the shortest
        # delay line (compile.superblock_eligible): below that the >=block
        # delay clamp would coarsen even at bigness=1; the vectorized
        # vibrato chain additionally needs <= 4096 samples per block
        if self.blockwise:
            self.superblock_cap = int(min(base_lens.min(), 4096))
        Lmax = int(base_lens.max())
        self._Lmax = Lmax
        self._overallscale = sr / 44100.0
        rng = np.random.default_rng(self.seed)
        fpd_l = np.uint32(rng.integers(16386, 2**32 - 1))
        fpd_r = np.uint32(rng.integers(16386, 2**32 - 1))
        z12 = jnp.zeros((2, 12, Lmax), ctx.dtype)
        return {
            "dbuf": z12,  # [channel, line, Lmax]
            "dpos": jnp.zeros((2, 12), jnp.int32),
            "vib_buf": jnp.zeros((2, 256), ctx.dtype),
            "vib_pos": jnp.zeros((2,), jnp.int32),
            "feedback": jnp.zeros((2, 4), ctx.dtype),
            "iir_a": jnp.zeros((2,), ctx.dtype),
            "iir_b": jnp.zeros((2,), ctx.dtype),
            "fpd": jnp.asarray([fpd_l, fpd_r], jnp.uint32),
            "vib_m": jnp.zeros((), ctx.dtype),
            "oldfpd": jnp.asarray(429496.7295, ctx.dtype),
        }

    def process(self, ctx: AudioCtx, state, inputs, params):
        if self.blockwise and int(self._base_lens.min()) >= ctx.block_size:
            return self._process_blockwise(ctx, state, inputs, params)
        return self._process_scan(ctx, state, inputs, params)

    # ------------------------------------------------------------------
    _XS_COLS: dict = {}

    @classmethod
    def _xorshift_columns(cls, n: int) -> np.ndarray:
        """``cols[t, j] = xorshift^t(1 << j)``: the 13/17/5 xorshift is
        linear over GF(2), so the whole per-sample sequence is a bit-matrix
        product with trace-time-constant matrices — integer-exact, no
        sequential chain."""
        cols = cls._XS_COLS.get(n)
        if cols is None:
            cols = np.empty((n + 1, 32), np.uint64)
            v = (np.uint64(1) << np.arange(32, dtype=np.uint64))
            m32 = np.uint64(0xFFFFFFFF)
            for t in range(n + 1):
                cols[t] = v
                v = (v ^ (v << np.uint64(13))) & m32
                v = v ^ (v >> np.uint64(17))
                v = (v ^ (v << np.uint64(5))) & m32
            cols = cols.astype(np.uint32)
            cls._XS_COLS[n] = cols
        return cols

    def _vib_fpd_vectorized(self, ctx, state, drift):
        """Vectorized replacement for the per-sample vibrato/xorshift chain
        (the last sequential piece of the blockwise path — ~40% of its cost
        even fully unrolled). The xorshift sequence is a GF(2) bit-matrix
        product (integer-exact); the vibrato phase has AT MOST one 2π reset
        per block (max phase rate ≈ 6.9e-4 rad/sample ⇒ ≥ 9000 samples
        between resets), so the recurrence is a cumsum plus one select."""
        dtype = ctx.dtype
        B = drift.shape[0]
        cols = jnp.asarray(self._xorshift_columns(B))  # [B+1, 32] u32
        x0 = state["fpd"]  # [2] u32
        # seq[c, t] = XOR over set bits j of cols[t, j]: mask each column by
        # 0xFFFFFFFF/0 (two's-complement of the bit) and XOR-reduce the 32
        # columns in 5 tree steps — ~10 ops instead of a 32-step serial loop
        # (the loop was ~2000 HLO ops, the dominant cost of this program)
        bits = (
            x0[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :]
        ) & np.uint32(1)  # [2, 32]
        masks = (np.uint32(0) - bits).astype(jnp.uint32)
        v = cols[None, :, :] & masks[:, None, :]  # [2, B+1, 32]
        for s in (16, 8, 4, 2, 1):
            v = v[..., :s] ^ v[..., s:2 * s]
        seq = v[..., 0]
        pre = seq[:, :B]       # carry fpd at step t (drives tiny + reset)
        fpd_seq = seq[:, 1:]   # advanced fpd at step t (drives the dither)
        fpd_out = seq[:, B]

        tiny = (pre.T.astype(dtype)) * jnp.asarray(1.18e-17, dtype)

        # vibrato phase: vm_t = vm0 + oldfpd0 * Σ d  until the (unique)
        # sample where it crosses 2π; there it resets to 0 and continues at
        # the re-seeded rate (galactic.rs:229-235)
        csum = jnp.cumsum(drift)  # inclusive [B]
        vm_naive = state["vib_m"] + state["oldfpd"] * csum
        two_pi = jnp.asarray(2.0 * np.pi, dtype)
        crossed = vm_naive > two_pi
        has = jnp.any(crossed)
        k = jnp.argmax(crossed).astype(jnp.int32)
        oldfpd_new = (
            jnp.asarray(0.4294967295, dtype)
            + pre[0, k].astype(dtype) * jnp.asarray(0.0000000000618, dtype)
        )
        t_i = jnp.arange(B, dtype=jnp.int32)
        after = has & (t_i > k)
        vm = jnp.where(after, oldfpd_new * (csum - csum[k]), vm_naive)
        vm = jnp.where(has & (t_i == k), jnp.zeros((), dtype), vm)
        off = jnp.stack(
            [
                (jnp.sin(vm) + 1.0) * 127.0,
                (jnp.sin(vm + np.pi / 2.0) + 1.0) * 127.0,
            ],
            axis=1,
        ).astype(dtype)  # [B, 2]
        vib_m_out = vm[B - 1]
        oldfpd_out = jnp.where(has, oldfpd_new, state["oldfpd"])
        return off, tiny, fpd_seq.T, vib_m_out, oldfpd_out, fpd_out

    def _vib_fpd_scan(self, ctx, state, drift):
        """Per-sample reference for the vibrato phase / xorshift dither
        chain (scalars). Returns per-sample (offsets [B,2], tiny [B,2],
        fpd_dither [B,2] advanced values) + new carry."""
        dtype = ctx.dtype

        def step(carry, d):
            vib_m, oldfpd, fpd = carry
            tiny = fpd.astype(dtype) * jnp.asarray(1.18e-17, dtype)
            vib_m = vib_m + oldfpd * d
            reset = vib_m > jnp.asarray(2.0 * np.pi, dtype)
            oldfpd = jnp.where(
                reset,
                jnp.asarray(0.4294967295, dtype)
                + fpd[0].astype(dtype) * jnp.asarray(0.0000000000618, dtype),
                oldfpd,
            )
            vib_m = jnp.where(reset, jnp.zeros((), dtype), vib_m)
            off = jnp.stack(
                [
                    (jnp.sin(vib_m) + 1.0) * 127.0,
                    (jnp.sin(vib_m + np.pi / 2.0) + 1.0) * 127.0,
                ]
            ).astype(dtype)
            fpd = _xorshift(fpd)
            return (vib_m, oldfpd, fpd), (off, tiny, fpd)

        carry0 = (state["vib_m"], state["oldfpd"], state["fpd"])
        # fully unrolled: B iterations of scalar ops become straight-line
        # fused code — a rolled while-loop pays ~µs-scale per-iteration
        # overhead on TPU, which dominated the blockwise program's cost
        (vib_m, oldfpd, fpd), (off, tiny, fpd_seq) = jax.lax.scan(
            step, carry0, drift, unroll=True
        )
        return off, tiny, fpd_seq, vib_m, oldfpd, fpd

    def _process_blockwise(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        B = ctx.block_size
        base_lens = jnp.asarray(self._base_lens, jnp.int32)

        replace = params["replace"]
        regen = 0.0625 + (1.0 - replace) * 0.0625
        attenuate = (1.0 - regen / 0.125) * 1.333
        lowpass = jnp.square(1.00001 - (1.0 - params["brightness"])) / np.sqrt(
            self._overallscale
        )
        drift = params["detune"] ** 3 * 0.001
        size = params["bigness"][0] * 0.9 + 0.1  # block-rate in this path
        wet = 1.0 - (1.0 - params["wet"]) ** 3

        # clamp to B+1: every read must land strictly before this block's
        # writes (at eff == B the exact per-sample scan reads the same-block
        # write, which the pre-block ring can't represent). Tiny ``bigness``
        # values with large blocks are therefore approximated by an eff of
        # B+1; use blockwise=False for exact short-delay behavior.
        eff = jnp.clip(
            (base_lens.astype(dtype) * size).astype(jnp.int32), B + 1, self._Lmax
        )  # [12]

        # 1. the vibrato/dither chain, vectorized (see _vib_fpd_vectorized;
        # the ≤1-reset-per-block argument needs B well under ~9000 samples)
        vib_chain = (
            self._vib_fpd_vectorized if B <= 4096 else self._vib_fpd_scan
        )
        off, tiny, fpd_seq, vib_m, oldfpd, fpd = vib_chain(ctx, state, drift)

        # 2. silence replacement dither
        inp = inputs  # [2, B]
        inp = jnp.where(jnp.abs(inp) < 1.18e-23, tiny.T, inp)
        dry = inp

        # 3. detune delay: timeline = [ring unrolled from pos][this block's writes]
        writes = inp * attenuate[None, :]  # [2, B]
        t_idx = jnp.arange(B, dtype=jnp.int32)

        def detune_read(vbuf, vpos, wr, off_c):
            ring = vbuf[(vpos + jnp.arange(256, dtype=jnp.int32)) % 256]
            timeline = jnp.concatenate([ring, wr])  # [256 + B]
            k = jnp.floor(off_c).astype(jnp.int32)
            frac = off_c - jnp.floor(off_c)
            low = timeline[t_idx + 1 + k]
            high = timeline[t_idx + 2 + k]
            return low + (high - low) * frac

        out_l = detune_read(state["vib_buf"][0], state["vib_pos"][0], writes[0], off[:, 0])
        out_r = detune_read(state["vib_buf"][1], state["vib_pos"][1], writes[1], off[:, 1])
        sig = jnp.stack([out_l, out_r])  # [2, B]
        # commit the vibrato writes
        wslots = (state["vib_pos"][:, None] + t_idx[None, :]) % 256
        vib_buf = state["vib_buf"].at[jnp.arange(2)[:, None], wslots].set(writes)
        vib_pos = (state["vib_pos"] + B) % 256

        # 4. pre lowpass (iirA), per channel affine scan
        from ..core.dsp import affine_scan_1d

        a = jnp.broadcast_to(1.0 - lowpass, (2, B))
        b = sig * lowpass[None, :]
        y_pre, iir_a = affine_scan_1d(a, b, state["iir_a"])
        sig = a * y_pre + b

        # 5. the three 4-line banks, fully blockwise (eff >= B so in-block
        #    writes are never read back)
        dbuf, dpos = state["dbuf"], state["dpos"]
        ch_i = jnp.arange(2)[:, None, None]
        line_i = jnp.arange(12)[None, :, None]
        read_idx = (dpos[:, :, None] + 1 + t_idx[None, None, :]) % eff[None, :, None]
        reads = dbuf[ch_i, line_i, read_idx]  # [2, 12, B]
        b0, b1, b2 = reads[:, 0:4], reads[:, 4:8], reads[:, 8:12]

        def mix4(x):  # over the line axis (axis=1)
            return 2.0 * x - jnp.sum(x, axis=1, keepdims=True)

        fb_now = mix4(b2)  # feedback produced at each sample  [2, 4, B]
        fb_prev = jnp.concatenate(
            [state["feedback"][:, :, None], fb_now[:, :, :-1]], axis=2
        )
        w0 = fb_prev[::-1] * regen[None, None, :] + sig[:, None, :]
        w1 = mix4(b0)
        w2 = mix4(b1)
        writes_all = jnp.concatenate([w0, w1, w2], axis=1)  # [2, 12, B]
        write_idx = (dpos[:, :, None] + t_idx[None, None, :]) % eff[None, :, None]
        dbuf = dbuf.at[ch_i, line_i, write_idx].set(writes_all)
        dpos = (dpos + B) % eff[None, :]
        feedback = fb_now[:, :, B - 1]

        sig = jnp.sum(b2, axis=1) * 0.125  # [2, B]

        # 6. post lowpass (iirB)
        b6 = sig * lowpass[None, :]
        y_pre, iir_b = affine_scan_1d(a, b6, state["iir_b"])
        sig = a * y_pre + b6

        # 7. wet/dry
        sig = jnp.where(wet[None, :] < 1.0, sig * wet[None, :] + dry * (1.0 - wet[None, :]), sig)

        # 8. airwindows fp dither (uses the advanced per-sample fpd values)
        m, e = jnp.frexp(sig)
        e = jnp.clip(e, 0, 64).astype(dtype)
        dither = (
            (fpd_seq.T.astype(jnp.float32) - np.float32(0x7FFFFFFF))
            * np.float32(5.5e-36)
            * jnp.exp2(e + 62.0)
        ).astype(dtype)
        sig = sig + dither

        new_state = {
            "dbuf": dbuf, "dpos": dpos, "vib_buf": vib_buf, "vib_pos": vib_pos,
            "feedback": feedback, "iir_a": iir_a, "iir_b": iir_b, "fpd": fpd,
            "vib_m": vib_m, "oldfpd": oldfpd,
        }
        return new_state, sig

    def _process_scan(self, ctx: AudioCtx, state, inputs, params):
        dtype = ctx.dtype
        B = ctx.block_size
        base_lens = jnp.asarray(self._base_lens, jnp.int32)

        # block-rate derived parameters, vectorized (galactic.rs:176-190)
        replace = params["replace"]
        regen = 0.0625 + (1.0 - replace) * 0.0625
        attenuate = (1.0 - regen / 0.125) * 1.333
        lowpass = jnp.square(1.00001 - (1.0 - params["brightness"])) / np.sqrt(
            self._overallscale
        )
        drift = params["detune"] ** 3 * 0.001
        size = params["bigness"] * 0.9 + 0.1
        wet = 1.0 - (1.0 - params["wet"]) ** 3

        # effective per-line lengths from `size` (set_delay_length_fraction)
        eff_lens = (base_lens[None, :].astype(dtype) * size[:, None]).astype(
            jnp.int32
        )  # [B, 12]
        eff_lens = jnp.clip(eff_lens, 1, self._Lmax)

        lines4 = jnp.arange(4, dtype=jnp.int32)

        def mix4(b):
            # b[i] - (b[i+1]+b[i+2]+b[i+3]) == 2*b[i] - sum(b); works for [..., 4]
            return 2.0 * b - jnp.sum(b, axis=-1, keepdims=True)

        def bank(dbuf, dpos, eff, first, values):
            """write `values` [2,4] into lines first..first+3, read delayed."""
            rows = lines4 + first
            pos = dpos[:, rows]  # [2, 4]
            ch = jnp.arange(2)[:, None]
            dbuf = dbuf.at[ch, rows[None, :], pos].set(values)
            new_pos = (pos + 1) % eff[rows][None, :]
            out = dbuf[ch, rows[None, :], new_pos]
            dpos = dpos.at[:, rows].set(new_pos)
            return dbuf, dpos, out

        def step(carry, x):
            (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b, fpd,
             vib_m, oldfpd) = carry
            inp = x["in"]  # [2]

            # floating-point-dither replacement of silence (galactic.rs:214-224)
            tiny = fpd.astype(dtype) * jnp.asarray(1.18e-17, dtype)
            inp = jnp.where(jnp.abs(inp) < 1.18e-23, tiny, inp)
            dry = inp

            # vibrato phase (galactic.rs:229-235)
            vib_m = vib_m + oldfpd * x["drift"]
            reset = vib_m > jnp.asarray(2.0 * np.pi, dtype)
            oldfpd = jnp.where(
                reset,
                jnp.asarray(0.4294967295, dtype)
                + fpd[0].astype(dtype) * jnp.asarray(0.0000000000618, dtype),
                oldfpd,
            )
            vib_m = jnp.where(reset, jnp.zeros((), dtype), vib_m)

            # detune delay: write, then read at drifting offset (lin interp)
            vib_buf = vib_buf.at[jnp.arange(2), vib_pos].set(inp * x["attenuate"])
            vib_pos = (vib_pos + 1) % 256
            offset = jnp.stack(
                [
                    (jnp.sin(vib_m) + 1.0) * 127.0,
                    (jnp.sin(vib_m + np.pi / 2.0) + 1.0) * 127.0,
                ]
            ).astype(dtype)
            working = vib_pos.astype(dtype) + offset
            low = jnp.floor(working).astype(jnp.int32) % 256
            high = (low + 1) % 256
            frac = working - jnp.floor(working)
            v_lo = vib_buf[jnp.arange(2), low]
            v_hi = vib_buf[jnp.arange(2), high]
            inp = v_lo + (v_hi - v_lo) * frac

            # pre lowpass (iirA)
            lp = x["lowpass"]
            iir_a = iir_a * (1.0 - lp) + inp * lp
            inp = iir_a

            # three cascaded 4-line banks with cross-channel feedback
            fb_cross = feedback[::-1]  # left bank gets right feedback & v.v.
            write0 = fb_cross * x["regen"] + inp[:, None]
            dbuf, dpos, b0 = bank(dbuf, dpos, x["eff"], 0, write0)
            dbuf, dpos, b1 = bank(dbuf, dpos, x["eff"], 4, mix4(b0))
            dbuf, dpos, b2 = bank(dbuf, dpos, x["eff"], 8, mix4(b1))
            feedback = mix4(b2)
            inp = jnp.sum(b2, axis=-1) * 0.125

            # post lowpass (iirB)
            iir_b = iir_b * (1.0 - lp) + inp * lp
            inp = iir_b

            w = x["wet"]
            inp = jnp.where(w < 1.0, inp * w + dry * (1.0 - w), inp)

            # airwindows fp dither (state matters for vib reseed; the added
            # noise is ~1e-17-scale)
            m, e = jnp.frexp(inp)
            e = jnp.clip(e, 0, 64).astype(dtype)
            fpd = _xorshift(fpd)
            dither = (
                (fpd.astype(jnp.float32) - np.float32(0x7FFFFFFF))
                * np.float32(5.5e-36)
                * jnp.exp2(e + 62.0)
            ).astype(dtype)
            inp = inp + dither

            carry = (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b,
                     fpd, vib_m, oldfpd)
            return carry, inp

        xs = {
            "in": jnp.swapaxes(inputs, 0, 1),  # [B, 2]
            "regen": regen,
            "attenuate": attenuate,
            "lowpass": lowpass,
            "drift": drift,
            "wet": wet,
            "eff": eff_lens,
        }
        carry0 = (
            state["dbuf"], state["dpos"], state["vib_buf"], state["vib_pos"],
            state["feedback"], state["iir_a"], state["iir_b"], state["fpd"],
            state["vib_m"], state["oldfpd"],
        )
        carry, out = jax.lax.scan(step, carry0, xs)
        (dbuf, dpos, vib_buf, vib_pos, feedback, iir_a, iir_b, fpd,
         vib_m, oldfpd) = carry
        new_state = {
            "dbuf": dbuf, "dpos": dpos, "vib_buf": vib_buf, "vib_pos": vib_pos,
            "feedback": feedback, "iir_a": iir_a, "iir_b": iir_b, "fpd": fpd,
            "vib_m": vib_m, "oldfpd": oldfpd,
        }
        return new_state, jnp.swapaxes(out, 0, 1)
