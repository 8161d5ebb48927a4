"""Fused Pallas voice-bank kernels: the hot path for massed voices.

The VoiceBank path builds the voice from composable UGens (vmap over a scan
for the envelope, cumsum for the oscillator). These kernels fuse the whole
voice — oscillator, envelope state machine, pan, mix-down — into ONE Pallas
kernel: state lives in VMEM, voices ride the 8×128 vector lanes, and the
per-sample loop is a register loop instead of an XLA scan.

**Sample-accurate control, identical to the vmap path** (the reference's
WrPreciseTiming semantics, wrappers_core/precise_timing.rs:65-114, at bank
scale): per-voice float sets and smoothing ramps are materialized *per
sample inside the kernel* — each float param arrives as its ANCHORED
linear-ramp trajectory (anchor value/step/elapsed/duration/target per
voice; the in-kernel value is anchor + step * absolute_progress in one
rounding, so every block partitioning is bit-identical) plus, in
eventful blocks, ``kernel_burst_depth`` per-round trajectory breakpoints
(``VoiceBank._apply_events_breakpoints``), and the kernel folds the same
piecewise select structure as ``VoiceBank.process``'s round fold — exact
graph-engine burst semantics (several sets / smoothing configs on one
slot in one block, in frame order) up to that depth. Triggers are packed
host→kernel as uint32 bitmasks (``ceil(B/32)`` words per voice), so the
kernel reads one bit per sample instead of a [B, V] boolean array; any
block size up to ``MAX_BLOCK`` works, which lets superblocked programs
drive the banks at multi-block sizes.

Oscillator parity: the u32 fixed-point phase is carried *through* the kernel
(per-sample increments from the materialized per-sample frequency), and the
sine is ``jnp.sin`` of the same table-quantized angle ``SinWt`` computes
(osc.rs:97-168 semantics) — the kernels match the vmap banks to float
rounding, not just to a quantization bound.

Layout: voices as [V/128, 128] tiles (sublane × lane); the grid walks voice
tiles of ``tile_rows``×128 voices; each grid step emits its partial mix,
summed in XLA afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..core.ugen import AudioCtx
from ..models.voices import SineVoice
from ..ugens.wavetable import FRACTIONAL_PART, TABLE_HIGH_MASK, TABLE_SIZE
from .voicebank import VoiceBank

LANES = 128
_CYCLE = float(TABLE_SIZE) * float(FRACTIONAL_PART)  # 2**30 phase units/cycle
_U2RAD = np.float32(2.0 * np.pi / _CYCLE)
_IDX_SCALE = np.float32(2.0 * np.pi / TABLE_SIZE)
_HALF_PI = np.float32(np.pi / 2.0)

# ramp-operand group sizes (see _ramp_operands)
N_FAST, N_EVENTFUL = 5, 10


# generous block cap: the per-tile [1, B, LANES] out buffers and the
# sample loop's VMEM footprint stay well under Mosaic limits through 1024
MAX_BLOCK = 1024


def _check_block(ctx, name: str) -> None:
    if ctx.block_size > MAX_BLOCK:
        raise ValueError(f"{name} supports block_size <= {MAX_BLOCK}")


def _unroll(B: int, interpret: bool):
    """Sample-loop unroll policy: full unroll through 64 samples on hardware
    (Mosaic's loop overhead costs ~20% at these body sizes); for larger
    blocks unroll the largest divisor <= 64 so program size stays bounded
    while the loop overhead amortizes away. The CPU interpreter keeps the
    rolled loop (cheap to trace)."""
    if interpret:
        return False
    if B <= 64:
        return True
    u = 64
    while B % u:
        u -= 1
    return u


def _sample_loop(B: int, body, carry, unroll):
    """fori_loop over B samples with Mosaic-legal unrolling. Mosaic's
    for-loop lowering accepts only unroll=1 or a FULL unroll; a partial
    factor U is expressed as an outer ROLLED loop of B/U steps whose body
    runs U statically-offset sample steps (same instruction stream as the
    partial unroll the lowering rejects)."""
    if unroll is True or unroll == B:
        return jax.lax.fori_loop(0, B, body, carry, unroll=True)
    if not unroll or unroll == 1:
        return jax.lax.fori_loop(0, B, body, carry)
    U = int(unroll)
    assert B % U == 0, (B, U)

    def outer(k, c):
        i0 = k * U
        for j in range(U):
            c = body(i0 + j, c)
        return c

    return jax.lax.fori_loop(0, B // U, outer, carry)


def _cap_tile_rows(tile_rows: int, n_voices: int) -> int:
    """Cap tiles at 64x128 voices: the unrolled sample loop's scoped-VMEM
    stack exceeds Mosaic's 16M limit with 128-row tiles (observed
    20.5-20.7M in several surrounding-program contexts; 64-row tiles fit
    everywhere measured). Mosaic additionally requires a block's sublane
    dim to be a multiple of 8 OR equal to the full array dim, so partial
    tiles are rounded to the largest multiple-of-8 divisor of R; small
    banks (R <= cap) use one full-array tile (always legal)."""
    R = max(n_voices // LANES, 1)
    cap = min(int(tile_rows), R, 64)
    if R <= cap or R <= 8:
        return R  # single tile: block shape == array shape
    best = 0
    for tr in range(8, cap + 1, 8):
        if R % tr == 0:
            best = tr
    return best or R


# --------------------------------------------------------------------------
# shared in-kernel pieces
# --------------------------------------------------------------------------

def _mat(i_f, g):
    """Materialize one float param at sample ``i`` from its ramp group.

    Mirrors VoiceBank.process's ``materialize`` + event-piece selects.
    Trajectories are ANCHORED: the base group's (v0, step) describe the
    ramp at its anchor frame and ``el`` is the progress already elapsed at
    sample 0, so the value at sample i is ``v0 + step * (i + el)`` in ONE
    rounding — identical for every block partitioning of the render (a
    per-block re-anchored v0 re-rounds at each boundary). Eventful blocks
    fold D per-round trajectory BREAKPOINTS (the device round fold
    ``_apply_events_breakpoints`` — exact same-block burst semantics up to
    D events per slot): piece r anchors at its own event frame —
    ``where(i-frame >= dur, target, v0 + step*(i-frame))`` — and wins
    from that frame on (untouched rounds carry the ``frame = B`` sentinel,
    so their select is a no-op). ``g`` is 5 refs (fast):
    (v0, step, el, dur, tgt) base tiles — or 10 (eventful): those plus
    (rv0, rstep, rdur, rtgt, rframe) round refs of block shape
    [D, rows, LANES]."""
    if len(g) == N_EVENTFUL:
        prog = i_f + g[2][:]
        acc = jnp.where(prog >= g[3][:], g[4][:], g[0][:] + g[1][:] * prog)
        for r in range(g[5].shape[0]):
            ln = i_f - g[9][r]
            v = jnp.where(ln >= g[7][r], g[8][r], g[5][r] + g[6][r] * ln)
            acc = jnp.where(i_f >= g[9][r], v, acc)
        return acc
    prog = i_f + g[2][:]
    return jnp.where(prog >= g[3][:], g[4][:], g[0][:] + g[1][:] * prog)


def _trig_bit(i, words_ref):
    """Sample i's trigger bit from the packed per-voice u32 words, ONE ref
    stacked [W, rows, LANES] (word w holds frames [32w, 32w+32)). One
    dynamic row slice per sample — O(1) in W, unlike the old W separate
    refs whose select chain cost W-1 vector selects per sample whenever the
    loop was only partially unrolled (B > 64). Fully unrolled loops
    (B <= 64 on hardware) have ``i`` as a compile-time constant, where the
    slice folds to a static load just like before."""
    iu = i.astype(jnp.uint32)
    word = words_ref[i >> 5]
    return ((word >> (iu & 31)) & 1) == 1


def _to_inc(f_times_f2pi):
    """freq*f2pi -> u32 phase increment, Rust `as u32` saturation semantics
    (osc.rs; the same 2^31-128 clamp as osc._f32_to_u32 — the largest f32
    below 2^31, so the int32 cast is exact on every backend — then a
    Mosaic-lowerable bitcast)."""
    return pltpu.bitcast(
        jnp.clip(f_times_f2pi, 0.0, 2.0**31 - 128).astype(jnp.int32),
        jnp.uint32,
    )


# degree-9 odd polynomial for sin(u) on [0, pi/2]: max error 1.2e-7 (the
# float32 rounding floor) — fitted on the 16384-grid this kernel evaluates
_SIN_C = (np.float32(1.0), np.float32(-0.16666652), np.float32(0.008332964),
          np.float32(-0.00019804752), np.float32(2.5981028e-06))


def _sin_quant(phase):
    """SinWt's table-quantized sine: sin of the 16384-grid angle.

    The grid index is folded to the first quadrant with integer identities
    (sin(x+pi) = -sin x, sin(pi-x) = sin x) and evaluated with a degree-9
    odd polynomial — error <= 1.2e-7 vs jnp.sin at roughly half the op count
    of a generic range reduction."""
    idx = (phase >> 16) & np.uint32(TABLE_HIGH_MASK)
    half = idx & np.uint32(TABLE_SIZE // 2 - 1)
    neg = idx >= np.uint32(TABLE_SIZE // 2)
    m = jnp.where(half > np.uint32(TABLE_SIZE // 4),
                  np.uint32(TABLE_SIZE // 2) - half, half)
    u = pltpu.bitcast(m, jnp.int32).astype(jnp.float32) * _IDX_SCALE
    u2 = u * u
    p = _SIN_C[4]
    p = p * u2 + _SIN_C[3]
    p = p * u2 + _SIN_C[2]
    p = p * u2 + _SIN_C[1]
    p = (p * u2 + _SIN_C[0]) * u
    return jnp.where(neg, -p, p)


def _theta_full(phase):
    """AdditiveVoice's full-resolution phase angle (mod one cycle)."""
    return pltpu.bitcast(
        phase & np.uint32(int(_CYCLE) - 1), jnp.int32
    ).astype(jnp.float32) * _U2RAD


def _env_asr(stage, t, rscale, restart, release, atk, rel):
    """EnvAsr state machine (stages: 0 stop, 1 atk, 2 sus, 3 rel).
    Returns (env, stage', t', rscale')."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    stage = jnp.where(restart, one, stage)
    rel_from_atk = release & (stage == 1.0)
    rel_from_sus = release & (stage == 2.0)
    rscale = jnp.where(rel_from_atk, t, jnp.where(rel_from_sus, one, rscale))
    t = jnp.where(rel_from_atk | rel_from_sus, one, t)
    stage = jnp.where(rel_from_atk | rel_from_sus, np.float32(3.0), stage)
    env = jnp.where(
        stage == 1.0, t,
        jnp.where(stage == 2.0, one,
                  jnp.where(stage == 3.0, t * t * t * rscale, zero)),
    )
    t_next = jnp.where(
        stage == 1.0, t + atk,
        jnp.where(stage == 3.0, t - rel, t),
    )
    to_sus = (stage == 1.0) & (t_next >= one)
    t_next = jnp.where(to_sus, one, t_next)  # pin sustain t (see EnvAsr)
    done = (stage == 3.0) & (t_next <= zero)
    stage = jnp.where(to_sus, np.float32(2.0), stage)
    stage = jnp.where(done, zero, stage)
    t_next = jnp.where(done, zero, t_next)
    return env, stage, t_next, rscale


def _env_asr_free(stage, t, rscale, atk, rel):
    """``_env_asr`` without the trigger plumbing. Event-free blocks carry no
    restart/release bits by construction (triggers only arrive via events),
    so the two per-sample ``_trig_bit`` chains and the release-capture
    selects vanish statically; ``rscale`` is read-only and stays in the
    caller's carry. Returns (env, stage', t')."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    env = jnp.where(
        stage == 1.0, t,
        jnp.where(stage == 2.0, one,
                  jnp.where(stage == 3.0, t * t * t * rscale, zero)),
    )
    t_next = jnp.where(
        stage == 1.0, t + atk,
        jnp.where(stage == 3.0, t - rel, t),
    )
    to_sus = (stage == 1.0) & (t_next >= one)
    t_next = jnp.where(to_sus, one, t_next)  # pin sustain t (see EnvAsr)
    done = (stage == 3.0) & (t_next <= zero)
    stage = jnp.where(to_sus, np.float32(2.0), stage)
    stage = jnp.where(done, zero, stage)
    t_next = jnp.where(done, zero, t_next)
    return env, stage, t_next


def _env_ar(stage, t, restart, atk, rel):
    """EnvAr state machine (stages: 0 stopped, 1 attack, 2 release)."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    stage = jnp.where(restart, one, stage)
    env = jnp.where(
        stage == 1.0, t,
        jnp.where(stage == 2.0, t * t * t, zero),
    )
    t_next = jnp.where(
        stage == 1.0, t + atk,
        jnp.where(stage == 2.0, t - rel, t),
    )
    to_rel = (stage == 1.0) & (t_next >= one)
    stage = jnp.where(to_rel, np.float32(2.0), stage)
    t_next = jnp.where(to_rel, one, t_next)
    done = (stage == 2.0) & ~to_rel & (t_next <= zero)
    stage = jnp.where(done, zero, stage)
    t_next = jnp.where(done, zero, t_next)
    return env, stage, t_next


ENV_SEG_FINISHED = -1.0  # non-looping end reached: the VoicePool idle latch
ENV_SEG_STOPPED = -2.0   # t_stop froze the value: still audible, NOT idle


def _make_env_multiseg(segments, looping, start_value, shapes=None):
    """Multi-segment Envelope evaluator for mosaic voice bodies
    (ugens/envelopes.py Envelope semantics, per sample).

    ``segments`` is the trace-time [S, 3] (recip, duration, value) table
    and ``shapes`` the per-segment shape codes — both voice constants, so
    the per-segment lookup is an UNROLLED select fold (no gathers). Two
    round-5 redesigns (the first version measured ~25% of the VPU
    ceiling, benchmarks/RESULTS.md roofline):

    - the ``running`` flag is folded into ``seg`` as sentinels
      (ENV_SEG_FINISHED / ENV_SEG_STOPPED): one fewer [rows, LANES] carry
      across the fully-unrolled sample loop (the round-3 "count carries"
      rule), and run/stop masks become sign tests on a row that exists
      anyway;
    - segment CONSTANTS (recip/dur/val) are selected first (cheap scalar
      selects) and each DISTINCT shape formula is evaluated once over the
      selected constants — not once per segment: an all-LINEAR table pays
      one clip+FMA where the old fold paid S of them, and exp/log/cos
      appear once per distinct curved shape present.

    Returns ``step(seg, t, from_v, time_scale_dt, restart, stop) ->
    (out, seg', t', from_v', fin)`` on [rows, LANES] tiles; ``restart``/
    ``stop`` may be None (event-free blocks). ``fin`` is the envelope-
    finished bit — the VoicePool idle latch on BOTH executors: a stopped
    voice keeps emitting its frozen value, so it is NOT idle (matches the
    vmap path's Envelope done bit, which fires only on envelope end;
    advisor round-4 finding). Carry uses f32 ``seg`` (exact small ints)
    like the AR/ASR stages."""
    from ..ugens.envelopes import EnvelopeShape

    segs = np.asarray(segments, np.float32)
    S = segs.shape[0]
    shapes = [EnvelopeShape.LINEAR] * S if shapes is None else list(shapes)
    one = np.float32(1.0)
    zero = np.float32(0.0)
    start_v = np.float32(start_value)
    fin_s = np.float32(ENV_SEG_FINISHED)
    stop_s = np.float32(ENV_SEG_STOPPED)
    present = []  # distinct shapes in first-segment order
    for sh in shapes:
        if sh not in present:
            present.append(sh)

    def shape_eval(shape, from_v, val, frac):
        """_segment_value's formula for one shape over the SELECTED
        constants (val = the current segment's to_v)."""
        if shape == EnvelopeShape.LINEAR:
            return from_v + frac * (val - from_v)
        if shape == EnvelopeShape.SINUSOIDAL:
            return from_v + (val - from_v) * (
                one - jnp.cos(np.float32(np.pi) * frac)) * np.float32(0.5)
        if shape == EnvelopeShape.STEP:
            return val
        # EXPONENTIAL: same-sign geometric, linear fallback across zero.
        # fa/ta both jnp.maximum-clamped like _segment_value (the old
        # python-max'd static ta diverged at the ULP on exp segments —
        # advisor round-4 finding); exp(frac*log()) is the pow identity
        # written in ops Mosaic is known to lower.
        lin = from_v + frac * (val - from_v)
        fa = jnp.maximum(jnp.abs(from_v), np.float32(1e-12))
        ta = jnp.maximum(jnp.abs(val), np.float32(1e-12))
        geo = jnp.sign(from_v) * fa * jnp.exp(frac * jnp.log(ta / fa))
        return jnp.where(from_v * val > 0, geo, lin)

    def step(seg, t, from_v, dt, restart, stop):
        if restart is not None:
            seg = jnp.where(restart, zero, seg)
            t = jnp.where(restart, zero, t)
            from_v = jnp.where(restart, start_v, from_v)
        # segment-constant selects; masks kept for the shape grouping
        masks = [seg == np.float32(s) for s in range(S)]
        recip = jnp.full_like(from_v, segs[0, 0])
        dur = jnp.full_like(from_v, segs[0, 1])
        val = jnp.full_like(from_v, segs[0, 2])
        for s in range(1, S):
            recip = jnp.where(masks[s], np.float32(segs[s, 0]), recip)
            dur = jnp.where(masks[s], np.float32(segs[s, 1]), dur)
            val = jnp.where(masks[s], np.float32(segs[s, 2]), val)
        frac = jnp.clip(t * recip, 0.0, 1.0)
        cur = shape_eval(present[0], from_v, val, frac)
        for sh in present[1:]:
            m_sh = None
            for s in range(S):
                if shapes[s] == sh:
                    m_sh = masks[s] if m_sh is None else (m_sh | masks[s])
            cur = jnp.where(m_sh, shape_eval(sh, from_v, val, frac), cur)
        if stop is not None:
            frozen = stop & (seg >= zero)
            from_v = jnp.where(frozen, cur, from_v)
            seg = jnp.where(frozen, stop_s, seg)
        is_run = seg >= zero
        in_seg = t < dur
        has_next = seg + one < np.float32(S)
        out = jnp.where(is_run, jnp.where(in_seg, cur, val), from_v)
        adv = is_run & ~in_seg & has_next
        fin = is_run & ~in_seg & ~has_next
        from_v = jnp.where(adv | fin, val, from_v)
        t = jnp.where(
            is_run & in_seg, t + dt, jnp.where(adv, t - dur + dt, t)
        )
        seg = jnp.where(adv, seg + one, seg)
        if looping:
            seg = jnp.where(fin, zero, seg)
            t = jnp.where(fin, zero, t)
            fin = jnp.zeros_like(fin)
        else:
            seg = jnp.where(fin, fin_s, seg)
        return out, seg, t, from_v, fin

    return step


def _env_ar_free(stage, t, atk, rel):
    """``_env_ar`` without the restart trigger (see ``_env_asr_free``)."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    env = jnp.where(
        stage == 1.0, t,
        jnp.where(stage == 2.0, t * t * t, zero),
    )
    t_next = jnp.where(
        stage == 1.0, t + atk,
        jnp.where(stage == 2.0, t - rel, t),
    )
    to_rel = (stage == 1.0) & (t_next >= one)
    stage = jnp.where(to_rel, np.float32(2.0), stage)
    t_next = jnp.where(to_rel, one, t_next)
    done = (stage == 2.0) & ~to_rel & (t_next <= zero)
    stage = jnp.where(done, zero, stage)
    t_next = jnp.where(done, zero, t_next)
    return env, stage, t_next


# --------------------------------------------------------------------------
# host-side operand staging
# --------------------------------------------------------------------------

def _ramp_operands(bank, fstate, dtype):
    """Flat list of [R, LANES] ramp tiles for the event-free fast program,
    one ANCHORED (v0, step, el, dur, tgt) group per float param in
    ``bank._float_names`` order (v0/step at the ramp's anchor frame, ``el``
    the progress already elapsed at this block's sample 0). ``el``/``dur``
    are cast to the compute dtype so the in-kernel progress add and
    ramp-done comparison are single VPU ops."""
    R = bank.n_voices // LANES

    def g2(x):
        return x.reshape(R, LANES)

    fvals, ftgt, fstep, fel, fdur, _ = fstate
    ops = []
    for p in range(len(bank._float_names)):
        ops += [g2(fvals[p]), g2(fstep[p]), g2(fel[p].astype(dtype)),
                g2(fdur[p].astype(dtype)), g2(ftgt[p])]
    return ops


def _ramp_operands_bursts(bank, state, pieces, dtype):
    """Eventful-block ramp operands: per float param, the 5 block-start
    anchored trajectory tiles ([R, LANES], pre-event state) plus the 5
    round refs ([D, R, LANES]) from ``_apply_events_breakpoints`` — the
    per-round trajectory breakpoints the kernel folds per sample (exact
    same-block bursts up to D = ``kernel_burst_depth`` events per slot).
    ``el``/``dur``/``frame`` components are cast to the compute dtype."""
    R = bank.n_voices // LANES
    bv0, bstep, bdur, btgt, bframe = pieces
    D = bv0.shape[0]

    def g2(x):
        return x.reshape(R, LANES)

    def g3(x):
        return x.reshape(D, R, LANES)

    ops = []
    for p in range(len(bank._float_names)):
        ops += [g2(state["fvals"][p]), g2(state["fstep"][p]),
                g2(state["felapsed"][p].astype(dtype)),
                g2(state["fdur"][p].astype(dtype)),
                g2(state["ftarget"][p]),
                g3(bv0[:, p]), g3(bstep[:, p]),
                g3(bdur[:, p].astype(dtype)), g3(btgt[:, p]),
                g3(bframe[:, p].astype(dtype))]
    return ops


def _fold_act(bank, ramp_ops, act):
    """Event-free blocks fold the block-constant active gain into the amp
    ramp group host-side: ``act`` is exactly 0 or 1, so scaling (v0, step,
    tgt) — never ``el``/``dur`` — makes ``_mat(i, AMP)`` produce
    ``amp * act`` bit-exactly while the kernel drops one ref load and mul
    per sample. Must run on the 5-tile fast layout BEFORE any pan-pack
    swap."""
    base = N_FAST * bank.float_index("amp")
    out = list(ramp_ops)
    for j in (0, 1, 4):
        out[base + j] = out[base + j] * act
    return out


def _bank_setup(bank, ctx, state, events):
    """Common per-block staging for every kernel bank: apply the event
    channel, build ramp operands + env constants, return the bits each
    ``process`` needs. ``ng`` is the per-param ramp-group size. Eventful
    blocks run the breakpoint round fold (exact same-block bursts up to
    ``kernel_burst_depth`` events per slot); event-free blocks skip every
    scatter and ship the 4-tile block-start trajectories."""
    dtype = ctx.dtype
    R = bank.n_voices // LANES
    if events is None:
        (fstate, ivals, active, _, _fframe, _iinfo, idle,
         _old) = bank._apply_events(ctx, state, events, trig_tensor=False)
        ramp_ops = _ramp_operands(bank, fstate, dtype)
        ng = N_FAST
    else:
        (fstate, pieces, ivals, active,
         idle) = bank._apply_events_breakpoints(ctx, state, events)
        ramp_ops = _ramp_operands_bursts(bank, state, pieces, dtype)
        ng = N_EVENTFUL
    # env-rate tiles for the hand-written banks; the generic PallasVoiceBank
    # has no bank-level envelope (its body closes over whatever constants the
    # voice wants) and gets inert placeholders
    atk = jnp.full(
        (R, LANES),
        1.0 / max(getattr(bank, "_attack", 0.0) * ctx.sample_rate, 1.0),
        dtype,
    )
    rel = jnp.full(
        (R, LANES),
        1.0 / max(getattr(bank, "_release", 0.0) * ctx.sample_rate, 1.0),
        dtype,
    )
    act = active.astype(dtype).reshape(R, LANES)
    return fstate, ivals, active, ramp_ops, ng, atk, rel, act, idle


def _op_specs(pl, ops, TR):
    """BlockSpecs matching a staged operand list: [R, LANES] tiles walk the
    voice grid; [D, R, LANES] round refs carry their full round axis into
    every tile."""
    specs = []
    for op in ops:
        if op.ndim == 3:
            D = op.shape[0]
            specs.append(
                pl.BlockSpec((D, TR, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            specs.append(
                pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
    return specs


def _grid2(bank, x):
    return x.reshape(bank.n_voices // LANES, LANES)


def _grid3(bank, x):
    """[W, V] stacked trigger words -> [W, rows, LANES]."""
    return x.reshape(x.shape[0], bank.n_voices // LANES, LANES)


def _extra_specs(pl, extras, TR):
    """BlockSpecs for the extras tuple: [TR, LANES] voice tiles, plus the
    whole-W window of any [W, rows, LANES] stacked trigger words."""
    return [
        pl.BlockSpec((e.shape[0], TR, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
        if e.ndim == 3
        else pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        for e in extras
    ]


def _eventful_tile_rows(TR, R, n_float_params):
    """Half-size voice tiles for EVENTFUL kernels with >= 4 float params.

    The eventful program's per-slot burst-breakpoint fold keeps live
    temporaries proportional to (float params x tile rows); measured on the
    v5e: the subtractive kernel (4 float params) at 64-row tiles needs a
    16.95M scoped-VMEM stack vs Mosaic's 16M limit (V=131072, B=64, burst
    depth 3) while the sine kernel's 3 params fit (soak-validated). Only
    the eventful program shrinks — the event-free steady-state program
    (the perf path) keeps the full `_cap_tile_rows` tile. Halving preserves
    grid divisibility (TR | R implies TR/2 | R); tiles must stay multiples
    of 8 (Mosaic sublane rule), else the tile is left as-is (small banks
    whose temps fit anyway)."""
    if n_float_params >= 4 and TR > 8:
        half = TR // 2
        if half % 8 == 0 and R % half == 0:
            return half
    return TR


def _sin_poly(u):
    """sin(u) for u in [-pi/2, pi/2]: the same degree-9 odd minimax
    polynomial as the quantized sine (error <= 1.2e-7)."""
    u2 = u * u
    p = _SIN_C[4]
    p = p * u2 + _SIN_C[3]
    p = p * u2 + _SIN_C[2]
    p = p * u2 + _SIN_C[1]
    return (p * u2 + _SIN_C[0]) * u


# degree-5 fit of 2^f on [-0.5, 0.5] (rel err <= 1.8e-7): the mantissa
# half of the range-reduced polynomial exp below
_EXP2_C = (np.float32(0.0013400433), np.float32(0.009676037),
           np.float32(0.05550327), np.float32(0.24022107),
           np.float32(0.6931472), np.float32(1.0000001))
_LOG2E = 1.4426950408889634
_PI_F = float(np.pi)


def _exp_poly(x):
    """exp(x) for x <= 0 without the hardware transcendental slot:
    base-2 range reduction x*log2(e) = n + f (f in [-0.5, 0.5]), 2^n by
    exponent-field construction (Mosaic-legal bitcast; n clamped to
    [-126, 0] — the result underflows to ~0 exactly where hw exp does),
    2^f by the degree-5 polynomial (rel err <= 1.8e-7)."""
    z = jnp.maximum(x * np.float32(_LOG2E), np.float32(-126.0))
    n = jnp.round(z)
    f = z - n
    p = _EXP2_C[0]
    for c in _EXP2_C[1:]:
        p = p * f + c
    n_i = jnp.clip(n, -126.0, 0.0).astype(jnp.int32)
    pow2n = pltpu.bitcast((n_i + 127) << 23, jnp.float32)
    return pow2n * p


def _sincos_halfturn(theta):
    """(sin, cos) of theta in [0, pi] via the odd minimax polynomial:
    sin by folding about pi/2 (sin(pi-t) = sin t), cos as sin(pi/2 - t)
    (argument already in [-pi/2, pi/2]). Abs err <= 1.2e-7 each."""
    s = _sin_poly(jnp.minimum(theta, np.float32(_PI_F) - theta))
    c = _sin_poly(_HALF_PI - theta)
    return s, c


def _svf_low_coeffs(x, q):
    """SVF lowpass coefficients (svf.rs set_coeffs, Low type) in the
    one-divide form: with s = sin(x), c = cos(x) (x = pi*cutoff/sr in
    [0, pi/2), so no range reduction), g = s/c gives

        a1 = 1/(1+g(g+1/q)) = q*c^2/(q+s*c),  a2 = g*a1,  a3 = g*a2.

    Algebraically identical to the tan form; evaluated with ``_sin_poly``
    (<=1.2e-7) and ONE divide instead of tan + two divides. Kernel-only:
    SvfFilter (the engine UGen) keeps the literal tan form."""
    s = _sin_poly(x)
    c = _sin_poly(_HALF_PI - x)
    sc = s * c
    d = q / (q + sc)
    return d * (c * c), d * sc, d * (s * s)


def _pan_fast_operands(bank, fstate, dtype):
    """Event-free blocks avoid per-sample pan transcendentals: the pan
    ramp is linear, so its equal-power angle is linear too, and the kernel
    evaluates cos/sin of the linear angle with its own odd polynomial
    (``_sin_poly``, error <= 1.2e-7) — CARRY-FREE, which matters more than
    the op count: the previous phasor-rotation pack carried two extra
    [TR, LANES] rows across the fully-unrolled sample loop and measured
    33.2G vs this formulation's 52.9G voice-samples/s on the v5e
    (benchmarks/kernel_probe.py). 5 tiles per block: angle at sample 0,
    d(angle)/d(sample), the post-ramp target gains (host cos/sin — the
    steady state stays *exact*), and the ramp end frame."""
    i = bank.float_index("pan")
    fvals, ftgt, fstep, fel, fdur, _ = fstate
    v0 = jnp.where(fel[i] >= fdur[i], ftgt[i],
                   fvals[i] + fstep[i] * fel[i].astype(dtype))
    a0 = (v0 * 0.5 + 0.5) * _HALF_PI
    da = fstep[i] * np.float32(np.pi / 4.0)  # d(angle)/d(sample)
    at = (ftgt[i] * 0.5 + 0.5) * _HALF_PI
    g2 = lambda x: _grid2(bank, x.astype(dtype))
    return [g2(a0), g2(da), g2(jnp.cos(at)), g2(jnp.sin(at)),
            g2((fdur[i] - fel[i]).astype(dtype))]


N_PAN_FAST = 5


def _pan_gains(i_f, g):
    """Per-sample equal-power pan gains.

    Eventful blocks (``g`` is a 10-tile ramp group): materialize pan and
    take cos/sin exactly like Pan2. Fast blocks (``g`` is the 5-tile
    linear-angle pack): polynomial cos/sin of the per-sample angle until
    the ramp ends (exact to 1.2e-7 at every mid-ramp sample — the old
    rotation pack only approximated those), the exact precomputed target
    gains after. Returns (panl, panr)."""
    if len(g) == N_EVENTFUL:
        angle = (_mat(i_f, g) * np.float32(0.5) + np.float32(0.5)) * _HALF_PI
        return jnp.cos(angle), jnp.sin(angle)
    a0_ref, da_ref, lt_ref, rt_ref, rem_ref = g
    angle = a0_ref[:] + da_ref[:] * i_f
    ended = i_f >= rem_ref[:]
    panl = jnp.where(ended, lt_ref[:], _sin_poly(_HALF_PI - angle))
    panr = jnp.where(ended, rt_ref[:], _sin_poly(angle))
    return panl, panr


# --------------------------------------------------------------------------
# sine bank
# --------------------------------------------------------------------------

def _sine_kernel(B, W, ng, f2pi, unroll, *refs):
    """Fused SineVoice: SinWt (u32 phase, table-quantized jnp.sin), EnvAsr,
    equal-power Pan2, stereo mix. refs: ramp groups for freq and amp (``ng``
    tiles each) and the pan group (10-tile ramp group when eventful, 5-tile
    linear-angle pack otherwise), then stage, t, rscale, atk, rel, active,
    W restart words, W release words, phase; outs: partial mix
    [1, B, 2, LANES], stage, t, rscale, phase."""
    np_ = N_EVENTFUL if ng == N_EVENTFUL else N_PAN_FAST
    trig_free = ng == N_FAST
    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    PAN = refs[2 * ng:2 * ng + np_]
    if trig_free:
        # event-free: no trigger words, active folded into AMP host-side
        (stage_ref, t_ref, rscale_ref, atk_ref, rel_ref, phase_ref,
         outl_ref, outr_ref, stage_out, t_out, rscale_out, phase_out) = \
            refs[2 * ng + np_:]
    else:
        base = refs[2 * ng + np_:]
        (stage_ref, t_ref, rscale_ref, atk_ref, rel_ref, act_ref) = base[:6]
        r_words, q_words = base[6], base[7]
        (phase_ref, outl_ref, outr_ref, stage_out, t_out, rscale_out,
         phase_out) = base[8:]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        if trig_free:
            env, stage, t_next = _env_asr_free(
                stage, t, rscale, atk_ref[:], rel_ref[:]
            )
            gain = env * _mat(i_f, AMP)
        else:
            restart = _trig_bit(i, r_words)
            release = _trig_bit(i, q_words)
            env, stage, t_next, rscale = _env_asr(
                stage, t, rscale, restart, release, atk_ref[:], rel_ref[:]
            )
            gain = env * _mat(i_f, AMP) * act_ref[:]

        freq = _mat(i_f, FREQ)
        osc = _sin_quant(phase)
        phase = phase + _to_inc(freq * f2pi)

        sig = osc * gain
        panl, panr = _pan_gains(i_f, PAN)
        # two mono [B, LANES] outs, not one [B, 2, LANES]: a trailing
        # (2, LANES) pair maps to (sublane, lane) and wastes 6/8 of every
        # 8-sublane store tile
        outl_ref[0, i, :] = jnp.sum(sig * panl, axis=0)
        outr_ref[0, i, :] = jnp.sum(sig * panr, axis=0)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    # fully unrolled on hardware: Mosaic's loop overhead costs ~20% at this
    # body size (the CPU interpreter keeps the rolled loop: cheap to trace)
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


class PallasSineVoiceBank(VoiceBank):
    """Drop-in VoiceBank for SineVoice with a fused Pallas kernel core."""

    # kernels fold kernel_burst_depth trajectory breakpoints per
    # (param, voice) slot: same-block bursts are exact up to that depth
    # (deeper bursts keep their last kernel_burst_depth events and the
    # host warns once). Constructor-configurable: deeper-burst workloads
    # pass kernel_burst_depth=N for exactness at N events per slot/block
    kernel_burst_depth = 3
    # superblocked programs may drive the kernel at k*B samples up to
    # this cap (compile.superblock_eligible honors it)
    superblock_cap = MAX_BLOCK

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.01, release: float = 0.1, tile_rows: int = 128,
                 kernel_burst_depth: int = 3):
        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            SineVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        if int(kernel_burst_depth) < 1:
            raise ValueError("kernel_burst_depth must be >= 1")
        self.kernel_burst_depth = int(kernel_burst_depth)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasSineBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasSineVoiceBank":
        return PallasSineVoiceBank(
            n_local,
            event_capacity=self.event_capacity,
            attack=self._attack,
            release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
            kernel_burst_depth=self.kernel_burst_depth,
        )

    def init(self, ctx: AudioCtx):
        _check_block(ctx, "PallasSineVoiceBank")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phase"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        # the nested per-voice UGen state from VoiceBank is unused here
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl

        B = ctx.block_size
        R = self.n_voices // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, ramp_ops, ng, atk, rel, act, \
            idle = _bank_setup(self, ctx, state, events)
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        if ng == N_FAST:
            # event-free block: fold active into amp, swap pan's ramp group
            # for the rotation pack, drop the (all-zero) trigger words
            ramp_ops = _fold_act(self, ramp_ops, act)
            ramp_ops = ramp_ops[:2 * ng] + _pan_fast_operands(
                self, fstate, dtype
            )
            extras = (state["stage"], state["t"], state["rscale"], atk, rel,
                      state["phase"])
        else:
            restart_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_restart")),
            )
            release_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_release")),
            )
            extras = (state["stage"], state["t"], state["rscale"], atk, rel,
                      act, restart_w, release_w, state["phase"])

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        # tests run on CPU: use the pallas interpreter there
        interpret = jax.devices()[0].platform == "cpu"
        W = (B + 31) // 32
        outs = pl.pallas_call(
            functools.partial(_sine_kernel, B, W, ng, f2pi,
                              _unroll(B, interpret)),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(*ramp_ops, *extras)
        partial_l, partial_r, stage, t, rscale, phase = outs
        out = jnp.stack(
            [jnp.sum(partial_l, axis=(0, 2)), jnp.sum(partial_r, axis=(0, 2))]
        )  # [2, B]
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B
        )
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "idle": idle | (stage.reshape(-1) == 0),
            "phase": phase, "stage": stage, "t": t, "rscale": rscale,
        }
        return new_state, out


# --------------------------------------------------------------------------
# FM bank
# --------------------------------------------------------------------------

def _fm_kernel(B, W, ng, f2pi, unroll, *refs):
    """2-op FM voice (models.FMVoice): per-sample modulator AND carrier u32
    phases (the modulator's frequency is freq*ratio of the materialized
    per-sample params; the carrier's instantaneous frequency is audio-rate
    FM), AR envelope, mono mix."""
    trig_free = ng == N_FAST
    FREQ = refs[0:ng]
    RATIO = refs[ng:2 * ng]
    INDEX = refs[2 * ng:3 * ng]
    AMP = refs[3 * ng:4 * ng]
    if trig_free:
        (phm_ref, phc_ref, stage_ref, t_ref, atk_ref, rel_ref,
         out_ref, phm_out, phc_out, stage_out, t_out) = refs[4 * ng:]
    else:
        base = refs[4 * ng:]
        (phm_ref, phc_ref, stage_ref, t_ref, atk_ref, rel_ref,
         act_ref) = base[:7]
        r_words = base[7]
        (out_ref, phm_out, phc_out, stage_out, t_out) = base[8:]
    one = np.float32(1.0)

    def body(i, carry):
        phm, phc, stage, t = carry
        i_f = i.astype(jnp.float32)
        if trig_free:
            env, stage, t_next = _env_ar_free(stage, t, atk_ref[:], rel_ref[:])
            gain = env * _mat(i_f, AMP)
        else:
            restart = _trig_bit(i, r_words)
            env, stage, t_next = _env_ar(stage, t, restart,
                                         atk_ref[:], rel_ref[:])
            gain = env * _mat(i_f, AMP) * act_ref[:]

        freq = _mat(i_f, FREQ)
        mod = _sin_quant(phm)
        phm = phm + _to_inc(freq * _mat(i_f, RATIO) * f2pi)
        car_freq = freq * (one + _mat(i_f, INDEX) * mod)
        car = _sin_quant(phc)
        phc = phc + _to_inc(car_freq * f2pi)

        sig = car * gain
        out_ref[0, i, :] = jnp.sum(sig, axis=0)
        return phm, phc, stage, t_next

    carry = (phm_ref[:], phc_ref[:], stage_ref[:], t_ref[:])
    phm, phc, stage, t = _sample_loop(B, body, carry, unroll)
    phm_out[:] = phm
    phc_out[:] = phc
    stage_out[:] = stage
    t_out[:] = t


class PallasFMVoiceBank(VoiceBank):
    """Drop-in VoiceBank for FMVoice with a fused Pallas kernel core.
    Sample-rate-agnostic (f2pi derived from the AudioCtx) and sample-accurate
    for per-voice float sets/ramps like the vmap path."""

    # kernels fold kernel_burst_depth trajectory breakpoints per
    # (param, voice) slot: same-block bursts are exact up to that depth
    # (deeper bursts keep their last kernel_burst_depth events and the
    # host warns once). Constructor-configurable: deeper-burst workloads
    # pass kernel_burst_depth=N for exactness at N events per slot/block
    kernel_burst_depth = 3
    # superblocked programs may drive the kernel at k*B samples up to
    # this cap (compile.superblock_eligible honors it)
    superblock_cap = MAX_BLOCK

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.005, release: float = 0.3,
                 tile_rows: int = 128, kernel_burst_depth: int = 3):
        from ..models.voices import FMVoice

        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            FMVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        if int(kernel_burst_depth) < 1:
            raise ValueError("kernel_burst_depth must be >= 1")
        self.kernel_burst_depth = int(kernel_burst_depth)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasFMBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasFMVoiceBank":
        return PallasFMVoiceBank(
            n_local, event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
            kernel_burst_depth=self.kernel_burst_depth,
        )

    def init(self, ctx: AudioCtx):
        _check_block(ctx, "PallasFMVoiceBank")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phm"] = jnp.zeros((R, LANES), jnp.uint32)
        base["phc"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl

        B = ctx.block_size
        R = self.n_voices // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, ramp_ops, ng, atk, rel, act, \
            idle = _bank_setup(self, ctx, state, events)
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)

        if ng == N_FAST:
            ramp_ops = _fold_act(self, ramp_ops, act)
            extras = (state["phm"], state["phc"], state["stage"], state["t"],
                      atk, rel)
        else:
            restart_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_restart")),
            )
            extras = (state["phm"], state["phc"], state["stage"], state["t"],
                      atk, rel, act, restart_w)
            TR = _eventful_tile_rows(TR, R, 4)  # freq, ratio, index, amp
            n_tiles = R // TR

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        W = (B + 31) // 32
        outs = pl.pallas_call(
            functools.partial(_fm_kernel, B, W, ng, f2pi,
                              _unroll(B, interpret)),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(*ramp_ops, *extras)
        partial_mix, phm, phc, stage, t = outs
        out = jnp.sum(partial_mix, axis=(0, 2))[None, :]  # [1, B]
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "idle": idle | (stage.reshape(-1) == 0),
            "phm": phm, "phc": phc, "stage": stage, "t": t,
        }
        return new_state, out


# --------------------------------------------------------------------------
# subtractive bank
# --------------------------------------------------------------------------

def _sub_kernel(B, W, ng, inv_sr, unroll, *refs):
    """Subtractive voice: polyBLEP saw -> SVF lowpass -> ASR envelope.

    Per-sample parity with the vmap path: dt = freq/sr from the materialized
    per-sample freq, and the SVF coefficients (svf.rs set_coeffs Low type)
    are recomputed per sample so filter sweeps are sample-accurate like
    SvfFilter. The coefficients use the one-divide algebraic form
    (``_svf_low_coeffs``): with s = sin(x), c = cos(x), x = pi*cutoff/sr,
    a1/a2/a3 = Q*(c^2, s*c, s^2) / (Q + s*c) — identical to the tan form
    1/(1+g(g+k)) exactly, evaluated with the kernel's odd polynomial
    (<=1.2e-7): replaces tan + two divides with two polys. Measured 19.5G
    -> 39.4G voice-samples/s on the v5e (benchmarks/kernel_probe.py
    sub_scform; output diff vs the tan form 4.1e-8, far under the 1e-5
    kernel-vs-vmap tolerance — SvfFilter itself keeps the tan form)."""
    trig_free = ng == N_FAST
    FREQ = refs[0:ng]
    CUT = refs[ng:2 * ng]
    Q = refs[2 * ng:3 * ng]
    AMP = refs[3 * ng:4 * ng]
    if trig_free:
        (t_ref, ic1_ref, ic2_ref, stage_ref, et_ref, rscale_ref,
         atk_ref, rel_ref,
         out_ref, t_out, ic1_out, ic2_out, stage_out, et_out, rscale_out) = \
            refs[4 * ng:]
    else:
        base = refs[4 * ng:]
        (t_ref, ic1_ref, ic2_ref, stage_ref, et_ref, rscale_ref,
         atk_ref, rel_ref, act_ref) = base[:9]
        r_words, q_words = base[9], base[10]
        (out_ref, t_out, ic1_out, ic2_out, stage_out, et_out,
         rscale_out) = base[11:]
    one = np.float32(1.0)
    zero = np.float32(0.0)
    two = np.float32(2.0)
    pi_inv_sr = np.float32(np.pi) * inv_sr

    def blep(t, dt):
        safe_dt = jnp.maximum(dt, np.float32(1e-9))
        a = t / safe_dt - one
        b = (t - one) / safe_dt + one
        return jnp.where(
            t < dt, -(a * a), jnp.where(t > one - dt, b * b, zero)
        )

    def body(i, carry):
        t, ic1, ic2, stage, et, rscale = carry
        i_f = i.astype(jnp.float32)
        if trig_free:
            env, stage, et_next = _env_asr_free(
                stage, et, rscale, atk_ref[:], rel_ref[:]
            )
        else:
            restart = _trig_bit(i, r_words)
            release = _trig_bit(i, q_words)
            env, stage, et_next, rscale = _env_asr(
                stage, et, rscale, restart, release, atk_ref[:], rel_ref[:]
            )

        # polyBLEP sawtooth (polyblep.rs saw): y = 2*frac(t+0.5)-1 - blep
        dt = jnp.clip(_mat(i_f, FREQ) * inv_sr, 0.0, 0.5)
        _t = t + np.float32(0.5)
        _t = _t - jnp.floor(_t)
        saw = two * _t - one - blep(_t, dt)
        t = t + dt
        t = t - jnp.floor(t)

        # SVF lowpass coefficients per sample (one-divide sc-form; see
        # _svf_low_coeffs)
        a1, a2, a3 = _svf_low_coeffs(pi_inv_sr * _mat(i_f, CUT),
                                     _mat(i_f, Q))
        # SVF step (svf.rs process_sample, m = (0, 0, 1))
        v3 = saw - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = two * v1 - ic1
        ic2 = two * v2 - ic2

        gain = env * _mat(i_f, AMP)
        if not trig_free:
            gain = gain * act_ref[:]
        out_ref[0, i, :] = jnp.sum(v2 * gain, axis=0)
        return t, ic1, ic2, stage, et_next, rscale

    carry = (t_ref[:], ic1_ref[:], ic2_ref[:], stage_ref[:], et_ref[:],
             rscale_ref[:])
    t, ic1, ic2, stage, et, rscale = _sample_loop(B, body, carry, unroll)
    t_out[:] = t
    ic1_out[:] = ic1
    ic2_out[:] = ic2
    stage_out[:] = stage
    et_out[:] = et
    rscale_out[:] = rscale


class PallasSubtractiveVoiceBank(VoiceBank):
    """Drop-in VoiceBank for SubtractiveVoice with a fused Pallas kernel.

    Caveat vs the vmap path: the oscillator is the plain polyBLEP saw without
    the >sr/4 sine fallback (keep fundamentals below sr/4)."""

    # kernels fold kernel_burst_depth trajectory breakpoints per
    # (param, voice) slot: same-block bursts are exact up to that depth
    # (deeper bursts keep their last kernel_burst_depth events and the
    # host warns once). Constructor-configurable: deeper-burst workloads
    # pass kernel_burst_depth=N for exactness at N events per slot/block
    kernel_burst_depth = 3
    # superblocked programs may drive the kernel at k*B samples up to
    # this cap (compile.superblock_eligible honors it)
    superblock_cap = MAX_BLOCK

    def __init__(self, n_voices: int, voice_defaults=None, event_capacity=256,
                 attack: float = 0.01, release: float = 0.2,
                 tile_rows: int = 128, kernel_burst_depth: int = 3):
        from ..models.voices import SubtractiveVoice

        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            SubtractiveVoice(attack=attack, release=release),
            n_voices,
            voice_defaults=voice_defaults,
            event_capacity=event_capacity,
        )
        self.tile_rows = int(tile_rows)
        if int(kernel_burst_depth) < 1:
            raise ValueError("kernel_burst_depth must be >= 1")
        self.kernel_burst_depth = int(kernel_burst_depth)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasSubtractiveBank[{self.n_voices}]"

    def make_local(self, n_local: int) -> "PallasSubtractiveVoiceBank":
        return PallasSubtractiveVoiceBank(
            n_local, event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
            kernel_burst_depth=self.kernel_burst_depth,
        )

    def init(self, ctx: AudioCtx):
        _check_block(ctx, "PallasSubtractiveVoiceBank")
        base = super().init(ctx)
        R = self.n_voices // LANES
        z = lambda: jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = z()
        base["ic1"] = z()
        base["ic2"] = z()
        base["stage"] = z()
        base["et"] = z()
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl

        B = ctx.block_size
        R = self.n_voices // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, ramp_ops, ng, atk, rel, act, \
            idle = _bank_setup(self, ctx, state, events)
        inv_sr = np.float32(1.0 / ctx.sample_rate)

        if ng == N_FAST:
            ramp_ops = _fold_act(self, ramp_ops, act)
            extras = (state["t"], state["ic1"], state["ic2"], state["stage"],
                      state["et"], state["rscale"], atk, rel)
        else:
            restart_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_restart")),
            )
            release_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_release")),
            )
            extras = (state["t"], state["ic1"], state["ic2"], state["stage"],
                      state["et"], state["rscale"],
                      atk, rel, act, restart_w, release_w)
            TR = _eventful_tile_rows(TR, R, 4)  # freq, cutoff, q, amp
            n_tiles = R // TR

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        W = (B + 31) // 32
        outs = pl.pallas_call(
            functools.partial(_sub_kernel, B, W, ng, inv_sr,
                              _unroll(B, interpret)),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(), tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(*ramp_ops, *extras)
        partial_mix, t, ic1, ic2, stage, et, rscale = outs
        out = jnp.sum(partial_mix, axis=(0, 2))[None, :]  # [1, B]
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "idle": idle | (stage.reshape(-1) == 0),
            "t": t, "ic1": ic1, "ic2": ic2, "stage": stage, "et": et,
            "rscale": rscale,
        }
        return new_state, out


# --------------------------------------------------------------------------
# additive wavetable bank
# --------------------------------------------------------------------------

def _wt_kernel(B, W, ng, f2pi, acoef, bcoef, nyq, unroll, *refs):
    """Additive wavetable voice (models.AdditiveVoice): H partials per voice
    by phasor recurrence from the per-sample full-resolution fundamental
    angle, per-sample Nyquist masking, ASR envelope, equal-power pan, stereo
    mix. The per-harmonic A/B coefficients are python-float constants baked
    into the unrolled harmonic loop (no [H, R, LANES] tiles)."""
    np_ = N_EVENTFUL if ng == N_EVENTFUL else N_PAN_FAST
    trig_free = ng == N_FAST
    FREQ = refs[0:ng]
    AMP = refs[ng:2 * ng]
    PAN = refs[2 * ng:2 * ng + np_]
    if trig_free:
        (phase_ref, stage_ref, t_ref, rscale_ref, atk_ref, rel_ref,
         outl_ref, outr_ref, phase_out, stage_out, t_out, rscale_out) = \
            refs[2 * ng + np_:]
    else:
        base = refs[2 * ng + np_:]
        (phase_ref, stage_ref, t_ref, rscale_ref, atk_ref, rel_ref,
         act_ref) = base[:7]
        r_words, q_words = base[7], base[8]
        (outl_ref, outr_ref, phase_out, stage_out, t_out,
         rscale_out) = base[9:]
    H = len(acoef)
    zero = np.float32(0.0)
    # hoisted per-harmonic Nyquist thresholds (f64 divide, f32 round — the
    # same constants as AdditiveVoice.process so the boundary rounds
    # identically): one compare per harmonic per sample instead of
    # multiply+compare. Measured +8% (12.18G -> 13.15G, kernel_probe
    # wt_hmax, bit-identical output on the probe bank).
    thr = [np.float32(np.float64(nyq) / (h + 1)) for h in range(H)]

    def body(i, carry):
        phase, stage, t, rscale = carry
        i_f = i.astype(jnp.float32)
        if trig_free:
            env, stage, t_next = _env_asr_free(
                stage, t, rscale, atk_ref[:], rel_ref[:]
            )
        else:
            restart = _trig_bit(i, r_words)
            release = _trig_bit(i, q_words)
            env, stage, t_next, rscale = _env_asr(
                stage, t, rscale, restart, release, atk_ref[:], rel_ref[:]
            )

        freq = _mat(i_f, FREQ)
        theta = _theta_full(phase)
        s1 = jnp.sin(theta)
        c1 = jnp.cos(theta)
        phase = phase + _to_inc(freq * f2pi)

        s, c = s1, c1
        acc = jnp.where(freq <= thr[0],
                        np.float32(acoef[0]) * s + np.float32(bcoef[0]) * c,
                        zero)
        for h in range(1, H):
            s, c = s * c1 + c * s1, c * c1 - s * s1
            part = np.float32(acoef[h]) * s + np.float32(bcoef[h]) * c
            acc = acc + jnp.where(freq <= thr[h], part, zero)

        gain = env * _mat(i_f, AMP)
        if not trig_free:
            gain = gain * act_ref[:]
        sig = acc * gain
        panl, panr = _pan_gains(i_f, PAN)
        # two mono outs for store-tile efficiency (see _sine_kernel)
        outl_ref[0, i, :] = jnp.sum(sig * panl, axis=0)
        outr_ref[0, i, :] = jnp.sum(sig * panr, axis=0)
        return phase, stage, t_next, rscale

    carry = (phase_ref[:], stage_ref[:], t_ref[:], rscale_ref[:])
    # measured: unrolling this kernel is a net loss (the harmonic loop
    # already fills the VPU; 64x body duplication only bloats the program)
    phase, stage, t, rscale = _sample_loop(B, body, carry, unroll)
    phase_out[:] = phase
    stage_out[:] = stage
    t_out[:] = t
    rscale_out[:] = rscale


class PallasWavetableVoiceBank(VoiceBank):
    """Drop-in VoiceBank for AdditiveVoice with a fused Pallas kernel core:
    arbitrary band-limited wavetables (OscWt's role,
    knaster_core/src/dsp/wavetable.rs) at voice-bank scale.

    Pass ``table`` (one waveform cycle) or ``harmonics`` (mags, or (mags,
    u32 offsets)); the table is decomposed into ``n_harmonics`` partials and
    re-synthesized gather-free with exact per-voice per-sample anti-aliasing
    (partials above Nyquist masked). Cost scales linearly with
    ``n_harmonics``."""

    # kernels fold kernel_burst_depth trajectory breakpoints per
    # (param, voice) slot: same-block bursts are exact up to that depth
    # (deeper bursts keep their last kernel_burst_depth events and the
    # host warns once). Constructor-configurable: deeper-burst workloads
    # pass kernel_burst_depth=N for exactness at N events per slot/block
    kernel_burst_depth = 3
    # superblocked programs may drive the kernel at k*B samples up to
    # this cap (compile.superblock_eligible honors it)
    superblock_cap = MAX_BLOCK

    def __init__(self, n_voices: int, table=None, harmonics=None,
                 n_harmonics: int = 16, voice_defaults=None,
                 event_capacity=256, attack: float = 0.01,
                 release: float = 0.1, tile_rows: int = 128,
                 kernel_burst_depth: int = 3):
        from ..models.voices import AdditiveVoice

        voice = AdditiveVoice(
            table=table, harmonics=harmonics, n_harmonics=n_harmonics,
            attack=attack, release=release,
        )
        # keep the unrolled harmonic loop's VMEM footprint bounded
        H = len(voice.mags)
        while tile_rows > 8 and (2 * H + 40) * tile_rows * LANES * 8 > (10 << 20):
            tile_rows //= 2
        tile_rows = _cap_tile_rows(tile_rows, n_voices)
        if n_voices % (tile_rows * LANES):
            raise ValueError(f"n_voices must be a multiple of {tile_rows * LANES}")
        super().__init__(
            voice, n_voices,
            voice_defaults=voice_defaults, event_capacity=event_capacity,
        )
        self.mags = voice.mags
        self.offsets = voice.offsets
        self.tile_rows = int(tile_rows)
        if int(kernel_burst_depth) < 1:
            raise ValueError("kernel_burst_depth must be >= 1")
        self.kernel_burst_depth = int(kernel_burst_depth)
        self._attack = float(attack)
        self._release = float(release)

    def name(self):
        return f"PallasWavetableBank[{self.n_voices}x{len(self.mags)}h]"

    def make_local(self, n_local: int) -> "PallasWavetableVoiceBank":
        return PallasWavetableVoiceBank(
            n_local, harmonics=(self.mags, self.offsets),
            event_capacity=self.event_capacity,
            attack=self._attack, release=self._release,
            tile_rows=min(self.tile_rows, n_local // LANES),
            kernel_burst_depth=self.kernel_burst_depth,
        )

    def init(self, ctx: AudioCtx):
        _check_block(ctx, "PallasWavetableVoiceBank")
        base = super().init(ctx)
        R = self.n_voices // LANES
        base["phase"] = jnp.zeros((R, LANES), jnp.uint32)
        base["stage"] = jnp.zeros((R, LANES), ctx.dtype)
        base["t"] = jnp.zeros((R, LANES), ctx.dtype)
        base["rscale"] = jnp.ones((R, LANES), ctx.dtype)
        del base["voices"]
        return base

    def process(self, ctx: AudioCtx, state, inputs, params, events=None):
        from jax.experimental import pallas as pl

        B = ctx.block_size
        R = self.n_voices // LANES
        TR = self.tile_rows
        n_tiles = R // TR
        dtype = ctx.dtype

        fstate, ivals, active, ramp_ops, ng, atk, rel, act, \
            idle = _bank_setup(self, ctx, state, events)
        f2pi = np.float32(TABLE_SIZE * FRACTIONAL_PART / ctx.sample_rate)
        if ng == N_FAST:
            # event-free block: fold active into amp, swap pan's ramp group
            # for the rotation pack, drop the (all-zero) trigger words
            ramp_ops = _fold_act(self, ramp_ops, act)
            ramp_ops = ramp_ops[:2 * ng] + _pan_fast_operands(
                self, fstate, dtype
            )
            extras = (state["phase"], state["stage"], state["t"],
                      state["rscale"], atk, rel)
        else:
            restart_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_restart")),
            )
            release_w = _grid3(
                self,
                self._packed_trigs(ctx, events, self.trig_index("t_release")),
            )
            extras = (state["phase"], state["stage"], state["t"],
                      state["rscale"], atk, rel, act,
                      restart_w, release_w)

        # per-harmonic A/B constants: table phases folded into static coeffs
        # (partial_h = A_h*sin(h*theta) + B_h*cos(h*theta))
        phi = self.offsets.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        acoef = tuple(float(x) for x in
                      (self.mags * np.cos(phi)).astype(np.float32))
        bcoef = tuple(float(x) for x in
                      (self.mags * np.sin(phi)).astype(np.float32))

        tile = lambda: pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        interpret = jax.devices()[0].platform == "cpu"
        outs = pl.pallas_call(
            functools.partial(
                _wt_kernel, B, (B + 31) // 32, ng, f2pi, acoef, bcoef,
                float(ctx.sample_rate / 2.0), False,
            ),
            grid=(n_tiles,),
            in_specs=_op_specs(pl, ramp_ops, TR) + _extra_specs(pl, extras, TR),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((n_tiles, B, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
                jax.ShapeDtypeStruct((R, LANES), dtype),
            ),
            out_specs=(
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile(), tile(), tile(), tile(),
            ),
            interpret=interpret,
        )(*ramp_ops, *extras)
        partial_l, partial_r, phase, stage, t, rscale = outs
        out = jnp.stack(
            [jnp.sum(partial_l, axis=(0, 2)), jnp.sum(partial_r, axis=(0, 2))]
        )  # [2, B]
        fvals, ftarget, fstep, felapsed, fdur, fsdur = self._advance_ramps(
            fstate, B)
        new_state = {
            "fvals": fvals, "ftarget": ftarget, "fstep": fstep,
            "felapsed": felapsed, "fdur": fdur, "fsdur": fsdur,
            "ivals": ivals, "active": active,
            "idle": idle | (stage.reshape(-1) == 0),
            "phase": phase, "stage": stage, "t": t, "rscale": rscale,
        }
        return new_state, out
