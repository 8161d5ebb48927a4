"""Throwaway TPU probe: where does the vectorized GrainPlayer spend time?

Variants of knaster_tpu/ugens/granular.py process():
  vec        — production vectorized path (baseline)
  nobuf      — buffer interpolation replaced by `frac` (no HBM gather):
               isolates the source-read gather cost
  noev       — event-table gathers replaced by broadcast of row 0:
               isolates the 6 small [B,G]<-[B] gathers + s_of_e[j]
  pair       — buffer read via ONE lax.gather with slice_sizes=(2,)
               (i0 and i0+1 in one gather) instead of two gathers
  evmm       — event tables gathered via one-hot matmul: onehot(j) [B*G, B]
               @ stacked tables [B, 7] on the MXU instead of 7 gathers
  unroll     — vec + fully unrolled scheduler scan
  all        — pair + evmm + unroll combined
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import knaster_tpu as kt
from knaster_tpu.core.ugen import AudioCtx
from knaster_tpu.ugens.granular import GrainPlayer

SR = 48000
B = 64

t = np.arange(SR, dtype=np.float32)
buf = kt.Buffer(np.sin(2 * np.pi * 220.0 / SR * t).astype(np.float32)[None, :], SR)
ctx = AudioCtx(SR, B, np.float32)
gp = GrainPlayer(buf, grains=64, density=400.0, grain_dur=0.08,
                 pos_jitter=0.3, rate_jitter=0.5, amp=0.2)
state0 = gp.init(ctx)
names = [p.name for p in gp.params]
defaults = {p.name: gp.pdefaults.get(p.name, p.default) for p in gp.params}
params = {n: (np.zeros(B, bool) if n == "t_spawn"
              else np.full(B, defaults[n], np.float32)) for n in names}
params = {k: jnp.asarray(v) for k, v in params.items()}


def make_process(mode):
    G = gp.grains
    dtype = ctx.dtype
    key = jax.random.key(gp.seed)
    half_pi = np.float32(np.pi / 2)
    half = np.float32(0.5)
    n_frames = gp.buffer.frames
    buf0 = jnp.asarray(gp.buffer.data[gp.channel].astype(dtype))

    def process(c_ctx, state, inputs, p):
        (period, dur_smp, pos_f, posj_f, rate_p, ratej,
         spread) = gp._spawn_quantities(ctx, p)
        Bn = period.shape[0]
        i_ar = jnp.arange(Bn, dtype=jnp.int32)

        def sched(carry, x):
            countdown, counter = carry
            countdown = countdown - np.float32(1.0)
            due = (countdown <= 0.0) | x["t"]
            countdown = jnp.where(
                due, jnp.where(x["t"], x["p"], countdown + x["p"]), countdown)
            return ((countdown, counter + due.astype(jnp.uint32)),
                    (due, counter))

        unroll = Bn if mode in ("unroll", "all", "allhp", "norand", "nowin") else 1
        (countdown_end, counter_end), (due, ctr_pre) = jax.lax.scan(
            sched, (state["countdown"], state["counter"]),
            {"t": p["t_spawn"], "p": period}, unroll=unroll)

        ctr0 = state["counter"]
        e_local = (ctr_pre - ctr0).astype(jnp.int32)
        n_applied = e_local + due.astype(jnp.int32)
        s_of_e = jnp.zeros(Bn, jnp.int32).at[
            jnp.where(due, e_local, Bn)].set(i_ar, mode="drop")

        ev_ctr = ctr0 + jnp.arange(Bn, dtype=jnp.uint32)
        u = jax.vmap(
            lambda c: jax.random.uniform(jax.random.fold_in(key, c), (3,),
                                         minval=-1.0, maxval=1.0)
        )(ev_ctr).astype(dtype)
        if mode == "norand":
            u = jnp.zeros((Bn, 3), dtype)
        ev_dur = dur_smp[s_of_e]
        ev_src0 = pos_f[s_of_e] + posj_f[s_of_e] * u[:, 0]
        ev_step = rate_p[s_of_e] * jnp.exp2(u[:, 1] * ratej[s_of_e])
        pan = u[:, 2] * spread[s_of_e]
        angle = (pan * half + half) * half_pi
        ev_gl = jnp.cos(angle)
        ev_gr = jnp.sin(angle)

        g0 = (ctr0 % np.uint32(G)).astype(jnp.int32)
        offs = jnp.mod(jnp.arange(G, dtype=jnp.int32) - g0, G)[None, :]
        n_bg = n_applied[:, None]
        has = n_bg > offs
        j = jnp.clip(offs + G * ((n_bg - 1 - offs) // G), 0, Bn - 1)

        if mode == "noev":
            dur = jnp.where(has, ev_dur[0], state["dur"][None, :])
            src0 = jnp.where(has, ev_src0[0], state["src0"][None, :])
            step = jnp.where(has, ev_step[0], state["step"][None, :])
            gl = jnp.where(has, ev_gl[0], state["gl"][None, :])
            gr = jnp.where(has, ev_gr[0], state["gr"][None, :])
            age = jnp.where(has, i_ar[:, None] - s_of_e[0],
                            state["age"][None, :] + (i_ar[:, None] + 1))
        elif mode in ("evmm", "evhp", "all", "allhp", "norand", "nowin"):
            tab = jnp.stack([ev_dur, ev_src0, ev_step, ev_gl, ev_gr,
                             s_of_e.astype(dtype)], axis=1)    # [B, 6]
            onehot = (j.reshape(-1, 1) ==
                      jnp.arange(Bn, dtype=jnp.int32)[None, :]).astype(dtype)
            prec = (jax.lax.Precision.HIGHEST if mode in ("evhp", "allhp", "norand", "nowin")
                    else jax.lax.Precision.DEFAULT)
            vals = jnp.matmul(onehot, tab,
                              precision=prec).reshape(Bn, G, 6)  # [B, G, 6]
            dur = jnp.where(has, vals[..., 0], state["dur"][None, :])
            src0 = jnp.where(has, vals[..., 1], state["src0"][None, :])
            step = jnp.where(has, vals[..., 2], state["step"][None, :])
            gl = jnp.where(has, vals[..., 3], state["gl"][None, :])
            gr = jnp.where(has, vals[..., 4], state["gr"][None, :])
            age = jnp.where(has, i_ar[:, None] - vals[..., 5].astype(jnp.int32),
                            state["age"][None, :] + (i_ar[:, None] + 1))
        else:
            dur = jnp.where(has, ev_dur[j], state["dur"][None, :])
            src0 = jnp.where(has, ev_src0[j], state["src0"][None, :])
            step = jnp.where(has, ev_step[j], state["step"][None, :])
            gl = jnp.where(has, ev_gl[j], state["gl"][None, :])
            gr = jnp.where(has, ev_gr[j], state["gr"][None, :])
            age = jnp.where(has, i_ar[:, None] - s_of_e[j],
                            state["age"][None, :] + (i_ar[:, None] + 1))

        a = age.astype(dtype)
        active = a < dur
        ph = a / dur
        w = (active.astype(dtype) if mode == "nowin"
             else jnp.where(active, gp._window(ph, dtype), 0.0))
        src = src0 + a * step
        idx = jnp.floor(src)
        frac = src - idx
        idx = idx.astype(jnp.int32)
        i0 = jnp.mod(idx, n_frames)
        valid = active
        if mode == "nobuf":
            s = frac
        elif mode in ("pair", "all", "allhp", "norand", "nowin"):
            gathered = jax.lax.gather(
                jnp.concatenate([buf0, buf0[:1]]),        # i0+1 may wrap
                i0.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(2,), mode="clip").reshape(Bn, G, 2)
            s = gathered[..., 0] * (np.float32(1.0) - frac) \
                + gathered[..., 1] * frac
        else:
            i1 = jnp.mod(idx + 1, n_frames)
            s = buf0[i0] * (np.float32(1.0) - frac) + buf0[i1] * frac
        sig = jnp.where(valid, w * s, 0.0)
        amp = p["amp"].astype(dtype)
        outl = jnp.sum(sig * gl, axis=1) * amp
        outr = jnp.sum(sig * gr, axis=1) * amp
        new_state = {
            "countdown": countdown_end, "counter": counter_end,
            "age": age[-1], "dur": dur[-1], "src0": src0[-1],
            "step": step[-1], "gl": gl[-1], "gr": gr[-1],
        }
        return new_state, jnp.stack([outl, outr])

    return process


def run(fn, label, n=750):
    @jax.jit
    def render(s):
        def blk(c, _):
            c2, out = fn(ctx, c, np.zeros((0, B)), params)
            return c2, out.mean()
        return jax.lax.scan(blk, s, None, length=n)

    s, m = render(state0)
    _ = np.asarray(m)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    rate = n * B / dt
    print(f"{label}: {rate:,.0f} samples/s = {rate/SR:.1f}x rt", flush=True)


# parity first (pair/evmm must match vec exactly on the buffer values)
ref = make_process("vec")
sref, oref = jax.jit(lambda s: ref(ctx, s, None, params))(state0)
for m in ("pair", "evmm", "evhp", "unroll", "all"):
    fn = make_process(m)
    sm, om = jax.jit(lambda s: fn(ctx, s, None, params))(state0)
    d = float(np.max(np.abs(np.asarray(om) - np.asarray(oref))))
    print(f"parity {m} vs vec: max|d| = {d:.3e}", flush=True)

for m in ("allhp", "norand", "nowin"):
    run(make_process(m), m)
