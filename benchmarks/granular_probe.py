"""Micro-probe: granular windowed-read weight-extraction variants on-chip.

The granular_bank roofline row (RESULTS.md) pinned the bottleneck on the
[slots, C, 2W] f32 one-hot window weights (~100 MB/block of HBM traffic at
64x64 slots). This probe times isolated variants at the suite workload's
exact shapes (players*grains folded into one slot axis) to pick the round-5
form:

  a) two einsums at HIGHEST (the round-4 shipping form)
  b) ONE combined-weight einsum (lerp folded into the weights)
  c) elementwise multiply + lane reduce (XLA fuses the one-hot producer
     into the reduction - no materialized weights at all, VPU MACs only)
  d) radix (hi-strip) decomposition: one-hot(hi) pulls an overlap strip,
     a combined lo-weight reads both taps from it

All variants are algebraically the two-tap lerp s0*(1-fr)+s1*fr; exactness
vs the gather form is asserted per run (<= 1 ulp-scale tolerance; the
shipping form must then pass the BIT-parity suite).

Usage: python benchmarks/granular_probe.py [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

# suite granular_bank shapes: B=64, C=16 -> nc=4; G = 64 players x 64
# grains; max_rate=2 -> nT=3, W=48, window pair 2W=96
NC, C, G, W2 = 4, 16, 4096, 96
NHI, NLO = 12, 8  # radix split of 96


def _inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    win = jax.random.normal(k1, (NC, G, W2), jnp.float32)
    wsel = jax.random.randint(k2, (NC, C, G), 0, W2 - 1)
    fr = jax.random.uniform(k3, (NC, C, G), jnp.float32)
    return win, wsel, fr


def v_gather(win, wsel, fr):
    """Ground truth: per-sample two-tap gather from the window."""
    s0 = jnp.take_along_axis(
        win[:, None], jnp.broadcast_to(wsel[..., None], wsel.shape + (1,)), axis=-1
    )[..., 0]
    s1 = jnp.take_along_axis(
        win[:, None], jnp.broadcast_to((wsel + 1)[..., None], wsel.shape + (1,)),
        axis=-1,
    )[..., 0]
    return s0 * (1.0 - fr) + s1 * fr


def v_two_einsum(win, wsel, fr):
    j = jnp.arange(W2)
    m0 = (wsel[..., None] == j).astype(jnp.float32)
    m1 = ((wsel + 1)[..., None] == j).astype(jnp.float32)
    s0 = jnp.einsum("ncgw,ngw->ncg", m0, win, precision=lax.Precision.HIGHEST)
    s1 = jnp.einsum("ncgw,ngw->ncg", m1, win, precision=lax.Precision.HIGHEST)
    return s0 * (1.0 - fr) + s1 * fr


def v_combined_einsum(win, wsel, fr):
    j = jnp.arange(W2)
    m0 = (wsel[..., None] == j).astype(jnp.float32)
    m1 = ((wsel + 1)[..., None] == j).astype(jnp.float32)
    wts = m0 * (1.0 - fr)[..., None] + m1 * fr[..., None]
    return jnp.einsum("ncgw,ngw->ncg", wts, win, precision=lax.Precision.HIGHEST)


def v_elementwise(win, wsel, fr):
    j = jnp.arange(W2)
    m0 = (wsel[..., None] == j).astype(jnp.float32)
    m1 = ((wsel + 1)[..., None] == j).astype(jnp.float32)
    wts = m0 * (1.0 - fr)[..., None] + m1 * fr[..., None]
    return jnp.sum(wts * win[:, None], axis=-1)


def v_elementwise_2tap(win, wsel, fr):
    """Two separate 0/1 selects fused elementwise, lerp after — matches
    the gather form's float ops exactly (bit-parity candidate)."""
    j = jnp.arange(W2)
    m0 = (wsel[..., None] == j).astype(jnp.float32)
    m1 = ((wsel + 1)[..., None] == j).astype(jnp.float32)
    s0 = jnp.sum(m0 * win[:, None], axis=-1)
    s1 = jnp.sum(m1 * win[:, None], axis=-1)
    return s0 * (1.0 - fr) + s1 * fr


def v_radix(win, wsel, fr):
    hi = wsel // NLO
    lo = wsel - hi * NLO
    # overlap strip: win reshaped [.., NHI, NLO] + next strip's first lane
    w3 = win.reshape(NC, G, NHI, NLO)
    nxt = jnp.concatenate(
        [w3[..., 1:, 0], jnp.zeros((NC, G, 1), jnp.float32)], axis=-1
    )  # [NC, G, NHI] first lane of the NEXT hi-tile (wsel < W2-1 in-probe)
    wext = jnp.concatenate([w3, nxt[..., None]], axis=-1)  # [NC,G,NHI,NLO+1]
    jh = jnp.arange(NHI)
    mh = (hi[..., None] == jh).astype(jnp.float32)
    strip = jnp.einsum(
        "ncgh,nghl->ncgl", mh, wext, precision=lax.Precision.HIGHEST
    )  # [NC, C, G, NLO+1]
    jl = jnp.arange(NLO + 1)
    m0 = (lo[..., None] == jl).astype(jnp.float32)
    m1 = ((lo + 1)[..., None] == jl).astype(jnp.float32)
    wts = m0 * (1.0 - fr)[..., None] + m1 * fr[..., None]
    return jnp.sum(wts * strip, axis=-1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    variants = {
        "two_einsum": v_two_einsum,
        "gather_taa": v_gather,
        "elementwise_2tap": v_elementwise_2tap,
    }
    if "--vmap" in sys.argv:
        # the REAL engine layout: vmap over P players, per-player G
        P, Gp = 64, G // 64
        def _vm(f):
            def g(win, wsel, fr):
                wv = win.reshape(P, Gp, NC, W2).transpose(0, 2, 1, 3)
                sv = wsel.reshape(NC, C, P, Gp).transpose(2, 0, 1, 3)
                fv = fr.reshape(NC, C, P, Gp).transpose(2, 0, 1, 3)
                out = jax.vmap(f)(wv, sv, fv)   # [P, NC, C, Gp]
                return out.transpose(1, 2, 0, 3).reshape(NC, C, G)
            return g
        variants = {k + "_vmap": _vm(v) for k, v in variants.items()}
    key = jax.random.PRNGKey(0)
    win, wsel, fr = _inputs(key)
    truth = np.asarray(v_gather(win, wsel, fr))

    for name, fn in variants.items():
        jf = jax.jit(fn)
        out = np.asarray(jf(win, wsel, fr))
        err = np.abs(out - truth).max()
        bit = "BIT" if (out == truth).all() else f"maxdiff {err:.2e}"

        # carry-chained slope timing: each call's window is perturbed by
        # the previous result (bits evolve -> no platform result cache),
        # slope between two loop lengths cancels dispatch + fetch floors
        @jax.jit
        def step(w, prev):
            w2 = w * (1.0 + 1e-30 * jnp.sum(prev))
            return fn(w2, wsel, fr)

        def run(n):
            prev = jnp.zeros((NC, C, G), jnp.float32)
            t0 = time.time()
            for _ in range(n):
                prev = step(win, prev)
            np.asarray(prev)
            return time.time() - t0

        run(3)  # warmup
        slopes = []
        for _ in range(3):
            t_lo = run(reps // 2)
            t_hi = run(reps)
            slopes.append((t_hi - t_lo) / (reps - reps // 2))
        per = sorted(slopes)[1]  # median of 3
        print(f"{name:18s} {per*1e6:9.1f} us/call  [{bit}]", flush=True)


if __name__ == "__main__":
    main()
