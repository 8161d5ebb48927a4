"""Arbitrary-rate sampler read-path probe (run on the real TPU).

DESIGN_NOTES "Gathers bill per element" measured the two-tap interpolated
gather read at ~1,438 rt voices (V=4096, 48 k-frame shared buffer) and
called it the access pattern's speed-of-light: element gathers from a
large HBM table dominate 57x over the math. The tiled unit-rate sampler
(37k rt voices) proved CONTIGUOUS row fetches are ~26x cheaper — but its
barrel-roll trick needs unit rate.

Hypothesis probed here: for BOUNDED rate (step in [0, 2)), the block's
read window spans < 2B+2 source frames, so 4 contiguous B-wide tiles
row-fetched per voice cover every tap. In-window selection then needs no
per-element gather: it is a [B, 4B] matmul against the window —
  * ``win_interp``: M[i,j] = clamp(1 - |p_i - j|, 0, 1) is exactly the
    two-tap linear-interp weight row (1-frac at floor(p), frac at
    floor(p)+1, 0 elsewhere) — ONE matmul does fetch + lerp.
  * ``win_onehot2``: two one-hot matrices fetch the taps separately and
    the production lerp formula combines them — candidate for BIT-exact
    parity with the gather path (granular precedent: one-hot matmul at
    HIGHEST precision is an exact gather).
  * ``win_chunk16``: same idea at chunk granularity (C=16, 4 C-wide
    tiles per chunk) — 4x less weight-matrix HBM traffic, for scale.

Usage: python benchmarks/_sampler_probe.py [variants...|all] [--voices N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

SR = 48000
B = 64
L = 48000  # loop length (frames)
RMAX = 2.0

HI = lax.Precision.HIGHEST


def make_buffer():
    rng = np.random.default_rng(7)
    return rng.standard_normal(L).astype(np.float32)


def make_ext(src, tile):
    """Loop-wrap-baked extended source reshaped to [Te, tile]."""
    ext = np.concatenate([src, src[: 4 * tile + 1]])
    pad = (-len(ext)) % tile + tile
    ext = np.concatenate([ext, np.zeros(pad, np.float32)])
    return ext.reshape(-1, tile)


def positions(pos_int, pos_frac, step):
    """Production SamplerVoice position trajectory (voices.py process)."""
    t = jnp.arange(B, dtype=jnp.float32)
    cont = pos_int.astype(jnp.float32) + pos_frac + step * t
    ipos = jnp.floor(cont)
    frac = cont - ipos
    return ipos.astype(jnp.int32), frac


def advance(pos_int, pos_frac, step):
    end = pos_int.astype(jnp.float32) + pos_frac + step * B
    e_int = jnp.floor(end)
    return jnp.mod(e_int.astype(jnp.int32), L), end - e_int


# ---------------------------------------------------------------- variants


def read_gather2(buf, tiles, pos_int, pos_frac, step):
    ipos, frac = positions(pos_int, pos_frac, step)
    idx = jnp.mod(ipos, L)
    idx1 = jnp.mod(ipos + 1, L)
    s0 = buf[idx]
    return s0 + (buf[idx1] - s0) * frac


def _window4(tiles, q):
    return jnp.concatenate(
        [tiles[q], tiles[q + 1], tiles[q + 2], tiles[q + 3]]
    )


def read_win_interp(buf, tiles, pos_int, pos_frac, step):
    q = pos_int // B
    win = _window4(tiles, q)  # [4B]
    t = jnp.arange(B, dtype=jnp.float32)
    cont = pos_int.astype(jnp.float32) + pos_frac + step * t
    p = cont - (q * B).astype(jnp.float32)  # exact (Sterbenz-ish)
    j = jnp.arange(4 * B, dtype=jnp.float32)
    M = jnp.clip(1.0 - jnp.abs(p[:, None] - j[None, :]), 0.0, 1.0)
    return jnp.matmul(M, win, precision=HI)


def read_win_onehot2(buf, tiles, pos_int, pos_frac, step):
    q = pos_int // B
    win = _window4(tiles, q)
    ipos, frac = positions(pos_int, pos_frac, step)
    w = ipos - q * B  # in-window tap index, [0, 3B)
    j = jnp.arange(4 * B)
    M0 = (w[:, None] == j[None, :]).astype(jnp.float32)
    M1 = (w[:, None] + 1 == j[None, :]).astype(jnp.float32)
    s0 = jnp.matmul(M0, win, precision=HI)
    s1 = jnp.matmul(M1, win, precision=HI)
    return s0 + (s1 - s0) * frac


def read_win_chunk16(buf, tiles_c, pos_int, pos_frac, step):
    C = 16
    nc = B // C
    ipos, frac = positions(pos_int, pos_frac, step)  # [B]
    ip = ipos.reshape(nc, C)
    fr = frac.reshape(nc, C)
    q = ip[:, 0] // C  # [nc]
    win = jnp.concatenate(
        [tiles_c[q], tiles_c[q + 1], tiles_c[q + 2], tiles_c[q + 3]],
        axis=-1,
    )  # [nc, 4C]
    w = ip - (q * C)[:, None]
    j = jnp.arange(4 * C, dtype=jnp.float32)
    p = w.astype(jnp.float32) + fr
    M = jnp.clip(1.0 - jnp.abs(p[:, :, None] - j[None, None, :]), 0.0, 1.0)
    return jnp.einsum("ncw,nw->nc", M, win, precision=HI).reshape(B)


VARIANTS = {
    "gather2": (read_gather2, B),
    "win_interp": (read_win_interp, B),
    "win_onehot2": (read_win_onehot2, B),
    "win_chunk16": (read_win_chunk16, 16),
}


def build(variant, V):
    src = make_buffer()
    buf = jnp.asarray(src)
    fn, tile = VARIANTS[variant]
    tiles = jnp.asarray(make_ext(src, tile))
    rng = np.random.default_rng(3)
    step = jnp.asarray(
        rng.uniform(0.5, 1.99, V).astype(np.float32)
    )
    pos0 = jnp.asarray(rng.integers(0, L, V).astype(np.int32))
    frac0 = jnp.asarray(rng.uniform(0, 1, V).astype(np.float32))

    voice = lambda pi, pf, st: fn(buf, tiles, pi, pf, st)
    vread = jax.vmap(voice)

    def scan_fn(n):
        def body(carry, _):
            pi, pf, acc = carry
            sig = vread(pi, pf, step)
            pi, pf = jax.vmap(advance)(pi, pf, step)
            return (pi, pf, acc + jnp.sum(sig, axis=1)), None

        def run(pi, pf):
            (pi, pf, acc), _ = lax.scan(
                body, (pi, pf, jnp.zeros(pi.shape[0], jnp.float32)),
                None, length=n)
            return pi, pf, acc

        return jax.jit(run)

    return scan_fn, pos0, frac0


def block_out(variant, V, nblocks=3):
    """Per-block outputs for cross-variant parity checking."""
    src = make_buffer()
    buf = jnp.asarray(src)
    fn, tile = VARIANTS[variant]
    tiles = jnp.asarray(make_ext(src, tile))
    rng = np.random.default_rng(3)
    step = jnp.asarray(rng.uniform(0.5, 1.99, V).astype(np.float32))
    pi = jnp.asarray(rng.integers(0, L, V).astype(np.int32))
    pf = jnp.asarray(rng.uniform(0, 1, V).astype(np.float32))
    outs = []
    voice = jax.jit(jax.vmap(lambda a, b, c: fn(buf, tiles, a, b, c)))
    adv = jax.jit(jax.vmap(advance))
    for _ in range(nblocks):
        outs.append(np.asarray(voice(pi, pf, step)))
        pi, pf = adv(pi, pf, step)
    return np.stack(outs)


def measure(variant, V):
    scan_fn, pos0, frac0 = build(variant, V)
    lo, hi = 200, 1200
    f_lo, f_hi = scan_fn(lo), scan_fn(hi)
    # warm
    r = f_lo(pos0, frac0)
    jax.block_until_ready(r)
    r = f_hi(pos0, frac0)
    jax.block_until_ready(r)
    ts = {}
    for name, f, n in (("lo", f_lo, lo), ("hi", f_hi, hi)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(pos0, frac0)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    dt = ts["hi"] - ts["lo"]
    vs = V * B * (hi - lo) / dt
    rt = vs / SR
    print(f"{variant:14s} V={V:6d}  {vs/1e9:8.3f}G voice-samples/s  "
          f"rt_voices={rt:10.0f}")
    return vs


def read_win_chunk16_exact(buf, tiles_c, pos_int, pos_frac, step):
    """Chunked + bit-exact: one-hot matmuls (shared one-hot, rolled
    window for the +1 tap), production lerp formula."""
    C = 16
    nc = B // C
    ipos, frac = positions(pos_int, pos_frac, step)
    ip = ipos.reshape(nc, C)
    fr = frac.reshape(nc, C)
    q = ip[:, 0] // C
    win = jnp.concatenate(
        [tiles_c[q], tiles_c[q + 1], tiles_c[q + 2], tiles_c[q + 3]],
        axis=-1)
    w = ip - (q * C)[:, None]
    j = jnp.arange(4 * C)
    m0 = (w[:, :, None] == j[None, None, :]).astype(jnp.float32)
    s0 = jnp.einsum("ncw,nw->nc", m0, win, precision=HI)
    s1 = jnp.einsum("ncw,nw->nc", m0, jnp.roll(win, -1, axis=-1),
                    precision=HI)
    return (s0 + (s1 - s0) * fr).reshape(B)


def read_win_chunk8(buf, tiles_c, pos_int, pos_frac, step):
    C = 8
    nc = B // C
    ipos, frac = positions(pos_int, pos_frac, step)
    ip = ipos.reshape(nc, C)
    fr = frac.reshape(nc, C)
    q = ip[:, 0] // C
    win = jnp.concatenate(
        [tiles_c[q], tiles_c[q + 1], tiles_c[q + 2], tiles_c[q + 3]],
        axis=-1)
    w = ip - (q * C)[:, None]
    j = jnp.arange(4 * C, dtype=jnp.float32)
    p = w.astype(jnp.float32) + fr
    M = jnp.clip(1.0 - jnp.abs(p[:, :, None] - j[None, None, :]), 0.0, 1.0)
    return jnp.einsum("ncw,nw->nc", M, win, precision=HI).reshape(B)


VARIANTS["win_chunk16_exact"] = (read_win_chunk16_exact, 16)
VARIANTS["win_chunk8"] = (read_win_chunk8, 8)



if __name__ == "__main__":
    argv = sys.argv[1:]
    V = 4096
    if "--voices" in argv:
        i = argv.index("--voices")
        V = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    args = [a for a in argv if not a.startswith("--")]
    names = list(VARIANTS) if (not args or args == ["all"]) else args
    if os.environ.get("PROBE_PARITY", "1") == "1":
        ref = block_out("gather2", 256)
        for n in names:
            if n == "gather2":
                continue
            got = block_out(n, 256)
            d = np.abs(got - ref).max()
            print(f"parity {n:14s} maxdiff vs gather2 = {d:.3e}")
    for n in names:
        measure(n, V)
