"""Empirical hardware ceilings for the roofline table (RESULTS.md).

Specs answer what the chip COULD do; this probe measures what this
runtime/compiler path actually delivers on the attached chip, with the
same measurement discipline as the suite (evolving inputs, real fetches,
slope over two lengths — DESIGN_NOTES "the ~250 us scan floor" and the
bit-identical-result cache gotcha):

  vpu   — f32 FMA throughput of a Pallas kernel holding [8, 128] vregs
          across a fori_loop (the shape every bank kernel compiles to).
  hbm   — bytes/s streaming two large f32 arrays through one add
          (read 2N + write N bytes per element).
  gather— random-index element gathers/s (the cost model behind
          DESIGN_NOTES "Gathers bill per element").
  mxu   — f32 matmul FLOPs at HIGHEST precision (the one-hot event
          routing / matmul-DFT path), 2048^3.

Usage: python benchmarks/roofline_probe.py [vpu hbm gather mxu]
Prints one JSON line per probe.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _timed(fn, *args):
    """Best-of-3 wall time of fn(*args) ended by a REAL fetch."""
    out = fn(*args)
    _ = np.asarray(out)  # warm / compile
    best = 1e9
    for _i in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def probe_vpu(iters_lo=2000, iters_hi=12000, rows=256):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128

    def kernel(iters, x_ref, o_ref):
        def body(i, c):
            # 4 chains x 16 FMAs on [rows, LANES] registers -> 128 flops
            # per element per iter; independent chains fill the pipe
            # (Mosaic only accepts unroll=1 or full unroll, so the work
            # lives in the body instead)
            a, b, c2, d = c
            for _ in range(8):
                a = a * np.float32(1.000001) + b
                b = b * np.float32(0.999999) + a
                c2 = c2 * np.float32(1.000002) + d
                d = d * np.float32(0.999998) + c2
            return a, b, c2, d

        x = x_ref[:]
        a, b, c2, d = jax.lax.fori_loop(
            0, iters, body,
            (x, x * np.float32(0.5), x * np.float32(0.25),
             x * np.float32(0.125)),
        )
        o_ref[:] = (a + b) + (c2 + d)

    def run(iters, x):
        call = pl.pallas_call(
            functools.partial(kernel, iters),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.devices()[0].platform == "cpu",
        )
        return call(x)

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.5, 1.0, (rows, LANES)), jnp.float32
    ) * 1e-30  # keep values finite across the FMA storm
    jit = jax.jit(run, static_argnums=0)
    t_lo = _timed(jit, iters_lo, x)
    t_hi = _timed(jit, iters_hi, x)
    per_iter = (t_hi - t_lo) / (iters_hi - iters_lo)
    flops = 128.0 * rows * 128 / per_iter
    print(json.dumps({"probe": "vpu_fma_f32", "value": round(flops / 1e9),
                      "unit": "Gflop/s", "rows": rows}))
    return flops


def probe_hbm(mb=128, lo=8, hi=40):
    """Streaming bandwidth via an on-device scan of dependent adds over a
    large resident array — slope over two scan lengths cancels dispatch
    RTT (same discipline as the suite's _scan_slope_rate)."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    _fns = {}

    def run(k, x):
        if k not in _fns:  # one remote compile per scan length
            @jax.jit
            def f(x, k=k):
                def body(c, _):
                    return c + b, c[0]
                return jax.lax.scan(body, x, None, length=k)

            _fns[k] = f
        return _fns[k](x)

    def t_of(k):
        out, m = run(k, a)
        _ = np.asarray(m)
        best = 1e9
        x = out
        for _i in range(3):
            t0 = time.time()
            x, m = run(k, x)
            _ = np.asarray(m)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = t_of(lo), t_of(hi)
    per = (t_hi - t_lo) / (hi - lo)
    bps = 3.0 * 4 * n / per  # 2 reads + 1 write per scan step
    print(json.dumps({"probe": "hbm_stream", "value": round(bps / 1e9),
                      "unit": "GB/s", "mb": mb}))
    return bps


def probe_gather(n_idx=1 << 22, table=1 << 22, lo=4, hi=20):
    """Random-index element gathers/s (pessimistic: uniform over a 16 MB
    table). Scan-slope like probe_hbm; indices evolve per step so the
    platform can't serve cached results."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.standard_normal(table).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, table, n_idx), jnp.int32)

    _fns = {}

    def run(k, i0):
        if k not in _fns:
            @jax.jit
            def f(i0, k=k):
                def body(i, _):
                    v = tab[i]
                    i2 = (i + jnp.int32(12345)) & jnp.int32(table - 1)
                    return i2, v.sum()
                return jax.lax.scan(body, i0, None, length=k)

            _fns[k] = f
        return _fns[k](i0)

    def t_of(k):
        i, m = run(k, idx0)
        _ = np.asarray(m)
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            i, m = run(k, i)
            _ = np.asarray(m)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = t_of(lo), t_of(hi)
    per = (t_hi - t_lo) / (hi - lo)
    eps = n_idx / per
    print(json.dumps({"probe": "gather", "value": round(eps / 1e6),
                      "unit": "Melem/s", "n": n_idx}))
    return eps


def probe_mxu(n=2048, lo=4, hi=20):
    """f32 matmul at HIGHEST precision (the one-hot event routing /
    matmul-DFT path) — a scan of dependent matmuls, slope over lengths."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32) / n)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    _fns = {}

    def run(k, x):
        if k not in _fns:
            @jax.jit
            def f(x, k=k):
                def body(c, _):
                    c2 = jnp.matmul(c, b, precision=lax.Precision.HIGHEST)
                    c2 = c2 / jnp.maximum(jnp.abs(c2).max(), 1e-9)
                    return c2, c2[0, 0]
                return jax.lax.scan(body, x, None, length=k)

            _fns[k] = f
        return _fns[k](x)

    def t_of(k):
        x, m = run(k, a)
        _ = np.asarray(m)
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            x, m = run(k, x)
            _ = np.asarray(m)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = t_of(lo), t_of(hi)
    per = (t_hi - t_lo) / (hi - lo)
    flops = 2.0 * n ** 3 / per
    print(json.dumps({"probe": "mxu_f32_highest",
                      "value": round(flops / 1e9), "unit": "Gflop/s",
                      "n": n}))
    return flops


PROBES = {"vpu": probe_vpu, "hbm": probe_hbm, "gather": probe_gather,
          "mxu": probe_mxu}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for nm in names:
        PROBES[nm]()
