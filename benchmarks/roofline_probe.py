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
            a, b = c
            # 8 dependent FMAs on two [rows, LANES] registers -> 16 flops
            # per element per iter, enough ILP to fill the pipe
            for _ in range(4):
                a = a * np.float32(1.000001) + b
                b = b * np.float32(0.999999) + a
            return a, b

        a, b = jax.lax.fori_loop(
            0, iters, body, (x_ref[:], x_ref[:] * np.float32(0.5)),
            unroll=8,
        )
        o_ref[:] = a + b

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
    flops = 16.0 * rows * 128 / per_iter
    print(json.dumps({"probe": "vpu_fma_f32", "value": round(flops / 1e9),
                      "unit": "Gflop/s", "rows": rows}))
    return flops


def probe_hbm(mb=512):
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4

    @jax.jit
    def add(a, b):
        return a + b

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    # evolving inputs (cache gotcha): alternate operands
    out = add(a, b)
    out.block_until_ready()
    best = 1e9
    x = out
    for _i in range(4):
        t0 = time.time()
        x = add(x, b)
        x.block_until_ready()
        best = min(best, time.time() - t0)
    bps = 3.0 * 4 * n / best  # 2 reads + 1 write
    print(json.dumps({"probe": "hbm_stream", "value": round(bps / 1e9),
                      "unit": "GB/s", "mb": mb}))
    return bps


def probe_gather(n_idx=1 << 24, table=1 << 22):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.standard_normal(table), jnp.float32)
    idx = jnp.asarray(rng.integers(0, table, n_idx), jnp.int32)

    @jax.jit
    def g(t, i):
        return t[i].sum()

    t = _timed(g, tab, idx)
    eps = n_idx / t
    print(json.dumps({"probe": "gather", "value": round(eps / 1e6),
                      "unit": "Melem/s", "n": n_idx}))
    return eps


def probe_mxu(n=2048):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

    @jax.jit
    def mm(a, b):
        return jnp.matmul(a, b, precision=lax.Precision.HIGHEST).sum()

    t = _timed(mm, a, b)
    flops = 2.0 * n ** 3 / t
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
