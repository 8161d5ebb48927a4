"""Deterministic program-structure gate: lowered-HLO op counts per workload.

Wall-clock gates on this platform fight two noise sources at once — tunnel
RTT and the remote service compiling the SAME StableHLO differently per
window (measured: 71x-448x rt on bit-identical block-16 programs, see
RESULTS.md). Program STRUCTURE is deterministic: build each graph
workload on CPU, lower its fast/full/superblock programs with
``jax.jit(...).lower().as_text()``, and count ops. A structural
regression (an op-count blowup from a compiler-pass change, a lost
fusion, an accidental per-event scatter in the fast path) trips this
gate on the first run, with zero weather.

Usage:
  python benchmarks/hlo_check.py --save benchmarks/hlo_baseline.json
  python benchmarks/hlo_check.py --baseline benchmarks/hlo_baseline.json
     (fails if any program's TOTAL op count grew >10% vs the baseline;
      shrinkage and op-mix churn are reported but never fail)
"""

from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# structure must not depend on which accelerator is attached
os.environ.setdefault("KNASTER_CHAIN_PALLAS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def count_ops(txt: str) -> dict:
    ops = collections.Counter()
    for ln in txt.splitlines():
        ln = ln.strip()
        if "=" in ln and not ln.startswith(("func", "module", "}", "//")):
            rhs = ln.split("=", 1)[1].strip().split(" ", 1)[0]
            if rhs.startswith(("stablehlo.", "call", "mhlo.")):
                ops[rhs] += 1
    return dict(ops)


def lower_programs(proc):
    """{program_name: op-count dict} for a processor's compiled programs."""
    from knaster_tpu.graph.compile import get_super_fn

    proc._ensure_compiled()
    cg = proc.compiled
    B = cg.ctx.block_size
    inputs = jnp.zeros((proc.graph.inputs, B), cg.ctx.dtype)
    out = {}
    out["fast"] = count_ops(
        jax.jit(lambda s: cg.render_fast_raw(s, inputs))
        .lower(proc.state).as_text()
    )
    try:
        ev = cg.empty_events()
        out["full"] = count_ops(
            jax.jit(lambda s: cg.render_raw(s, ev, inputs))
            .lower(proc.state).as_text()
        )
    except Exception as e:
        print(f"# full program skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        k = 4
        fn = get_super_fn(cg, k)
        if fn is not None:
            sin = jnp.zeros((proc.graph.inputs, k * B), cg.ctx.dtype)
            out[f"super_k{k}"] = count_ops(
                jax.jit(lambda s: fn(s, sin)).lower(proc.state).as_text()
            )
    except Exception:
        pass
    return out


def build_sines(block):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions, Constant,
                             SinWt)

    opts = AudioProcessorOptions(block_size=block, sample_rate=48000)
    g, proc = AudioProcessor.new(0, 1, opts)

    def build(gg):
        for i in range(256):
            s = gg.push(SinWt(200.0 + i))
            c = gg.push(Constant(0.001))
            (s * c).to_graph_out()

    g.edit(build)
    return proc


def build_fm_cascade(n_nodes=256, block=64):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions, SinWt)

    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=block))

    def build(gg):
        prev = None
        for i in range(n_nodes):
            s = gg.push(SinWt(100.0 + i))
            if prev is not None:
                mod = (prev * 100.0) + 200.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
        (prev * 0.1).to_graph_out()

    g.edit(build)
    return proc


def build_galactic(block=64):
    from knaster_tpu import (AllpassFeedbackDelay, AudioProcessor,
                             AudioProcessorOptions, PinkNoise)
    from knaster_tpu.airwindows import Galactic

    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block))

    def build(gg):
        src = gg.push(PinkNoise())
        echo = gg.push(AllpassFeedbackDelay(
            0.25, feedback=0.5, long=True, min_delay_time=0.25))
        verb = gg.push(Galactic(wet=0.5))
        src.to(echo)
        (echo.out([0, 0])).to(verb)
        verb.to_graph_out()

    g.edit(build)
    return proc


def build_granular(block=64):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions, Buffer,
                             GrainPlayer)

    src = Buffer(np.sin(2 * np.pi * 220.0 / 48000.0
                        * np.arange(48000)).astype(np.float32)[None, :],
                 sample_rate=48000)
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block))

    def build(gg):
        gp = gg.push(GrainPlayer(src, grains=64, density=400.0,
                                 grain_dur=0.08, pos_jitter=0.3,
                                 rate_jitter=0.5, amp=0.2))
        gp.to_graph_out()

    g.edit(build)
    return proc


WORKLOADS = {
    "sines_const_b16": lambda: build_sines(16),
    "sines_const_b128": lambda: build_sines(128),
    "fm_cascade_b64": build_fm_cascade,
    "galactic_chain_b64": build_galactic,
    "granular_b64": build_granular,
}


def collect():
    rows = {}
    for name, builder in WORKLOADS.items():
        try:
            proc = builder()
        except Exception as e:  # workload helper moved/renamed
            print(f"# skip {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        for prog, ops in lower_programs(proc).items():
            rows[f"{name}/{prog}"] = {"total": sum(ops.values()), "ops": ops}
            print(json.dumps({"program": f"{name}/{prog}",
                              "total_ops": sum(ops.values())}))
    return rows


if __name__ == "__main__":
    args = sys.argv[1:]
    save = baseline = None
    i = 0
    while i < len(args):
        if args[i] == "--save":
            save = args[i + 1]; i += 2
        elif args[i] == "--baseline":
            baseline = args[i + 1]; i += 2
        else:
            i += 1
    rows = collect()
    if save:
        with open(save, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print(f"# saved {len(rows)} program signatures to {save}")
    if baseline:
        with open(baseline) as f:
            base = json.load(f)
        bad = []
        for key, rec in rows.items():
            ref = base.get(key)
            if ref is None:
                print(f"# new program (no baseline): {key}")
                continue
            if rec["total"] > ref["total"] * 1.10:
                diff = collections.Counter(rec["ops"])
                diff.subtract(collections.Counter(ref["ops"]))
                grew = {k: v for k, v in diff.items() if v > 0}
                bad.append(f"{key}: {ref['total']} -> {rec['total']} ops "
                           f"(grew: {grew})")
            elif rec["total"] != ref["total"]:
                print(f"# {key}: {ref['total']} -> {rec['total']} ops "
                      f"(within budget)")
        if bad:
            print("PROGRAM-STRUCTURE REGRESSIONS (>10% op growth):",
                  file=sys.stderr)
            for b in bad:
                print("  " + b, file=sys.stderr)
            sys.exit(1)
        print(f"# structure check OK vs {baseline}")
