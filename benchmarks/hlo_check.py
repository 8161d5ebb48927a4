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


def build_granular_bank(block=64, players=8):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions, Buffer,
                             GrainPlayer)

    src = Buffer(np.sin(2 * np.pi * 220.0 / 48000.0
                        * np.arange(48000)).astype(np.float32)[None, :],
                 sample_rate=48000)
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block))

    def build(gg):
        for i in range(players):
            gp = gg.push(GrainPlayer(src, grains=64, seed=i, density=400.0,
                                     grain_dur=0.08, pos_jitter=0.3,
                                     rate_jitter=0.5, max_rate=2.0,
                                     amp=0.2 / players))
            gp.to_graph_out()

    g.edit(build)
    return proc


def build_convolver(block=64, ir_seconds=2.0):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             Convolver, WhiteNoise)

    rng = np.random.default_rng(0)
    L = int(ir_seconds * 48000)
    t = np.arange(L, dtype=np.float32) / 48000.0
    ir = (rng.standard_normal((2, L)).astype(np.float32)
          * np.exp(-3.0 * t)[None, :] * 0.02)
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block))

    def build(gg):
        n = gg.push(WhiteNoise(seed=5))
        cv = gg.push(Convolver(ir))
        n.to(cv)
        cv.to_graph_out()

    g.edit(build)
    return proc


def build_fm_cascade_model(block=64, n_stages=256):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             FMCascade)

    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=block))
    g.edit(lambda gg: gg.push(FMCascade(n_stages)).to_graph_out())
    return proc


def build_env_chain(block=64, n=10):
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions, EnvAsr)

    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=block))

    def build(gg):
        prev = None
        for i in range(n):
            e = gg.push(EnvAsr(attack_time=(50.3 + 7.1 * i) / 48000.0,
                               release_time=95.5 / 48000.0))
            prev = e if prev is None else prev + e
        (prev * 0.05).to_graph_out()

    g.edit(build)
    return proc


# ---- direct-bank programs (the shape the bank benches actually run:
# one bank.process step, fast and eventful) --------------------------------

def lower_bank(bank):
    from knaster_tpu.core.ugen import AudioCtx

    # fast = the steady-state program shape (no_events ctx, like the
    # graph's fast program and the suite benches)
    fctx = AudioCtx(48000, 64, np.float32, no_events=True)
    ctx = AudioCtx(48000, 64, np.float32)
    st = bank.init(ctx)
    no_in = jnp.zeros((0, 64), np.float32)
    out = {}
    out["fast"] = count_ops(
        jax.jit(lambda s: bank.process(fctx, s, no_in, {}, events=None))
        .lower(st).as_text()
    )
    try:
        ev = bank.node_events_from_lists([(0, 0, 0, 0, 300.0)])
        out["eventful"] = count_ops(
            jax.jit(lambda s, e: bank.process(ctx, s, no_in, {}, events=e))
            .lower(st, ev).as_text()
        )
    except Exception as e:
        print(f"# eventful bank program skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
    return out


def _fm_defaults(V, rng):
    return {
        "freq": (220.0 * 2 ** rng.uniform(-1, 1, V)).astype(np.float32),
        "ratio": rng.choice([1.0, 2.0], V).astype(np.float32),
        "index": rng.uniform(0.5, 2.0, V).astype(np.float32),
        "amp": np.full(V, 0.005, np.float32),
    }


def bank_fm_vmap():
    from knaster_tpu import FMVoice, VoiceBank

    rng = np.random.default_rng(0)
    return VoiceBank(FMVoice(), 512, voice_defaults=_fm_defaults(512, rng),
                     event_capacity=512)


def bank_sine_vmap():
    from knaster_tpu import SineVoice, VoiceBank

    rng = np.random.default_rng(0)
    V = 512
    return VoiceBank(
        SineVoice(), V, event_capacity=512,
        voice_defaults={
            "freq": rng.uniform(100, 900, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
            "pan": rng.uniform(-1, 1, V).astype(np.float32),
        },
    )


def bank_pallas_fm():
    from knaster_tpu import PallasFMVoiceBank

    rng = np.random.default_rng(0)
    return PallasFMVoiceBank(1024, voice_defaults=_fm_defaults(1024, rng),
                             tile_rows=4, event_capacity=512)


def bank_pallas_sine():
    from knaster_tpu import PallasSineVoiceBank

    rng = np.random.default_rng(0)
    V = 1024
    return PallasSineVoiceBank(
        V, tile_rows=4, event_capacity=512,
        voice_defaults={
            "freq": rng.uniform(100, 900, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
            "pan": rng.uniform(-1, 1, V).astype(np.float32),
        },
    )


def bank_pallas_subtractive():
    from knaster_tpu import PallasSubtractiveVoiceBank

    rng = np.random.default_rng(0)
    V = 1024
    return PallasSubtractiveVoiceBank(
        V, tile_rows=4, event_capacity=512,
        voice_defaults={
            "freq": rng.uniform(55, 880, V).astype(np.float32),
            "cutoff": rng.uniform(400, 4000, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
        },
    )


def bank_pallas_wavetable():
    from knaster_tpu import PallasWavetableVoiceBank

    rng = np.random.default_rng(0)
    V = 1024
    return PallasWavetableVoiceBank(
        V, harmonics=np.array([1.0, 0.5, 0.25, 0.12], np.float32),
        tile_rows=4, event_capacity=512,
        voice_defaults={
            "freq": rng.uniform(100, 900, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
            "pan": rng.uniform(-1, 1, V).astype(np.float32),
        },
    )


def bank_generic_fm():
    from knaster_tpu import FMVoice, PallasVoiceBank

    rng = np.random.default_rng(0)
    return PallasVoiceBank(FMVoice(), 1024,
                           voice_defaults=_fm_defaults(1024, rng),
                           tile_rows=4, event_capacity=512)


def bank_generic_modal():
    from knaster_tpu import ModalVoice, PallasVoiceBank
    from knaster_tpu.ugens.modal import ModalResonator

    rng = np.random.default_rng(0)
    V = 256
    return PallasVoiceBank(
        ModalVoice(ModalResonator.bell(300.0)), V, tile_rows=2,
        event_capacity=256,
        voice_defaults={
            "freq": rng.uniform(100, 900, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
        },
    )


def bank_generic_envelope():
    from knaster_tpu import EnvelopeVoice, PallasVoiceBank
    from knaster_tpu.ugens.envelopes import Envelope

    rng = np.random.default_rng(0)
    V = 256
    env = Envelope(0.0, [(0.002, 1.0), (0.004, 0.5),
                         (0.004, 0.75, "sinusoidal"), (0.006, 0.0)])
    return PallasVoiceBank(
        EnvelopeVoice(env), V, tile_rows=2, event_capacity=256,
        voice_defaults={
            "freq": rng.uniform(100, 900, V).astype(np.float32),
            "amp": np.full(V, 0.005, np.float32),
        },
    )


def bank_plucked():
    from knaster_tpu import VoiceBank
    from knaster_tpu.models import PluckedVoice

    rng = np.random.default_rng(0)
    V = 64
    return VoiceBank(
        PluckedVoice(max_freq=1000.0), V, event_capacity=256,
        voice_defaults={
            "vseed": np.arange(V),
            "freq": (110.0 * 2 ** rng.uniform(0, 3, V)).astype(np.float32),
            "damp": rng.uniform(0.995, 0.999, V).astype(np.float32),
            "brightness": rng.uniform(0.4, 0.9, V).astype(np.float32),
        },
    )


def _tone():
    return np.sin(2 * np.pi * 220.0 * np.arange(48000) / 48000.0).astype(
        np.float32)


def bank_sampler_tiled():
    from knaster_tpu import VoiceBank
    from knaster_tpu.models.voices import SamplerVoice

    V = 64
    return VoiceBank(
        SamplerVoice(_tone(), loop=True, tiled=True), V, event_capacity=256,
        voice_defaults={"amp": np.full(V, 0.01, np.float32)})


def bank_sampler_resample():
    from knaster_tpu import VoiceBank
    from knaster_tpu.models.voices import SamplerVoice

    rng = np.random.default_rng(11)
    V = 64
    return VoiceBank(
        SamplerVoice(_tone(), loop=True, resample=True), V,
        event_capacity=256,
        voice_defaults={
            "amp": np.full(V, 0.01, np.float32),
            "rate": rng.uniform(0.5, 1.99, V).astype(np.float32),
        })


WORKLOADS = {
    "sines_const_b16": lambda: build_sines(16),
    "sines_const_b128": lambda: build_sines(128),
    "fm_cascade_b64": build_fm_cascade,
    "galactic_chain_b64": build_galactic,
    "granular_b64": build_granular,
    "granular_bank_b64": build_granular_bank,
    "convolver_b64": build_convolver,
    "fm_cascade_model_b64": build_fm_cascade_model,
    "env_chain_b64": build_env_chain,
}

# direct-bank programs: {name: bank factory} — lowered via lower_bank
BANK_WORKLOADS = {
    "fm_bank_vmap": bank_fm_vmap,
    "sine_bank_vmap": bank_sine_vmap,
    "pallas_fm_bank": bank_pallas_fm,
    "pallas_sine_bank": bank_pallas_sine,
    "pallas_subtractive_bank": bank_pallas_subtractive,
    "pallas_wavetable_bank": bank_pallas_wavetable,
    "generic_fm_bank": bank_generic_fm,
    "modal_bank": bank_generic_modal,
    "envelope_bank": bank_generic_envelope,
    "plucked_bank": bank_plucked,
    "sampler_bank_tiled": bank_sampler_tiled,
    "sampler_resample": bank_sampler_resample,
}


def collect():
    rows = {}

    def add(name, progs):
        for prog, ops in progs.items():
            rows[f"{name}/{prog}"] = {"total": sum(ops.values()), "ops": ops}
            print(json.dumps({"program": f"{name}/{prog}",
                              "total_ops": sum(ops.values())}))

    for name, builder in WORKLOADS.items():
        try:
            proc = builder()
        except Exception as e:  # workload helper moved/renamed
            print(f"# skip {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        add(name, lower_programs(proc))
    for name, factory in BANK_WORKLOADS.items():
        try:
            progs = lower_bank(factory())
        except Exception as e:
            print(f"# skip {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        add(name, progs)
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
