"""Benchmark suite reproducing the reference's criterion workloads.

knaster_benchmarks parity (SURVEY §6 / BASELINE.md):
  sines_const   — 256 × (SinWt × Constant) → mono out, block 16/32/128
                  (graph_dsp_performance.rs:12-36), as *graph nodes* to
                  measure the generic compiled-graph path
  fm_cascade    — chain of sines, each FM-modulating the next via audio-rate
                  param edges (graph_dsp_performance.rs:38-80)
  wrappers      — wr_mul wrapper fusion vs a separate Mul node
                  (wrappers_vs_nodes.rs)
  voicebank     — the many_sines voice-bank headline (see ../bench.py)
  galactic      — stereo bus: feedback delay + Galactic chain (BASELINE
                  config #5)

Each prints one JSON line: {"bench", "config", "value", "unit", ...}.

Usage: python benchmarks/suite.py [name ...] [--save F] [--baseline F]
  (default names: all quick ones)
  --save F      write every record to F (json lines) — commit as baseline
  --baseline F  compare against a saved baseline; any rate >10% below it
                is flagged and the process exits 1 (criterion's
                regression-tracking role, knaster_benchmarks/)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORDS: list = []


def emit(rec: dict) -> None:
    RECORDS.append(rec)
    print(json.dumps(rec), flush=True)


# fields compared by --baseline: direction +1 = higher is better
COMPARE_FIELDS = {
    "value": 1,
    "realtime_x": 1,
    "program_realtime_x": 1,
    "superblock_realtime_x": 1,
    "superblock_bounce_x": 1,
    "realtime_voices": 1,
    "realtime_players": 1,
    "pallas_realtime_x": 1,
    "wrapper_rate": 1,
    "node_rate": 1,
    "cache_hit_push_ms": -1,
    "cache_hit_free_ms": -1,
}


def _direction(rec, field):
    """Comparison direction for a field of a record. ``value`` is
    higher-is-better everywhere except latency benches (unit in ms) and
    the soak rows (unit underruns), where lower is better."""
    d = COMPARE_FIELDS[field]
    if field == "value" and str(rec.get("unit", "")).startswith(
        ("ms", "underruns")
    ):
        return -d
    return d


def compare_to_baseline(records, baseline_path, tolerance=0.10):
    """Flag regressions beyond ``tolerance`` vs a saved baseline. Returns
    the list of regression strings (empty = clean)."""
    with open(baseline_path) as f:
        base = {
            (r["bench"], r.get("config")): r
            for r in (json.loads(ln) for ln in f if ln.strip())
        }
    regressions = []
    for rec in records:
        key = (rec["bench"], rec.get("config"))
        ref = base.get(key)
        if ref is None:
            continue
        for field in COMPARE_FIELDS:
            a, b = rec.get(field), ref.get(field)
            if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
                continue
            if field == "value" and str(rec.get("unit", "")).startswith(
                "underruns"
            ):
                # soak rows: absolute — any underrun beyond the committed
                # count (0 for the gated scenarios) is a regression
                if a > b:
                    regressions.append(
                        f"{key[0]}[{key[1]}].underruns: {a} vs baseline {b}"
                    )
                continue
            if b == 0 or a == 0:
                continue
            ratio = a / b if _direction(rec, field) > 0 else b / a
            if ratio < 1.0 - tolerance:
                regressions.append(
                    f"{key[0]}[{key[1]}].{field}: {a} vs baseline {b} "
                    f"({(ratio - 1.0) * 100:.1f}%)"
                )
    return regressions


def _best_records(records):
    """Collapse duplicate (bench, config) records to their per-field BEST
    (max for higher-is-better fields, min for lower-is-better). Retried
    workloads (see the weather guard in __main__) then compare on the best
    window instead of the last one."""
    merged: dict = {}
    order = []
    for rec in records:
        key = (rec["bench"], rec.get("config"))
        if key not in merged:
            merged[key] = dict(rec)
            order.append(key)
            continue
        m = merged[key]
        for field in COMPARE_FIELDS:
            a, b = rec.get(field), m.get(field)
            if isinstance(a, (int, float)) and isinstance(b, (int, float)):
                m[field] = max(a, b) if _direction(rec, field) > 0 else min(a, b)
            elif a is not None and b is None:
                m[field] = a
    return [merged[k] for k in order]


# record "bench" field -> ALL key, for re-running just the regressed
# workloads in the weather guard
_BENCH_TO_FN = {
    "sines_const": "sines_const",
    "convolver": "convolver",
    "chain_kernel_ab": "chain_kernel",
    "edit_latency": "edit_latency",
    "fm_cascade": "fm_cascade",
    "wrappers_vs_nodes": "wrappers",
    "galactic_chain": "galactic",
    "fm_voice_bank": "fm_bank",
    "plucked_bank": "plucked_bank",
    "sampler_bank": "sampler_bank",
    "sampler_resample": "sampler_resample",
    "fm_cascade_model": "fm_cascade_model",
    "wavetable_bank": "wavetable_bank",
    "subtractive_bank": "subtractive_bank",
    "modal_bank": "modal_bank",
    "granular": "granular",
    "granular_bank": "granular_bank",
    "generic_bank": "generic_bank",
    "envelope_bank": "envelope_bank",
    "voicebank": "voicebank",
}


def _bounce_rate(proc, seconds=0.5, runs=2):
    """Render `seconds` repeatedly; return rendered-samples/sec (best run).

    This is the end-to-end bounce rate: it includes host-side chunk dispatch
    and the device→host audio fetch (~75 ms/s of audio on this tunnel), i.e.
    the 'export a WAV' user experience. See _program_rate for the engine's
    on-device block-program rate (what bounds realtime operation)."""
    best = 0.0
    proc.render(seconds=0.2)  # compile warmup
    for _ in range(runs):
        t0 = time.time()
        audio = proc.render(seconds=seconds)
        dt = time.time() - t0
        best = max(best, audio.shape[1] / dt)
    return best


def _scan_slope_rate(raw_step, state0, per_iter_samples, lo=200, hi=2200):
    """Samples/sec of an on-device scanned step, measured as the SLOPE
    between two scan lengths. One device->host fetch costs ~50 ms on this
    tunnel; a single timed run of n iterations reports (fetch + n*step)/n
    and was dominating every per-block measurement. The slope cancels the
    fetch and any fixed dispatch cost. The carry evolves between runs (the
    platform can serve cached results for bit-identical calls)."""
    import jax

    def total(n, st):
        @jax.jit
        def run(s):
            def body(c, _):
                c2, out = raw_step(c)
                return c2, (out.mean() if out.size else np.float32(0))
            return jax.lax.scan(body, s, None, length=n)

        st1, m = run(st)
        jax.block_until_ready(m)
        _ = np.asarray(m)  # warm + force completion
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            st1, m = run(st1)
            jax.block_until_ready(m)
            _ = np.asarray(m)
            best = min(best, time.time() - t0)
        return best

    t_lo = total(lo, state0)
    t_hi = total(hi, state0)
    per = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return per_iter_samples / per


def _program_rate(proc, **kw):
    """Samples/sec of the no-events block program in an on-device scan --
    the engine-capability number, free of tunnel dispatch/fetch overhead
    (slope-measured, see _scan_slope_rate)."""
    import jax.numpy as jnp

    proc._ensure_compiled()
    cg = proc.compiled
    B = cg.ctx.block_size
    inputs = jnp.zeros((proc.graph.inputs, B), cg.ctx.dtype)

    def step(s):
        s2, out, _done = cg.render_fast_raw(s, inputs)
        return s2, out

    return _scan_slope_rate(step, proc.state, B, **kw)


def _live_chunk_rates(proc, ns=(2, 4)):
    """Samples/sec of the live-chunk program shapes at small multiples —
    what the streaming runner dispatches at small block sizes: the
    event-free n-block superblock and the eventful chunk (full block 0
    with event tensors + fast (n-1)-block rest, the get_evchunk_fn body).
    Slope-measured (see _scan_slope_rate). Control events land at chunk
    edges in this regime: latency = n blocks."""
    import jax.numpy as jnp

    from knaster_tpu.graph.compile import _build_render, superblock_eligible

    proc._ensure_compiled()
    cg = proc.compiled
    B = cg.ctx.block_size
    out = {}
    ev = cg.empty_events()
    for n in ns:
        if not superblock_eligible(cg) or n * B > cg.superblock_max:
            continue
        sraw = _build_render(cg, fast=True, block_multiple=n)
        inp = jnp.zeros((proc.graph.inputs, n * B), cg.ctx.dtype)

        def sstep(s, fn=sraw, inp=inp):
            s2, o, _d = fn(s, inp)
            return s2, o

        out[f"chunk{n}_realtime_x"] = _scan_slope_rate(
            sstep, proc.state, n * B, lo=100, hi=1100
        )

        rraw = _build_render(cg, fast=True, block_multiple=n - 1)
        in0 = jnp.zeros((proc.graph.inputs, B), cg.ctx.dtype)
        inr = jnp.zeros((proc.graph.inputs, (n - 1) * B), cg.ctx.dtype)

        def estep(s, rr=rraw, in0=in0, inr=inr):
            st, out0, _d0 = cg.render_raw(s, ev, in0)
            st, outr, _d1 = rr(st, inr)
            return st, jnp.concatenate([out0, outr], axis=1)

        out[f"evchunk{n}_realtime_x"] = _scan_slope_rate(
            estep, proc.state, n * B, lo=100, hi=1100
        )

        # float-event variant: block 0 keeps the chain kernel (trigger-free
        # control batches — compile.get_float_fn)
        from knaster_tpu.graph.compile import chain_in_plan

        if chain_in_plan(cg):
            fraw = _build_render(cg, float_events=True)

            def fstep(s, fr=fraw, rr=rraw, in0=in0, inr=inr):
                st, out0, _d0 = fr(s, ev, in0)
                st, outr, _d1 = rr(st, inr)
                return st, jnp.concatenate([out0, outr], axis=1)

            out[f"fltchunk{n}_realtime_x"] = _scan_slope_rate(
                fstep, proc.state, n * B, lo=100, hi=1100
            )
    return out


def _super_rate(proc, latency_s=0.010):
    """Samples/sec of the superblock fast program (the interactive path:
    event-free runs of k blocks in ONE device program, k chosen as the
    largest power of two within the control-latency budget and the graph's
    superblock cap). Slope-measured (see _scan_slope_rate). Returns
    (rate, k) or (None, 0) when the graph is superblock-ineligible."""
    import jax.numpy as jnp

    from knaster_tpu.graph.compile import (
        _build_render,
        superblock_eligible,
    )

    proc._ensure_compiled()
    cg = proc.compiled
    if not superblock_eligible(cg):
        return None, 0
    B = cg.ctx.block_size
    budget = int(min(latency_s * cg.ctx.sample_rate, cg.superblock_max) / B)
    k = 1
    while k * 2 <= budget:
        k *= 2
    if k < 2:
        return None, 0
    raw = _build_render(cg, fast=True, block_multiple=k)
    inputs = jnp.zeros((proc.graph.inputs, k * B), cg.ctx.dtype)

    def step(s):
        s2, out, _done = raw(s, inputs)
        return s2, out

    # full iteration counts regardless of k: small counts make the slope
    # noise-dominated (ms of work against ~30 ms of tunnel dispatch jitter)
    return _scan_slope_rate(step, proc.state, k * B), k


def bench_sines_const(n_nodes=256, block_sizes=(16, 32, 128)):
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        Constant,
        SinWt,
    )

    for bs in block_sizes:
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=bs)
        )

        def build(gg):
            rng = np.random.default_rng(1)
            for _ in range(n_nodes):
                s = gg.push(SinWt(float(rng.uniform(100, 1000))))
                (s * 0.001).to_graph_out()

        t0 = time.time()
        g.edit(build)
        proc._ensure_compiled()
        build_time = time.time() - t0
        rate = _bounce_rate(proc)
        prate = _program_rate(proc)
        srate_, k = _super_rate(proc)
        emit(
            (
                {
                    "bench": "sines_const",
                    "config": f"{n_nodes}nodes_block{bs}",
                    "value": round(rate),
                    "unit": "samples/s",
                    "realtime_x": round(rate / 48000, 1),
                    "program_realtime_x": round(prate / 48000, 1),
                    "superblock_realtime_x": (
                        round(srate_ / 48000, 1) if srate_ else None
                    ),
                    "superblock_k": k,
                    "superblock_latency_ms": round(k * bs / 48.0, 1),
                    "compile_s": round(build_time, 2),
                }
            )
        )


def bench_fm_cascade(n_nodes=256, block_sizes=(64,)):
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        SinWt,
    )

    for bs in block_sizes:
        g, proc = AudioProcessor.new(
            0, 1, AudioProcessorOptions(block_size=bs)
        )

        def build(gg):
            prev = None
            for i in range(n_nodes):
                s = gg.push(SinWt(100.0 + i))
                if prev is not None:
                    # prev sine FM-modulates this one's freq at audio rate:
                    # freq = 200 + prev*100 (Constant/Math sugar + param edge)
                    mod = (prev * 100.0) + 200.0
                    # route the math node's output into the freq param
                    gg.connect_param(
                        gg.handle(mod.channels[0][1]), 0, s, "freq"
                    )
                prev = s
            (prev * 0.1).to_graph_out()

        t0 = time.time()
        g.edit(build)
        proc._ensure_compiled()
        build_time = time.time() - t0
        rate = _bounce_rate(proc)
        prate = _program_rate(proc)
        srate_, k = _super_rate(proc)
        # the bounce path renders event-free runs at up to
        # render_chunk_blocks per dispatch — report that regime too
        brate_, bk = _super_rate(proc, latency_s=0.0427)
        emit(
            (
                {
                    "bench": "fm_cascade",
                    "config": f"{n_nodes}nodes_block{bs}",
                    "value": round(rate),
                    "unit": "samples/s",
                    "realtime_x": round(rate / 48000, 1),
                    "program_realtime_x": round(prate / 48000, 1),
                    "superblock_realtime_x": (
                        round(srate_ / 48000, 1) if srate_ else None
                    ),
                    "superblock_k": k,
                    "superblock_bounce_x": (
                        round(brate_ / 48000, 1) if brate_ else None
                    ),
                    "superblock_bounce_k": bk,
                    "compile_s": round(build_time, 2),
                }
            )
        )


def bench_wrappers(block_size=64):
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        SinWt,
    )

    # wrapper fusion
    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=block_size))

    def build_wr(gg):
        for _ in range(64):
            gg.push(SinWt(440.0).wr_mul(0.01)).to_graph_out()

    g.edit(build_wr)
    r_wr = _program_rate(proc)

    # separate math nodes
    g2, proc2 = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=block_size))

    def build_nodes(gg):
        for _ in range(64):
            (gg.push(SinWt(440.0)) * 0.01).to_graph_out()

    g2.edit(build_nodes)
    r_nodes = _program_rate(proc2)
    emit(
        (
            {
                "bench": "wrappers_vs_nodes",
                "config": "64x_sinwt_mul",
                "value": round(r_wr),
                "unit": "samples/s",
                "wrapper_rate": round(r_wr),
                "node_rate": round(r_nodes),
                "ratio": round(r_wr / max(r_nodes, 1), 3),
            }
        )
    )


def bench_galactic(block_size=64):
    from knaster_tpu import (
        AllpassFeedbackDelay,
        AudioProcessor,
        AudioProcessorOptions,
        PinkNoise,
    )
    from knaster_tpu.airwindows import Galactic

    g, proc = AudioProcessor.new(0, 2, AudioProcessorOptions(block_size=block_size))

    def build(gg):
        src = gg.push(PinkNoise())
        echo = gg.push(
            AllpassFeedbackDelay(
                0.25, feedback=0.5, long=True, min_delay_time=0.25
            )
        )
        verb = gg.push(Galactic(wet=0.5))
        src.to(echo)
        (echo.out([0, 0])).to(verb)
        verb.to_graph_out()

    g.edit(build)
    rate = _bounce_rate(proc, seconds=1.0)
    prate = _program_rate(proc, lo=100, hi=600)
    srate_, k = _super_rate(proc)
    emit(
        (
            {
                "bench": "galactic_chain",
                "config": f"pink_echo_galactic_block{block_size}",
                "value": round(rate),
                "unit": "samples/s",
                "realtime_x": round(rate / 48000, 1),
                "program_realtime_x": round(prate / 48000, 1),
                "superblock_realtime_x": (
                    round(srate_ / 48000, 1) if srate_ else None
                ),
                "superblock_k": k,
            }
        )
    )


def bench_fm_cascade_model(n_stages=256):
    """The same 256-stage cascade as fm_cascade, expressed the TPU-native
    way (models.FMCascade: scan over stages in one UGen)."""
    from knaster_tpu import AudioProcessor, AudioProcessorOptions, FMCascade

    g, proc = AudioProcessor.new(0, 1, AudioProcessorOptions(block_size=64))
    g.edit(lambda gg: gg.push(FMCascade(n_stages)).to_graph_out())
    rate = _bounce_rate(proc, seconds=2.0)
    prate = _program_rate(proc)
    emit(({
        "bench": "fm_cascade_model",
        "config": f"{n_stages}stages_fused",
        "value": round(rate),
        "unit": "samples/s",
        "realtime_x": round(rate / 48000, 1),
        "program_realtime_x": round(prate / 48000, 1),
    }))


def bench_fm_bank(n_voices=8192):
    """BASELINE config #3: detuned FM voice bank (vmap path)."""
    import time

    import jax
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx, FMVoice, VoiceBank

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": (220.0 * 2 ** rng.uniform(-1, 1, n_voices)).astype(np.float32),
        "ratio": rng.choice([0.5, 1.0, 2.0, 3.0], n_voices).astype(np.float32),
        "index": rng.uniform(0.5, 3.0, n_voices).astype(np.float32),
        "amp": np.full(n_voices, 0.005, np.float32),
    }
    from knaster_tpu import PallasFMVoiceBank

    if os.environ.get("FM_BANK_PALLAS", "0") == "1" and n_voices % 16384 == 0:
        bank = PallasFMVoiceBank(n_voices, voice_defaults=defaults)
    else:
        bank = VoiceBank(FMVoice(), n_voices, voice_defaults=defaults)
    st = bank.init(ctx)
    no_in = jnp.zeros((0, 64), np.float32)

    def block(s, _):
        # events=None = the steady-state program (what the graph engine's
        # fast program runs for event-free blocks)
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)  # force real execution (see _program_rate)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        jax.block_until_ready(m)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "fm_voice_bank",
        "config": f"{n_voices}voices_vmap",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_plucked_bank(n_voices=4096):
    """Karplus-Strong string bank (beyond reference): per-voice delay-line
    rings read gather-free (tiled + barrel-rolled — DESIGN_NOTES "tile +
    barrel roll"); measured like bench_fm_bank (one on-device scan of 750
    blocks, mean fetched)."""
    import time

    import jax
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx, VoiceBank
    from knaster_tpu.models import PluckedVoice

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "vseed": np.arange(n_voices),
        "freq": (110.0 * 2 ** rng.uniform(0, 3, n_voices)).astype(np.float32),
        "damp": rng.uniform(0.995, 0.999, n_voices).astype(np.float32),
        "brightness": rng.uniform(0.4, 0.9, n_voices).astype(np.float32),
    }
    bank = VoiceBank(PluckedVoice(max_freq=1000.0), n_voices,
                     voice_defaults=defaults)
    st = bank.init(ctx)
    no_in = jnp.zeros((0, 64), np.float32)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit({
        "bench": "plucked_bank",
        "config": f"{n_voices}strings_vmap_tiled",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    })


def bench_sampler_bank(n_voices=16384):
    """Unit-rate sample playback bank (SamplerVoice tiled=True): shared
    tiled source, gather-free reads — 28x the gather path (DESIGN_NOTES
    "tile + barrel roll")."""
    import time

    import jax
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx, VoiceBank
    from knaster_tpu.models.voices import SamplerVoice

    # no_events=True: the steady-state fast program's shape (what the
    # graph engine traces between events) — a default ctx takes the
    # eventful read branch and under-measures the sampler reads ~4x
    ctx = AudioCtx(48000, 64, np.float32, no_events=True)
    n = 48000
    tone = np.sin(2 * np.pi * 220.0 * np.arange(n) / 48000.0).astype(
        np.float32)
    bank = VoiceBank(
        SamplerVoice(tone, loop=True, tiled=True), n_voices,
        voice_defaults={"amp": np.full(n_voices, 0.01, np.float32)})
    st = bank.init(ctx)
    no_in = jnp.zeros((0, 64), np.float32)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit({
        "bench": "sampler_bank",
        "config": f"{n_voices}voices_unit_rate_tiled",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    })



def bench_sampler_resample(n_voices=16384):
    """Pitched (arbitrary bounded-rate) sample playback bank
    (SamplerVoice resample=True): per-chunk contiguous tile windows +
    one-hot in-window matmuls — bit-identical to the gather path at a
    fraction of its cost (DESIGN_NOTES "Windowed resampling")."""
    import time

    import jax
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx, VoiceBank
    from knaster_tpu.models.voices import SamplerVoice

    # no_events=True: see bench_sampler_bank
    ctx = AudioCtx(48000, 64, np.float32, no_events=True)
    n = 48000
    tone = np.sin(2 * np.pi * 220.0 * np.arange(n) / 48000.0).astype(
        np.float32)
    rng = np.random.default_rng(11)
    rates = rng.uniform(0.5, 1.99, n_voices).astype(np.float32)
    bank = VoiceBank(
        SamplerVoice(tone, loop=True, resample=True), n_voices,
        voice_defaults={"amp": np.full(n_voices, 0.01, np.float32),
                        "rate": rates})
    st = bank.init(ctx)
    no_in = jnp.zeros((0, 64), np.float32)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit({
        "bench": "sampler_resample",
        "config": f"{n_voices}voices_bounded_rate_windowed",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    })


def bench_wavetable_bank(n_voices=131072, n_harmonics=16):
    """Arbitrary band-limited wavetable voices (OscWt at bank scale):
    fused Pallas additive-synthesis kernel, saw table, H partials.

    Measured like bench_fm_bank: ONE jitted on-device `lax.scan` of 750
    blocks (1 s of audio) whose per-block mean is FETCHED to the host.
    The old form — a 200-iteration Python dispatch loop ended by
    `block_until_ready` with no fetch — measured the transport, not the
    kernel: dispatch-bound lows when this tunnel ran synchronously
    (4.8G/2.5G "regressions" with no code change) and a physically
    impossible 150G when it ran fully async (block_until_ready returned
    before execution; the readiness signal is not trustworthy here —
    only a real device->host fetch is)."""
    import time

    import jax

    from knaster_tpu import AudioCtx, NonAaWavetable, PallasWavetableVoiceBank

    ctx = AudioCtx(48000, 64, np.float32)
    nb = NonAaWavetable()
    nb.add_saw(1, n_harmonics + 1, 1.0)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(50, 2000, n_voices).astype(np.float32),
        "amp": np.full(n_voices, 1e-4, np.float32),
        "pan": rng.uniform(-1, 1, n_voices).astype(np.float32),
    }
    bank = PallasWavetableVoiceBank(
        n_voices, table=nb.buffer, n_harmonics=n_harmonics,
        voice_defaults=defaults, event_capacity=4096,
    )
    st = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)

    @jax.jit
    def trig_step(s, ev):
        return bank.process(ctx, s, no_in, {}, events=ev)[:2]

    ev = bank.node_events_from_lists(
        [(0, v, bank.trig_index("t_restart"), 1, 0.0) for v in range(4096)]
    )
    st, out = trig_step(st, ev)
    _ = np.asarray(out)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)  # force real execution
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "wavetable_bank",
        "config": f"{n_voices}voices_{n_harmonics}partials_pallas",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_subtractive_bank(n_voices=131072):
    """BASELINE config #2 at bank scale: polyBLEP saw -> SVF lowpass (per-
    sample coefficients, sample-accurate sweeps) -> ASR envelope, fused
    Pallas kernel. Regression anchor for the one-divide sc-form SVF
    coefficients (DESIGN_NOTES "SVF coefficients"; 19.5G -> 39.4G on the
    v5e). Measured like bench_fm_bank: ONE jitted on-device scan of 750
    blocks whose per-block mean is FETCHED."""
    import time

    import jax

    from knaster_tpu import AudioCtx, PallasSubtractiveVoiceBank

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(55, 880, n_voices).astype(np.float32),
        "cutoff": rng.uniform(400, 8000, n_voices).astype(np.float32),
        "q": rng.uniform(0.7, 4.0, n_voices).astype(np.float32),
        "amp": np.full(n_voices, 1e-4, np.float32),
    }
    bank = PallasSubtractiveVoiceBank(n_voices, voice_defaults=defaults,
                                      event_capacity=4096)
    st = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)

    @jax.jit
    def trig_step(s, ev):
        return bank.process(ctx, s, no_in, {}, events=ev)[:2]

    ev = bank.node_events_from_lists(
        [(0, v, bank.trig_index("t_restart"), 1, 0.0) for v in range(4096)]
    )
    st, out = trig_step(st, ev)
    _ = np.asarray(out)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)  # force real execution
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "subtractive_bank",
        "config": f"{n_voices}voices_pallas",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_granular(grains=64, density=400.0, block=64):
    """GrainPlayer program rate (beyond reference — knaster has no granular
    engine): one grain-cloud node, G concurrent grain slots over a 1 s
    source buffer at `density` grains/s with position/pitch/pan jitter.
    Measured like the graph workloads: the no-events program in ONE
    on-device scan whose mean is fetched; slope over two scan lengths."""
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             Buffer, GrainPlayer)

    src = Buffer(np.sin(2 * np.pi * 220.0 / 48000.0
                        * np.arange(48000)).astype(np.float32)[None, :],
                 sample_rate=48000)
    opts = AudioProcessorOptions(block_size=block, sample_rate=48000)
    g, proc = AudioProcessor.new(0, 2, opts)

    def build(gg):
        gp = gg.push(GrainPlayer(src, grains=grains, density=density,
                                 grain_dur=0.08, pos_jitter=0.3,
                                 rate_jitter=0.5, amp=0.2))
        gp.to_graph_out()

    g.edit(build)
    rate = _program_rate(proc)
    emit(({
        "bench": "granular",
        "config": f"{grains}grains_{int(density)}hz_block{block}",
        "value": round(rate),
        "unit": "samples/s",
        "program_realtime_x": round(rate / 48000, 1),
    }))


def bench_granular_bank(players=64, grains=64, density=400.0, block=64):
    """A texture of `players` grain clouds in ONE graph: same-config
    GrainPlayers over a shared source auto-batch (batch_key, seed in
    state) into a single vmapped closed-form engine — players*grains
    concurrent grain slots. Emits realtime_players (players at >=1x)."""
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             Buffer, GrainPlayer)

    src = Buffer(np.sin(2 * np.pi * 220.0 / 48000.0
                        * np.arange(48000)).astype(np.float32)[None, :],
                 sample_rate=48000)
    opts = AudioProcessorOptions(block_size=block, sample_rate=48000)
    g, proc = AudioProcessor.new(0, 2, opts)
    rng = np.random.default_rng(7)

    def build(gg):
        for i in range(players):
            gp = gg.push(GrainPlayer(
                src, grains=grains, seed=i,
                density=float(density * 2 ** rng.uniform(-0.5, 0.5)),
                grain_dur=0.08, pos_jitter=0.3, rate_jitter=0.5,
                max_rate=2.0,  # windowed source reads (clamp inert at
                               # rate 1.0 * 2^±0.5): the gather path is
                               # the measured 0.3x floor at 64 players
                amp=0.2 / players,
            ))
            gp.to_graph_out()

    g.edit(build)
    proc._ensure_compiled()
    batched = max(
        (len(it) for k, it in proc.compiled.plan if k == "batch"),
        default=0,
    )
    rate = _program_rate(proc)
    emit(({
        "bench": "granular_bank",
        "config": f"{players}x{grains}grains_block{block}",
        "value": round(rate),
        "unit": "samples/s",
        "program_realtime_x": round(rate / 48000, 1),
        "realtime_players": round(players * rate / 48000),
        "batched_players": batched,
    }))


def bench_modal_bank(n_voices=65536):
    """Modal mallet ensemble at fused-kernel scale: ModalVoice (12-mode bell
    preset) on the generic PallasVoiceBank — 12 rotation-decay modes per
    voice with per-sample coefficients (audio-rate freq/decay modulation is
    exact), EnvAr mallet, Pan2. Beyond-reference model family; the heaviest
    per-sample body in the library (3 hardware transcendentals per mode per
    sample). Measured like bench_fm_bank: ONE jitted on-device scan of 750
    blocks whose per-block mean is FETCHED."""
    import time

    import jax

    from knaster_tpu import AudioCtx, ModalVoice, PallasVoiceBank
    from knaster_tpu.ugens.modal import ModalResonator

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": (330.0 * 2 ** rng.uniform(-1.5, 1.5, n_voices)).astype(np.float32),
        "decay": rng.uniform(0.5, 6.0, n_voices).astype(np.float32),
        "pan": rng.uniform(-1, 1, n_voices).astype(np.float32),
        "amp": np.full(n_voices, 0.01, np.float32),
    }
    bank = PallasVoiceBank(ModalVoice(ModalResonator.bell(330.0)), n_voices,
                           voice_defaults=defaults, event_capacity=4096)
    st = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)

    @jax.jit
    def strike_step(s, ev):
        return bank.process(ctx, s, no_in, {}, events=ev)[:2]

    ev = bank.node_events_from_lists(
        [(0, v, bank.trig_index("t_strike"), 1, 0.0) for v in range(4096)]
    )
    st, out = strike_step(st, ev)
    _ = np.asarray(out)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)  # force real execution
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "modal_bank",
        "config": f"{n_voices}voices_mosaic_modal12",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_generic_bank(n_voices=131072):
    """Generic PallasVoiceBank (mosaic_voice harness) on FMVoice — must hold
    the hand-written PallasFMVoiceBank's performance class (measured ratio
    0.95 on the v5e; the hand kernel remains the A/B reference). Measured
    like bench_fm_bank: ONE jitted on-device scan of 750 blocks whose
    per-block mean is FETCHED (only a fetch is a trustworthy completion
    signal on this tunnel)."""
    import time

    import jax

    from knaster_tpu import AudioCtx, FMVoice, PallasVoiceBank

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": (220.0 * 2 ** rng.uniform(-1, 1, n_voices)).astype(np.float32),
        "ratio": rng.choice([0.5, 1.0, 2.0, 3.0], n_voices).astype(np.float32),
        "index": rng.uniform(0.5, 3.0, n_voices).astype(np.float32),
        "amp": np.full(n_voices, 0.005, np.float32),
    }
    bank = PallasVoiceBank(FMVoice(), n_voices, voice_defaults=defaults)
    st = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)  # force real execution
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "generic_bank",
        "config": f"{n_voices}voices_mosaic_fm",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_envelope_bank(n_voices=131072):
    """Multi-segment Envelope voices at fused-kernel scale: EnvelopeVoice
    (4-segment program, 3 shapes) on the generic PallasVoiceBank — the
    unrolled segment-table fold (pallas_bank._make_env_multiseg). Voices
    start RUNNING (restart trigger in block 0's eventful program, then the
    steady state is measured) so the fold pays its full per-sample cost.
    Measured like bench_fm_bank: ONE jitted on-device scan of 750 blocks
    whose per-block mean is FETCHED."""
    import time

    import jax

    from knaster_tpu import AudioCtx, EnvelopeVoice, PallasVoiceBank
    from knaster_tpu.ugens.envelopes import Envelope

    ctx = AudioCtx(48000, 64, np.float32)
    rng = np.random.default_rng(0)
    env = Envelope(0.0, [(0.05, 1.0), (0.4, 0.5),
                         (0.8, 0.75, "sinusoidal"), (1.5, 0.0)],
                   looping=True)
    defaults = {
        "freq": (220.0 * 2 ** rng.uniform(-1, 1, n_voices)).astype(np.float32),
        "amp": np.full(n_voices, 0.002, np.float32),
        "pan": rng.uniform(-1, 1, n_voices).astype(np.float32),
        "time_scale": rng.uniform(0.5, 2.0, n_voices).astype(np.float32),
    }
    bank = PallasVoiceBank(EnvelopeVoice(env), n_voices,
                           voice_defaults=defaults, event_capacity=4096)
    st = bank.init(ctx)
    no_in = np.zeros((0, 64), np.float32)
    ti = bank.trig_index("t_restart")
    evs = bank.node_events_from_lists(
        [(0, v, ti, 1, 0.0) for v in range(0, n_voices, max(n_voices // 4096, 1))]
    )
    st = bank.process(ctx, st, no_in, {}, events=evs)[0]

    def block(s, _):
        result = bank.process(ctx, s, no_in, {}, events=None)
        return result[0], result[1].mean()

    @jax.jit
    def render(s):
        return jax.lax.scan(block, s, None, length=750)

    s, m = render(st)
    _ = np.asarray(m)
    dt = 1e9
    for _i in range(3):
        t0 = time.time()
        s, m = render(s)
        _ = np.asarray(m)
        dt = min(dt, time.time() - t0)
    vs = n_voices * 48000 / dt
    emit(({
        "bench": "envelope_bank",
        "config": f"{n_voices}voices_4seg_looping",
        "value": round(vs),
        "unit": "voice-samples/s",
        "realtime_voices": round(vs / 48000),
    }))


def bench_edit_latency(n_nodes=256, block_size=16):
    """Live-edit cost at 256 nodes: time from g.edit() commit to the first
    rendered block of the NEW program, for (a) a cold topology (fresh trace
    + XLA compile) and (b) a recurring topology (program-cache hit — the
    reference's microsecond TaskData swap, graph.rs:1707-1726, is matched
    by reusing both compiled programs and rebuilding only the state carry).
    """
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        SinWt,
    )
    from knaster_tpu.graph.compile import clear_program_cache

    clear_program_cache()
    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=block_size)
    )

    def add_sine(gg):
        s = gg.push(SinWt(440.0))
        (s * 0.001).to_graph_out()
        return s

    handles = []
    def build(gg):
        for _ in range(n_nodes):
            handles.append(add_sine(gg))
    g.edit(build)
    proc.run_without_inputs()  # warm the n_nodes-topology programs

    def edit_to_audible(mutate):
        t0 = time.time()
        g.edit(mutate)
        proc.run_without_inputs()  # recompile (or cache hit) + 1 block
        return time.time() - t0

    # cold: n_nodes+1 sines is a new topology -> trace + compile
    cold = edit_to_audible(lambda gg: handles.append(add_sine(gg)))
    # free/push cycles: both topologies are now program-cached; the first
    # cycle still pays one-time eager compiles of the state-carry ops, the
    # second is the recurring live-edit cost (the SuperCollider-style case)
    cycle = []
    for _ in range(3):
        f = edit_to_audible(lambda gg: handles.pop().free())
        p = edit_to_audible(lambda gg: handles.append(add_sine(gg)))
        cycle.append((f, p))
    hot_free, hot_push = cycle[-1]

    # the many_sines idiom: play a NEW NOTE by pushing the same voice shape
    # at a fresh default frequency — pdefaults are excluded from the
    # structural signature, so this must be a cache hit too
    def new_note(gg):
        s = gg.push(SinWt(float(100.0 + len(handles))))
        (s * 0.001).to_graph_out()
        return s

    edit_to_audible(lambda gg: handles.pop().free())
    new_default_push = edit_to_audible(
        lambda gg: handles.append(new_note(gg))
    )
    emit(
        (
            {
                "bench": "edit_latency",
                "config": f"{n_nodes}nodes_block{block_size}",
                "value": round(hot_push * 1e3, 2),
                "unit": "ms (cache-hit edit -> audible)",
                "cold_compile_ms": round(cold * 1e3, 1),
                "first_cycle_ms": [round(x * 1e3, 1) for x in cycle[0]],
                "cache_hit_free_ms": round(hot_free * 1e3, 2),
                "cache_hit_push_ms": round(hot_push * 1e3, 2),
                "new_default_push_ms": round(new_default_push * 1e3, 2),
            }
        )
    )


def bench_voicebank():
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True, text=True,
    )
    sys.stderr.write(out.stderr)
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            rec = json.loads(ln)
            rec.setdefault("bench", "voicebank")
            rec.setdefault("config", "headline")
            emit(rec)
        else:
            print(ln)


def bench_chain_kernel(n_nodes=256, block_sizes=(16, 64)):
    """A/B the Pallas chain executor (graph/chain_kernel.py) against the
    lax.scan executor on the generic fm_cascade graph — the measurement
    behind KNASTER_CHAIN_PALLAS's `auto` default (v5e: 4.0-4.4x, see
    DESIGN_NOTES). Run explicitly: `python benchmarks/suite.py
    chain_kernel` (not in the default set; the scan leg duplicates
    fm_cascade's numbers)."""
    import knaster_tpu.graph.chain_kernel as ck
    import knaster_tpu.graph.compile as C
    from knaster_tpu import AudioProcessor, AudioProcessorOptions, SinWt

    def build(gg):
        prev = None
        for i in range(n_nodes):
            s = gg.push(SinWt(100.0 + i))
            if prev is not None:
                mod = (prev * 100.0) + 200.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
        (prev * 0.1).to_graph_out()

    for bs in block_sizes:
        rates = {}
        chunk = {}
        try:
            for mode in ("0", "1"):
                ck._MODE = mode
                C.clear_program_cache()
                g, proc = AudioProcessor.new(
                    0, 1, AudioProcessorOptions(block_size=bs)
                )
                g.edit(build)
                rates[mode] = _program_rate(proc)
                if mode == "1" and bs <= 32:
                    # the LIVE small-block regime (VERDICT round-5 #7):
                    # the per-block kernel pays its stage-loop floor on
                    # 16-lane rows; a 2-4-block live chunk (the evchunk /
                    # small-superblock tiers the stream runner already
                    # picks) amortizes it. Events land at chunk edges —
                    # the evchunk contract.
                    chunk.update(_live_chunk_rates(proc, (2, 4)))
        finally:
            ck._MODE = None
            C.clear_program_cache()
        emit(
            {
                "bench": "chain_kernel_ab",
                "config": f"{n_nodes}nodes_block{bs}",
                "value": round(rates["1"]),
                "unit": "samples/s",
                "pallas_realtime_x": round(rates["1"] / 48000, 1),
                "scan_realtime_x": round(rates["0"] / 48000, 1),
                "speedup": round(rates["1"] / max(rates["0"], 1e-9), 2),
                **{
                    k: round(v / 48000, 1) for k, v in chunk.items()
                },
            }
        )


def bench_convolver(ir_seconds=2.0, block_size=64):
    """Convolution reverb (beyond-reference): noise -> Convolver with an
    ir_seconds stereo IR (K = ceil(L/B) partitions in the FDL). Not in
    the default set; run `python benchmarks/suite.py convolver`."""
    from knaster_tpu import AudioProcessor, AudioProcessorOptions, Convolver, WhiteNoise

    rng = np.random.default_rng(0)
    L = int(ir_seconds * 48000)
    t = np.arange(L, dtype=np.float32) / 48000.0
    ir = (
        rng.standard_normal((2, L)).astype(np.float32)
        * np.exp(-3.0 * t)[None, :]
        * 0.02
    )
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=block_size)
    )

    def build(gg):
        n = gg.push(WhiteNoise(seed=5))
        cv = gg.push(Convolver(ir))
        n.to(cv)
        cv.to_graph_out()

    g.edit(build)
    rate = _program_rate(proc)
    emit({
        "bench": "convolver",
        "config": f"{int(ir_seconds*1000)}ms_stereo_ir_block{block_size}",
        "value": round(rate),
        "unit": "samples/s",
        "realtime_x": round(rate / 48000, 1),
        "partitions": -(-L // block_size),
    })


ALL = {
    "sines_const": bench_sines_const,
    "convolver": bench_convolver,
    "chain_kernel": bench_chain_kernel,
    "edit_latency": bench_edit_latency,
    "fm_cascade": bench_fm_cascade,
    "wrappers": bench_wrappers,
    "galactic": bench_galactic,
    "fm_bank": bench_fm_bank,
    "plucked_bank": bench_plucked_bank,
    "sampler_bank": bench_sampler_bank,
    "sampler_resample": bench_sampler_resample,
    "fm_cascade_model": bench_fm_cascade_model,
    "wavetable_bank": bench_wavetable_bank,
    "subtractive_bank": bench_subtractive_bank,
    "modal_bank": bench_modal_bank,
    "granular": bench_granular,
    "granular_bank": bench_granular_bank,
    "generic_bank": bench_generic_bank,
    "envelope_bank": bench_envelope_bank,
    "voicebank": bench_voicebank,
}

if __name__ == "__main__":
    args = sys.argv[1:]
    save = baseline = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--save":
            save = args[i + 1]; i += 2
        elif args[i] == "--baseline":
            baseline = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    names = names or ["sines_const", "wrappers", "galactic", "fm_bank",
                      "plucked_bank", "sampler_bank", "sampler_resample",
                      "fm_cascade_model",
                      "wavetable_bank", "generic_bank"]
    for n in names:
        ALL[n]()
    if baseline:
        # Weather guard: this tunnel swings dispatch-bound rows ±30-40%
        # between runs with zero code change (RESULTS.md notes), in BOTH
        # directions. A single bad window must not read as a regression:
        # re-measure only the regressed workloads (up to 2 retries) and
        # compare each (bench, config) field on its best measurement.
        regs = compare_to_baseline(_best_records(RECORDS), baseline)
        for attempt in (1, 2):
            if not regs:
                break
            benches = sorted({r.split("[", 1)[0] for r in regs})
            fns = sorted({_BENCH_TO_FN[b] for b in benches if b in _BENCH_TO_FN})
            print(
                f"# {len(regs)} candidate regression(s); re-measuring "
                f"(weather guard, attempt {attempt}): {', '.join(fns)}",
                file=sys.stderr,
            )
            for n in fns:
                ALL[n]()
            regs = compare_to_baseline(_best_records(RECORDS), baseline)
    if save:
        with open(save, "w") as f:
            for rec in _best_records(RECORDS):
                f.write(json.dumps(rec) + "\n")
    if baseline:
        if regs:
            print("PERF REGRESSIONS (>10% below baseline, best of 3 runs):",
                  file=sys.stderr)
            for r in regs:
                print("  " + r, file=sys.stderr)
            sys.exit(1)
        print(f"# perf check OK: no >10% regressions vs {baseline}")
