"""Realtime streaming soak: StreamBackend on real hardware with live control.

Runs the two-thread live engine (producer renders ahead through the native
C++ SPSC ring, consumer drains at the audio rate) for SOAK_SECONDS of
wall-clock with a large Pallas voice bank, firing live per-voice events every
~100 ms from the control thread. Reports one JSON line with the underrun
count — the realtime-viability metric (0 = no glitch).

Device dispatch + fetch latency is tens of ms over this environment's TPU
tunnel, so realtime hinges on the chunked producer (StreamBackend
chunk_blocks) amortizing round trips; control latency is one chunk.

Usage: python benchmarks/realtime_soak.py [seconds]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
SOAK_SECONDS = float(_pos_args[0]) if _pos_args else 10.0
V = 131072
SR = 48000
BLOCK = int(os.environ.get("SOAK_BLOCK", 64))  # 16 = the live-latency regime
CHUNK_BLOCKS = int(os.environ.get("SOAK_CHUNK", 64))  # control latency = chunk
# ring depth (blocks): how much transport jitter the stream can absorb.
# The engine's steady-state chunk cost is ~3-7 ms against the 85 ms budget
# (see RESULTS.md), but this environment's TPU tunnel occasionally stalls
# for SECONDS; a deep ring rides those out at the cost of control latency.
LOOKAHEAD = int(os.environ.get("SOAK_LOOKAHEAD", 96))


def main():
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        PallasSineVoiceBank,
        SinWt,
        StreamBackend,
    )

    rng = np.random.default_rng(0)
    opts = AudioProcessorOptions(block_size=BLOCK, sample_rate=SR)
    graph, proc = AudioProcessor.new(0, 2, opts)
    with_fx = os.environ.get("SOAK_FX", "0") == "1"
    with_probe = os.environ.get("SOAK_PROBE", "0") == "1"
    # SOAK_SCENARIO=cascade: stream the generic 256-node FM cascade (the
    # chain-collapsed graph, Pallas chain kernel on accelerators) with live
    # mid-chain param changes — the role of the reference's fm_bench JACK
    # binaries (knaster_benchmarks/src/bin/fm_bench*.rs: the same cascade
    # run live against an audio server). Default scenario: the voice bank.
    # SOAK_SCENARIO=ir: pink noise through a long-IR Convolver with live
    # dry_wet moves — a single-voice effect chain whose chunks carry
    # MID-CHUNK events (the case that fragments a chunk into several
    # RTT-priced dispatches without the eventful-superblock program).
    scenario = os.environ.get("SOAK_SCENARIO", "bank")
    n_casc = int(os.environ.get("SOAK_CASCADE_NODES", 256))
    ir_seconds = float(os.environ.get("SOAK_IR_SECONDS", 2.0))

    def build_ir(g):
        from knaster_tpu import Convolver, PinkNoise

        t = np.arange(int(ir_seconds * SR), dtype=np.float32) / SR
        decay = np.exp(-3.0 * t)
        rr = np.random.default_rng(3)
        ir = np.stack([
            rr.standard_normal(t.size).astype(np.float32) * decay,
            rr.standard_normal(t.size).astype(np.float32) * decay,
        ]) * 0.02
        src = g.push(PinkNoise(seed=11))
        conv = g.push(Convolver(ir, inputs=1, dry_wet=0.4))
        amp = src * 0.2
        amp.to(conv)
        conv.to_graph_out()  # stereo IR: both channels
        return conv

    def build_cascade(g):
        prev = None
        sines = []
        for i in range(n_casc):
            s = g.push(SinWt(100.0 + i))
            sines.append(s)
            if prev is not None:
                mod = (prev * 100.0) + 200.0
                g.connect_param(
                    g.handle(mod.channels[0][1]), 0, s, "freq"
                )
            prev = s
        sig = prev * 0.1
        sig.to_graph_out()                      # left
        sig.to_graph_out_channels([1])          # right (same mono bus)
        return sines

    def build(g):
        bank = g.push(PallasSineVoiceBank(
            V, event_capacity=512,
            voice_defaults={
                "freq": rng.uniform(80, 3000, V).astype(np.float32),
                "amp": np.full(V, 5e-5, np.float32),
                "pan": rng.uniform(-1, 1, V).astype(np.float32),
            },
        ))
        if with_fx:
            # the full production bus: massed voices -> Galactic reverb
            from knaster_tpu import Galactic

            verb = g.push(Galactic(wet=0.35))
            bank.to(verb)
            verb.to_graph_out()
        else:
            bank.to_graph_out()
        if with_probe:
            # bus probe drained from the control thread (VERDICT #8: probing
            # a live stream must not add round-trips to the producer; the
            # one-fetch drain rides the control thread at ~10 Hz)
            from knaster_tpu import LogProbe

            probe = g.push(LogProbe("bus"))
            bank.out([0]).to(probe)
        return bank

    def build_edit(g):
        # SOAK_SCENARIO=edit: a live many-sines set the control thread
        # RESTRUCTURES while audio runs — push a new voice / free an old
        # one at ~2 structural edits/s (the SuperCollider idiom; the
        # reference's raison d'etre, graph.rs:1707-1726 TaskData swap +
        # graph_gen.rs:93-109). StreamBackend enables async recompile, so
        # the producer keeps rendering the old program while the worker
        # compiles (program-cache hits after the first cycle) and swaps
        # between blocks; underruns measure glitch-freedom.
        hs = []
        for i in range(64):
            s = g.push(SinWt(200.0 + 7.0 * i))
            (s * 0.002).to_graph_out()
            hs.append(s)
        return hs

    builders = {"cascade": build_cascade, "ir": build_ir, "edit": build_edit}
    bank = graph.edit(builders.get(scenario, build))

    consumed = [0]
    peak = [0.0]

    def consumer(block):
        consumed[0] += block.shape[1]
        peak[0] = max(peak[0], float(np.abs(block).max()))

    backend = StreamBackend(SR, BLOCK, consumer=consumer,
                            chunk_blocks=CHUNK_BLOCKS,
                            lookahead_blocks=LOOKAHEAD)
    t_setup = time.time()
    backend.start_processing(proc)
    setup_s = time.time() - t_setup

    t_end = time.time() + SOAK_SECONDS
    n_events = 0
    group = 0
    probe_reads = [0]
    if scenario == "cascade":
        sines = bank  # build() returned the chain's node handles
        while time.time() < t_end:
            # live control at ~10 Hz: retune the cascade root and reset the
            # phase of a rotating mid-chain node (eventful blocks take the
            # full program; event-free chunks stay on the chain kernel)
            sines[0].param("freq").set(float(rng.uniform(80, 160)))
            sines[(group * 17) % len(sines)].param("reset_phase").trig()
            n_events += 2
            group += 1
            time.sleep(0.1)
    elif scenario == "ir":
        from knaster_tpu import Seconds

        dw = bank.param("dry_wet")
        while time.time() < t_end:
            # sequenced control: four dry/wet moves per round scheduled at
            # random sub-chunk offsets — they land MID-CHUNK, the case that
            # needs the eventful-superblock program to stay one dispatch
            for _ in range(4):
                off = int(rng.integers(0, CHUNK_BLOCKS * BLOCK))
                dw.set_after(
                    float(rng.uniform(0.1, 0.9)),
                    Seconds.from_samples(off, SR),
                )
            n_events += 4
            group += 1
            time.sleep(0.1)
    elif scenario == "edit":
        hs = list(bank)
        n_edits = 0
        while time.time() < t_end:
            def push_one(gg):
                s = gg.push(SinWt(float(rng.uniform(150, 2000))))
                (s * 0.002).to_graph_out()
                return s

            hs.append(graph.edit(push_one))
            n_edits += 1
            time.sleep(0.25)
            if len(hs) > 66 and time.time() < t_end:
                victim = hs.pop(0)
                graph.edit(lambda gg: victim.free())
                n_edits += 1
            time.sleep(0.25)
            group += 1
        n_events = n_edits
    else:
        trig = bank.voice_param("t_restart")
        rel = bank.voice_param("t_release")
        freqp = bank.voice_param("freq")
        while time.time() < t_end:
            # live control at ~10 Hz: start a 64-voice cluster, release the
            # one from two rounds ago, detune a few voices
            base = (group * 64) % V
            for v in range(base, base + 64):
                trig.trig(v)
            old = ((group - 2) * 64) % V
            if group >= 2:
                for v in range(old, old + 64):
                    rel.trig(v)
            for v in range(base, base + 8):
                freqp.set(v, float(rng.uniform(200, 2000)))
            n_events += 64 + (64 if group >= 2 else 0) + 8
            group += 1
            if with_probe:
                caps = proc.probe_log()
                probe_reads[0] += len(caps)
            time.sleep(0.1)

    backend.stop()
    wall = SOAK_SECONDS
    audio_s = consumed[0] / SR
    row = {
        "bench": "realtime_soak",
        "config": (
            f"{n_casc}node_cascade_block{BLOCK}_chunk{CHUNK_BLOCKS}_la{LOOKAHEAD}"
            if scenario == "cascade"
            else f"ir{ir_seconds:g}s_block{BLOCK}_chunk{CHUNK_BLOCKS}_la{LOOKAHEAD}"
            if scenario == "ir"
            else f"live_edit_block{BLOCK}_chunk{CHUNK_BLOCKS}_la{LOOKAHEAD}"
            if scenario == "edit"
            else f"{V}voices_block{BLOCK}_chunk{CHUNK_BLOCKS}_la{LOOKAHEAD}"
            + ("_galactic" if with_fx else "")
        ),
        "value": backend.underruns,
        "unit": "underruns",
        "wall_s": round(wall, 1),
        "audio_consumed_s": round(audio_s, 2),
        "live_events": n_events,
        "peak": round(peak[0], 4),
        "probe_reads": probe_reads[0],
        "startup_s": round(setup_s, 1),
    }
    print(json.dumps(row))
    if "--baseline" in sys.argv:
        # gate realtime behavior like throughput (VERDICT round-5 #8):
        # any underrun beyond the committed row's count fails the run
        from benchmarks.suite import compare_to_baseline

        path = os.path.join(os.path.dirname(__file__), "baseline_tpu.json")
        regs = compare_to_baseline([row], path)
        for r in regs:
            print(f"# REGRESSION {r}")
        if regs:
            raise SystemExit(1)
        print("# soak check OK vs baseline")


if __name__ == "__main__":
    main()
