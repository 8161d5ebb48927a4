"""Hardware validation sweep for the Pallas kernels (one real chip).

CPU interpret mode accepts kernel structures Mosaic rejects (partial
unrolls, f32<->u32 converts), so every kernel family x block-size x
event-path combination must compile and match the vmap bank ON HARDWARE.
This script is the one-command check; it exists because two Mosaic-invalid
structures (chain-kernel partial unroll, bank sample-loop partial unroll at
B > 64) landed during a multi-hour tunnel outage and passed every CPU test.

Usage: python benchmarks/tpu_kernel_check.py [--quick] [--only=substr ...]
Prints one PASS/FAIL line per check and a final JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _defaults(V, rng, extra=()):
    d = {
        "freq": rng.uniform(100, 900, V).astype(np.float32),
        "amp": np.full(V, 0.001, np.float32),
    }
    for name in extra:
        if name == "pan":
            d["pan"] = rng.uniform(-1, 1, V).astype(np.float32)
        elif name == "ratio":
            d["ratio"] = np.full(V, 2.0, np.float32)
        elif name == "index":
            d["index"] = np.full(V, 1.5, np.float32)
        elif name == "cutoff":
            d["cutoff"] = rng.uniform(400, 4000, V).astype(np.float32)
    return d


def main():
    from knaster_tpu.core.ugen import AudioCtx
    from knaster_tpu import (
        AdditiveVoice,
        FMVoice,
        ModalVoice,
        PallasFMVoiceBank,
        PallasSineVoiceBank,
        PallasSubtractiveVoiceBank,
        PallasVoiceBank,
        PallasWavetableVoiceBank,
        SineVoice,
        SubtractiveVoice,
        VoiceBank,
    )
    from knaster_tpu.ugens.modal import ModalResonator
    from knaster_tpu import EnvelopeVoice
    from knaster_tpu.ugens.envelopes import Envelope

    def _env4seg():
        return Envelope(0.0, [(0.002, 1.0), (0.004, 0.5),
                              (0.004, 0.75, "sinusoidal"), (0.006, 0.0)])

    quick = "--quick" in sys.argv
    V = 1024
    rng = np.random.default_rng(3)
    results = []
    blocks = (64, 128) if quick else (64, 128, 256, 1024)

    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]

    def check(name, fn):
        if only and not any(s in name for s in only):
            return
        try:
            fn()
            print(f"PASS {name}")
            results.append({"check": name, "ok": True})
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"FAIL {name}: {msg}")
            results.append({"check": name, "ok": False, "error": msg})

    def pairs():
        yield (
            "sine",
            lambda: PallasSineVoiceBank(
                V, voice_defaults=_defaults(V, rng, ("pan",))
            ),
            ("pan",),
        )
        yield (
            "fm",
            lambda: PallasFMVoiceBank(
                V, voice_defaults=_defaults(V, rng, ("ratio", "index"))
            ),
            ("ratio", "index"),
        )
        yield (
            "subtractive",
            lambda: PallasSubtractiveVoiceBank(
                V, voice_defaults=_defaults(V, rng, ("cutoff",))
            ),
            ("cutoff",),
        )
        yield (
            "generic_fm",  # the generic-harness kernel (PallasVoiceBank)
            lambda: PallasVoiceBank(
                FMVoice(),
                V, voice_defaults=_defaults(V, rng, ("ratio", "index"))
            ),
            ("ratio", "index"),
        )
        yield (
            "generic_sine",
            lambda: PallasVoiceBank(
                SineVoice(),
                V, voice_defaults=_defaults(V, rng, ("pan",))
            ),
            ("pan",),
        )
        yield (
            "generic_subtractive",
            lambda: PallasVoiceBank(
                SubtractiveVoice(),
                V, voice_defaults=_defaults(V, rng, ("cutoff",))
            ),
            ("cutoff",),
        )
        yield (
            "generic_additive",
            lambda: PallasVoiceBank(
                AdditiveVoice(
                    harmonics=np.array([1.0, 0.5, 0.25, 0.12], np.float32)
                ),
                V, voice_defaults=_defaults(V, rng, ("pan",)),
            ),
            ("pan",),
        )
        yield (
            "wavetable",
            lambda: PallasWavetableVoiceBank(
                V, harmonics=np.array([1.0, 0.5, 0.25, 0.12], np.float32),
                voice_defaults=_defaults(V, rng, ("pan",)),
            ),
            ("pan",),
        )
        yield (
            "generic_modal",  # hardware transcendentals (exp/sin/cos) in-body
            lambda: PallasVoiceBank(
                ModalVoice(ModalResonator.bell(300.0)),
                V, voice_defaults=_defaults(V, rng, ("pan",)),
            ),
            ("pan",),
        )
        yield (
            "generic_envelope",  # multi-segment table fold (4 shapes)
            lambda: PallasVoiceBank(
                EnvelopeVoice(_env4seg()),
                V, voice_defaults=_defaults(V, rng, ("pan",)),
            ),
            ("pan",),
        )

    # ---- chain-kernel stage families: Pallas executor vs scan executor
    # on hardware (graph/chain_kernel.py; every family must actually
    # enter the kernel — silent validation-valve fallbacks fail the check)
    import knaster_tpu.graph.chain_kernel as ck
    import knaster_tpu.graph.compile as C
    from knaster_tpu import (
        AudioProcessor,
        AudioProcessorOptions,
        EnvAsr,
        Pan2,
        PolyBlep,
        SampleDelay,
        SinWt,
        WhiteNoise,
    )
    from knaster_tpu.ugens.polyblep import Waveform

    def _build_sin(gg, hs):
        prev = None
        for i in range(12):
            s = gg.push(SinWt(100.0 + 3.0 * i))
            if prev is not None:
                mod = (prev * 100.0) + 200.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
            hs.append(s)
        (prev * 0.1).to_graph_out()

    def _build_env(gg, hs):
        prev = None
        for i in range(10):
            e = gg.push(EnvAsr(attack_time=(50.3 + 7.1 * i) / 48000.0,
                               release_time=95.5 / 48000.0))
            hs.append(e)
            prev = e if prev is None else prev + e
        (prev * 0.05).to_graph_out()

    def _build_polyblep(gg, hs):
        waves = [Waveform.Sawtooth, Waveform.Sine, Waveform.Rectangle,
                 Waveform.Triangle, Waveform.Square]
        prev = None
        for i in range(10):
            s = gg.push(PolyBlep(waves[i % len(waves)], 80.0 + 11.0 * i))
            if prev is not None:
                mod = (prev * 30.0) + 110.0
                gg.connect_param(gg.handle(mod.channels[0][1]), 0, s, "freq")
            prev = s
            hs.append(s)
        (prev * 0.1).to_graph_out()

    def _build_pan(gg, hs):
        prev = gg.push(WhiteNoise(seed=3))
        for i in range(10):
            p = gg.push(Pan2(-0.4 + 0.08 * i))
            prev.to(p)
            prev = p.out([0]) + p.out([1])
            hs.append(p)
        (prev * 0.1).to_graph_out()

    def _build_delay(gg, hs):
        prev = gg.push(WhiteNoise(seed=9))
        for i in range(10):
            d = gg.push(SampleDelay(32.0 / 48000.0))
            prev.to(d)
            prev = d * 0.8
            hs.append(d)
        (prev * 0.5).to_graph_out()

    def _env_events(hs, phase):
        trig = "t_restart" if phase == 0 else "t_release"
        for h in hs:
            h.param(trig).trig()

    def _delay_events(hs, phase):
        if phase == 0:
            for i, h in enumerate(hs):
                h.param("delay_time").set((3.0 + 2.0 * i) / 48000.0)
            hs[4].param("delay_time").smooth(20.0 / 48000.0, 0.004)

    # (family, builder, per-phase event fn, tolerance). Library chain
    # stages are transcendental-free or sin/cos-only; Mosaic-vs-XLA ULP
    # differences bound the tolerances.
    def _build_noise(gg, hs):
        from knaster_tpu import OnePoleLpf
        prev = None
        for i in range(12):
            n = gg.push(WhiteNoise(seed=100 + i))
            lp = gg.push(OnePoleLpf(2000.0 + 100.0 * i))
            src = n if prev is None else prev + n
            src.to(lp)
            prev = lp
            hs.append(lp)
        (prev * 0.2).to_graph_out()

    def _build_onepole(gg, hs):
        from knaster_tpu import OnePoleHpf, OnePoleLpf
        node = gg.push(WhiteNoise(seed=7))
        for i in range(16):
            f = gg.push(
                OnePoleLpf(8000.0 + 100.0 * i)
                if i % 2 == 0
                else OnePoleHpf(40.0 + 5.0 * i)
            )
            node.to(f)
            node = f
            hs.append(f)
        node.to_graph_out()

    def _build_svf(gg, hs):
        from knaster_tpu import SvfFilter
        from knaster_tpu.ugens.filters import SvfFilterType
        node = gg.push(WhiteNoise(seed=11))
        for i in range(10):
            f = gg.push(SvfFilter(
                SvfFilterType.Bell, 400.0 * (i + 1), q=1.2,
                gain_db=3.0 if i % 2 == 0 else -2.0,
            ))
            node.to(f)
            node = f
            hs.append(f)
        node.to_graph_out()

    chain_fams = [
        ("chain_sin", _build_sin, None, 1e-6),
        ("chain_noise", _build_noise, None, 1e-6),
        ("chain_onepole", _build_onepole, None, 1e-5),
        # both executors share the polynomial tan coefficients
        # (core/dsp.tan_first_quadrant) since round 5 — the 2e-2 bound
        # that covered XLA-TPU's tan error (6.2e-3 from f64 truth on this
        # chain) is gone; residual is scan-tree association only
        ("chain_svf", _build_svf, None, 1e-4),
        ("chain_env", _build_env, _env_events, 1e-5),
        # u32 fixed-point phase since round 5: both executors' prefix sums
        # are wrapping integer adds, bit-identical at every block size
        # (the old float cumsum reassociated to 1.8e-3 at B=1024);
        # residual is jnp.sin lowering (Mosaic vs XLA) on sine waveforms
        ("chain_polyblep", _build_polyblep, None, 1e-4),
        ("chain_pan", _build_pan, None, 1e-4),
        ("chain_delay", _build_delay, _delay_events, 1e-6),
    ]

    def chain_run(builder, events_fn, tol, B):
        def render(mode):
            ck._MODE, engaged = mode, {"ok": 0}
            real = ck.run

            def spy(*a, **k):
                r = real(*a, **k)
                if r is not None:
                    engaged["ok"] += 1
                return r

            ck.run = spy
            try:
                C.clear_program_cache()
                g, proc = AudioProcessor.new(
                    0, 1, AudioProcessorOptions(block_size=B)
                )
                hs = []
                g.edit(lambda gg: builder(gg, hs))
                outs = []
                for phase in range(2):
                    if events_fn is not None:
                        events_fn(hs, phase)
                    outs.append(np.asarray(proc.render(frames=4 * B)))
                return np.concatenate(outs, axis=1), engaged["ok"]
            finally:
                ck.run = real
                ck._MODE = None
        a, hits = render("1")
        b, _ = render("0")
        assert hits >= 1, "kernel never engaged (Mosaic rejected?)"
        assert np.abs(b).max() > 1e-4, "silent reference render"
        d = float(np.abs(a - b).max())
        assert d < tol, f"maxdiff {d}"

    for fam, builder, events_fn, tol in chain_fams:
        for B in blocks[:2] if quick else blocks:
            check(
                f"{fam}_B{B}",
                lambda builder=builder, events_fn=events_fn, tol=tol, B=B:
                    chain_run(builder, events_fn, tol, B),
            )

    for fam, make, extra in pairs():
        for B in blocks:
            ctx = AudioCtx(48000, B, np.float32)

            def run(fam=fam, make=make, B=B, ctx=ctx):
                pb = make()
                vb = VoiceBank(
                    pb.voice, V, voice_defaults=pb.voice_defaults
                )
                spb, svb = pb.init(ctx), vb.init(ctx)
                no_in = np.zeros((0, B), np.float32)
                fi = pb.float_index("freq")
                trig = pb._trig_names[0] if pb._trig_names else None
                # the library kernels are transcendental-free (table sine /
                # minimax polys — deterministic mul/add on both backends);
                # the modal body uses polynomial exp/sin/cos (round 5,
                # 2.35G -> 5.36G vs/s) <=2e-7 from the vmap path's hw
                # ops; the diff accumulates as phase drift through the
                # ringing modes (~2.4e-7 rad/sample), and an f64-truth
                # test pins both executors to the same bound
                # (tests/test_generic_bank.py::test_generic_modal_truth_parity).
                # previous rationale: hardware exp/sin/cos Mosaic-vs-
                # XLA ULP differences compound through the rotation carry
                tol = 1e-3 if "modal" in fam else 5e-5
                for blk in range(3):
                    evs = None
                    if blk == 0 and trig is not None:
                        # activate voices so the A/B compares real signal,
                        # not idle-envelope zeros
                        ti = pb.trig_index(trig)
                        evs = [(0, v, ti, 1, 0.0) for v in range(0, 8)]
                    if blk == 1:
                        # same-block burst on one slot + a trigger: the
                        # in-kernel breakpoint fold and bitmask read
                        evs = [
                            (min(5, B - 3), 2, fi, 0, 300.0),
                            (min(20, B - 2), 2, fi, 0, 500.0),
                            (min(40, B - 1), 2, fi, 0, 700.0),
                        ]
                    ep = pb.node_events_from_lists(evs) if evs else None
                    ev = vb.node_events_from_lists(evs) if evs else None
                    spb, op = pb.process(ctx, spb, no_in, {}, events=ep)[:2]
                    svb, ov = vb.process(ctx, svb, no_in, {}, events=ev)[:2]
                    d = float(
                        np.abs(np.asarray(op) - np.asarray(ov)).max()
                    )
                    assert d < tol, f"block {blk} maxdiff {d}"

            check(f"{fam}_B{B}", run)

    ok = all(r["ok"] for r in results)
    print(json.dumps({
        "bench": "tpu_kernel_check",
        "config": "quick" if quick else "full",
        "value": sum(1 for r in results if not r["ok"]),
        "unit": "failures",
        "checks": len(results),
        "ok": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
