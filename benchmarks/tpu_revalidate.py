"""Post-outage TPU revalidation — run when the tunnel returns.

One command covers everything that landed while the TPU service was down
(multi-hour UNAVAILABLE window, round 3):

1. Eventful-bank smoke on hardware: the stacked [W, rows, LANES] trigger
   words' dynamic row slice (`pallas_bank._trig_bit`) must lower in Mosaic
   and match the vmap bank at B=64 (fully-unrolled loop) and B=256
   (partially-unrolled, traced word index).
2. chain_kernel A/B (`suite.bench_chain_kernel`): the measurement that
   decides KNASTER_CHAIN_PALLAS's default.
3. The standard baseline check: the suite's DEFAULT bench set actually
   runs, then compares against benchmarks/baseline_tpu.json (>10% drops
   fail; benches absent from the baseline — the A/B records — are
   skipped by the comparator).

Usage: python benchmarks/tpu_revalidate.py [--skip-baseline]

See also benchmarks/tpu_kernel_check.py — the wider kernel-structure
sweep (all four bank families x block sizes x event paths vs the vmap
bank). Running it after the round-3 outage found two Mosaic-invalid
structures CPU interpret had accepted (partial sample-loop unrolls at
B > 64; non-multiple-of-8 tile rows for small banks) — run BOTH after
any outage window.
"""

import importlib.util
import os
import sys
import time

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_DIR))


def eventful_bank_smoke():
    import jax

    from knaster_tpu import AudioProcessor, AudioProcessorOptions, Seconds
    from knaster_tpu.models.voices import SineVoice
    from knaster_tpu.parallel import PallasSineVoiceBank, VoiceBank

    print(f"# devices: {jax.devices()}", flush=True)
    for bs in (64, 256):
        outs = {}
        for cls in ("pallas", "vmap"):
            g, proc = AudioProcessor.new(
                0, 2, AudioProcessorOptions(block_size=bs)
            )
            if cls == "pallas":
                bank = g.edit(lambda gg: gg.push(
                    PallasSineVoiceBank(256, attack=0.002, release=0.05)
                ))
            else:
                bank = g.edit(lambda gg: gg.push(
                    VoiceBank(SineVoice(attack=0.002, release=0.05), 256)
                ))
            bank.to_graph_out()
            g.commit()
            for v in range(6):
                bank.voice_param("freq").set(v, 200.0 + 50.0 * v)
                bank.voice_param("amp").set(v, 0.05)
                bank.voice_param("t_restart").trig(v)
            # mid-block triggers exercising every trigger word at this B
            for w in range(max(bs // 32, 1)):
                voice = 10 + w
                bank.voice_param("amp").set(voice, 0.03)
                bank.voice_param("t_restart").trig_after(
                    voice, Seconds.from_samples(32 * w + 7, 48000)
                )
            t0 = time.time()
            outs[cls] = np.asarray(proc.render(frames=bs * 8))
            print(f"# B={bs} {cls}: peak {np.abs(outs[cls]).max():.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        err = float(np.abs(outs["pallas"] - outs["vmap"]).max())
        print(f"# B={bs} pallas-vs-vmap max err: {err:.2e}", flush=True)
        assert err < 1e-5, f"eventful bank parity broke on hardware: {err}"
    print("# eventful-bank smoke OK", flush=True)


if __name__ == "__main__":
    eventful_bank_smoke()

    # the wider kernel-structure sweep (all bank families x block sizes x
    # event paths vs the vmap bank) — quick mode; run the full sweep by
    # hand after long outages
    import subprocess

    rc = subprocess.call(
        [sys.executable, os.path.join(_DIR, "tpu_kernel_check.py"), "--quick"]
    )
    if rc != 0:
        print("tpu_kernel_check failed", file=sys.stderr)
        sys.exit(rc)

    spec = importlib.util.spec_from_file_location(
        "suite", os.path.join(_DIR, "suite.py")
    )
    suite = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(suite)
    suite.bench_chain_kernel()
    if "--skip-baseline" not in sys.argv:
        # the comparison is only meaningful if the baseline workloads RUN
        for name in ["sines_const", "wrappers", "galactic", "fm_bank",
                     "fm_cascade_model", "wavetable_bank"]:
            suite.ALL[name]()
        regs = suite.compare_to_baseline(
            suite.RECORDS, os.path.join(_DIR, "baseline_tpu.json")
        )
        if regs:
            print("PERF REGRESSIONS:", file=sys.stderr)
            for r in regs:
                print("  " + r, file=sys.stderr)
            sys.exit(1)
    print("# tpu_revalidate OK", flush=True)
