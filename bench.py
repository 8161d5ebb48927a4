"""Headline benchmark: polyphonic voice throughput (many_sines workload).

Uses the flagship PallasSineVoiceBank (fused osc+env+pan+mix kernel, voices
on VPU lanes, state in VMEM); the composable vmap VoiceBank path reaches
~40% of this (see benchmarks/RESULTS.md).

The reference's demonstrated scale is 600 simultaneous enveloped, panned
sine voices in realtime at 48 kHz on a desktop (knaster/examples/
many_sines.rs, BASELINE.md). We render an N-voice enveloped/panned sine bank
fully on device (lax.scan over blocks) and report voice-samples/second;
``vs_baseline`` is the ratio to the reference's 600 × 48000 voice-samples/s.

Run on TPU (default env) or CPU (JAX_PLATFORMS=cpu for a sanity check).
Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VOICES = int(os.environ.get("BENCH_VOICES", 131072))
SECONDS = float(os.environ.get("BENCH_SECONDS", 1.0))
BLOCK = int(os.environ.get("BENCH_BLOCK", 64))
SR = 48000
BASELINE_VOICE_SAMPLES = 600 * 48000  # reference: 600 voices realtime @48k


def main():
    import jax
    import jax.numpy as jnp

    from knaster_tpu import AudioCtx, PallasSineVoiceBank

    ctx = AudioCtx(sample_rate=SR, block_size=BLOCK, dtype=np.float32)
    rng = np.random.default_rng(0)
    defaults = {
        "freq": rng.uniform(100.0, 4000.0, N_VOICES).astype(np.float32),
        "amp": np.full(N_VOICES, 0.01, np.float32),
        "pan": rng.uniform(-1.0, 1.0, N_VOICES).astype(np.float32),
    }
    bank = PallasSineVoiceBank(N_VOICES, voice_defaults=defaults)
    state = bank.init(ctx)
    # start EVERY voice's envelope via staged event blocks during warmup
    # (event capacity bounds triggers per block), then measure event-free
    # steady state: "realtime voices" = SOUNDING voices, not 256 sounding
    # + idle rest (round-5 hardening; per-voice kernel work is identical
    # either way, so the throughput number itself is unchanged)
    trig_idx = bank.trig_index("t_restart")
    cap = bank.event_capacity
    stages = [
        bank.node_events_from_lists(
            [(0, v, trig_idx, 1, 0.0)
             for v in range(base, min(base + cap, N_VOICES))]
        )
        for base in range(0, N_VOICES, cap)
    ]
    ev_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)

    n_blocks = max(1, int(SECONDS * SR) // BLOCK)
    no_in = jnp.zeros((0, BLOCK), ctx.dtype)

    def block_step(st, ev):
        result = bank.process(ctx, st, no_in, {}, events=ev)
        return result[0], result[1]

    @jax.jit
    def start_all(state):
        def body(st, ev):
            st, out = block_step(st, ev)
            return st, out[:, -1]

        return jax.lax.scan(body, state, ev_stack)

    @jax.jit
    def render(state):
        def body(st, _):
            # events=None is the steady-state program (what the graph
            # engine's fast program runs for event-free blocks)
            st, out = block_step(st, None)
            # keep only the mix bus mean per block: avoids materializing
            # the full output while forcing full computation
            return st, out.mean()

        state, means = jax.lax.scan(body, state, None, length=n_blocks)
        return state, means

    # compile + warm up. Force a host fetch: on this stack the first
    # block_until_ready after a fresh compile can return before the remote
    # execution finishes, poisoning the timing.
    t0 = time.time()
    state, last_cols = start_all(state)
    mix_amp = float(np.abs(np.asarray(last_cols)[-1]).max())
    st, means = render(state)
    _ = np.asarray(means)
    compile_and_first = time.time() - t0

    # timed steady-state runs (best of 3, each closed by a host fetch).
    # The fetch costs ~50 ms on this tunnel — a short run would report
    # (fetch + work)/work-time, so subtract it via a short-run baseline
    # (slope measurement; see benchmarks/suite.py::_scan_slope_rate).
    dt = float("inf")
    for _i in range(3):
        t0 = time.time()
        st, means = render(st)
        jax.block_until_ready(means)
        _ = np.asarray(means)
        dt = min(dt, time.time() - t0)

    # baseline: dispatch + same-size fetch for a trivial program (compiles
    # in ms, unlike a second full scan program)
    @jax.jit
    def tiny(x):
        return x + 1.0

    r = tiny(jnp.zeros((n_blocks,), jnp.float32))
    _ = np.asarray(r)
    rtt = float("inf")
    for _i in range(3):
        t0 = time.time()
        r = tiny(r)
        jax.block_until_ready(r)
        _ = np.asarray(r)
        rtt = min(rtt, time.time() - t0)
    dt = max(dt - rtt, dt * 0.05)

    frames = n_blocks * BLOCK
    voice_samples_per_sec = N_VOICES * frames / dt
    realtime_voices = voice_samples_per_sec / SR
    result = {
        "metric": "voice_samples_per_sec",
        "value": round(voice_samples_per_sec),
        "unit": "voice-samples/s",
        "vs_baseline": round(voice_samples_per_sec / BASELINE_VOICE_SAMPLES, 3),
    }
    print(json.dumps(result))
    print(
        f"# {N_VOICES} voices (ALL triggered; mix peak {mix_amp:.1f}), "
        f"{frames} frames in {dt:.3f}s -> "
        f"{realtime_voices:.0f} realtime voices @48kHz "
        f"(compile+warmup {compile_and_first:.1f}s, platform "
        f"{jax.devices()[0].platform})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
