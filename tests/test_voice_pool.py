"""VoicePool: alloc/note_on/auto-release over a VoiceBank (VERDICT #6).

Matches the reference's polyphony idiom — push voice, free-on-done
(many_sines.rs + wrappers_graph/done.rs WrDone) — at bank scale: 1,000
note-ons through a 64-voice pool with ZERO recompiles and no stolen active
voices under the default policy.
"""

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    SineVoice,
    VoiceBank,
    VoicePool,
)

OPTS = AudioProcessorOptions(block_size=64)


def _make(n_voices=64, attack=0.001, release=0.004):
    g, proc = AudioProcessor.new(0, 2, OPTS)
    bank = g.edit(
        lambda gg: gg.push(
            VoiceBank(SineVoice(attack=attack, release=release), n_voices,
                      event_capacity=512)
        )
    )
    bank.to_graph_out()
    g.commit()
    pool = VoicePool(proc, bank)
    return g, proc, bank, pool


def test_thousand_note_ons_zero_recompiles():
    g, proc, bank, pool = _make()
    proc.render(frames=64)  # compile once
    rev0 = g.revision
    compiled0 = proc.compiled

    played = 0
    peak = 0.0
    rng = np.random.default_rng(0)
    while played < 1000:
        burst = min(16, 1000 - played)
        voices = []
        for _ in range(burst):
            v = pool.note_on({"freq": float(rng.uniform(100, 900)),
                              "amp": 0.002})
            assert v is not None, f"pool dry at note {played}"
            voices.append(v)
        played += burst
        peak = max(peak, float(np.abs(proc.render(frames=64 * 2)).max()))
        # release the gates; envelopes finish within ~5 ms
        for v in voices:
            pool.note_off(v)
        proc.render(frames=64 * 8)  # ~10 ms: envelopes run out

    assert played == 1000
    assert peak > 1e-4  # the notes actually sounded
    assert g.revision == rev0, "a recompile happened"
    assert proc.compiled is compiled0
    # after a final render, everything auto-releases
    proc.render(frames=64 * 8)
    pool.refresh()
    assert pool.free_count == pool.n_voices


def test_pool_over_mesh_bank_auto_release():
    """VoicePool flips track_idle AFTER the MeshVoiceBank is constructed;
    the flag must reach the per-shard local bank or the idle latch never
    engages and every voice leaks (regression: make_local / process sync)."""
    import jax

    from knaster_tpu import MeshVoiceBank

    mesh = jax.make_mesh((len(jax.devices()),), ("voices",))
    g, proc = AudioProcessor.new(0, 2, OPTS)
    bank = g.edit(
        lambda gg: gg.push(
            MeshVoiceBank(
                VoiceBank(SineVoice(attack=0.001, release=0.004), 64,
                          event_capacity=512),
                mesh,
            )
        )
    )
    bank.to_graph_out()
    g.commit()
    pool = VoicePool(proc, bank)
    proc.render(frames=64)

    voices = [pool.note_on({"freq": 300.0 + 10 * i, "amp": 0.002})
              for i in range(pool.n_voices)]
    assert all(v is not None for v in voices)
    proc.render(frames=64 * 2)
    for v in voices:
        pool.note_off(v)
    proc.render(frames=64 * 8)  # envelopes run out
    assert pool.refresh() == pool.n_voices  # idle latch engaged per shard
    assert pool.free_count == pool.n_voices
    # and the pool is usable again without stealing
    assert pool.note_on({"freq": 440.0, "amp": 0.002}) is not None


def test_exhaustion_policies():
    g, proc, bank, pool = _make(n_voices=8)
    proc.render(frames=64)
    got = [pool.note_on({"amp": 0.001}) for _ in range(8)]
    assert sorted(got) == list(range(8))
    # default policy: never steal an active voice
    assert pool.note_on({"amp": 0.001}) is None
    assert pool.held_count == 8

    pool2 = VoicePool(proc, bank, steal="oldest")
    pool2._free = []  # simulate exhaustion
    pool2._held.update((v, 0) for v in range(8))
    v = pool2.note_on({"amp": 0.001})
    assert v == 0  # the oldest held voice is reused


def test_auto_release_is_fetch_gated():
    """note_on does NOT touch the device while free voices remain (the
    has_*-gate rule: each fetch is a tunnel round-trip)."""
    g, proc, bank, pool = _make(n_voices=8)
    proc.render(frames=64)
    calls = []
    orig = pool._idle_vector
    pool._idle_vector = lambda: (calls.append(1), orig())[1]
    for _ in range(8):
        assert pool.note_on({"amp": 0.001}) is not None
    assert calls == []  # free list never ran dry
    # exhausted now: the next note_on fetches exactly once
    pool.note_on({"amp": 0.001})
    assert len(calls) == 1


def test_pool_over_pallas_bank():
    """The idle latch's level semantics in the Pallas kernels (stopped
    envelope stage == free) drive VoicePool auto-release too."""
    from knaster_tpu import PallasSineVoiceBank

    g, proc = AudioProcessor.new(0, 2, OPTS)
    bank = g.edit(
        lambda gg: gg.push(
            PallasSineVoiceBank(
                256, attack=0.001, release=0.004, tile_rows=2,
                voice_defaults={
                    "freq": np.linspace(100, 900, 256).astype(np.float32),
                    "amp": np.full(256, 0.01, np.float32),
                    "pan": np.zeros(256, np.float32),
                },
            )
        )
    )
    bank.to_graph_out()
    g.commit()
    pool = VoicePool(proc, bank)
    proc.render(frames=64)
    voices = [pool.note_on() for _ in range(16)]
    assert all(v is not None for v in voices)
    peak = float(np.abs(proc.render(frames=64 * 4)).max())
    assert peak > 1e-4
    for v in voices:
        pool.note_off(v)
    proc.render(frames=64 * 12)  # release tails run out
    released = pool.refresh()
    assert released == 16
    assert pool.free_count == pool.n_voices


def test_pool_over_envelope_voice_bank():
    """Pool-managed voices with 4+-segment envelopes (VERDICT r3 #7): the
    envelope-finished latch reclaims voices that ran their program out
    (no note_off needed — one-shot envelopes free themselves), and
    t_stop acts as a hard note-off."""
    from knaster_tpu import EnvelopeVoice, PallasVoiceBank
    from knaster_tpu.ugens.envelopes import Envelope

    env = Envelope(0.0, [(0.001, 1.0), (0.002, 0.5),
                         (0.002, 0.75, "sinusoidal"), (0.003, 0.0)])
    g, proc = AudioProcessor.new(0, 2, OPTS)
    bank = g.edit(
        lambda gg: gg.push(
            PallasVoiceBank(
                EnvelopeVoice(env), 256, tile_rows=2, event_capacity=512,
                voice_defaults={
                    "freq": np.linspace(100, 900, 256).astype(np.float32),
                    "amp": np.full(256, 0.01, np.float32),
                },
            )
        )
    )
    bank.to_graph_out()
    g.commit()
    pool = VoicePool(proc, bank)
    proc.render(frames=64)
    voices = [pool.note_on() for _ in range(16)]
    assert all(v is not None for v in voices)
    peak = float(np.abs(proc.render(frames=64 * 2)).max())
    assert peak > 1e-4
    proc.render(frames=64 * 8)  # ~10.7 ms > the 8 ms program
    released = pool.refresh()
    assert released == 16
    assert pool.free_count == pool.n_voices
    # t_stop as note-off: a held... stop a fresh voice mid-program
    v = pool.note_on()
    proc.render(frames=64)
    pool.note_off(v, trigger="t_stop")
    proc.render(frames=64 * 2)
    assert pool.refresh() == 1
