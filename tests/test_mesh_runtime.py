"""Multi-chip through the FULL runtime (VERDICT round-2 #5): a MeshVoiceBank
graph driven by AudioProcessor.render() with live per-voice events, by the
StreamBackend (async recompile + pipeline), and through sharded
save_state/load_state — all on the 8-device virtual CPU mesh."""

import time

import jax
import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    MeshVoiceBank,
    Seconds,
    SineVoice,
    VoiceBank,
)
from knaster_tpu.backends import StreamBackend

SR = 48000
OPTS = AudioProcessorOptions(block_size=64, sample_rate=SR)
V = 16


def _samples(n):
    return Seconds.from_samples(n, SR)


def _mesh():
    return jax.make_mesh((len(jax.devices()),), ("voices",))


def _bank():
    freqs = 220.0 * (1 + np.arange(V, dtype=np.float32) / V)
    return VoiceBank(SineVoice(amp=0.02), V, voice_defaults={"freq": freqs},
                     event_capacity=512)


def _schedule_events(handle, n_events=120):
    """>= 100 live per-voice events spread over ~0.2 s: triggers, float
    sets, smoothing ramps, releases — identical for both graphs."""
    rng = np.random.default_rng(7)
    t = handle.voice_param("t_restart")
    r = handle.voice_param("t_release")
    f = handle.voice_param("freq")
    count = 0
    frame = 10
    while count < n_events:
        v = int(rng.integers(0, V))
        which = count % 4
        if which == 0:
            t.trig_at(v, _samples(frame))
        elif which == 1:
            f.set_at(v, float(rng.uniform(150, 800)), _samples(frame))
        elif which == 2:
            f.smooth(v, 0.002)
            f.set_at(v, float(rng.uniform(150, 800)), _samples(frame + 3))
        else:
            r.trig_at(v, _samples(frame))
        count += 1
        frame += int(rng.integers(17, 97))
    return frame


def test_mesh_graph_render_with_live_events_matches_unsharded():
    """The engine path (compile → per-block events → render) over the mesh
    equals the unsharded graph, with 120 live per-voice events."""
    g, proc = AudioProcessor.new(0, 2, OPTS)
    mb = g.edit(lambda gg: gg.push(MeshVoiceBank(_bank(), _mesh())))
    mb.to_graph_out()
    g.commit()
    end = _schedule_events(mb)

    g2, proc2 = AudioProcessor.new(0, 2, OPTS)
    ub = g2.edit(lambda gg: gg.push(_bank()))
    ub.to_graph_out()
    g2.commit()
    end2 = _schedule_events(ub)
    assert end == end2

    frames = ((end + 256) // 64) * 64
    a = proc.render(frames=frames)
    b = proc2.render(frames=frames)
    assert np.abs(b).max() > 1e-4
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """save_state/load_state of a mesh-sharded graph: leaves restore with
    their mesh shardings and the resumed render is sample-exact."""
    path = str(tmp_path / "ck.pkl")

    def fresh():
        g, proc = AudioProcessor.new(0, 2, OPTS)
        mb = g.edit(lambda gg: gg.push(MeshVoiceBank(_bank(), _mesh())))
        mb.to_graph_out()
        g.commit()
        return g, proc, mb

    g, proc, mb = fresh()
    for v in range(V):
        mb.voice_param("t_restart").trig(v)
    proc.render(frames=640)
    proc.save_state(path)
    after = proc.render(frames=640)

    g2, proc2, mb2 = fresh()
    proc2.load_state(path)
    # sharded leaves restored SHARDED (not silently replicated)
    loc = proc2.compiled._node_loc(mb2.node_id)
    st = proc2.state["nodes"][loc[1]]
    fv = st["fvals"]
    assert not fv.sharding.is_fully_replicated
    resumed = proc2.render(frames=640)
    np.testing.assert_allclose(resumed, after, atol=1e-6)


def test_stream_backend_drives_mesh_graph():
    """StreamBackend (producer/fetcher pipeline + async recompile) streams
    a mesh-sharded bank graph with live per-voice control."""
    g, proc = AudioProcessor.new(0, 2, OPTS)
    mb = g.edit(lambda gg: gg.push(MeshVoiceBank(_bank(), _mesh())))
    mb.to_graph_out()
    g.commit()
    proc.run_without_inputs()  # warm before going live
    captured = []
    be = StreamBackend(SR, 64, lookahead_blocks=64,
                       consumer=lambda blk: captured.append(blk.copy()))
    be.start_processing(proc)
    try:
        time.sleep(0.3)
        for v in range(V):
            mb.voice_param("t_restart").trig(v)
        time.sleep(0.6)
        for v in range(0, V, 2):
            mb.voice_param("freq").set(v, 330.0)
        time.sleep(0.3)
    finally:
        be.stop()
    data = np.concatenate(captured, axis=1)
    assert data.shape[0] == 2
    # silence before the triggers, sound after
    assert np.abs(data).max() > 1e-4
