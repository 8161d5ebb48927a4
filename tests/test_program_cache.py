"""Topology-keyed program cache: structural commits whose canonical shape
matches a previous compile reuse both jitted programs without re-tracing —
the TPU-native analog of the reference's microsecond TaskData swap on
commit_changes (knaster_graph/src/graph.rs:1707-1726)."""

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    EnvAsr,
    MathUGen,
    SinWt,
)
from knaster_tpu.core.ugen import AudioCtx, UGen

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


class CountingUGen(UGen):
    """Constant UGen that counts how many times its process is TRACED."""

    inputs = 0
    outputs = 1
    params = ()
    trace_count = [0]  # class-level: not part of the instance signature

    def __init__(self, value: float = 1.0):
        self.value = float(value)

    def init(self, ctx: AudioCtx):
        import jax.numpy as jnp

        return {"z": jnp.zeros((), ctx.dtype)}

    def process(self, ctx: AudioCtx, state, inputs, params):
        import jax.numpy as jnp

        CountingUGen.trace_count[0] += 1
        return state, jnp.full((1, ctx.block_size), self.value, ctx.dtype)


def _push_voice(g):
    s = g.push(SinWt(440.0))
    e = g.push(EnvAsr(0.01, 0.05))
    m = g.push(MathUGen("mul", 1))
    c = g.push(CountingUGen(0.5))
    g.connect(s, 0, 0, m)
    g.connect(e, 0, 1, m)
    g.connect(m, 0, 0, "graph")
    g.connect(c, 0, 0, "graph")
    return [s, e, m, c]


def test_push_free_push_identical_does_not_retrace():
    from knaster_tpu.graph.compile import clear_program_cache

    clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, OPTS)
    nodes = g.edit(_push_voice)
    nodes[1].param("t_restart").trig()  # eventful block: traces the FULL program
    proc.run_without_inputs()
    proc.run_without_inputs()  # event-free block: traces the fast program
    b0 = proc.output_block().copy()
    cg1 = proc.compiled
    traces_after_first = CountingUGen.trace_count[0]
    assert traces_after_first == 2  # render + render_fast traced once each

    def cycle(g):
        for h in nodes:
            g.free_node(h)
        return _push_voice(g)

    nodes[:] = g.edit(cycle)
    nodes[1].param("t_restart").trig()  # exercise BOTH programs post-commit
    proc.run_without_inputs()
    proc.run_without_inputs()
    cg2 = proc.compiled
    assert cg2.cache_hit
    assert cg2.render is cg1.render
    assert cg2.render_fast is cg1.render_fast
    # no re-trace: the counter did not move across the structural commit
    assert CountingUGen.trace_count[0] == traces_after_first
    # fresh nodes start from fresh state: first block identical to the first
    np.testing.assert_allclose(proc.output_block(), b0, atol=1e-7)


def test_cache_miss_on_different_config():
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        s = g.push(SinWt(440.0))
        g.connect(s, 0, 0, "graph")
        return s

    s = g.edit(build)
    proc.run_without_inputs()
    cg1 = proc.compiled

    def edit(g):
        g.free_node(s)
        s2 = g.push(SinWt(440.0, lookup=True))  # different trace config
        g.connect(s2, 0, 0, "graph")

    g.edit(edit)
    proc.run_without_inputs()
    assert not proc.compiled.cache_hit or proc.compiled.render is not cg1.render


def test_surviving_node_state_carries_across_cache_hit():
    """A node that survives a cached commit keeps its state (phase continues)
    while the re-pushed node restarts — TakeFromTask parity on the fast path."""
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        keep = g.push(SinWt(330.0))
        tmp = g.push(SinWt(440.0))
        g.connect(keep, 0, 0, "graph")
        g.connect(tmp, 0, 0, "graph")
        return keep, tmp

    keep, tmp = g.edit(build)
    proc.run_without_inputs()
    proc.run_without_inputs()

    # reference render: same graph untouched for 3 blocks
    g2, proc2 = AudioProcessor.new(0, 1, OPTS)

    def build2(g):
        keep = g.push(SinWt(330.0))
        tmp = g.push(SinWt(440.0))
        g.connect(keep, 0, 0, "graph")
        g.connect(tmp, 0, 0, "graph")
        return keep, tmp

    k2, t2 = g2.edit(build2)
    for _ in range(2):
        proc2.run_without_inputs()

    def cycle(g):
        g.free_node(tmp)
        t = g.push(SinWt(440.0))
        g.connect(t, 0, 0, "graph")
        return t

    g.edit(cycle)
    proc.run_without_inputs()
    out = proc.output_block()[0]
    assert proc.compiled.cache_hit

    # expected: keep-sine continues at block 3 phase; tmp-sine restarts
    import jax.numpy as jnp  # noqa: F401
    from knaster_tpu.graph.compile import compile_graph

    g3, proc3 = AudioProcessor.new(0, 1, OPTS)

    def build3(g):
        a = g.push(SinWt(330.0))
        g.connect(a, 0, 0, "graph")
        return a

    g3.edit(build3)
    for _ in range(3):
        proc3.run_without_inputs()
    keep_b3 = proc3.output_block()[0]

    g4, proc4 = AudioProcessor.new(0, 1, OPTS)

    def build4(g):
        a = g.push(SinWt(440.0))
        g.connect(a, 0, 0, "graph")
        return a

    g4.edit(build4)
    proc4.run_without_inputs()
    tmp_b1 = proc4.output_block()[0]

    np.testing.assert_allclose(out, keep_b3 + tmp_b1, atol=1e-6)


def test_two_processors_share_programs():
    g1, p1 = AudioProcessor.new(0, 1, OPTS)
    g2, p2 = AudioProcessor.new(0, 1, OPTS)

    def build(g):
        s = g.push(SinWt(220.0))
        g.connect(s, 0, 0, "graph")

    g1.edit(build)
    g2.edit(build)
    p1.run_without_inputs()
    p2.run_without_inputs()
    assert p2.compiled.render is p1.compiled.render
    np.testing.assert_allclose(p1.output_block(), p2.output_block(), atol=0)


def test_carry_keyed_by_correspondence_not_just_prev_signature():
    """Two same-signature commits can pair surviving node ids with DIFFERENT
    slots (free A + push C vs free C + push D); a cached carry program traced
    for the first correspondence must not be reused for the second
    (TakeFromTask: same node id => same state)."""
    from knaster_tpu.graph.compile import clear_program_cache

    def run(use_cache):
        if not use_cache:
            clear_program_cache()
        g, proc = AudioProcessor.new(0, 1, OPTS)
        hs = g.edit(lambda gg: [
            (lambda h: (h.to_graph_out(), h)[1])(gg.push(SinWt(440.0)))
            for _ in range(2)
        ])
        # distinguish the two identical nodes through runtime param values
        hs[0].param("freq").set(100.0)
        hs[1].param("freq").set(900.0)
        proc.render(frames=256)
        # edit 1: free node B, push C  (correspondence: A->pos0, C fresh)
        g.edit(lambda gg: hs[1].free())
        hC = g.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
            gg.push(SinWt(440.0))))
        hC.param("freq").set(500.0)
        proc.render(frames=256)
        # edit 2: SAME signatures, DIFFERENT correspondence (free A, push D)
        g.edit(lambda gg: hs[0].free())
        hD = g.edit(lambda gg: (lambda h: (h.to_graph_out(), h)[1])(
            gg.push(SinWt(440.0))))
        return proc.render(frames=512)

    a = run(use_cache=True)
    b = run(use_cache=False)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_carry_from_single_slot_into_batch():
    """A node that moves from a 'single' plan slot into a batch on re-edit
    keeps its state (the batched carry gather must not treat it as fresh)."""
    from knaster_tpu import OnePoleLpf

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        src = gg.push(SinWt(220.0))
        f1 = gg.push(OnePoleLpf(500.0))
        f2 = gg.push(OnePoleLpf(500.0))
        f3 = gg.push(OnePoleLpf(500.0))
        src.to(f1)
        src.to(f2)
        f1.to(f3)     # depth 2: planned as a 'single'
        f3.to_graph_out()
        f2.to_graph_out()
        return src, f1, f3

    src, f1, f3 = g.edit(build)
    proc.render(frames=512)  # filters accumulate state
    before = proc.compiled._extract_node_state(proc.state, f3.node_id)
    before = {k: float(np.asarray(v)) for k, v in before.items()}
    assert any(abs(v) > 1e-6 for v in before.values())
    # rewire f3 to read the source directly: it joins the depth-1 batch
    g.edit(lambda gg: src.to_replace(f3))
    proc._ensure_compiled()
    after = proc.compiled._extract_node_state(proc.state, f3.node_id)
    after = {k: float(np.asarray(v)) for k, v in after.items()}
    assert before == after, (before, after)


def test_cache_hit_uses_new_push_defaults():
    """Program-cache hits must NOT resurrect the previous push's param
    defaults: pdefaults are excluded from the structural signature
    (core/signature.py), so push/free/push of the same voice shape at a NEW
    default frequency is a cache hit — and the carry program receives the
    fresh default-init state as runtime data, not baked trace constants
    (regression: a cached carry once replayed the earlier 440 Hz default
    onto a 523 Hz re-push)."""
    import knaster_tpu.graph.compile as C

    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def push(freq):
        def build(gg):
            s = gg.push(SinWt(freq))
            (s * 0.1).to_graph_out()
            return s
        return g.edit(build)

    def zc_tail(audio, n):
        ch = np.asarray(audio)[0][-n:]
        return int(np.sum((ch[:-1] < 0) & (ch[1:] >= 0)))

    h = push(440.0)
    assert abs(zc_tail(proc.render(seconds=0.2), 9600) - 88) <= 2
    n1 = len(C._PROGRAM_CACHE)
    g.edit(lambda gg: gg.free_node(h))
    proc.render(frames=32)
    push(523.25)
    out = proc.render(seconds=0.2)
    assert abs(zc_tail(out, 4800) - 52) <= 3, (
        "re-pushed voice played the previous push's default frequency"
    )
    # same shape at a new default: program-cache hit (only the freed
    # interim topology is a new entry)
    assert len(C._PROGRAM_CACHE) == n1 + 1


def test_cache_hit_uses_new_bank_voice_defaults():
    """voice_defaults arrays are in VoiceBank.signature_exclude: re-pushing
    a bank with a different detune table is a cache hit AND the new table
    takes effect (state flows through the carry's fresh-data argument)."""
    import knaster_tpu.graph.compile as C
    from knaster_tpu.models.voices import SineVoice
    from knaster_tpu.parallel import VoiceBank

    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 2, OPTS)

    def push(freq):
        def build(gg):
            b = gg.push(VoiceBank(SineVoice(amp=0.1, attack=0.0), 4,
                                  voice_defaults={
                                      "freq": np.full(4, freq, np.float32)
                                  }))
            b.to_graph_out()
            return b
        return g.edit(build)

    def freq_of(audio, n):
        ch = np.asarray(audio)[0][-n:]
        return np.sum((ch[:-1] < 0) & (ch[1:] >= 0)) / (n / 48000.0)

    b = push(440.0)
    b.voice_param("t_restart").trig(0)
    assert abs(freq_of(proc.render(seconds=0.2), 4800) - 440) < 15
    n1 = len(C._PROGRAM_CACHE)
    g.edit(lambda gg: gg.free_node(b))
    proc.render(frames=32)
    b2 = push(660.0)
    b2.voice_param("t_restart").trig(0)
    out = proc.render(seconds=0.2)
    assert abs(freq_of(out, 4800) - 660) < 20, (
        "re-pushed bank played the previous bank's detune table"
    )
    assert len(C._PROGRAM_CACHE) == n1 + 1  # new-table re-push = cache hit


def test_cache_hit_on_different_wavetable_content():
    """OscWt keeps its mip chain in STATE and excludes the wavetable from
    its signature: re-pushing with different table content is a cache hit
    and the new table is what renders (live wavetable swap idiom)."""
    import knaster_tpu.graph.compile as C
    from knaster_tpu import OscWt, Wavetable

    C.clear_program_cache()
    g, proc = AudioProcessor.new(0, 1, OPTS)

    def push(wt):
        def build(gg):
            o = gg.push(OscWt(wt, 440.0))
            (o * 0.5).to_graph_out()
            return o
        return g.edit(build)

    h = push(Wavetable.sine())
    a = np.asarray(proc.render(seconds=0.05))
    n1 = len(C._PROGRAM_CACHE)
    g.edit(lambda gg: gg.free_node(h))
    proc.render(frames=32)
    push(Wavetable.saw())  # different spectrum
    b = np.asarray(proc.render(seconds=0.05))
    assert len(C._PROGRAM_CACHE) == n1 + 1  # re-push = cache hit
    # the NEW table renders: a pure-sine fit leaves clear residual on b
    t = np.arange(a.shape[1]) / 48000.0

    def sine_resid(x):
        ph = 2 * np.pi * 440.0 * t
        basis = np.stack([np.sin(ph), np.cos(ph)])
        coef, *_ = np.linalg.lstsq(basis.T, x, rcond=None)
        return float(np.sqrt(np.mean((x - basis.T @ coef) ** 2)))

    assert sine_resid(a[0]) < 0.01
    assert sine_resid(b[0]) > 0.05, "re-push still playing the old table"
