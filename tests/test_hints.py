"""Parameter hints end-to-end (VERDICT r1 #6): declaration via pfloat/
pinteger/@ugen, exposure via Handle.param_hints(), Nyquist resolution at the
graph sample rate, and inclusion in GraphInspection/dot.

reference: knaster_core/src/parameters.rs:109-230 (PFloatHint/PIntegerHint),
knaster_macros/src/lib.rs:773-779 (#[param(range=…, logarithmic=…, kind=…)]).
"""

import numpy as np

from knaster_tpu import (
    AudioProcessor,
    AudioProcessorOptions,
    FloatHint,
    IntegerHint,
    NYQUIST,
    ParameterKind,
    SvfFilter,
    pfloat,
    ugen,
)
from knaster_tpu.graph.inspection import inspect as g_inspect, to_dot


def _new(sr=48000):
    return AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=64, sample_rate=sr)
    )


def test_svf_cutoff_hint_resolves_nyquist_at_graph_sample_rate():
    g, proc = _new(sr=44100)
    h = g.edit(lambda gg: gg.push(SvfFilter()))
    hints = h.param_hints()
    cutoff = hints["cutoff_freq"]
    assert isinstance(cutoff, FloatHint)
    assert cutoff.kind == ParameterKind.FREQUENCY
    assert cutoff.logarithmic
    assert cutoff.minimum == 0.0
    assert cutoff.maximum == 44100 / 2.0  # Nyquist resolved
    # unresolved view keeps the sentinel
    raw = h.param_hints(resolve=False)["cutoff_freq"]
    assert raw.maximum is NYQUIST
    # the Parameter handle exposes the resolved hint too
    assert h.param("cutoff_freq").hint.maximum == 22050.0


def test_enum_integer_param_has_value_descriptions():
    g, proc = _new()
    h = g.edit(lambda gg: gg.push(SvfFilter()))
    ih = h.param_hints()["filter"]
    assert isinstance(ih, IntegerHint)
    assert ih.minimum == 0 and ih.maximum == 8
    descs = dict(ih.value_descriptions)
    assert descs[0] == "Low" and descs[8] == "HighShelf"


def test_ugen_decorator_accepts_param_declarations_with_hints():
    @ugen(inputs=0, outputs=1)
    def osc(ctx, state, inputs, *,
            freq=pfloat(440.0, kind=ParameterKind.FREQUENCY,
                        range=(20.0, NYQUIST), logarithmic=True),
            amp=pfloat(0.5, range=(0.0, 1.0))):
        return state, (amp * (freq * 0.0 + 1.0))[None, :]

    g, proc = _new()
    h = g.edit(lambda gg: (lambda hh: (hh.to_graph_out(), hh)[1])(
        gg.push(osc(freq=220.0))))
    hints = h.param_hints()
    assert hints["freq"].minimum == 20.0
    assert hints["freq"].maximum == 24000.0
    assert hints["freq"].logarithmic
    assert hints["amp"] == FloatHint(minimum=0.0, maximum=1.0, default=0.5,
                                     logarithmic=False)
    # the declaration still carries the default value and renders
    out = proc.render(frames=64)
    np.testing.assert_allclose(out[0], 0.5, atol=1e-7)


def test_inspection_and_dot_carry_hints():
    g, proc = _new()
    g.edit(lambda gg: gg.push(SvfFilter()).to_graph_out())
    gi = g_inspect(g.root())
    node = [n for n in gi.nodes if n.type_name.startswith("Svf")][0]
    by_name = {name: hint for name, _, hint in node.params}
    assert by_name["cutoff_freq"].maximum == 24000.0
    dot = to_dot(g.root())
    assert "tooltip=" in dot and "cutoff_freq" in dot
