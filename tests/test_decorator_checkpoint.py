"""@ugen decorator (impl_ugen parity) and checkpoint/resume tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from knaster_tpu import (
    TRIG,
    AudioProcessor,
    AudioProcessorOptions,
    Seconds,
    SinWt,
    ugen,
)

OPTS = AudioProcessorOptions(block_size=16, sample_rate=48000)


def test_ugen_decorator_block_form():
    @ugen(inputs=1, outputs=1)
    def gain(ctx, state, inputs, *, amount=1.0):
        return state, inputs * amount[None, :]

    g, proc = AudioProcessor.new(1, 1, OPTS)

    def build(gg):
        n = gg.push(gain(amount=0.5))
        gg.from_inputs(0).to(n)
        n.to_graph_out()
        return n.param("amount")

    p = g.edit(build)
    x = np.ones((1, 16), np.float32)
    proc.run(x)
    assert np.all(proc.output_block()[0] == 0.5)
    p.set_at(2.0, Seconds.from_samples(24, 48000))  # sample-accurate for free
    proc.run(x)
    out = proc.output_block()[0]
    np.testing.assert_array_equal(out[:8], 0.5)
    np.testing.assert_array_equal(out[8:], 2.0)


def test_ugen_decorator_sample_form_with_trigger():
    @ugen.sample(
        inputs=0, outputs=1,
        state=lambda ctx: {"count": jnp.zeros((), jnp.int32)},
    )
    def counter(carry, frame, *, t_reset=TRIG, step=1):
        c = jnp.where(t_reset, 0, carry["count"])
        return {"count": c + step}, jnp.asarray([c], jnp.float32)

    g, proc = AudioProcessor.new(0, 1, OPTS)

    def build(gg):
        n = gg.push(counter())
        n.to_graph_out()
        return n.param("t_reset")

    t = g.edit(build)
    t.trig_at(Seconds.from_samples(5, 48000))
    proc.run_without_inputs()
    out = proc.output_block()[0]
    np.testing.assert_array_equal(out[:5], np.arange(5))
    np.testing.assert_array_equal(out[5:], np.arange(11))


def test_ugen_decorator_param_inference_errors():
    with pytest.raises(TypeError):

        @ugen()
        def bad(ctx, state, inputs, *, weird="str"):
            return state, inputs


def test_checkpoint_resume(tmp_path):
    path = str(tmp_path / "ckpt.pkl")

    def make():
        g, proc = AudioProcessor.new(0, 1, OPTS)
        g.edit(lambda gg: gg.push(SinWt(997.0)).to_graph_out())
        return g, proc

    g1, p1 = make()
    a = p1.render(frames=481)  # NOT block-aligned: pending must checkpoint too
    p1.save_state(path)
    b_continued = p1.render(frames=480)

    g2, p2 = make()
    p2.load_state(path)
    b_restored = p2.render(frames=480)
    np.testing.assert_array_equal(b_continued, b_restored)
    assert g2.clock.frames >= 480


def test_ugen_decorator_flexible_signatures():
    """The block fn may take any subset of ctx/state/inputs (the reference
    macro's flexible-signature adapter, knaster_macros/src/lib.rs:824-870);
    stateless forms return just the output block."""
    import jax.numpy as jnp

    from knaster_tpu import AudioProcessor, AudioProcessorOptions, ugen

    @ugen(inputs=0, outputs=1)
    def just_params(ctx, *, level=0.25):
        return level[None, :] * jnp.ones((1, ctx.block_size), ctx.dtype)

    @ugen(inputs=1, outputs=1)
    def gain_no_ctx(inputs, *, amount=2.0):
        return inputs * amount[None, :]

    g, proc = AudioProcessor.new(
        0, 1, AudioProcessorOptions(block_size=16)
    )

    def build(gg):
        src = gg.push(just_params())
        amp = gg.push(gain_no_ctx())
        src.to(amp)
        amp.to_graph_out()
        return src

    g.edit(build)
    out = proc.render(frames=64)
    np.testing.assert_allclose(out[0], 0.5, atol=1e-7)

    # unknown positional names are rejected at decoration time
    import pytest as _pytest
    with _pytest.raises(TypeError):
        @ugen(inputs=0, outputs=1)
        def bad(banana, *, x=1.0):
            return banana
