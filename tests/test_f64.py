"""f64 sample-type mode (reference: F = f64 genericity).

enable_f64 flips global JAX config, so it runs in a subprocess to keep the
rest of the suite on f32.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as xb
    xb._clear_backends()
except Exception:
    pass
import numpy as np
import knaster_tpu as kt

kt.enable_f64()
opts = kt.AudioProcessorOptions(block_size=16)
g, proc = kt.AudioProcessor.new(0, 1, opts, dtype=np.float64)

def build(gg):
    s = gg.push(kt.SinNumeric(440.0))
    (s * 0.25).to_graph_out()
    f = gg.push(kt.SvfFilter(kt.SvfFilterType.Low, 2000.0, 0.7, 0.0))

g.edit(build)
audio = proc.render(frames=4800)
assert audio.dtype == np.float64, audio.dtype
import math
expected = 0.25 * np.sin(2 * np.pi * 440.0 * np.arange(4800) / 48000.0)
err = np.abs(audio[0] - expected).max()
assert err < 1e-9, f"f64 precision not reached: {err}"
print("OK", err)
"""


def test_f64_mode_subprocess():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
