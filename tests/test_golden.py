"""End-to-end golden parity (BASELINE.md "Output parity <= 1e-6"): the
five north-star configs render bit-stably against checked-in FLAC
fixtures at f32 and f64 (tests/golden_configs.py). A failure here means
an audible end-to-end change — regenerate fixtures only for INTENTIONAL
changes (python tests/golden_configs.py --write [--f64])."""

import os
import subprocess
import sys

import numpy as np
import pytest

from golden_configs import CONFIGS, check_fixture

_SCRIPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "golden_configs.py")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_f32(name):
    err = check_fixture(name, np.float32, "f32")
    assert err <= 1e-6 + 2.0 ** -23


def test_golden_f64():
    """enable_f64 flips global JAX config, so the f64 sweep runs in a
    subprocess (same pattern as test_f64.py) over all five configs."""
    r = subprocess.run(
        [sys.executable, _SCRIPT, "--f64"],
        capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    for name in CONFIGS:
        assert f"OK {name}_f64" in r.stdout, r.stdout
