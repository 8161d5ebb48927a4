"""Test configuration: run on a virtual 8-device CPU mesh.

Tests drive the compiled block function synchronously — the same pattern as
the reference, where the non-realtime AudioProcessor *is* the fake backend
(knaster_graph/src/tests/graph_tests.rs). Multi-chip sharding tests use the
8 virtual CPU devices.

The container's sitecustomize force-registers the axon TPU platform and
overrides jax_platforms, so we must switch the config *after* importing jax
and clear any initialized backends.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("KNASTER_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    except Exception:
        pass
    assert jax.devices()[0].platform == "cpu"

    # persistent compilation cache: the suite is dominated by CPU jit
    # compiles of programs that are identical across runs
    try:
        _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        # crash sentinel: if the previous run died mid-write (SIGKILL from a
        # harness timeout), a cache entry can be truncated, and deserializing
        # it SEGFAULTS jax (observed: get_executable_and_time crash). Wipe
        # the cache whenever the last run didn't exit cleanly.
        _sentinel = os.path.join(_cache_dir, ".suite_running")
        if os.path.exists(_sentinel):
            import shutil

            shutil.rmtree(_cache_dir, ignore_errors=True)
        os.makedirs(_cache_dir, exist_ok=True)
        with open(_sentinel, "w") as _f:
            _f.write(str(os.getpid()))
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def pytest_sessionfinish(session, exitstatus):
    try:
        os.remove(os.path.join(os.path.dirname(__file__), ".jax_cache",
                               ".suite_running"))
    except OSError:
        pass
