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

    # NO persistent compilation cache here, on purpose. The cache was tried
    # (round 3) and produced three distinct native crashes mid-suite on this
    # jaxlib: SIGSEGV deserializing a truncated entry (handled with a crash
    # sentinel), then SIGABRT in put_executable_and_time / SIGSEGV in
    # get_executable_and_time whenever executable.(de)serialize() ran while
    # ANOTHER thread compiled, and finally — with every compile behind one
    # RLock — the same SIGABRT in the MAIN thread's locked cache write while
    # an engine worker thread merely EXECUTED a program (the processor
    # pre-warms carry programs and streams render on daemon threads, so
    # concurrent execution is inherent to this suite). CPU executable
    # serialization is not thread-safe against concurrent client activity in
    # this jaxlib, and that cannot be fixed from Python: tests recompile.
    import shutil

    shutil.rmtree(os.path.join(os.path.dirname(__file__), ".jax_cache"),
                  ignore_errors=True)

    # ...and native CPU compiles themselves are not safe against CONCURRENT
    # native compiles either (the engine pre-warms carry programs on daemon
    # worker threads across many tests): with the cache gone, a full-suite
    # run still SIGSEGVed in backend_compile_and_load in the MAIN thread
    # mid-suite. Serialize every compile through one lock — pxla calls
    # compile_or_get_cached as a module attribute, so setattr is enough.
    # CPU test compiles are subsecond; losing compile overlap is fine here.
    try:
        import threading

        from jax._src import compiler as _compiler

        _compile_lock = threading.RLock()
        _orig_cogc = _compiler.compile_or_get_cached

        def _locked_cogc(*a, **k):
            with _compile_lock:
                return _orig_cogc(*a, **k)

        _compiler.compile_or_get_cached = _locked_cogc
    except Exception:
        pass
