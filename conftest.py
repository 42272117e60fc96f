"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The driver benches on real TPU hardware separately; tests must be runnable
anywhere, so we pin JAX to the host platform with 8 virtual devices (the
SURVEY.md §4 implication: multi-host pod-slice logic testable without TPUs).

Note: the container's sitecustomize pre-imports jax and registers the axon
TPU platform, so the JAX_PLATFORMS env var is read too early — we must use
``jax.config.update`` instead of env vars alone.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CPU-scoped persistent compile cache: the suite is dominated by jit
# compilation of closed-loop programs (48 min cold / most of it compiles).
# A platform-scoped cache dir is safe — the CLAUDE.md hazard is only about
# SHARING one dir between the remote-compile TPU tunnel and local CPU
# (tunnel-emitted CPU AOT artifacts SIGILL local runs); this dir is used
# by the forced-CPU test platform exclusively.  OVT_TEST_NO_CACHE=1 opts
# out (e.g. to measure cold-compile regressions).
if not os.environ.get("OVT_TEST_NO_CACHE"):
    _cache = os.path.expanduser("~/.cache/ovt_cpu_test_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(__file__))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long closed-loop simulations (run with -m slow or no -m "
        "filter; the fast default profile is -m 'not slow')",
    )
