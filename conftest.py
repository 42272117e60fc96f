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

sys.path.insert(0, os.path.dirname(__file__))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long closed-loop simulations (run with -m slow or no -m "
        "filter; the fast default profile is -m 'not slow')",
    )
